package graft.sources

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import graft.functions.ScalarOps

/** Minimal dependency-free HTML DOM for the rumor-page scan
  * (ref fetchRumors.js:75-124 uses JSDOM; this reproduces exactly the
  * subset of DOM behavior the reference exercises: container selection
  * fallback chain, document-order descendant walk, textContent, last
  * anchor extraction, and the `paragraphHTML` sanitizer).
  *
  * Tolerant of: void elements, self-closing tags, comments, doctype,
  * single/double/unquoted attributes, mismatched close tags (popped to
  * nearest match). Not a general-purpose parser — the frozen fixtures
  * (FIXTURES.md §B) are the contract, and the parsed element-row table
  * is the stable interface to the relational pipeline (SURVEY §7 risk 4).
  */
object HtmlDom {

  sealed trait Node
  final case class TextNode(text: String) extends Node
  final case class Elem(tag: String, attrs: Vector[(String, String)],
      children: Vector[Node]) extends Node {

    def attr(name: String): Option[String] =
      attrs.find(_._1 == name).map(_._2)

    /** Concatenated descendant text (DOM textContent). Iterative —
      * pathological nesting depth must not overflow the stack (found by
      * HtmlDomFuzzSpec).
      */
    def textContent: String = {
      val sb = new StringBuilder
      val stack = ArrayBuffer.empty[Node]
      var i = children.length - 1
      while (i >= 0) { stack += children(i); i -= 1 }
      while (stack.nonEmpty) {
        stack.remove(stack.length - 1) match {
          case TextNode(t) => sb.append(t)
          case e: Elem =>
            var j = e.children.length - 1
            while (j >= 0) { stack += e.children(j); j -= 1 }
        }
      }
      sb.toString
    }

    /** All descendant elements in document (pre-)order — the
      * querySelectorAll("*") snapshot of fetchRumors.js:89. Iterative.
      */
    def descendants: Vector[Elem] = {
      val out = ArrayBuffer.empty[Elem]
      val stack = ArrayBuffer.empty[Node]
      var i = children.length - 1
      while (i >= 0) { stack += children(i); i -= 1 }
      while (stack.nonEmpty) {
        stack.remove(stack.length - 1) match {
          case e: Elem =>
            out += e
            var j = e.children.length - 1
            while (j >= 0) { stack += e.children(j); j -= 1 }
          case _ =>
        }
      }
      out.toVector
    }

    /** Descendant anchors in document order (fetchRumors.js:103). */
    def anchors: Vector[Elem] = descendants.filter(_.tag == "a")
  }

  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** Parse an HTML document; returns the root <html> element (synthesized
    * if absent) — callers use [[container]] to pick the scan root.
    */
  def parse(html: String): Elem = {
    val n = html.length
    var i = 0
    // node-under-construction stack; index 0 is a synthetic root
    final case class Open(tag: String, attrs: Vector[(String, String)],
        children: ListBuffer[Node])
    val stack = ArrayBuffer(Open("#root", Vector.empty, ListBuffer.empty))

    def closeTo(tag: String): Unit = {
      val idx = stack.lastIndexWhere(_.tag == tag)
      if (idx > 0) {
        while (stack.length > idx) {
          val top = stack.remove(stack.length - 1)
          stack.last.children += Elem(top.tag, top.attrs, top.children.toVector)
        }
      } // unknown close tag: ignored (browser-like)
    }

    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (html.startsWith("</", i)) {
          val end = html.indexOf('>', i)
          val tag = html.substring(i + 2, if (end < 0) n else end).trim
            .toLowerCase(java.util.Locale.ROOT)
          closeTo(tag)
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(i + 1, end)
            val selfClosing = inner.endsWith("/")
            val body = if (selfClosing) inner.dropRight(1) else inner
            val (tag, attrs) = parseTag(body)
            if (tag.nonEmpty) {
              if (selfClosing || VoidTags(tag)) {
                stack.last.children += Elem(tag, attrs, Vector.empty)
              } else {
                stack += Open(tag, attrs, ListBuffer.empty)
              }
            }
            i = end + 1
          }
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next < 0) n else next
        val text = html.substring(i, end)
        if (text.nonEmpty) stack.last.children += TextNode(decodeEntities(text))
        i = end
      }
    }
    // close any unclosed elements
    while (stack.length > 1) {
      val top = stack.remove(stack.length - 1)
      stack.last.children += Elem(top.tag, top.attrs, top.children.toVector)
    }
    val root = Elem("#root", Vector.empty, stack.head.children.toVector)
    root.descendants.find(_.tag == "html")
      .getOrElse(Elem("html", Vector.empty, root.children))
  }

  private def parseTag(body: String): (String, Vector[(String, String)]) = {
    val trimmed = body.trim
    if (trimmed.isEmpty) return ("", Vector.empty)
    var i = 0
    while (i < trimmed.length && !trimmed.charAt(i).isWhitespace) i += 1
    val tag = trimmed.substring(0, i).toLowerCase(java.util.Locale.ROOT)
    if (!tag.forall(c => c.isLetterOrDigit || c == '-')) return ("", Vector.empty)
    val attrs = ArrayBuffer.empty[(String, String)]
    while (i < trimmed.length) {
      while (i < trimmed.length && trimmed.charAt(i).isWhitespace) i += 1
      if (i < trimmed.length) {
        val nameStart = i
        while (i < trimmed.length && trimmed.charAt(i) != '=' &&
          !trimmed.charAt(i).isWhitespace) i += 1
        val name = trimmed.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
        var value = ""
        if (i < trimmed.length && trimmed.charAt(i) == '=') {
          i += 1
          if (i < trimmed.length && (trimmed.charAt(i) == '"' || trimmed.charAt(i) == '\'')) {
            val quote = trimmed.charAt(i)
            val close = trimmed.indexOf(quote, i + 1)
            value = trimmed.substring(i + 1, if (close < 0) trimmed.length else close)
            i = if (close < 0) trimmed.length else close + 1
          } else {
            val valStart = i
            while (i < trimmed.length && !trimmed.charAt(i).isWhitespace) i += 1
            value = trimmed.substring(valStart, i)
          }
        }
        if (name.nonEmpty) attrs += (name -> decodeEntities(value))
      }
    }
    (tag, attrs.toVector)
  }

  /** The five named entities the engine emits plus numeric forms —
    * matching what fixtures may contain (fixtures are otherwise
    * entity-free by construction).
    */
  private def decodeEntities(s: String): String =
    if (!s.contains('&')) s
    else s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&#039;", "'").replace("&nbsp;", "\u00a0")
      .replace("&amp;", "&")

  private def encodeText(s: String): String =
    s.replace("&", "&amp;").replace("\u00a0", "&nbsp;")
      .replace("<", "&lt;").replace(">", "&gt;")

  /** HTML attribute-value serialization (the spec rules JSDOM's
    * innerHTML applies): escape `&`, U+00A0 (the HTML serialization
    * algorithm emits non-breaking space as `&nbsp;` in both text and
    * attribute values) and `"` — entities were decoded at parse time, so
    * a crawled href containing any of these must not break out of the
    * quoted attribute in the sanitized snippet.
    */
  private def encodeAttr(s: String): String =
    s.replace("&", "&amp;").replace("\u00a0", "&nbsp;").replace("\"", "&quot;")

  /** Container selection fallback chain (ref fetchRumors.js:79-84):
    * main → #content → .content → .container → body.
    */
  def container(doc: Elem): Elem = {
    val all = doc.descendants
    def byClass(c: String) = all.find(_.attr("class").exists(
      _.split("\\s+").contains(c)))
    all.find(_.tag == "main")
      .orElse(all.find(_.attr("id").contains("content")))
      .orElse(byClass("content"))
      .orElse(byClass("container"))
      .orElse(all.find(_.tag == "body"))
      .getOrElse(doc)
  }

  /** The `paragraphHTML` sanitizer (ref fetchRumors.js:59-73): keep
    * anchors (only href kept, target="_blank" forced when href exists),
    * flatten every non-anchor descendant to its text — outermost-first,
    * so anchors nested inside non-anchors flatten away with their
    * parent, exactly like the reference's document-order replaceWith
    * loop. Output is whitespace-normalized innerHTML.
    */
  def paragraphHtml(el: Elem): String = {
    // iterative serialize (nested-anchor chains must not overflow)
    sealed trait Item
    final case class Visit(n: Node) extends Item
    final case class Emit(s: String) extends Item
    val sb = new StringBuilder
    val stack = ArrayBuffer.empty[Item]
    var i = el.children.length - 1
    while (i >= 0) { stack += Visit(el.children(i)); i -= 1 }
    while (stack.nonEmpty) {
      stack.remove(stack.length - 1) match {
        case Emit(s) => sb.append(s)
        case Visit(TextNode(t)) => sb.append(encodeText(t))
        case Visit(a: Elem) if a.tag == "a" =>
          val attrs = a.attr("href") match {
            case Some(h) => s""" href="${encodeAttr(h)}" target="_blank""""
            case None => ""
          }
          sb.append(s"<a$attrs>")
          stack += Emit("</a>")
          var j = a.children.length - 1
          while (j >= 0) { stack += Visit(a.children(j)); j -= 1 }
        case Visit(other: Elem) => sb.append(encodeText(other.textContent))
      }
    }
    ScalarOps.clean(sb.toString)
  }
}
