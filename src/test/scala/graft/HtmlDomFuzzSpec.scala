package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HtmlDom

/** Fuzz robustness for the dependency-free HTML parser: arbitrary
  * garbage (including unbalanced tags, stray '<', truncated comments,
  * weird attributes) must never throw — a permissive source survives
  * malformed pages the way a browser does (SURVEY §7 risk 4).
  */
class HtmlDomFuzzSpec extends AnyFunSuite {
  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p).passed)

  private val tagSoup: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf("<p>", "</p>", "<li>", "<a href=\"x\">", "</a>", "<", ">", "</",
        "<!-- comment", "-->", "<br/>", "<div class='c", "<h3>March 3, 2024</h3>",
        "<a href=", "\"", "'", "<>", "</>", "<p", "<a href='y' rel=nofollow>"))
    Gen.listOf(frag).map(_.mkString)
  }

  test("parse never throws on tag soup") {
    check(Prop.forAll(tagSoup) { s =>
      val doc = HtmlDom.parse(s)
      doc.descendants.length >= 0
    })
  }

  test("full element walk + paragraphHtml never throw on tag soup") {
    check(Prop.forAll(tagSoup) { s =>
      val cont = HtmlDom.container(HtmlDom.parse(s))
      cont.descendants.forall { el =>
        val t = el.textContent
        val p = HtmlDom.paragraphHtml(el)
        t != null && p != null
      }
    })
  }

  test("parse is total on pathological nesting depth") {
    val deep = "<div>" * 5000 + "text" + "</div>" * 5000
    val doc = HtmlDom.parse(deep)
    assert(doc.descendants.nonEmpty)
  }
}
