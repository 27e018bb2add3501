package graft

import org.apache.spark.sql.{DataFrame, Row}
import java.security.MessageDigest

/** Canonical content hashing for query results.
  *
  * Motivation (VERDICT r6 §next-round #1): the driver's correctness gate
  * hashes parquet cell values after sorting columns by name; when its
  * number disagrees with ours we need a value-by-value diffable artifact
  * on OUR side, produced from the SAME parquet bytes the driver reads.
  * `Verify` therefore re-reads each written parquet directory and records
  * (a) a canonical sha256 over the sorted row text and (b) the sorted row
  * text itself (bounded), so any future divergence pinpoints the exact
  * row/cell instead of a bare hash mismatch.
  *
  * Canonical form: columns sorted by name (mirroring the driver compare),
  * each cell rendered by [[cell]], cells joined with , rows sorted
  * lexicographically and joined with \n. Deterministic across partition
  * counts, schedulers, and repeated runs — DeterminismStressSpec enforces
  * that claim for the queries the driver has flagged.
  */
object Canonical {

  /** Render one cell deterministically. Null is a sentinel no real value
    * collides with; binary is hex; nested arrays/structs/maps recurse
    * (map entries sorted — Spark map iteration order is not defined).
    * Doubles/floats use Java's shortest-roundtrip toString, which is
    * deterministic per bit pattern; BigDecimal normalizes trailing zeros
    * so 3.40 and 3.4 (same value, different scale) cannot hash apart.
    */
  def cell(v: Any): String = v match {
    case null => "␀"
    case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
    // java.sql.Timestamp/Date.toString render in the JVM DEFAULT
    // timezone — an environment-dependent hash. Instant is UTC ISO.
    case t: java.sql.Timestamp => t.toInstant.toString
    case d: java.sql.Date => d.toLocalDate.toString
    // TIMESTAMP_NTZ collects as LocalDateTime, whose toString OMITS
    // zero seconds ("1995-01-22T00:00") — render the full instant form
    // so all timestamp flavors share one canonical shape
    case ldt: java.time.LocalDateTime =>
      ldt.toInstant(java.time.ZoneOffset.UTC).toString
    case i: java.time.Instant => i.toString
    case ld: java.time.LocalDate => ld.toString
    case f: java.lang.Float => java.lang.Float.toString(f)
    case d: java.lang.Double => java.lang.Double.toString(d)
    case bd: java.math.BigDecimal =>
      val s = bd.stripTrailingZeros
      (if (s.scale < 0) s.setScale(0) else s).toPlainString
    case bd: BigDecimal => cell(bd.bigDecimal)
    case s: scala.collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.iterator.map { case (k, x) => cell(k) + "→" + cell(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(cell).mkString("(", ",", ")")
    // string values escape the separators and control chars: a text
    // cell containing "\n" must not collide with a row boundary (one
    // row "a\nb" vs two rows "a","b"), nor a "" with the cell
    // separator — several outputs carry raw document text
    case s: String => s.flatMap {
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      // ADVICE r7: escape the null sentinel and every structural char
      // this renderer itself emits, so no rendered value (array, map,
      // struct, null) can be forged by raw string content
      case c @ ('\u2400' | ',' | '[' | ']' | '{' | '}' | '(' | ')' | '\u2192') =>
        "\\" + c
      case c => c.toString
    }
    case other => other.toString
  }

  /** Collect a result as sorted canonical row strings (columns sorted by
    * name first). Driver-side collect is intentional: this runs on gate
    * results (sf0.01, ≤ ~100k rows), not on production-scale data.
    */
  def rows(df: DataFrame): Array[String] = {
    val byName = df.columns.sorted.map(org.apache.spark.sql.functions.col)
    val out = df.select(byName.toIndexedSeq: _*).collect()
      .map(r => r.toSeq.map(cell).mkString(""))
    java.util.Arrays.sort(out, java.util.Comparator.naturalOrder[String]())
    out
  }

  def sha256(lines: Array[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    var first = true
    lines.foreach { l =>
      if (!first) md.update('\n'.toByte)
      first = false
      md.update(l.getBytes("UTF-8"))
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Canonical hash of a DataFrame result. */
  def hash(df: DataFrame): String = sha256(rows(df))
}
