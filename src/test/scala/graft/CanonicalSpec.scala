package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The canonical content hash is the arbiter the determinism stress and
  * checkpoint-mode specs (and any future driver-divergence diff) lean
  * on — so its cell rendering itself needs pinning: equal values must
  * render identically whatever their container's internal order or
  * representation, and distinct values must never collide via the null
  * sentinel or string concatenation.
  */
class CanonicalSpec extends AnyFunSuite {

  test("BigDecimal scale variants render identically") {
    assert(Canonical.cell(new java.math.BigDecimal("3.40")) ==
      Canonical.cell(new java.math.BigDecimal("3.4")))
    assert(Canonical.cell(new java.math.BigDecimal("0.00")) ==
      Canonical.cell(new java.math.BigDecimal("0")))
    // negative-scale normalization: 6e2 must not render as "6E+2"
    assert(Canonical.cell(new java.math.BigDecimal("6E+2")) == "600")
  }

  test("map rendering is independent of insertion order") {
    val a = scala.collection.immutable.ListMap("x" -> 1, "y" -> 2, "z" -> 3)
    val b = scala.collection.immutable.ListMap("z" -> 3, "x" -> 1, "y" -> 2)
    assert(Canonical.cell(a) == Canonical.cell(b))
  }

  test("null sentinel cannot collide with real strings, binary is hex") {
    assert(Canonical.cell(null) != Canonical.cell("null"))
    assert(Canonical.cell(Array[Byte](0, 15, -1)) == "0x000fff")
  }

  test("doubles and floats use shortest-roundtrip Java rendering") {
    assert(Canonical.cell(java.lang.Double.valueOf(0.1)) == "0.1")
    assert(Canonical.cell(java.lang.Float.valueOf(0.1f)) == "0.1")
    assert(Canonical.cell(java.lang.Double.valueOf(-0.0)) == "-0.0")
  }

  test("nested rows and arrays recurse") {
    assert(Canonical.cell(Row(1L, Seq("a", "b"), null)) == "(1,[a,b],␀)")
  }

  test("timestamps render as UTC instants, not JVM-default-zone strings") {
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2026-08-13T07:00:00.123456Z"))
    assert(Canonical.cell(ts) == "2026-08-13T07:00:00.123456Z")
  }

  test("sha256 distinguishes row-boundary placement") {
    // ["ab","c"] vs ["a","bc"] must hash apart (newline separator is
    // part of the digest, not a join-then-hash of concatenated text)
    assert(Canonical.sha256(Array("ab", "c")) != Canonical.sha256(Array("a", "bc")))
    assert(Canonical.sha256(Array.empty[String]) ==
      Canonical.sha256(Array.empty[String]))
  }

  test("control characters in string cells cannot forge separators") {
    // a newline INSIDE a text value must not render as a row boundary,
    // nor  as a cell boundary, nor a literal backslash-n string
    // collide with an escaped newline
    assert(Canonical.cell("a\nb") == "a\\nb")
    assert(Canonical.cell("ab") == "a\\u0001b")
    assert(Canonical.cell("a\\nb") == "a\\\\nb")
    assert(Canonical.cell("a\nb") != Canonical.cell("a\\nb"))
  }

  test("structural characters in string cells cannot forge containers") {
    // ADVICE r7: a text cell literally containing the null sentinel or
    // array/map/struct delimiters must not render identically to the
    // real thing — document text can contain anything
    assert(Canonical.cell("␀") != Canonical.cell(null))
    assert(Canonical.cell(Seq("a,b")) != Canonical.cell(Seq("a", "b")))
    assert(Canonical.cell("[a,b]") != Canonical.cell(Seq("a", "b")))
    assert(Canonical.cell("{a→1}") !=
      Canonical.cell(scala.collection.immutable.Map("a" -> 1)))
    assert(Canonical.cell(Row("x,y")) != Canonical.cell(Row("x", "y")))
  }
}
