package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.ScalarOps

/** Golden tests for the reference's scalar semantics, each pinned to a
  * cited line in /root/reference (SURVEY.md §5 item 3).
  */
class ScalarOpsSpec extends AnyFunSuite {
  private def checkProp(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)
  private def forAll[A](g: Gen[A])(f: A => Boolean): Unit =
    checkProp(Prop.forAll(g)(f))

  // slugify — ref fetchRumors.js:33-38
  test("slugify basic") {
    assert(ScalarOps.slugify("Jalen Brunson") == "jalen_brunson")
    assert(ScalarOps.slugify("New York Knicks") == "new_york_knicks")
  }
  test("slugify accents are NFD-stripped") {
    assert(ScalarOps.slugify("Nikola Jokić") == "nikola_jokic")
    assert(ScalarOps.slugify("Luka Dončić") == "luka_doncic")
  }
  test("slugify ampersand becomes ' and '") {
    assert(ScalarOps.slugify("Cavs & Celtics") == "cavs_and_celtics")
  }
  test("slugify collapses runs and trims underscores") {
    assert(ScalarOps.slugify("  --hello!!  world--  ") == "hello_world")
    assert(ScalarOps.slugify("***") == "")
  }
  test("slugify charset invariant (property)") {
    forAll(Gen.asciiPrintableStr) { s =>
      ScalarOps.slugify(s).matches("[a-z0-9_]*")
    }
  }

  // extractISODate — ref fetchRumors.js:41-50
  test("extractISODate matches anywhere in the string") {
    assert(ScalarOps.extractIsoDate("Posted on October 15, 2025 at noon") == "2025-10-15")
    assert(ScalarOps.extractIsoDate("May 7, 2024") == "2024-05-07")
  }
  test("extractISODate zero-pads day and month") {
    assert(ScalarOps.extractIsoDate("January 3, 2024") == "2024-01-03")
  }
  test("extractISODate rejects unknown month names") {
    assert(ScalarOps.extractIsoDate("Floopuary 3, 2024") == "")
    assert(ScalarOps.extractIsoDate("no date here") == "")
    assert(ScalarOps.extractIsoDate("") == "")
  }

  // fmtMonthAbbrev — ref fetchRumors.js:153-159
  test("fmtMonthAbbrev all 12 months incl. bare May and Sep.") {
    val expected = Seq("Jan.", "Feb.", "Mar.", "Apr.", "May", "Jun.",
      "Jul.", "Aug.", "Sep.", "Oct.", "Nov.", "Dec.")
    for (m <- 1 to 12) {
      assert(ScalarOps.fmtMonthAbbrev(f"2025-$m%02d-05") == s"${expected(m - 1)} 5, 2025")
    }
  }
  test("fmtMonthAbbrev day is non-padded") {
    assert(ScalarOps.fmtMonthAbbrev("2025-10-07") == "Oct. 7, 2025")
  }
  test("fmtMonthAbbrev rejects non-ISO input") {
    assert(ScalarOps.fmtMonthAbbrev("Oct 7 2025") == "")
    assert(ScalarOps.fmtMonthAbbrev("") == "")
  }
  test("extractISODate ∘ fmtMonthAbbrev round-trip (property)") {
    val dates = for {
      y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d"
    val months = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    forAll(dates) { iso =>
      val m = iso.substring(5, 7).toInt
      val d = iso.substring(8, 10).toInt
      val pretty = s"${months(m - 1)} $d, ${iso.substring(0, 4)}"
      ScalarOps.extractIsoDate(pretty) == iso
    }
  }

  // htmlEscape — ref index.html:49
  test("htmlEscape escapes the five chars") {
    assert(ScalarOps.htmlEscape("""a & b < c > d " e ' f""") ==
      "a &amp; b &lt; c &gt; d &quot; e &#39; f")
  }
  test("htmlEscape output has no raw specials (property)") {
    forAll(Gen.asciiPrintableStr) { s =>
      val out = ScalarOps.htmlEscape(s)
      !out.replaceAll("&(amp|lt|gt|quot|#39);", "").exists("&<>\"'".contains(_))
    }
  }

  // bodyAlreadyHasSource — ref fetchRumors.js:162-172
  test("endsWithSource by href with trailing slash normalization") {
    val snip = """Rumor text <a href="https://x.com/path/">ESPN</a>"""
    assert(ScalarOps.endsWithSource(snip, "https://x.com/path", "Whatever"))
  }
  test("endsWithSource by label, case-insensitive") {
    val snip = """Rumor text <a href="https://other.com">espn</a>"""
    assert(ScalarOps.endsWithSource(snip, "https://x.com", "ESPN"))
  }
  test("endsWithSource false when no trailing anchor or empty url") {
    assert(!ScalarOps.endsWithSource("""<a href="https://x.com">E</a> trailing text""",
      "https://x.com", "E"))
    assert(!ScalarOps.endsWithSource("""text <a href="https://x.com">E</a>""", "", "E"))
  }

  // clean — ref fetchRumors.js:32
  test("clean collapses whitespace") {
    assert(ScalarOps.clean("  a\t\n b   c ") == "a b c")
    assert(ScalarOps.clean(null) == "")
  }

  // fingerprint expressions
  test("minGramHash equals brute-force min over 8-char windows (property)") {
    forAll(Gen.asciiPrintableStr) { s =>
      val expected =
        if (s.length < 8) -1L
        else s.sliding(8).map(ScalarOps.stableHash64).min
      ScalarOps.minGramHash(s) == expected
    }
  }
  test("shingles2 equals sliding(2) with duplicates (property)") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val word = Gen.oneOf("a", "bb", "ccc", "a", "e")
    forAll(Gen.listOf(word)) { toks =>
      val in = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val got = ScalarOps.shingles2(in)
      val exp =
        if (toks.length < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == exp
    }
  }

  test("distinctShingles3 equals sliding(3).distinct (property)") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e")
    forAll(Gen.listOf(word)) { toks =>
      val in = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val got = ScalarOps.distinctShingles3(in)
      val exp =
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == exp
    }
  }

  private def toksArr(toks: Seq[String]) = {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
  }

  test("tokenMaxRun equals the naive run-length scan (property)") {
    val word = Gen.oneOf("a", "bb", "ccc")
    forAll(Gen.listOf(word)) { toks =>
      val naive =
        if (toks.isEmpty) 0L
        else toks.foldLeft((0L, "", 0L)) { case ((best, prev, run), t) =>
          val r = if (t == prev) run + 1 else 1L
          (math.max(best, r), t, r)
        }._1
      ScalarOps.tokenMaxRun(toksArr(toks)) == naive
    }
  }

  test("tokenTopCount equals the max groupBy count (property)") {
    val word = Gen.oneOf("a", "bb", "ccc", "dd")
    forAll(Gen.listOf(word)) { toks =>
      val naive =
        if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.size).max.toLong
      ScalarOps.tokenTopCount(toksArr(toks)) == naive
    }
  }

  test("tokenMaxRun / tokenTopCount edge cases") {
    assert(ScalarOps.tokenMaxRun(toksArr(Nil)) == 0L)
    assert(ScalarOps.tokenTopCount(toksArr(Nil)) == 0L)
    assert(ScalarOps.tokenMaxRun(toksArr(Seq("x"))) == 1L)
    assert(ScalarOps.tokenTopCount(toksArr(Seq("x"))) == 1L)
    assert(ScalarOps.tokenMaxRun(toksArr(Seq("a", "a", "b", "a"))) == 2L)
    assert(ScalarOps.tokenTopCount(toksArr(Seq("a", "a", "b", "a"))) == 3L)
  }
}
