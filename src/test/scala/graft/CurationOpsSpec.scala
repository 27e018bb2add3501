package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Hand-computable synthetic corpora for the round-4 curation ops:
  * q82 passage-level dedup, q83 PII redaction, q84 int8 embedding
  * quantization, q85 cluster-representative selection. The sf oracles
  * prove engine parity; these pin the MATH on inputs small enough to
  * verify by hand.
  */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def corpus(docs: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-curation").toString
    docs.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embCorpus(vecs: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-curation-emb").toString
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- q82 passage dedup (PassageSize = 8, non-overlapping) ----

  test("q82: a doc identical to an earlier doc has every passage marked duplicate") {
    // 16 tokens = exactly 2 passages; doc 1 owns both, doc 2 repeats
    // them, doc 3 is unique (1 partial passage of 4 tokens).
    val sixteen = (1 to 16).map(i => s"w$i").mkString(" ")
    val dir = corpus(Seq(
      (1L, sixteen, "en", "s0"),
      (2L, sixteen, "en", "s0"),
      (3L, "x1 x2 x3 x4", "en", "s0")))
    val got = rows(LlmOps.q82PassageDedup(spark, dir))
    assert(got == Seq(
      Seq(1L, 2L, 0L, 0.0),
      Seq(2L, 2L, 2L, 1.0),
      Seq(3L, 1L, 0L, 0.0)))
  }

  test("q82: a window repeated INSIDE one doc is a duplicate of its first occurrence") {
    // tokens 1-8 == tokens 9-16 → pidx 1 duplicates pidx 0 of the same doc
    val eight = (1 to 8).map(i => s"r$i").mkString(" ")
    val dir = corpus(Seq((1L, s"$eight $eight", "en", "s0")))
    val got = rows(LlmOps.q82PassageDedup(spark, dir))
    assert(got == Seq(Seq(1L, 2L, 1L, 0.5)))
  }

  // ---- q83 PII redaction ----

  test("q83: seeded email/phone/IP are each counted once and masked") {
    // doc_id 7: lpad(7,3)=007, (7*7)%10000=0049, 7%256=7, 21%256=21
    val dir = corpus(Seq((7L, "hello world", "en", "s0")))
    val got = rows(LlmOps.q83PiiRedact(spark, dir))
    assert(got == Seq(Seq(7L, 1L, 1L, 1L,
      "hello world contact <EMAIL> call <PHONE> from <IP>")))
  }

  test("q83: PII already present in the text is counted and masked too") {
    val dir = corpus(Seq(
      (2L, "mail me at a.b@test.org or ring 555-123-4567 via 192.168.0.1", "en", "s0")))
    val got = rows(LlmOps.q83PiiRedact(spark, dir)).head
    assert((got(1), got(2), got(3)) == ((2L, 2L, 2L)))
    val redacted = got(4).asInstanceOf[String]
    assert(redacted.startsWith("mail me at <EMAIL> or ring <PHONE> via <IP>"))
    assert(!redacted.contains("@test.org") && !redacted.contains("555-123-4567")
      && !redacted.contains("192.168.0.1"))
  }

  // ---- q84 int8 embedding quantization ----

  test("q84: affine codes hit 0 and 255 at the extremes; RMSE matches the hand fold") {
    // v = [0,1,2]: scl = 2/255, codes = [0, round(127.5)=128, 255]
    val dir = embCorpus(Seq((1L, Seq(0f, 1f, 2f), 0)))
    val scl = 2.0 / 255.0
    val e1 = 128.0 * scl - 1.0 // only nonzero reconstruction error
    val errfx = math.round(e1 * e1 * LlmOps.QuantFx)
    val expectRmse = r6(math.sqrt(errfx.toDouble / LlmOps.QuantFx / 3.0))
    val got = rows(LlmOps.q84EmbeddingQuant(spark, dir))
    assert(got == Seq(Seq(1L, 0.0, 2.0, 383L, expectRmse)))
  }

  test("q84: a constant vector quantizes to code 0 with zero error (no NaN)") {
    val dir = embCorpus(Seq((1L, Seq(5f, 5f), 0)))
    val got = rows(LlmOps.q84EmbeddingQuant(spark, dir))
    assert(got == Seq(Seq(1L, 5.0, 5.0, 0L, 0.0)))
  }

  // ---- q85 cluster representatives ----

  test("q85: the higher-quality doc represents the cluster, beating the min-id label") {
    // Same tokens (same simhash → hamming 0 → one cluster), but doc 1
    // carries trailing spaces: same n_alpha over a larger n_chars →
    // strictly lower quality. The representative must be doc 2 even
    // though the cluster LABEL is min id = 1.
    val text = (1 to 12).map(i => s"t$i").mkString(" ")
    val dir = corpus(Seq(
      (1L, text + "    ", "en", "s0"),
      (2L, text, "en", "s0"),
      (3L, "solo unique words here", "en", "s0")))
    val got = rows(LlmOps.q85ClusterReps(spark, dir))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long], r(3).asInstanceOf[Long]))
    assert(got == Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 3L, 1L)))
  }

  // ---- q86 incremental near-dup (IncrementalSplit = 300) ----

  test("q86: a batch doc matching an index doc is flagged with its nearest match; others pass") {
    // doc 300 repeats doc 1's tokens (hamming 0 → banded match);
    // doc 301 is unrelated. Only batch docs (>= 300) appear.
    val text = (1 to 12).map(i => s"n$i").mkString(" ")
    val dir = corpus(Seq(
      (1L, text, "en", "s0"),
      (300L, text, "en", "s0"),
      (301L, "completely different words entirely", "en", "s0")))
    val got = rows(LlmOps.q86IncrementalNearDup(spark, dir))
    assert(got == Seq(
      Seq(300L, 1L, 1L, 0L, 1L), // identical tokens → hamming 0
      Seq(301L, 0L, -1L, -1L, 0L)))
  }

  test("q86: batch docs never match EACH OTHER — only the index") {
    // docs 300 and 301 are identical to each other but unlike any
    // index doc: within-batch duplication is q44/q62's job, not q86's.
    val text = (1 to 12).map(i => s"m$i").mkString(" ")
    val dir = corpus(Seq(
      (1L, "some standing index content here", "en", "s0"),
      (300L, text, "en", "s0"),
      (301L, text, "en", "s0")))
    val got = rows(LlmOps.q86IncrementalNearDup(spark, dir))
    assert(got == Seq(
      Seq(300L, 0L, -1L, -1L, 0L),
      Seq(301L, 0L, -1L, -1L, 0L)))
  }

  test("q85: equal quality falls back to the min doc_id tie-break") {
    val text = (1 to 10).map(i => s"e$i").mkString(" ")
    val dir = corpus(Seq((1L, text, "en", "s0"), (2L, text, "en", "s0")))
    val got = rows(LlmOps.q85ClusterReps(spark, dir))
      .map(r => (r(0).asInstanceOf[Long], r(3).asInstanceOf[Long]))
    assert(got == Seq((1L, 1L), (2L, 0L)))
  }

  // ---- canonicalizeUrl (q138's map-side chain) ----

  test("canonicalizeUrl: default-port strip is anchored to the authority") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq(
      "HTTPS://WWW.A.Example.COM/a/1/?utm_source=rss",
      "http://a.example.com/a/1",
      "https://m.a.example.com/a/1#frag",
      "https://a.example.com:443/a/1/",
      "https://a.example.com:80/a/1",
      "https://a.example.com:443",
      // ADVICE r7 regression: a PATH segment that looks like a default
      // port must NOT be rewritten
      "https://a.example.com/a:80/x",
      "https://a.example.com:443/a:80/x",
      // a non-default port is preserved
      "https://a.example.com:8080/a/1")
      .toDF("raw").select(LlmOps.canonicalizeUrl(col("raw")).as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "a.example.com/a/1",
      "a.example.com/a/1",
      "a.example.com/a/1",
      "a.example.com/a/1",
      "a.example.com/a/1",
      "a.example.com",
      "a.example.com/a:80/x",
      "a.example.com/a:80/x",
      "a.example.com:8080/a/1"))
  }
}
