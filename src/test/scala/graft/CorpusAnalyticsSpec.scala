package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Hand-computable synthetic corpora for the corpus-analytics trio:
  * q74 PMI collocations, q75 per-source KL divergence, q76 boilerplate
  * n-gram detection. The sf oracles prove engine parity; these pin the
  * MATH (known counts → known PMI/KL/fractions) on inputs small enough
  * to verify by hand.
  */
class CorpusAnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  /** Writes docs as a documents.parquet table and returns the dir. */
  private def corpus(docs: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-corpus").toString
    docs.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q74: PMI of a bigram that always co-occurs is ln((c2/M)/((c1a/N)(c1b/N)))") {
    // 5 docs of "a b": uni a=5 b=5 (N=10), bigram "a b" c2=5 (M=5)
    // PMI = ln((5/5) / ((5/10)*(5/10))) = ln(4)
    val dir = corpus((1L to 5L).map(i => (i, "a b", "en", "s0")))
    val got = rows(LlmOps.q74PmiCollocations(spark, dir))
    assert(got == Seq(Seq("a b", 5L, BigDecimal(math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("q74: bigrams under the min count are not scored") {
    // "c d" occurs once (< MinCollocCount) → only "a b" survives
    val dir = corpus((1L to 5L).map(i => (i, "a b", "en", "s0")) :+ (6L, "c d", "en", "s0"))
    val got = rows(LlmOps.q74PmiCollocations(spark, dir))
    assert(got.map(_.head) == Seq("a b"))
    assert(got.head(2).asInstanceOf[Double] > 0.0)
  }

  test("q75: a source distributed identically to the corpus has KL 0") {
    val dir = corpus(Seq(
      (1L, "x y", "en", "sa"),
      (2L, "x y", "en", "sb")))
    val got = rows(LlmOps.q75SourceMixKl(spark, dir))
    assert(got == Seq(Seq("sa", 2L, 0.0), Seq("sb", 2L, 0.0)))
  }

  test("q75: a skewed source diverges positively; token totals are per source") {
    // sa is all-x (4 tokens), sb is all-y (2 tokens); corpus = 4x + 2y
    // KL(sa) = 1 * ln(1 / (4/6)) = ln(1.5); KL(sb) = ln(3)
    val dir = corpus(Seq(
      (1L, "x x x x", "en", "sa"),
      (2L, "y y", "en", "sb")))
    val got = rows(LlmOps.q75SourceMixKl(spark, dir))
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      Seq("sa", 4L, r6(math.log(6.0 / 4.0))),
      Seq("sb", 2L, r6(math.log(3.0)))))
  }

  test("q76: a shingle in >= BoilerplateDf docs flags the docs containing it") {
    // 5 docs share "a b c" (df=5) with unique tails; doc 6 is all-unique.
    // Shared docs: 3 distinct shingles, 1 boilerplate → frac 1/3 > 0.2.
    val shared = (1L to 5L).map(i => (i, s"a b c u$i v$i", "en", "s0"))
    val dir = corpus(shared :+ (6L, "p q r s", "en", "s0"))
    val got = rows(LlmOps.q76BoilerplateNgrams(spark, dir)).map(r => (r(0), r(1), r(2), r(3), r(4)))
    val sharedExpect = (1L to 5L).map(i => (i, 3L, 1L, 0.333333, 1L))
    assert(got == sharedExpect :+ ((6L, 2L, 0L, 0.0, 0L)))
  }

  test("q76: docs under 3 tokens are excluded (no shingles to judge)") {
    val dir = corpus(Seq((1L, "a b", "en", "s0"), (2L, "a b c", "en", "s0")))
    val got = rows(LlmOps.q76BoilerplateNgrams(spark, dir))
    assert(got.map(_.head) == Seq(2L))
  }

  test("q78: sliding chunks advance by the stride and truncate at the end") {
    // 40 tokens, width 32 / stride 24: chunk 0 = tokens 1-32,
    // chunk 1 = tokens 25-40 (16 tokens, overlapping 8)
    val toks = (1 to 40).map(i => s"t$i")
    val dir = corpus(Seq((1L, toks.mkString(" "), "en", "s0"), (2L, "a b c", "en", "s0")))
    val got = rows(LlmOps.q78Chunking(spark, dir))
    assert(got == Seq(
      Seq(1L, 0L, 1L, 32L, toks.take(32).mkString(" ")),
      Seq(1L, 1L, 25L, 16L, toks.drop(24).mkString(" ")),
      Seq(2L, 0L, 1L, 3L, "a b c")))
  }

  test("q79: duplicate rate and counts roll up per source") {
    val dup = "the quick brown fox and the lazy dog of winter for that"
    val dir = corpus(Seq(
      (1L, dup, "en", "sa"), (2L, dup, "en", "sa"),
      (3L, "one two three four five six seven eight nine ten eleven stone", "en", "sa"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu", "en", "sb")))
    val got = rows(LlmOps.q79CorpusReport(spark, dir))
      .map(r => (r(0), r(1), r(2), r(3)))
    assert(got == Seq(("sa", 3L, 2L, 0.333333), ("sb", 1L, 1L, 0.0)))
    val meanTokens = rows(LlmOps.q79CorpusReport(spark, dir)).map(_(6))
    assert(meanTokens == Seq(12.0, 12.0))
  }

  test("q80: docs matching more query terms outrank single-term docs; no-term docs are absent") {
    val dir = corpus(Seq(
      (1L, "spark table join vector alpha beta gamma delta epsilon zeta", "en", "s0"),
      (2L, "spark alpha beta gamma delta epsilon zeta eta theta iota", "en", "s0"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0")))
    val got = rows(LlmOps.q80Bm25(spark, dir)).map(_(0).asInstanceOf[Long])
    assert(got == Seq(1L, 2L), "expected all-terms doc first, no-terms doc absent")
  }

  /** Writes vecs as an embeddings.parquet table and returns the dir. */
  private def embCorpus(vecs: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-emb").toString
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q77: the one vector pointing away from its label centroid is the outlier") {
    // 9 copies of e_x and one e_y under label 0: centroid ~ [0.9, 0.1],
    // the e_y vector sits ~2.8 sample stddevs below the mean cosine
    val vecs = (1L to 9L).map(i => (i, Seq(1f, 0f), 0)) :+ (10L, Seq(0f, 1f), 0)
    val got = rows(LlmOps.q77EmbeddingOutliers(spark, embCorpus(vecs)))
      .map(r => (r(0).asInstanceOf[Long], r(4).asInstanceOf[Long]))
    assert(got == (1L to 9L).map(i => (i, 0L)) :+ ((10L, 1L)))
  }

  test("q77: z-scores are computed within label, not across the corpus") {
    // label 0 has an outlier; label 1's tight cluster must not be
    // dragged into label 0's moments (its own z-scores stay small)
    val l0 = (1L to 9L).map(i => (i, Seq(1f, 0f), 0)) :+ (10L, Seq(0f, 1f), 0)
    val l1 = (11L to 18L).map(i => (i, Seq(0.6f, 0.8f), 1)) :+
      (19L, Seq(0.5f, 0.9f), 1) :+ (20L, Seq(0.7f, 0.7f), 1)
    val got = rows(LlmOps.q77EmbeddingOutliers(spark, embCorpus(l0 ++ l1)))
      .map(r => (r(0).asInstanceOf[Long], r(4).asInstanceOf[Long])).toMap
    assert(got(10L) == 1L)
    assert((11L to 20L).forall(i => got(i) == 0L),
      "label-1 vectors wrongly flagged against label-0 moments")
  }
}
