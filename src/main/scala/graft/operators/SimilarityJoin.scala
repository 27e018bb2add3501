package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine.MaterializeSyntax

/** Reusable exact all-pairs similarity join with prefix filtering
  * (the AllPairs/PPJoin family; promoted from q147's inline pipeline,
  * VERDICT r8 item 8) — the deterministic-recall complement to MinHash
  * LSH: LSH trades false negatives for speed; prefix filtering
  * guarantees every pair with Jaccard ≥ τ survives candidate
  * generation.
  *
  * The threshold is a rational τ = tauNum/tauDen and the
  * document-frequency cut maxDfNum/maxDfDen likewise, so every filter
  * in the pipeline stays in exact integer arithmetic — no float
  * rounding can disagree with an oracle.
  *
  * Algorithm: tokens are globally ordered by ascending document
  * frequency (rarest first, ties by token); a document's PREFIX is its
  * first |d| − ⌈τ·|d|⌉ + 1 tokens in that order, and any pair with
  * J ≥ τ must share a prefix token (if the intersection avoided a's
  * prefix it would have to fit inside a suffix of ⌈τ·|a|⌉ − 1 <
  * ⌈τ·|a|⌉ ≤ |a∩b| tokens). Candidates additionally pass the length
  * filter den·min(|a|,|b|) ≥ num·max(|a|,|b|), then verify with an
  * exact intersection count.
  *
  * Scale shape (100 TB): candidate pairs are generated only from
  * prefix tokens — by construction the RAREST tokens of each document
  * — and the df cut bounds any single token's postings at
  * n·maxDfNum/maxDfDen, so the candidate join is an equi-join on
  * skew-bounded keys (ubiquitous tokens that would quadratically blow
  * up a naive shared-token join never reach it). Per-doc prefix
  * ranking is a document-length-bounded window; verification touches
  * candidate pairs only, carrying token arrays for just those rows.
  */
object SimilarityJoin {

  /** Exact Jaccard-threshold self-join over a token-set column.
    *
    * @param docs    input with an id column and a token-ARRAY column
    *                (duplicates tolerated — de-duplicated internally)
    * @param idCol   unique document id (orderable; pairs emitted with
    *                doc_a < doc_b)
    * @param tokCol  array&lt;string&gt; token column
    * @param tauNum/tauDen    Jaccard threshold as a rational in (0, 1]
    * @param maxDfNum/maxDfDen  drop tokens present in more than this
    *                fraction of documents from the similarity universe
    *                (standard stop-token removal for all-pairs joins);
    *                pass 1/1 to keep every token
    * @return (doc_a, doc_b, sz_a, sz_b, inter, jaccard) for every pair
    *         with Jaccard ≥ τ over the kept-token sets; jaccard is
    *         rounded to 6 dp for canonical comparison
    */
  def allPairs(docs: DataFrame, idCol: String, tokCol: String,
      tauNum: Int, tauDen: Int,
      maxDfNum: Int, maxDfDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"tau must be in (0,1]: $tauNum/$tauDen")
    require(maxDfNum > 0 && maxDfDen > 0, s"df cut must be positive: $maxDfNum/$maxDfDen")
    val docsArr = docs.select(
      col(idCol).as("doc_id"), array_distinct(col(tokCol)).as("ts"))
    // toks and kept materialize ONCE (lazy checkpoint — no extra job):
    // toks otherwise re-runs the tokenize+explode subtree for the df
    // count and the kept join, and kept feeds both the prefix window
    // and the verification arrays (partial aggregations under the df
    // exchange defeat ReuseExchange — the q65/q145 gap)
    val toks = docsArr.select(col("doc_id"), explode(col("ts")).as("token"))
      .materialize(false)
    val dfreq = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nd = docsArr.agg(count(lit(1)).as("nd"))
    val keep = dfreq.crossJoin(nd)
      .filter(col("df") * maxDfDen <= col("nd") * maxDfNum)
      .select(col("token"), col("df"))
    val kept = toks.join(keep, Seq("token")).materialize(false)
    val cand = candidatesFrom(kept, tauNum, tauDen)
    val keptArr = kept.groupBy(col("doc_id"))
      .agg(collect_list(col("token")).as("kt"))
    cand
      .join(keptArr.select(col("doc_id").as("doc_a"), col("kt").as("ta")),
        Seq("doc_a"))
      .join(keptArr.select(col("doc_id").as("doc_b"), col("kt").as("tb")),
        Seq("doc_b"))
      .withColumn("sz_a", size(col("ta")).cast("long"))
      .withColumn("sz_b", size(col("tb")).cast("long"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter") * (tauNum + tauDen) >=
        (col("sz_a") + col("sz_b")) * tauNum)
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
  }

  /** Prefix ranking + candidate generation shared by [[allPairs]] and
    * [[allPairsCandidates]]: rank each doc's kept tokens rarest-first,
    * keep the |d| − ⌈τ·|d|⌉ + 1 prefix, equi-join prefixes on token
    * with the ordering and length filters, distinct pairs.
    */
  private def candidatesFrom(kept: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    val sized = kept
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df").asc, col("token").asc)))
      .withColumn("ceil_tau", expr(
        s"(sz * $tauNum + ${tauDen - 1}) div $tauDen"))
    val prefix = sized.filter(col("rk") <= col("sz") - col("ceil_tau") + 1)
      .select(col("token"), col("doc_id"), col("sz"))
    prefix.as("a").join(prefix.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")) * tauDen >=
            greatest(col("a.sz"), col("b.sz")) * tauNum)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** The CANDIDATE pair set of [[allPairs]] — after the df cut, prefix
    * filter, ordering, and length filter, but BEFORE exact
    * verification. Exposed for scale-stress auditing: the candidate
    * count is the quantity the prefix filter exists to bound (a naive
    * shared-token join explodes quadratically on duplicated corpora
    * while this set stays within a constant factor of the true result),
    * and SimilarityScaleStressSpec machine-asserts that ceiling on an
    * adversarial ×N-duplication corpus. Same plan subtree allPairs
    * executes — not a parallel reimplementation that could drift.
    */
  def allPairsCandidates(docs: DataFrame, idCol: String, tokCol: String,
      tauNum: Int, tauDen: Int,
      maxDfNum: Int, maxDfDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"tau must be in (0,1]: $tauNum/$tauDen")
    require(maxDfNum > 0 && maxDfDen > 0, s"df cut must be positive: $maxDfNum/$maxDfDen")
    val docsArr = docs.select(
      col(idCol).as("doc_id"), array_distinct(col(tokCol)).as("ts"))
    val toks = docsArr.select(col("doc_id"), explode(col("ts")).as("token"))
    val dfreq = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nd = docsArr.agg(count(lit(1)).as("nd"))
    val keep = dfreq.crossJoin(nd)
      .filter(col("df") * maxDfDen <= col("nd") * maxDfNum)
      .select(col("token"), col("df"))
    candidatesFrom(toks.join(keep, Seq("token")), tauNum, tauDen)
  }

  /** Cross-set variant of [[allPairs]]: pairs (a, b) with Jaccard ≥ τ
    * where a and b come from DIFFERENT sides of a boolean split — the
    * incremental-service shape (today's crawl delta joined against the
    * standing corpus) where a full self-join would redundantly re-pair
    * the standing corpus against itself every run.
    *
    * Token document frequencies and the df cut are computed over the
    * WHOLE input (both sides), exactly as a production system maintains
    * global df stats across the standing corpus — so a pair's kept-token
    * sets, prefix, and jaccard are identical to what [[allPairs]] over
    * the union would compute; only the pair universe shrinks to
    * cross-side. The prefix-filter theorem is per-pair, so filtering
    * each side's prefix table to its own rows before the candidate join
    * loses no qualifying cross pair.
    *
    * Scale shape: the candidate join probes |delta-prefix| rows against
    * the standing prefix postings instead of all-pairs over the union —
    * with a daily delta ≪ corpus this is the difference between O(Δ·n)
    * and O(n²) candidate generation; the delta side broadcasts when
    * small.
    *
    * @param sideCol boolean column: true rows form the `doc_b` (delta)
    *                side, false rows the `doc_a` (standing) side. Rows
    *                with a NULL side are dropped ENTIRELY before any
    *                stats — they join neither pair side, contribute to
    *                neither nd nor token df, and cannot shift the df
    *                cut (ADVICE r9: previously they were excluded from
    *                pairing but still counted in the stats, silently
    *                changing which tokens survived the cut)
    * @return (doc_a, doc_b, sz_a, sz_b, inter, jaccard), doc_a always
    *         from the false side, doc_b from the true side
    */
  def allPairsBetween(docs: DataFrame, idCol: String, tokCol: String,
      sideCol: String, tauNum: Int, tauDen: Int,
      maxDfNum: Int, maxDfDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"tau must be in (0,1]: $tauNum/$tauDen")
    require(maxDfNum > 0 && maxDfDen > 0, s"df cut must be positive: $maxDfNum/$maxDfDen")
    val docsArr = docs.select(col(idCol).as("doc_id"),
      array_distinct(col(tokCol)).as("ts"), col(sideCol).cast("boolean").as("is_b"))
      .filter(col("is_b").isNotNull)
    // same one-shot materialization as allPairs (q65/q145 gap)
    val toks = docsArr.select(col("doc_id"), col("is_b"), explode(col("ts")).as("token"))
      .materialize(false)
    val dfreq = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nd = docsArr.agg(count(lit(1)).as("nd"))
    val keep = dfreq.crossJoin(nd)
      .filter(col("df") * maxDfDen <= col("nd") * maxDfNum)
      .select(col("token"), col("df"))
    val kept = toks.join(keep, Seq("token")).materialize(false)
    val cand = crossCandidatesFrom(kept, tauNum, tauDen)
    val keptArr = kept.groupBy(col("doc_id"))
      .agg(collect_list(col("token")).as("kt"))
    cand
      .join(keptArr.select(col("doc_id").as("doc_a"), col("kt").as("ta")),
        Seq("doc_a"))
      .join(keptArr.select(col("doc_id").as("doc_b"), col("kt").as("tb")),
        Seq("doc_b"))
      .withColumn("sz_a", size(col("ta")).cast("long"))
      .withColumn("sz_b", size(col("tb")).cast("long"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter") * (tauNum + tauDen) >=
        (col("sz_a") + col("sz_b")) * tauNum)
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
  }

  /** Cross-side prefix candidate generation shared by
    * [[allPairsBetween]] and [[allPairsBetweenCandidates]] — like
    * [[candidatesFrom]] but pairing false-side prefixes against
    * true-side prefixes instead of ordered self-pairs. `kept` must
    * carry is_b.
    */
  private def crossCandidatesFrom(kept: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    val sized = kept
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df").asc, col("token").asc)))
      .withColumn("ceil_tau", expr(
        s"(sz * $tauNum + ${tauDen - 1}) div $tauDen"))
    val prefix = sized.filter(col("rk") <= col("sz") - col("ceil_tau") + 1)
      .select(col("token"), col("doc_id"), col("sz"), col("is_b"))
    prefix.filter(!col("is_b")).as("a")
      .join(prefix.filter(col("is_b")).as("b"),
        col("a.token") === col("b.token") &&
          least(col("a.sz"), col("b.sz")) * tauDen >=
            greatest(col("a.sz"), col("b.sz")) * tauNum)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** The CANDIDATE pair set of [[allPairsBetween]] (post-df-cut,
    * post-prefix, pre-verification) — the cross-side counterpart of
    * [[allPairsCandidates]], exposed for the same scale-stress audit.
    */
  def allPairsBetweenCandidates(docs: DataFrame, idCol: String, tokCol: String,
      sideCol: String, tauNum: Int, tauDen: Int,
      maxDfNum: Int, maxDfDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"tau must be in (0,1]: $tauNum/$tauDen")
    require(maxDfNum > 0 && maxDfDen > 0, s"df cut must be positive: $maxDfNum/$maxDfDen")
    val docsArr = docs.select(col(idCol).as("doc_id"),
      array_distinct(col(tokCol)).as("ts"), col(sideCol).cast("boolean").as("is_b"))
      .filter(col("is_b").isNotNull)
    val toks = docsArr.select(col("doc_id"), col("is_b"), explode(col("ts")).as("token"))
    val dfreq = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nd = docsArr.agg(count(lit(1)).as("nd"))
    val keep = dfreq.crossJoin(nd)
      .filter(col("df") * maxDfDen <= col("nd") * maxDfNum)
      .select(col("token"), col("df"))
    crossCandidatesFrom(toks.join(keep, Seq("token")), tauNum, tauDen)
  }

  /** Interval union of fixed-width windows per document (promoted from
    * q145's span machinery so span dedup and span decontamination share
    * one implementation).
    *
    * Input: (doc_id, start0) rows — 0-based start offsets of
    * width-`window` hits within each document. Windows starting at or
    * before the running max end of previous windows merge into the open
    * span; otherwise a new span opens.
    *
    * Scale shape: ONE window partitioned by doc_id — per-partition state
    * is a single running max, and partitions are document-bounded (a
    * document's windows ≤ its token count), so no global sort and no
    * skew beyond the longest single document.
    *
    * @return per-doc (doc_id, n_spans, covered_tokens, longest_span,
    *         n_hit_windows) for docs with ≥ 1 hit
    */
  def spanUnion(hits: DataFrame, window: Int): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("start0")
    val spans = hits
      .withColumn("e", col("start0") + window)
      .withColumn("new_span",
        (col("start0") > coalesce(
          max(col("e")).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1))).cast("bigint"))
      .withColumn("span_id",
        sum(col("new_span")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val perSpan = spans.groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("start0")).as("s0"), max(col("e")).as("e1"),
        count(lit(1)).as("nw"))
    perSpan.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e1") - col("s0")).cast("long").as("covered_tokens"),
        max(col("e1") - col("s0")).cast("long").as("longest_span"),
        sum(col("nw")).as("n_hit_windows"))
  }
}
