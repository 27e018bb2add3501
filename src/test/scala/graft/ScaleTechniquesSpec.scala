package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

/** The remaining named scale techniques: skew salting and partition
  * pruning (SURVEY §4 notes the single-file fixtures don't exercise
  * pruning — this spec creates a partitioned copy and proves the scan
  * prunes).
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("salted join == plain join; salt spreads a hot key") {
    // build a skewed fact: 90% of rows share o_custkey of customer 1
    val o = Engine.table(spark, dir, "orders")
      .withColumn("o_custkey",
        when(col("o_orderkey") % 10 < 9, lit(1L)).otherwise(col("o_custkey")))
    val c = Engine.table(spark, dir, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Salting.saltedJoin(o, c, "o_custkey", "c_custkey",
        saltFactor = 8, saltOn = Seq("o_orderkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain && salted.nonEmpty)
    // the hot key's rows really carry >1 distinct salt value
    val salts = o.filter(col("o_custkey") === 1L)
      .select(Salting.saltColumn(8, col("o_orderkey")).as("s"))
      .distinct().count()
    assert(salts > 1)
  }

  test("partition pruning: partitioned scan reads only matching partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("orders_part").toString
    Engine.table(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    val pruned = spark.read.parquet(tmp).filter(col("o_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"no partition filter in plan:\n$plan")
    // count matches the unpartitioned predicate
    val expected = Engine.table(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("IVF recall >= 0.9 at the shipped probe width, vs brute force") {
    import graft.operators.LlmOps
    // exact top-3 neighbors per query from the brute-force baseline
    val exact = SparkEntry.queries("q48_cosine_topk")(spark, dir)
      .filter(col("rn") <= 3).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Double = {
      val got = LlmOps.annIvf(spark, dir, nprobe)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    // VERDICT r10 item 4: q57 now ships AT the q159-proven multi-probe
    // coordinate (NProbe == MultiProbeN), and the WHOLE family clears
    // the 0.9 floor — the 0.5-floor era is retired. nprobe=1 stays as
    // the monotonicity baseline only.
    val r1 = recall(1)
    val rq57 = recall(LlmOps.NProbe)
    assert(rq57 >= r1, s"nprobe=${LlmOps.NProbe} recall $rq57 < nprobe=1 $r1")
    assert(rq57 >= 0.9, s"q57 (nprobe=${LlmOps.NProbe}) recall $rq57 below 0.9")
    assert(LlmOps.MultiProbeN == LlmOps.NProbe,
      "q159's audited width must be the width q57 serves")
    val rm = recall(LlmOps.MultiProbeN)
    assert(rm >= 0.9, s"nprobe=${LlmOps.MultiProbeN} recall $rm below 0.9")
  }
}
