package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinPlanner

/** q191 — bucket-layout advice: the one-layout-per-table argmax, the
  * strategy exclusions (broadcast and salt joins must never earn
  * co-location), and the advice→layout physical loop (bucketing the
  * advised key makes the advised join plan zero exchanges).
  */
class BucketAdviceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"

  /** A synthetic decision table in the q179 output shape (only the
    * columns the advice consumes need real values).
    */
  private def decisionsDf(rows: Seq[(String, String, String, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("join_name", "left_rel", "right_rel",
      "bytes_left", "bytes_right", "strategy")
  }

  test("argmax picks the key with the larger summed shuffle benefit; ties break lexicographically") {
    import spark.implicits._
    // table t joined on key A in TWO shuffle joins (100 bytes each)
    // and on key B in ONE bigger shuffle join (150): A wins 200 > 150
    val d = decisionsDf(Seq(
      ("j1", "t", "dim", 100L, 10L, "shuffle"),
      ("j2", "t", "dim", 100L, 10L, "shuffle"),
      ("j3", "t", "dim", 150L, 10L, "shuffle"),
      // a broadcast join on key C contributes nothing — layout wasted
      ("j4", "t", "dim", 900L, 10L, "broadcast"),
      // table u appears ONLY in broadcast joins: both its keys tie at 0
      ("j5", "u", "dim", 50L, 10L, "broadcast"),
      ("j6", "u", "dim", 50L, 10L, "broadcast")))
    val keys = Seq(("j1", "a", "dk"), ("j2", "a", "dk"),
      ("j3", "b", "dk"), ("j4", "c", "dk"),
      ("j5", "zz", "dk"), ("j6", "aa", "dk"))
      .toDF("join_name", "left_key", "right_key")
    val out = JoinPlanner.bucketAdvice(d, keys).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getLong(4), r.getLong(6)))
      .toMap
    // dim co-locates on dk everywhere (its only shuffle-joined key),
    // adding its 10 bytes to each shuffle join's savings
    assert(out("j1") == (("a", 1L, 110L)))
    assert(out("j2") == (("a", 1L, 110L)))
    assert(out("j3") == (("a", 0L, 10L)), "key b must lose the layout to a")
    assert(out("j4") == (("a", 0L, 0L)), "broadcast join must not co-locate")
    // u's keys both carry 0 benefit: lexicographically smallest wins
    val uKey = JoinPlanner.bucketAdvice(d, keys).collect()
      .collect { case r if Set("j5", "j6")(r.getString(0)) => r.getString(2) }
      .distinct.toSeq
    assert(uKey == Seq("aa"))
  }

  test("salt joins never earn co-location even when their key wins the layout") {
    import spark.implicits._
    val d = decisionsDf(Seq(
      ("hot", "t", "t", 500L, 500L, "salt"),
      ("cold", "t", "dim", 100L, 10L, "shuffle")))
    val keys = Seq(("hot", "k", "k"), ("cold", "k", "dk"))
      .toDF("join_name", "left_key", "right_key")
    val out = JoinPlanner.bucketAdvice(d, keys).collect()
      .map(r => r.getString(0) ->
        (r.getString(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // k wins t's layout (the cold shuffle join pays for it), and the
    // dim side co-locates on its own key
    assert(out("cold") == (("k", 1L, 1L, 110L)))
    // …but the salted join still reports no co-location and no savings:
    // a key-bucketed layout cannot satisfy the (key, salt) shuffle, and
    // a co-located merge would recreate the straggler
    assert(out("hot") == (("k", 0L, 0L, 0L)))
  }

  test("fixture advice: lineitem buckets on l_partkey and the self-join co-locates") {
    val rows = JoinPlanner.q191BucketAdvice(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    val (strat, bkey, cl, cr, saved) = rows("li_self_partkey")
    assert(strat == "shuffle" && bkey == "l_partkey")
    assert(cl == 1L && cr == 1L && saved > 0L)
    // every non-shuffle join reports zero savings
    rows.values.filter(_._1 != "shuffle")
      .foreach { case (_, _, l, r, s) => assert(l == 0L && r == 0L && s == 0L) }
  }

  test("q194 runs the advised join over the advised store: SMJ with zero exchanges and sorts below") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val df = graft.sources.BucketStore.q194AdvisedJoin(spark, dir)
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(joinPart.split("Exchange").length - 1 == 0 &&
        !joinPart.contains("+- Sort") && !joinPart.contains("+- *Sort"),
        s"advised join re-shuffled or re-sorted its inputs:\n$p")
      // the store was built on the key the advice chose
      val (_, lr, lk, _, _) = graft.sources.BucketStore.ensureAdvised(spark, dir)
      assert(lr == "lineitem" && lk == "l_partkey")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("advised store: matching signature reuses; edited advised table rebuilds") {
    import graft.sources.BucketStore
    // private corpus carrying everything the PLANNER profiles (the
    // advice itself reads the full ANALYZE catalog)
    val d = java.nio.file.Files.createTempDirectory("graft_adv_").toString
    for (t <- Seq("customer", "nation", "events", "orders", "lineitem",
      "part", "supplier"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        java.nio.file.Paths.get(s"$d/$t.parquet"))
    def mtime(root: String): Long = {
      val p = java.nio.file.Paths.get(root)
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.getLastModifiedTime(_).toMillis)
          .foldLeft(0L)(math.max)
      }
    }
    val root = BucketStore.advRoot(d)
    val adv = BucketStore.advisedJoin(spark, d)
    assert(adv._1 == "li_self_partkey") // same catalog, same argmax
    BucketStore.ensureAdvisedValidated(spark, d, adv) // session 1: builds
    val built = mtime(root)
    assert(built > 0L)
    Thread.sleep(1100)
    BucketStore.ensureAdvisedValidated(spark, d, adv) // session 2: reuses
    assert(mtime(root) == built,
      "fresh advised store was rebuilt instead of reused")
    // poison the advised table: signature flips, store rebuilds
    val li0 = spark.read.parquet(s"$d/lineitem.parquet")
    val schema = li0.schema
    val edited = li0.withColumn("l_linestatus",
      when(col("l_orderkey") === li0.select(min(col("l_orderkey"))).head().get(0),
        lit("Z")).otherwise(col("l_linestatus"))).collect()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(s"$d/lineitem.parquet"))
    spark.createDataFrame(new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(edited.toSeq).asJava),
      schema).coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Thread.sleep(1100)
    BucketStore.ensureAdvisedValidated(spark, d, adv) // session 3: rebuilds
    assert(mtime(root) > built,
      "edited advised table did not trigger a rebuild")
  }

  test("advice→layout loop: bucketing the advised key plans the advised join with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val tn = "graft_bkt_advice_li"
      spark.sql(s"DROP TABLE IF EXISTS $tn")
      val loc = new java.io.File(s"/tmp/graft_warehouse/adv_li")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
      // the advised layout: lineitem bucketed on l_partkey
      Engine.table(spark, dir, "lineitem")
        .repartition(8, col("l_partkey"))
        .write.mode("overwrite").option("path", loc.toString)
        .bucketBy(8, "l_partkey").sortBy("l_partkey").saveAsTable(tn)
      // the advised join: the l_partkey self-join
      val t = spark.table(tn)
      val t2 = spark.table(tn)
      val j = t.as("a").join(t2.as("b"),
          col("a.l_partkey") === col("b.l_partkey"))
        .groupBy(col("a.l_returnflag")).agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // everything below the SMJ (its printed suffix) must be
      // exchange-free; the aggregation's exchange sits above it
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(joinPart.split("Exchange").length - 1 == 0,
        s"advised co-located join still shuffles:\n$p")
      // value check against the plain parquet self-join
      val li = Engine.table(spark, dir, "lineitem")
      val want = li.as("a").join(li.as("b"),
          col("a.l_partkey") === col("b.l_partkey"))
        .groupBy(col("a.l_returnflag")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val got = j.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
