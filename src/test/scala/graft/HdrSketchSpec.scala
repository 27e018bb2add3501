package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexOps

/** q207/q208 — the HDR-histogram quantile sketch: the documented
  * ≤ 1/64 relative-error bound holds against EXACT percentiles, the
  * merge is loss-free on adversarial shapes, and the sub-32 singleton
  * buckets are exact.
  */
class HdrSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"

  test("estimates stay within the documented 1/64 relative error of exact percentiles") {
    val docs = Engine.table(spark, dir, "documents")
    val est = IndexOps.q207HdrQuantiles(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // exact answers under the sketch's own rank convention — the
    // element at r = floor(q*(n-1)) — computed from the raw values
    // (fixture-scale collect; the gate compares the estimates exactly)
    val byLang = docs.select(col("lang"), col("n_chars")).collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(1)).sorted }
    def exactAt(v: Array[Long], q: Double): Long =
      v(math.floor(q * (v.length - 1)).toInt)
    assert(est.keySet == byLang.keySet && est.nonEmpty)
    for ((lang, (e50, e90, e99)) <- est) {
      val v = byLang(lang)
      for ((e, q, tag) <- Seq((e50, 0.5, "p50"), (e90, 0.9, "p90"),
          (e99, 0.99, "p99"))) {
        val x = exactAt(v, q)
        // the floor-rank element lies in the answered bucket; the
        // mid-point is within half a bucket width = x/64 of it
        assert(math.abs(e - x) <= x / 32.0,
          s"$lang $tag: sketch $e vs exact $x exceeds the error bound")
      }
    }
  }

  test("merge is loss-free: merged fine-grained sketches == the direct sketch (adversarial skew)") {
    import spark.implicits._
    // one shard holds a heavy spike, the other a long tail — the shape
    // where a lossy quantile merge (e.g. naive digest averaging) bends
    val df = ((1 to 900).map(i => ("a", 40L + (i % 3))) ++
      (1 to 100).map(i => ("b", 1L << (i % 14 + 5))))
      .toDF("shard", "v")
    val fine = IndexOps.hdrSketch(df.withColumn("lang", lit("x")),
      "v", Seq("lang", "shard"))
    val merged = fine.groupBy(col("lang"), col("bid"))
      .agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("bid"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val direct = IndexOps.hdrSketch(df.withColumn("lang", lit("x")),
      "v", Seq("lang"))
      .orderBy(col("bid"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(merged == direct && merged.nonEmpty,
      "summing bucket counts must reproduce the direct sketch exactly")
  }

  test("values below 32 land in singleton buckets: the sketch is EXACT there") {
    import spark.implicits._
    val small = (0L to 31L).flatMap(v => Seq.fill(3)(("s", v)))
      .toDF("lang", "v")
    val sk = IndexOps.hdrSketch(small, "v", Seq("lang"))
      .withColumn("rep", expr(IndexOps.hdrRep))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq.sorted
    assert(sk == (0L to 31L).map(v => (v, v)).toSeq,
      "sub-32 buckets must be singletons with rep == value")
  }

  test("streaming twin: a foreachBatch-maintained sketch == the recomputed sketch after every batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = Engine.table(spark, dir, "documents")
      .select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val batches = all.groupBy(t => math.floorMod(t._1, 3L)).toSeq
      .sortBy(_._1).map(_._2.toSeq)
    def sketchOf(rows: Seq[(Long, String, Long)]) =
      IndexOps.hdrSketch(rows.toDF("doc_id", "lang", "n_chars"),
        "n_chars", Seq("lang"))
    var maintained = Engine.materialize(
      sketchOf(Seq.empty).toDF()) // empty, schema-setting
    val ms = MemoryStream[(Long, String, Long)]
    val query = ms.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the sketch merge IS the maintenance: bucket counts add
        maintained = Engine.materialize(
          maintained.unionByName(
            IndexOps.hdrSketch(batch, "n_chars", Seq("lang")))
            .groupBy(col("lang"), col("bid"))
            .agg(sum(col("cnt")).as("cnt")))
        ()
      }
      .start()
    try {
      var fed = Seq.empty[(Long, String, Long)]
      batches.foreach { b =>
        ms.addData(b)
        query.processAllAvailable()
        fed = fed ++ b
        assert(maintained.orderBy("lang", "bid").collect().map(_.toString).toSeq ==
          sketchOf(fed).orderBy("lang", "bid").collect().map(_.toString).toSeq,
          s"maintained sketch diverged after ${fed.size} rows")
      }
    } finally query.stop()
  }

  test("q208 reports merge_exact == 1 on every fixture group") {
    val rows = IndexOps.q208HdrRollup(spark, dir).collect()
    assert(rows.nonEmpty &&
      rows.forall(_.getAs[Long]("merge_exact") == 1L))
  }

  test("q216: the stored sketch answers bit-identically to the direct build, and is reused") {
    val a = IndexOps.q216HdrStanding(spark, dir)
      .collect().map(_.toString).toSeq
    val b = IndexOps.q207HdrQuantiles(spark, dir)
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty,
      "store → merge → extract must lose nothing vs the direct build")
    // artifact reuse: a second ensure leaves the stored file untouched
    val p = IndexOps.ensureHdrArtifact(spark, dir)
    val f = new java.io.File(p.stripPrefix("file:"))
    val mtime = f.lastModified()
    Thread.sleep(20)
    IndexOps.ensureHdrArtifact(spark, dir)
    assert(f.lastModified() == mtime)
  }
}
