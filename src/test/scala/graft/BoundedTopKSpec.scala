package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedTopK.top_k

/** BoundedTopK (TypedImperativeAggregate) equivalence: for any k, the
  * heap aggregate must produce exactly the window row_number().over
  * (score DESC, id ASC) <= k result — including duplicate scores —
  * across partial/merge/serialize paths (repartition forces them).
  */
class BoundedTopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("top_k == window top-k, with score ties, across partial merges") {
    import spark.implicits._
    // 3 groups × 400 rows; scores collide heavily ((id*7) % 50)
    val df = spark.range(1200)
      .select((col("id") % 3).as("g"), col("id"),
        ((col("id") * 7) % 50).cast("double").as("score"))
      .repartition(13) // force partial buffers + merge + serialization
    for (k <- Seq(1, 5, 17)) {
      val viaAgg = df.groupBy(col("g"))
        .agg(top_k(struct(col("score"), col("id")), k).as("topk"))
        .select(col("g"), posexplode(col("topk")).as(Seq("pos", "e")))
        .select(col("g"), col("e.id").as("id"), col("e.score").as("score"),
          (col("pos") + 1).as("rn"))
        .collect().map(_.toString).sorted.toSeq
      val w = Window.partitionBy(col("g"))
        .orderBy(col("score").desc, col("id").asc)
      val viaWindow = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select(col("g"), col("id"), col("score"), col("rn"))
        .collect().map(_.toString).sorted.toSeq
      assert(viaAgg == viaWindow, s"k=$k mismatch")
    }
  }

  test("top_k handles groups smaller than k and null structs") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0), 10L), (1L, None, 11L), (2L, Some(1.0), 12L))
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(top_k(struct(col("score"), col("id")), 5).as("t"))
      .select(col("g"), size(col("t")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(1L -> 1, 2L -> 1)) // null score skipped
  }

  test("top_k rejects non-struct<double,long> input at analysis time") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("g", "s")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("g")).agg(top_k(struct(col("s"), col("g")), 3)).collect()
    }
    assert(e.getMessage.contains("struct<double,long>"))
  }
}
