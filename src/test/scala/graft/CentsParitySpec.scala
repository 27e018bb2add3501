package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational.{cents, descale, lsum}

/** The round-6 perf work rests on one claim: the scaled-long ("cents")
  * aggregation path produces the SAME double bits as the decimal
  * formulation it replaced, for 2-dp-backed inputs — which is why
  * every oracle stayed unchanged. This spec pins that equivalence on
  * adversarial data the fixtures don't contain: negative values,
  * HALF_UP .005 boundaries, large magnitudes, and many partitions.
  */
class CentsParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def both(values: Seq[Double], parts: Int): (Double, Double) = {
    import spark.implicits._
    val df = values.toDF("x").repartition(parts)
    val r = df.agg(
      descale(lsum(cents(col("x"))), 100L).as("cents_path"),
      sum(col("x").cast(DecimalType(12, 2))).cast("double").as("dec_path"))
      .collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("cents sum == decimal sum, bit-for-bit, on random 2-dp data") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 10) {
      val values = Seq.fill(500)(
        math.round((rnd.nextDouble() - 0.5) * 2e7) / 100.0)
      val (c, d) = both(values, 1 + trial % 7)
      assert(c == d, s"trial $trial: cents=$c dec=$d")
    }
  }

  test("2-dp-backed negatives and magnitude extremes agree; true .005 boundaries are OUT of contract") {
    // The contract's PRECONDITION is that inputs are 2-dp-BACKED:
    // doubles that are the nearest representation of some n/100 —
    // which is what every column routed through cents() holds. Those
    // agree bit-for-bit, including negatives and large magnitudes:
    val backed = Seq(-0.01, 0.0, 0.01, -99999.99, 99999.99,
      -12345.67, 12345.67, 0.05, -0.05)
    val (c, d) = both(backed, 3)
    assert(c == d, s"cents=$c dec=$d")
    // A true decimal boundary like 1.005 is NOT 2-dp-backed (its
    // nearest double is 1.00499999999999989…), and there the paths
    // genuinely diverge: cents rounds the double PRODUCT
    // (100.49999… → 100 → 1.00) while the decimal cast routes through
    // Double.toString ("1.005" → 1.01). This is the documented reason
    // full-precision columns (events.value) must stay on the decimal
    // path — pinned here so the divergence is a visible fact, not a
    // latent surprise:
    val (cb, db) = both(Seq(1.005), 1)
    assert(cb == 1.00 && db == 1.01,
      s"boundary divergence changed: cents=$cb dec=$db")
  }

  test("product de-scale matches decimal products (the revSum shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(400)((
      math.round(rnd.nextDouble() * 1e7) / 100.0,   // price: 2-dp
      math.round(rnd.nextDouble() * 10.0) / 100.0)) // discount: 2-dp
    val df = rows.toDF("price", "disc").repartition(5)
    val one = lit(1).cast(DecimalType(12, 2))
    val r = df.agg(
      descale(lsum(cents(col("price")) * (lit(100L) - cents(col("disc")))),
        10000L).as("cents_path"),
      sum(col("price").cast(DecimalType(12, 2)) *
        (one - col("disc").cast(DecimalType(12, 2))))
        .cast("double").as("dec_path"))
      .collect()(0)
    assert(r.getDouble(0) == r.getDouble(1),
      s"cents=${r.getDouble(0)} dec=${r.getDouble(1)}")
  }
}
