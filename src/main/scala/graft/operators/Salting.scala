package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for fact⋈fact equi-joins (SURVEY.md brief: "salting for
  * skew"). When one side's key distribution is heavily skewed and the
  * other side is too large to broadcast, a hot key pins its entire
  * partition on one task. Salting splits each hot key into
  * `saltFactor` sub-keys: the skewed side gets a random-but-
  * deterministic salt per row, the build side is replicated across all
  * salts, and the join key becomes (key, salt) — spreading a hot key
  * over saltFactor tasks at the cost of replicating the build side.
  *
  * AQE's skew-join handles many cases adaptively at runtime; explicit
  * salting remains the tool when a single key exceeds what AQE can
  * split (it can only split on map-output boundaries) or when the
  * skew is known up front.
  */
object Salting {

  /** Inner equi-join `left.key == right.key` with the LEFT side treated
    * as skewed. Deterministic salt: hash of the left row's full key
    * column list modulo saltFactor (no rand() — keeps retries/replays
    * stable, which matters for exactly-once sinks).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int,
      saltOn: Seq[String]): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt",
      pmod(hash(saltOn.map(col): _*), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Column helper for ad-hoc salting expressions. */
  def saltColumn(saltFactor: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(saltFactor))
}
