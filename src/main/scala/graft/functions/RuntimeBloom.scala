package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit runtime Bloom-filter join pruning (the q69 decontamination
  * shape): build a Bloom filter over the SMALL side's join key, probe
  * it map-side on the BIG side BEFORE the join shuffle, keep the exact
  * equi-join after it. The probe is a superset filter, so results are
  * bit-identical — only the shuffle volume changes: at 100 TB the
  * training-side scan ships only rows whose key might match the
  * benchmark suite, instead of every shingle in the corpus.
  *
  * Spark's own `InjectRuntimeFilter` implements exactly this, but only
  * when the application-side join key traces down to a scan output
  * attribute; a key derived through a Generate (explode) — every
  * shingle/n-gram join in this engine — is invisible to it, so the
  * engine injects the filter itself with the same Catalyst expressions
  * (`BloomFilterAggregate` to build, `BloomFilterMightContain` to
  * probe, both codegen-capable and format-compatible by construction).
  *
  * The build side is aggregated eagerly and embedded as a BINARY
  * literal — `BloomFilterMightContain` requires a foldable or subquery
  * bloom operand, and the build side is small by definition (a held-out
  * benchmark suite, not the corpus). One extra job over the small side,
  * driver traffic = one serialized filter.
  */
object RuntimeBloom {

  /** Bloom capacity: 2^16 expected items / 2^19 bits ≈ 1% false
    * positives at capacity, 64 KiB serialized. Sized for benchmark
    * suites up to ~65k distinct shingle hashes; a bigger eval suite
    * would scale `numBits` with its measured count (the FP rate only
    * costs shuffle bytes, never correctness).
    */
  val ExpectedItems: Long = 1L << 16
  val NumBits: Long = 1L << 19

  /** Serialized Bloom filter over a bigint key column of `small`. */
  def buildBloom(small: DataFrame, key: Column): Array[Byte] =
    small.select(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(key),
          Literal(ExpectedItems), Literal(NumBits)).toAggregateExpression())
        .as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Probe predicate: `might_contain(<bloom literal>, key)`. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(key)))

  /** `big` filtered to rows whose `key` might appear in `small`'s key
    * set — prune-before-shuffle; compose with the exact join for
    * identical results. An EMPTY small side yields a null filter
    * (BloomFilterAggregate of zero rows): prune everything, which is
    * exact — nothing can join against an empty build side.
    */
  def prunedBySmall(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column): DataFrame = {
    val bloom = buildBloom(small, smallKey)
    if (bloom == null) big.filter(lit(false)) else big.filter(mightContain(bloom, bigKey))
  }
}
