package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.TreeSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV bottom-k distinct-value sample — `kmv_sample(struct(h, v), k)`
  * keeps the k smallest DISTINCT (h, v) pairs under (h ASC, v ASC) and
  * evaluates to the sampled values `v`, sorted ascending.
  *
  * With `h` a fixed content hash of `v`, the retained set is the
  * bottom-k of a uniform permutation of the DISTINCT values — i.e. a
  * uniform k-sample of the group's value domain, usable for quantile /
  * histogram estimation over distinct values (q146). Three properties
  * make it gate-friendly and scale-friendly at once:
  *
  *  - **Merge-order insensitive.** The bottom-k of a union is a pure
  *    set function of the inputs, so partial-buffer arrival order
  *    (which Spark does NOT fix across runs) cannot change the result —
  *    unlike rank-error sketches (GK/KLL/t-digest) whose internal
  *    compactions are merge-order dependent. The sample is therefore
  *    exactly reproducible in DuckDB as
  *    `QUALIFY row_number() OVER (ORDER BY h, v) <= k` over distinct
  *    values, giving a full value-check of the estimate itself, not
  *    just an error-bound flag.
  *  - **Duplicate-idempotent.** The buffer is a set keyed on (h, v):
  *    re-inserting a value already sampled is a no-op, so the sample
  *    over raw rows equals the sample over pre-deduped rows and the
  *    aggregate can sit directly on an un-deduplicated scan.
  *  - **O(k) state.** Map-side partial aggregation keeps one k-sized
  *    tree per group per task and shuffles only k pairs per group —
  *    the scale path where the exact-quantile baseline must shuffle
  *    and fully sort every distinct value.
  *
  * Ties: `h` is the 60-bit stable hash, so distinct values collide
  * with probability ~2^-60; the (h, v) tie-break makes the order total
  * (and the DuckDB mirror identical) even when they do.
  */
case class KmvSample(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[(Long, Long)]] {

  require(k > 0, "kmv_sample requires k > 0")

  private def newSet(): TreeSet[(Long, Long)] =
    new TreeSet[(Long, Long)]((a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })

  /** Insert keeping only the k smallest; TreeSet.add dedupes (h, v). */
  private def offer(set: TreeSet[(Long, Long)], e: (Long, Long)): Unit = {
    if (set.size < k) { set.add(e); () }
    else if (set.comparator.compare(e, set.last()) < 0) {
      if (set.add(e)) { set.pollLast(); () }
    }
  }

  override def createAggregationBuffer(): TreeSet[(Long, Long)] = newSet()

  override def update(set: TreeSet[(Long, Long)], input: InternalRow):
      TreeSet[(Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        offer(set, (row.getLong(0), row.getLong(1)))
    }
    set
  }

  override def merge(s1: TreeSet[(Long, Long)], s2: TreeSet[(Long, Long)]):
      TreeSet[(Long, Long)] = {
    val it = s2.iterator()
    while (it.hasNext) offer(s1, it.next())
    s1
  }

  override def eval(set: TreeSet[(Long, Long)]): Any = {
    val vs = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { vs(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(vs)
    new GenericArrayData(vs)
  }

  override def serialize(set: TreeSet[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(set.size)
    val it = set.iterator()
    while (it.hasNext) { val e = it.next(); out.writeLong(e._1); out.writeLong(e._2) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = newSet()
    var i = 0
    while (i < n) { offer(set, (in.readLong(), in.readLong())); i += 1 }
    set
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StructType(Array(a, b))
          if a.dataType == LongType && b.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sample expects struct<bigint,bigint> (hash, value), got ${other.sql}")
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KmvSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSample =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "kmv_sample"
}

object KmvSample {
  /** Column API: `kmv_sample(struct(h, v), k)` → array<bigint> of the
    * sampled values, sorted ascending.
    */
  def kmv_sample(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSample(ColumnBridge.expression(c), k).toAggregateExpression())
}
