package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a distributive aggregate:
  * `count_min(item)` → array<bigint> of d·w bucket counters (row-major).
  *
  * Point-estimate contract (Cormode & Muthukrishnan '05): for any item,
  * min over the d rows of the counter at that item's bucket OVERcounts
  * the true frequency by at most εn with probability 1−δ (ε = e/w,
  * δ = e^−d) and never undercounts. The buffer is a constant d·w longs
  * whatever the stream — merging is elementwise addition, so map-side
  * partial aggregation ships one ~2 KiB buffer per task instead of one
  * row per distinct item; that fixed-size shuffle is the entire point
  * at 100 TB vocabulary scans.
  *
  * Bucket function (mirrored verbatim into the DuckDB oracle):
  * `((a_i · (stable_hash64(item) mod P) + b_i) mod P) mod w`, reusing
  * the engine's minhash permutation constants — every factor stays
  * under 2^30 so the products fit a signed 64-bit integer on any
  * engine.
  */
case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CountMinAgg._

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hp = java.lang.Math.floorMod(
        ScalarOps.stableHash64(v.asInstanceOf[UTF8String].getBytes), P)
      var i = 0
      while (i < D) {
        buf(i * W + (((A(i) * hp + B(i)) % P) % W).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box(_).asInstanceOf[Any]))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(D * W)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min expects string, got ${child.dataType.sql}")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "count_min"
}

object CountMinAgg {
  /** Depth (hash rows) and width (buckets per row). */
  val D = 4
  val W = 64

  val P: Long = ScalarOps.MinhashP
  val A: Array[Long] = ScalarOps.MinhashA
  val B: Array[Long] = ScalarOps.MinhashB

  /** Column API: `count_min(item)` → row-major d·w counter array. */
  def count_min(item: Column): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(item)).toAggregateExpression())
}
