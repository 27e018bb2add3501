package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a distributive aggregate:
  * `misra_gries(item, k)` → array<string> of candidate items.
  *
  * Guarantee: any item with true frequency > n/k is GUARANTEED to be in
  * the candidate set (the sketch undercounts by at most the total
  * decrement, which is ≤ n/k; merging two sketches adds their error
  * bounds — Agarwal et al., "Mergeable Summaries", PODS '12 — so the
  * superset property survives map-side partial aggregation). The set
  * may contain false positives; an exact counting pass over just the
  * candidates (a broadcast semi-join filter) removes them. That
  * two-pass shape is the point at 100 TB: the first pass shuffles ONE
  * k-sized buffer per task instead of one row per distinct item, and
  * the second pass counts only |candidates| ≪ |vocabulary| items.
  *
  * Each sketch keeps at most k−1 counters. update: increment if
  * present, insert if room; on overflow, subtract the smallest
  * surviving weight jointly from every counter and the incoming item
  * (an O(k) walk per overflow — the total subtracted mass is bounded
  * by n/k, which is what the superset guarantee rests on; at the
  * small k a two-pass heavy-hitter plan uses, the walk is noise).
  * merge: replay the other sketch's counters as weighted inserts (the
  * standard mergeable-summaries reduction). eval emits candidates
  * sorted lexicographically so the output is deterministic regardless
  * of hash-map iteration order.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, "misra_gries needs k >= 2")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def add(m: mutable.HashMap[String, Long], item: String, w: Long): Unit = {
    m.get(item) match {
      case Some(c) => m.update(item, c + w)
      case None =>
        if (m.size < k - 1) m.update(item, w)
        else {
          // no room: absorb min(w, smallest counter) as a joint decrement
          val dec = math.min(w, m.valuesIterator.min)
          val dead = mutable.ArrayBuffer.empty[String]
          m.mapValuesInPlace { (key, v) =>
            if (v == dec) dead += key
            v - dec
          }
          dead.foreach(m.remove)
          if (w > dec) m.update(item, w - dec)
        }
    }
  }

  override def update(m: mutable.HashMap[String, Long], input: InternalRow):
      mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(m, v.asInstanceOf[UTF8String].toString, 1L)
    m
  }

  override def merge(m1: mutable.HashMap[String, Long],
      m2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    m2.foreach { case (item, w) => add(m1, item, w) }
    m1
  }

  override def eval(m: mutable.HashMap[String, Long]): Any = {
    // binary (UTF-8 byte) order, matching engine-side array_sort /
    // ORDER BY on strings — Java String natural order is UTF-16
    // code-unit order, which diverges for supplementary-plane items
    val items = m.keysIterator.map(UTF8String.fromString).toArray
    java.util.Arrays.sort(items,
      (a: UTF8String, b: UTF8String) => a.binaryCompare(b))
    new GenericArrayData(items.map(_.asInstanceOf[Any]))
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF throws above 64 KiB
  // encoded bytes, and nothing in the sketch's contract caps item size
  // (sketching whole documents or URLs is a legitimate use)
  override def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects string, got ${child.dataType.sql}")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Column API: `misra_gries(item, k)` → sorted array of candidate
    * heavy hitters (superset of all items with frequency > n/k).
    */
  def misra_gries(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), k).toAggregateExpression())
}
