package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.PriorityQueue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score double, id long) structs —
  * `top_k(struct(score, id), k)` keeps the k best entries by
  * (score DESC, id ASC) in a fixed-size heap.
  *
  * This is the scale-path replacement for the window-sort top-k pattern
  * (`row_number().over(...) <= k`): the window form sorts every
  * partition's full candidate set; this aggregate keeps k entries per
  * group per task (map-side partial aggregation), shuffles only k-sized
  * buffers, and merges heaps — O(n log k) work and O(k) state instead of
  * a full sort. Exactly the shape a 100 TB similarity search needs
  * (SURVEY.md §7 M6 "blocked brute-force scan").
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[(Double, Long)]] {

  require(k > 0, "top_k requires k > 0")

  // min-heap whose head is the WORST retained entry under
  // (score desc, id asc) — evicted first when a better one arrives
  private def newHeap(): PriorityQueue[(Double, Long)] =
    new PriorityQueue[(Double, Long)](k + 1, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1) // lower score = worse
      if (c != 0) c else java.lang.Long.compare(b._2, a._2) // higher id = worse
    })

  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    if (c != 0) c > 0 else a._2 < b._2
  }

  private def offer(heap: PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (heap.size < k) heap.offer(e)
    else if (better(e, heap.peek())) { heap.poll(); heap.offer(e) }
  }

  override def createAggregationBuffer(): PriorityQueue[(Double, Long)] = newHeap()

  override def update(heap: PriorityQueue[(Double, Long)], input: InternalRow):
      PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        offer(heap, (row.getDouble(0), row.getLong(1)))
    }
    heap
  }

  override def merge(h1: PriorityQueue[(Double, Long)],
      h2: PriorityQueue[(Double, Long)]): PriorityQueue[(Double, Long)] = {
    val it = h2.iterator()
    while (it.hasNext) offer(h1, it.next())
    h1
  }

  override def eval(heap: PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // best first: (score desc, id asc)
    val sorted = arr.sortWith(better)
    new GenericArrayData(sorted.map(e => InternalRow(e._1, e._2)))
  }

  override def serialize(heap: PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) { val e = it.next(); out.writeDouble(e._1); out.writeLong(e._2) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = newHeap()
    var i = 0
    while (i < n) { offer(heap, (in.readDouble(), in.readLong())); i += 1 }
    heap
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  /** Analysis-time type check: the update path casts to
    * struct<double,long>, so reject anything else with a clear error
    * instead of an execution-time ClassCastException.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StructType(Array(a, b))
          if a.dataType == DoubleType && b.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k expects struct<double,long> (score, id), got ${other.sql}")
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "top_k"
}

object BoundedTopK {
  /** Column API: `top_k(struct(score, id), k)` → array<struct<score,id>>
    * of the k best by (score DESC, id ASC).
    */
  def top_k(c: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
