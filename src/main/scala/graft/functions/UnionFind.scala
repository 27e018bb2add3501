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

/** Single-pass connected components over an edge stream:
  * `union_find_labels(src, dst)` → array<struct<node:long,label:long>>
  * with label = the component MINIMUM node id, one entry per distinct
  * node seen in any edge.
  *
  * This is the small-graph fast path behind q62: when the near-dup pair
  * list fits one aggregation buffer (the candidate graph is ~n_dup
  * edges — orders of magnitude smaller than the corpus), the iterative
  * label-propagation loop collapses into ONE aggregation: each task
  * builds a partial union-find over its edge partition (map-side), the
  * partials merge by replaying their parent forests as edges, and eval
  * emits the fully-compressed labels. Zero loop rounds, zero
  * per-round checkpoints, zero driver-side collect.
  *
  * Union policy attaches the larger root under the smaller, so every
  * root is its component's minimum by construction; `find` does full
  * path compression. Merging replays the other buffer's (child, parent)
  * entries as union ops — a union-find parent map is a spanning forest
  * of its components, so connectivity is preserved exactly.
  */
case class UnionFindAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  private def find(parent: mutable.LongMap[Long], x0: Long): Long = {
    var x = x0
    var p = parent.getOrElse(x, x)
    while (p != x) { x = p; p = parent.getOrElse(x, x) }
    val root = x
    // path compression: repoint the walked chain at the root
    x = x0
    while (x != root) { val nxt = parent(x); parent(x) = root; x = nxt }
    root
  }

  private def union(parent: mutable.LongMap[Long], a: Long, b: Long): Unit = {
    // register both endpoints (roots map to themselves) so eval emits
    // every node that appeared in an edge, then attach max under min
    if (!parent.contains(a)) parent(a) = a
    if (!parent.contains(b)) parent(b) = b
    val ra = find(parent, a)
    val rb = find(parent, b)
    if (ra < rb) parent(rb) = ra
    else if (rb < ra) parent(ra) = rb
  }

  override def update(parent: mutable.LongMap[Long], input: InternalRow):
      mutable.LongMap[Long] = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l != null && r != null)
      union(parent, l.asInstanceOf[Long], r.asInstanceOf[Long])
    parent
  }

  override def merge(p1: mutable.LongMap[Long], p2: mutable.LongMap[Long]):
      mutable.LongMap[Long] = {
    p2.foreach { case (child, par) => union(p1, child, par) }
    p1
  }

  override def eval(parent: mutable.LongMap[Long]): Any = {
    // sorted by node id: deterministic output independent of hash-map
    // iteration order (the oracle hash-compare needs stable rows)
    val nodes = parent.keysIterator.toArray
    java.util.Arrays.sort(nodes)
    new GenericArrayData(nodes.map(n => InternalRow(n, find(parent, n))))
  }

  override def serialize(parent: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(parent.size)
    parent.foreach { case (k, v) => out.writeLong(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val parent = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { union(parent, in.readLong(), in.readLong()); i += 1 }
    parent
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("node", LongType, nullable = false),
    StructField("label", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(left, right)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"union_find_labels expects (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): UnionFindAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UnionFindAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "union_find_labels"
}

object UnionFindAgg {
  /** Column API: `union_find_labels(src, dst)` →
    * array<struct<node,label>> sorted by node, label = component min.
    */
  def union_find_labels(src: Column, dst: Column): Column =
    ColumnBridge.column(
      UnionFindAgg(
        ColumnBridge.expression(src),
        ColumnBridge.expression(dst)).toAggregateExpression())
}
