package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, NullsFirst, NullsLast, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Top-k rows per group as a typed imperative AGGREGATE function — the
  * spill-safe sibling of [[TopKPerKeyExec]].
  *
  * Planning through the aggregate path means Spark's
  * ObjectHashAggregateExec owns the group map: under memory pressure it
  * falls back to sort-based aggregation (external spill) instead of
  * OOMing, which is exactly the degradation mode the custom physical
  * operator documents away. Partial aggregation still bounds the
  * shuffle at k rows per (mapper, key).
  *
  * Input is a struct whose FIRST `order.length` fields are the ranking
  * key — `order` carries (isAscending, nullsFirst) per field so the
  * full SortOrder semantics (incl. desc_nulls_first etc.) survive —
  * remaining fields the payload; the buffer keeps the k first rows
  * under that ordering as a reverse-ordered heap (head = worst
  * retained).
  */
case class TopKRowsAgg(child: Expression, k: Int,
                       order: Seq[(Boolean, Boolean)],
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k >= 1)
  private def structType = child.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "top_k_rows"

  @transient private lazy val ordering = {
    val fields = structType.fields
    val sortOrders = order.zipWithIndex.map { case ((asc, nullsFirst), i) =>
      SortOrder(BoundReference(i, fields(i).dataType, fields(i).nullable),
        if (asc) Ascending else Descending,
        if (nullsFirst) NullsFirst else NullsLast, Seq.empty)
    }
    RowOrdering.create(sortOrders, Seq.empty)
  }

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k, ordering.reverse)

  override def update(buf: java.util.PriorityQueue[UnsafeRow],
                      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) {
        buf.add(toUnsafe(row).copy())
      } else if (ordering.compare(row, buf.peek()) < 0) {
        buf.poll()
        buf.add(toUnsafe(row).copy())
      }
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[UnsafeRow],
                     other: java.util.PriorityQueue[UnsafeRow])
      : java.util.PriorityQueue[UnsafeRow] = {
    val it = other.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (buf.size < k) buf.add(row)
      else if (ordering.compare(row, buf.peek()) < 0) { buf.poll(); buf.add(row) }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    var total = 4
    val it0 = buf.iterator()
    while (it0.hasNext) { total += 4 + it0.next().getSizeInBytes }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val r = it.next()
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    val nFields = structType.size
    while (i < n) {
      val len = bb.getInt
      val rowBytes = java.util.Arrays.copyOfRange(
        bytes, bb.position(), bb.position() + len)
      val row = new UnsafeRow(nFields)
      row.pointTo(rowBytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      bb.position(bb.position() + len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(child = newChildren.head)
}
