package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min Sketch over a precomputed 60-bit hash column, as a typed
  * imperative aggregate — the frequency twin of [[HllAgg]]: where HLL
  * answers "how many DISTINCT items" in constant state, CMS answers
  * "about how often is item x" in constant state. 4 rows × 256
  * counters = one flat 8 KiB long array per group; partial buffers
  * merge by elementwise ADDITION, so the shuffle carries one counter
  * array per (mapper, group) no matter how many billions of tokens
  * feed it — heavy-hitter frequencies over 100 TB in a single
  * exchange, where an exact per-token groupBy would shuffle the full
  * token vocabulary.
  *
  * Row j of the sketch indexes by bits (8j … 8j+7) of the input hash
  * (md5-derived, so the four 8-bit fields are independent uniform
  * hashes). An item's estimate is min_j counter[j][bits_j(x)] —
  * min-of-4 one-sided overestimates (CMS never undercounts; ε = e/256
  * ≈ 1% of the stream per row at δ = e^-4).
  *
  * Like [[HllAgg]], every piece is exact integer arithmetic replayable
  * in ANSI SQL from md5 alone: counter[j][b] is just COUNT(*) of rows
  * whose j-th hash byte equals b, so the oracle rebuilds all 1024
  * counters per group bit-for-bit and takes the same min. The eval
  * returns the flat counters (row-major, 4×256) for the query to
  * probe with `element_at` + `least` — the probe sits in the query
  * next to its SQL mirror.
  */
case class CmsAgg(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import CmsAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_counters"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < d) {
        buf(j * w + ((h >>> (8 * j)) & (w - 1)).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < d * w) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(d * w * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](d * w)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
}

object CmsAgg {
  /** 4 rows × 256 buckets: 32 of the hash's 60 bits, 8 KiB state. */
  val d = 4
  val w = 256
}
