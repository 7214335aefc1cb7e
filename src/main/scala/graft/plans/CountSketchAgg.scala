package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Sketch (AGMS) over a precomputed 60-bit hash column — the
  * SIGNED sibling of [[CmsAgg]], and the estimator CMS cannot be:
  * counter[j][b] accumulates ±1 per row (sign = hash bit 32+j, bucket
  * = hash byte j — independent md5-derived bits), so colliding keys
  * CANCEL in expectation instead of stacking. The inner product of two
  * groups' row-j counters is an UNBIASED estimate of the join size
  * Σ_k f_A(k)·f_B(k) (Alon-Gilbert-Matias-Szegedy), with variance
  * ~ ‖A‖₂²·‖B‖₂²/w — where the CMS dot product is one-sided and its
  * error term ‖A‖₁·‖B‖₁/w drowns the truth whenever distinct keys ≫ w
  * (q150 reports both, so the contrast is measured, not asserted).
  * The median over the 4 independent rows tames the variance.
  *
  * Same state contract as CmsAgg: one flat 4×256 long array (8 KiB)
  * per group, elementwise-ADD merge, ONE exchange at any row count.
  * Every counter is an exact signed integer count — the oracle
  * rebuilds all 1024 cells as count(+1 rows) − count(−1 rows) and the
  * dot products, median, and estimate hash-check bit-for-bit.
  */
case class CountSketchAgg(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import CmsAgg.{d, w}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < d) {
        val s = if (((h >>> (32 + j)) & 1L) == 1L) 1L else -1L
        buf(j * w + ((h >>> (8 * j)) & (w - 1)).toInt) += s
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountSketchAgg =
    copy(child = newChildren.head)
}
