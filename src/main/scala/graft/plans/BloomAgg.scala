package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter over a precomputed 60-bit hash column, as a typed
  * imperative aggregate — the third member of the sketch family:
  * [[HllAgg]] answers "how many distinct", [[CmsAgg]] "about how
  * often", this answers "definitely absent, or maybe present" in
  * constant state. 8192 bits (128 longs, 1 KiB) per group, k=4 probes
  * from disjoint 13-bit fields of the input hash; partial buffers
  * merge by bitwise OR, so the shuffle carries one bit array per
  * (mapper, group) no matter how many rows feed it.
  *
  * The use case is the decontamination pre-filter: a broadcast Bloom
  * of benchmark shingles rejects the overwhelming majority of corpus
  * shingles without touching the exact set — NO FALSE NEGATIVES by
  * construction (a set bit never clears), so the exact check only
  * runs on Bloom hits. At m=8192/k=4 the false-positive rate is
  * (1−e^(−kn/m))^k ≈ 0.24% at n=1024 members.
  *
  * Like the other two, every piece is exact integer arithmetic
  * replayable in ANSI SQL from md5 alone: bit b of probe row f is set
  * iff ANY input hash has (h >> 13f) & 8191 = b, so the oracle
  * rebuilds membership per group as 4 EXISTS joins and must match the
  * query's bit tests exactly. The eval returns the 128 longs for the
  * query to probe with `element_at` + shifts — the probe sits in the
  * query next to its SQL mirror.
  */
case class BloomAgg(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import BloomAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_bits"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var f = 0
      while (f < k) {
        val bit = ((h >>> (fieldBits * f)) & (m - 1)).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        f += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** 8192 bits (1 KiB), 4 probes from disjoint 13-bit hash fields —
    * 52 of the 60 hash bits used. */
  val m = 8192
  val k = 4
  val fieldBits = 13
  val words: Int = m / 64
}
