package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** HyperLogLog over a precomputed 60-bit hash column, as a typed
  * imperative aggregate — the cardinality sketch for 100 TB distinct
  * counts: constant 512-byte state per group, partial buffers merge
  * with an elementwise max, so the shuffle carries one register array
  * per (mapper, group) no matter how many rows feed it. Input is the
  * md5-derived 60-bit hash the text kernels already emit
  * ([[graft.text.TextExpressions]] `shingleHashes`), split 9+51: the
  * top 9 bits pick one of 512 registers, the rank is the position of
  * the first set bit in the remaining 51.
  *
  * Unlike `approx_count_distinct` (whose HLL++ internals are not
  * reproducible outside Spark — q50 is rows-only for that reason),
  * every piece of this sketch is replayable in ANSI SQL from md5
  * alone, so the oracle checks the REGISTERS bit-for-bit: the eval
  * returns integer register summaries (sum of ranks, zero count, and
  * the indicator sum Σ 2^(52-M_j) scaled by 2^52 so it stays exact
  * integer arithmetic — max 512·2^52 = 2^61 fits a long); the final
  * double estimate alpha·m²/S is left to the caller so the one
  * floating-point step sits in the query next to its SQL mirror.
  */
case class HllAgg(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sum_ranks", LongType, nullable = false),
    StructField("zero_regs", LongType, nullable = false),
    StructField("s_scaled", LongType, nullable = false)))
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllAgg.updateBuf(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var sumRanks = 0L
    var zeros = 0L
    var sScaled = 0L
    var i = 0
    while (i < m) {
      val r = buf(i)
      sumRanks += r
      if (r == 0) zeros += 1
      sScaled += 1L << (remBits + 1 - r)
      i += 1
    }
    InternalRow(sumRanks, zeros, sScaled)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

/** [[HllAgg]] with the raw REGISTER ARRAY as the result (512 ranks as
  * array<long>) instead of the scalar summaries — the form set algebra
  * needs: HLL registers merge under elementwise max, so two groups'
  * arrays combine into their UNION sketch with one `zip_with(..,
  * greatest)` and inclusion–exclusion prices intersections from there
  * (q141's cross-source overlap at sketch cost). Same state, same
  * shuffle shape (one 512-byte buffer per (mapper, group)); only the
  * final eval differs. The array is bounded output (|groups| rows ×
  * 4 KiB), never a per-row column. */
case class HllRegsAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hll_reg_array"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllAgg.updateBuf(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegsAgg =
    copy(child = newChildren.head)
}

object HllAgg {
  /** 512 registers: 9 index bits + 51 rank bits out of the 60-bit
    * hash; std error 1.04/sqrt(512) ~ 4.6%. */
  val m = 512
  private val idxBits = 9
  private[plans] val remBits = 60 - idxBits // 51
  private val remMask = (1L << remBits) - 1

  /** The shared register update: idx = top 9 bits, rank = first-set-bit
    * position in the remaining 51 (one definition for [[HllAgg]] and
    * [[HllRegsAgg]] — the two sketches must be bit-identical). */
  private[plans] def updateBuf(buf: Array[Byte], h: Long): Unit = {
    val idx = (h >>> remBits).toInt
    val rem = h & remMask
    val rank =
      if (rem == 0L) (remBits + 1).toByte
      else (remBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))).toByte
    if (rank > buf(idx)) buf(idx) = rank
  }

  /** alpha_512 · m² · 2^52 as one double constant (2^52 undoes the
    * s_scaled integer scaling; the product m²·2^52 = 2^70 is a power
    * of two, so the only rounding is in alpha itself). The estimate
    * is alphaNum / s_scaled — division of bit-identical doubles is
    * bit-identical in both engines; the oracle SQL interpolates this
    * exact constant via its shortest round-trip decimal form. */
  val alphaNum: Double =
    0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble * 4503599627370496.0
}
