package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Log-scale histogram sketch over a nonnegative Long measure, as a
  * typed imperative aggregate — the DISTRIBUTION member of the sketch
  * family ([[HllAgg]] distinct counts, [[CmsAgg]] frequencies,
  * [[BloomAgg]] membership): approximate quantiles of billions of
  * values in one exchange of 2 KiB per group, where an exact
  * percentile (q81's `percentile_approx`-free discipline) needs a
  * per-group sort or a value-scale groupBy.
  *
  * Buckets are pure bit arithmetic — no logarithms anywhere, so the
  * cross-engine replay is exact integer math (the repo-wide
  * no-transcendentals-in-hashes rule): value v lands in
  *
  *   bucket(v) = v                                  (v < 8)
  *             = ((bitlen(v)-2) << 2) | top2(v)     (v >= 8)
  *
  * where bitlen is the position of the highest set bit and top2 the
  * two bits below it — i.e. 4 geometric sub-buckets per octave, giving
  * a guaranteed ≤12.5% relative quantile-value error at any scale.
  * Max bucket for any positive Long is 247, so the state is a flat
  * 256-long array; partial buffers merge by elementwise ADDITION
  * (same as CMS), so the shuffle carries one 2 KiB array per
  * (mapper, group) no matter how many rows feed it.
  *
  * Every piece is replayable in ANSI SQL: bucket(v) is expressible
  * with `bin()`/shifts, counters are plain per-bucket COUNTs, and
  * quantile extraction (nearest-rank over the cumulative bucket sums)
  * is a window — the oracle rebuilds the whole sketch bit-for-bit.
  * Negative and NULL inputs are skipped (the measures this aggregates
  * — token counts, byte lengths, durations — are nonnegative by
  * construction; a negative would be upstream corruption, and
  * silently bucketing it would mask that).
  */
case class HistAgg(child: Expression,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import HistAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hist_counts"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x >= 0) buf(bucketOf(x)) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < w) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(w * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](w)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistAgg =
    copy(child = newChildren.head)
}

object HistAgg {
  /** Flat state size: max bucket is ((63-2)<<2)|3 = 247 for Long.MaxValue. */
  val w = 256

  /** Bucket index for a nonnegative value — bit arithmetic only. */
  def bucketOf(x: Long): Int =
    if (x < 8L) x.toInt
    else {
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(x)
      (((bitlen - 2) << 2) | ((x >>> (bitlen - 3)) & 3L).toInt).toInt
    }

  /** Inclusive lower bound of a bucket — the value a quantile reports.
    * Exact inverse of [[bucketOf]]'s binning: `lo(bucketOf(x)) <= x <
    * lo(bucketOf(x)+1)` for every nonnegative x. */
  def loOf(b: Int): Long =
    if (b < 8) b.toLong
    else (4L + (b & 3)) << ((b >> 2) - 1)

  // ── engine-side transcriptions of loOf — generated HERE so every
  // consumer (batch quantile extraction, streaming twin, DuckDB
  // oracles) shares ONE definition of the inverse; a bucket-geometry
  // change edits this file only. The cast precedes the shift because
  // high buckets would overflow an int shift.

  /** loOf as a Spark SQL expression over column `name`. Yields NULL
    * for a negative (sentinel) bucket. */
  def loSparkSql(name: String): String =
    s"""CASE WHEN $name < 0 THEN CAST(NULL AS BIGINT)
        WHEN $name < 8 THEN CAST($name AS BIGINT)
        ELSE shiftleft(CAST(4 + ($name % 4) AS BIGINT),
          CAST(($name div 4) - 1 AS INT)) END"""

  /** loOf as a DuckDB expression over column `name` (BIGINT result). */
  def loDuckSql(name: String): String =
    s"""CAST(CASE WHEN $name < 8 THEN $name
        ELSE (4 + ($name % 4)) << (($name // 4) - 1) END AS BIGINT)"""

  /** Nearest-rank p-quantile BUCKET over a counter array column, as a
    * window-free `aggregate()` fold: smallest index whose cumulative
    * count reaches p% of `total`; -1 when the sketch is empty (feed
    * through [[loSparkSql]], whose -1 branch yields NULL). ONE
    * definition for every context that can't (streaming) or shouldn't
    * (single-row frames) spend a Window on a 256-element scan. */
  def quantileBucketSql(arr: String, total: String, p: Int): String =
    s"""aggregate($arr,
        named_struct('cum', CAST(0 AS BIGINT), 'pos', 0, 'b', -1),
        (acc, x) -> named_struct(
          'cum', acc.cum + x,
          'pos', acc.pos + 1,
          'b', CASE WHEN acc.b >= 0 THEN acc.b
                    WHEN $total > 0 AND (acc.cum + x) * 100 >= $p * $total
                      THEN acc.pos
                    ELSE -1 END),
        acc -> acc.b)"""
}
