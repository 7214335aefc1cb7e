package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketed so it scales.
  *
  * A naive `p.t BETWEEN i.start AND i.end` theta join becomes a
  * broadcast-nested-loop (or a per-key cartesian) — quadratic per key,
  * hopeless at 100 TB. Instead both sides are bucketed on a fixed time
  * grid: a point lands in exactly one bucket, an interval is exploded
  * into every bucket it overlaps, and the join becomes an EQUI-join on
  * (key, bucket) + a residual filter. One shuffle, hash join, linear
  * in points + interval-bucket coverage.
  *
  * Pick `bucketWidth` near the typical interval length: each interval
  * then explodes into ~2 buckets, and no (point, interval) pair can be
  * produced twice because the point's bucket is unique.
  */
object RangeJoin {

  /** Join each left point row to every right interval row with the same
    * key and `startCol <= timeCol < endCol` (half-open). Time columns
    * must be numeric (e.g. epoch micros as Long).
    *
    * Output: left columns + `rightPayload` columns (inner join).
    */
  def pointInInterval(points: DataFrame, pointKey: String, pointTime: String,
                      intervals: DataFrame, intervalKey: String,
                      startCol: String, endCol: String,
                      rightPayload: Seq[String],
                      bucketWidth: Long): DataFrame =
    joined(points, pointKey, pointTime, intervals, intervalKey,
      startCol, endCol, rightPayload, bucketWidth, "inner")

  /** LEFT variant: every point row survives; points covered by no
    * interval carry null payload. Still exactly one output row per
    * unmatched point — a point lives in ONE bucket, so the left join
    * can't fan it out — and per matched (point, interval) pair. This is
    * the as-of-probe shape ([[graft.etl.Scd2.asOf]]): a fact before its
    * key's first dimension version must appear with a null attribute,
    * not vanish. */
  def pointInIntervalLeft(points: DataFrame, pointKey: String,
                          pointTime: String, intervals: DataFrame,
                          intervalKey: String, startCol: String,
                          endCol: String, rightPayload: Seq[String],
                          bucketWidth: Long): DataFrame =
    joined(points, pointKey, pointTime, intervals, intervalKey,
      startCol, endCol, rightPayload, bucketWidth, "left")

  private def joined(points: DataFrame, pointKey: String, pointTime: String,
                     intervals: DataFrame, intervalKey: String,
                     startCol: String, endCol: String,
                     rightPayload: Seq[String], bucketWidth: Long,
                     joinType: String): DataFrame = {
    val p = points.withColumn("_bucket", floor(col(pointTime) / bucketWidth))
    // interval [s, e) covers buckets floor(s/w) .. floor((e-1)/w)
    val i = intervals
      .select((col(intervalKey).as("_ik") +: col(startCol).as("_s") +:
        col(endCol).as("_e") +: rightPayload.map(col)): _*)
      // empty intervals would make sequence() DESCEND (Spark quirk)
      .filter(col("_e") > col("_s"))
      .withColumn("_bucket",
        explode(sequence(floor(col("_s") / bucketWidth),
          floor((col("_e") - 1) / bucketWidth))))
    p.join(i, p(pointKey) === i("_ik") && p("_bucket") === i("_bucket") &&
        p(pointTime) >= i("_s") && p(pointTime) < i("_e"), joinType)
      .drop("_bucket", "_ik", "_s", "_e")
  }
}
