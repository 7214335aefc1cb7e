package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the
  * latest right row with the same key and `rightTime <= leftTime`.
  *
  * Implemented with the union + running-last-value trick rather than a
  * range join: tag both sides, union, one window over
  * (key, time, side-tag) carrying the last non-null payload forward,
  * keep left rows. Cost is ONE shuffle on the key + a per-partition
  * sort — linear at 100 TB, where a naive `leftTime >= rightTime`
  * theta-join would explode to |left|x|right| per key.
  *
  * Right side must be unique per (key, time) — pre-dedupe with a
  * deterministic tiebreak (see EventQueries for an example).
  */
object AsOfJoin {

  /** `payload` columns are taken from `right`; they appear on the
    * output left rows (null when no right row precedes). */
  def backward(left: DataFrame, leftKey: String, leftTime: String,
               right: DataFrame, rightKey: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    // payload travels as ONE struct: a right row with a null payload
    // field must not fall back to an older right row's value
    val rightTagged = right
      .select(col(rightKey).as("_k"), col(rightTime).as("_t"),
        lit(0).as("_side"), struct(payload.map(col): _*).as("_p"))

    val combined = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows (_side=0) sort before left rows at equal time -> an
    // exactly-equal timestamp matches (inclusive as-of)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val withPayload = combined
      .withColumn("_pl", last(col("_p"), ignoreNulls = true).over(w))
    payload.foldLeft(withPayload.filter(col("_side") === 1)) { (df, c) =>
      df.withColumn(c, col("_pl").getField(c))
    }.drop("_p", "_pl", "_k", "_t", "_side")
  }

  /** Forward as-of join: for each left row, the payload of the EARLIEST
    * right row with the same key and `rightTime >= leftTime` (inclusive).
    * Same single-shuffle union trick, mirrored by sorting time
    * DESCENDING and carrying the last non-null payload — a running
    * [unbounded preceding, current] frame, which Spark executes in one
    * linear pass per partition (an [current, unbounded following]
    * frame would be O(n²) per key). Right rows sort before left rows
    * at equal time so exact matches count (inclusive). */
  def forward(left: DataFrame, leftKey: String, leftTime: String,
              right: DataFrame, rightKey: String, rightTime: String,
              payload: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_ord", lit(0))
    val rightTagged = right
      .select(col(rightKey).as("_k"), col(rightTime).as("_t"),
        lit(0).as("_side"), lit(1).as("_ord"),
        struct(payload.map(col): _*).as("_p"))

    val combined = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // descending time: "earliest right at-or-after" becomes "last right
    // seen so far"; at equal _t, right (_ord=1) sorts first (desc) so
    // it is already in the running frame when the left row arrives
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_ord").desc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val withPayload = combined
      .withColumn("_pl", last(col("_p"), ignoreNulls = true).over(w))
    payload.foldLeft(withPayload.filter(col("_side") === 1)) { (df, c) =>
      df.withColumn(c, col("_pl").getField(c))
    }.drop("_p", "_pl", "_k", "_t", "_side", "_ord")
  }
}
