package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD TYPE-2 history build — turn a change/event stream into the
  * slowly-changing-dimension interval table (`valid_from`, `valid_to`,
  * `is_current`) warehouses join facts against "as of" a date.
  *
  * The reference's dimensions are TYPE-1 (its MERGE overwrites in
  * place — `etl-gcs-cloudsql/src/services/conductor.ts` upserts the
  * latest attributes and history is lost; [[MergeOps.merge]] is that
  * parity path). This is the extension operator its warehouse
  * successor needs: full attribute history, closed intervals, one
  * current row per key — built declaratively from the raw change
  * stream rather than maintained row-at-a-time.
  *
  * Semantics (q181's DuckDB oracle replays all of it):
  *
  *   1. changes order per key by `seqCols` — the caller supplies a
  *      TOTAL order (include a tiebreaker: ties would make both the
  *      compression and the interval chaining nondeterministic);
  *   2. CHANGE COMPRESSION (`compress = true`): a change whose
  *      tracked `attrs` all equal the previous change's (null-safe
  *      `<=>`) creates no new version — re-stating a value is not a
  *      change. SCD2 without this emits a version per event and the
  *      dimension inherits the fact table's row count;
  *   3. each surviving version's `valid_to` is the NEXT version's
  *      `valid_from` (half-open intervals — an as-of probe uses
  *      `valid_from <= t < valid_to`); the last version per key is
  *      open (`valid_to` null) and flagged `is_current`.
  *
  * Scale shape: everything is per-key window arithmetic over ONE hash
  * exchange on the key — the compression lag/row_number and the
  * interval lead share the same (key, seq) partitioning and Spark
  * plans them on a single sort (the filter between them preserves
  * distribution and order). No join, no global sort; key count scales
  * with the dimension, the per-key sort is the spillable per-task
  * kind. PlanSpec pins the single-Exchange shape.
  */
object Scd2 {

  /** Build the interval table from `changes`. Output: `keys` ++
    * `seqCols` ++ `attrs` ++ (`valid_to_seq` — the next version's
    * first seq value, null when open) ++ `is_current` (1/0). The
    * first seq column doubles as `valid_from`; callers wanting
    * renamed/derived interval columns shape the result. */
  def build(changes: DataFrame, keys: Seq[String], seqCols: Seq[String],
            attrs: Seq[String], compress: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    require(seqCols.nonEmpty, "scd2 needs an ordering (with a tiebreaker)")
    require(attrs.nonEmpty, "scd2 needs tracked attribute columns")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqCols.map(col): _*)
    val kept =
      if (!compress) changes
      else {
        val sameAsPrev = attrs.map(a => col(a) <=> lag(col(a), 1).over(w))
          .reduce(_ && _)
        changes
          .withColumn("_first", row_number().over(w) === 1)
          .withColumn("_same", sameAsPrev)
          .filter(col("_first") || !col("_same"))
          .drop("_first", "_same")
      }
    kept
      .withColumn("valid_to_seq", lead(col(seqCols.head), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to_seq").isNull, lit(1)).otherwise(lit(0)))
      .select((keys ++ seqCols ++ attrs ++
        Seq("valid_to_seq", "is_current")).map(col): _*)
  }
}
