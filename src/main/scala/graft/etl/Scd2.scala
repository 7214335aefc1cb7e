package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Incremental SCD2 maintenance: fold a batch of new changes into an
    * existing [[build]] output, row-identical to rebuilding from the
    * full change stream (q187's oracle IS the full rebuild — the hash
    * match is the fold≡rebuild proof, the q183 discipline) at
    * BATCH-scale cost, not dimension-scale.
    *
    * Why replaying the stored versions is enough: each interval row
    * retains its version-opening change verbatim (keys ++ seqCols ++
    * attrs), and under the APPEND-ONLY contract — every new change
    * sequences strictly after ALL of its key's original changes — the
    * compression decisions for old rows cannot be altered by new ones
    * (a lag-compare only looks backward), so rebuilding the touched
    * keys from (stored versions ∪ new changes) reproduces the full
    * rebuild exactly. Out-of-order backfill breaks this (a change
    * spliced BETWEEN two originals can resurrect a compressed-away
    * row the interval table no longer holds) — the fold fails loudly
    * on any new change at-or-before its key's latest stored version
    * (the strongest check expressible from the interval table alone;
    * the contract itself covers compressed-away originals too).
    * Backfill is a [[build]] over the raw change log, not a fold.
    *
    * Scale shape: touched keys (batch-scale) broadcast twice — a
    * broadcast ANTI join passes untouched dimension rows through with
    * no shuffle and no window work, a broadcast SEMI join selects the
    * rows to replay; the guard joins the batch against the touched
    * CURRENT rows (one per key, broadcast); the only hash exchange in
    * the plan is [[build]]'s window over the touched slice (PlanSpec
    * pins exactly one). The raise_error guard rides batch rows only —
    * never a dimension-scale path (the q171/ZOrder lesson). */
  def fold(existing: DataFrame, changes: DataFrame, keys: Seq[String],
           seqCols: Seq[String], attrs: Seq[String],
           compress: Boolean = true): DataFrame = {
    val cols = keys ++ seqCols ++ attrs
    val touched = changes.select(keys.map(col): _*).distinct()
    val untouched = existing.join(broadcast(touched), keys, "left_anti")
    val replayed = existing.join(broadcast(touched), keys, "left_semi")
      .select(cols.map(col): _*)
    // append-only guard: current rows carry each touched key's latest
    // stored seq; any batch change at-or-before it is out of order
    val cur = existing.filter(col("is_current") === 1)
      .join(broadcast(touched), keys, "left_semi")
      .select(keys.map(col) :+
        struct(seqCols.map(col): _*).as("_cur_seq"): _*)
    // when().otherwise(raise_error): pass/raise is branch-structural,
    // not reliant on Or-disjunct evaluation order
    val guarded = changes.join(broadcast(cur), keys, "left")
      .withColumn("_seq", struct(seqCols.map(col): _*))
      .filter(when(col("_cur_seq").isNull || col("_seq") > col("_cur_seq"),
          lit(true))
        .otherwise(raise_error(
          concat(lit("scd2 fold is append-only: change at "),
            col("_seq").cast("string"), lit(" not after stored "),
            col("_cur_seq").cast("string"),
            lit(" — backfill requires a rebuild from the raw change log")))))
      .select(cols.map(col): _*)
    untouched.unionByName(
      build(replayed.unionByName(guarded), keys, seqCols, attrs, compress))
  }

  /** How [[asOf]] physically probes the dimension. */
  sealed trait AsOfStrategy
  /** Dimension broadcasts; the probe is a BroadcastHashJoin on the key
    * with the interval bounds as residual — the fact side never
    * shuffles. Right whenever the change-compressed dimension fits the
    * broadcast budget (the common case: dimensions are orders of
    * magnitude under fact tables). */
  case object BroadcastProbe extends AsOfStrategy
  /** Dimension too big to broadcast: the probe rides
    * [[graft.operators.RangeJoin.pointInIntervalLeft]] — both sides
    * bucketed on a fixed time grid, so the theta condition becomes an
    * EQUI-join on (key, bucket) + residual. One hash exchange per side,
    * shuffled hash/sort-merge join, NEVER a nested loop; linear in
    * facts + interval-bucket coverage. `bucketWidth` is in the numeric
    * unit `num` maps times into — pick it near the typical version
    * lifetime so an interval explodes into ~2 buckets. */
  final case class BucketedProbe(bucketWidth: Long) extends AsOfStrategy

  /** As-of probe — the interval table's consuming join: each fact row
    * matched (LEFT) to the dimension version in effect at its time,
    * `validFrom <= t < validTo`, null `validTo` = open current version
    * matching forever, facts before their key's first version keep a
    * null payload. SCD2 intervals are disjoint per key, so the output
    * is exactly one row per fact under either strategy.
    *
    * Output: all fact columns ++ `payload` (from the dimension).
    * `factTime`/`validFrom`/`validTo` must be mutually comparable; for
    * [[BucketedProbe]] they must additionally map to numbers via `num`
    * (monotone, e.g. `unix_date(to_date(_))` for yyyy-MM-dd strings —
    * the residual compares the mapped numbers, so monotonicity is what
    * keeps the two strategies row-identical). Open intervals are capped
    * at max(fact time)+1 — a broadcast 1-row stat frame — so an open
    * interval explodes into the observed probe range's buckets, never a
    * sentinel-infinity's. */
  def asOf(facts: DataFrame, factKey: String, factTime: String,
           dim: DataFrame, dimKey: String, validFrom: String,
           validTo: String, payload: Seq[String],
           strategy: AsOfStrategy = BroadcastProbe,
           num: Column => Column = identity): DataFrame = strategy match {
    case BroadcastProbe =>
      val factCols = facts.columns.toSeq.map(facts(_))
      facts.join(broadcast(dim),
          facts(factKey) === dim(dimKey) &&
            dim(validFrom) <= facts(factTime) &&
            (dim(validTo).isNull || facts(factTime) < dim(validTo)),
          "left")
        .select(factCols ++ payload.map(dim(_)): _*)
    case BucketedProbe(w) =>
      val factsN = facts.withColumn("_t", num(col(factTime)).cast("long"))
      val cap = factsN.agg((max(col("_t")) + 1).as("_cap"))
      val dimN = dim
        .withColumn("_s", num(col(validFrom)).cast("long"))
        .crossJoin(broadcast(cap))
        .withColumn("_e",
          coalesce(num(col(validTo)).cast("long"), col("_cap")))
        // versions opening after every probe can never match — don't
        // explode them (their open-capped interval would be empty or
        // inverted anyway)
        .filter(col("_s") < col("_e"))
        .drop("_cap")
      graft.operators.RangeJoin.pointInIntervalLeft(
          factsN, factKey, "_t", dimN, dimKey, "_s", "_e", payload, w)
        .drop("_t")
  }
}
