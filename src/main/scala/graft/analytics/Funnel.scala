package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion funnel — q200's operator surface: users
  * progressing through an ordered step sequence with
  * earliest-completion semantics. Stage i's floor is the FIRST event
  * of step type i at-or-after the previous stage's floor and within
  * `window` of it (stage 0: the first step-0 event, unconditioned).
  *
  * The batch build is k chained min-over-partition windows — each
  * stage's predicate reads the previous stage's column — which
  * Catalyst stacks on ONE user-hash exchange and one sort (PlanSpec
  * pins it for q200). No joins, no re-shuffle per stage.
  *
  * [[fold]] is the incremental twin (q203; the q187/q197 fold family):
  * per-user state is the k floors + the event-time frontier + the
  * frontier's same-ts tie group — O(1 + tie group) per user, nothing
  * history-scale is retained — and folding a batch is the SAME chained
  * windows over (batch ∪ tie-group replay), seeded with the stored
  * floors. Why that state suffices: stages fill once, in order, and
  * under the at-or-after-frontier contract the only OLD event a new
  * batch can make qualify is one AT the frontier instant (any other
  * old event precedes every possible new floor) — exactly the retained
  * tie group. fold ≡ rebuild is proven the q197 way: q203's oracle is
  * q200's full-replay SQL verbatim. */
object Funnel {

  /** Per-user stage floors over the full event history. Input columns:
    * (`user`, `ts`, `step`); output: one row per user with `f_<step>`
    * floor columns (null = stage never completed). */
  def stages(events: DataFrame, steps: Seq[String],
             window: Column): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      "funnel steps must be non-empty and distinct")
    val w = Window.partitionBy(col("user"))
    val withFloors = steps.zipWithIndex.foldLeft(events) {
      case (df, (st, i)) =>
        val hit =
          if (i == 0) when(col("step") === st, col("ts"))
          else {
            val prev = col(s"f_${steps(i - 1)}")
            when(col("step") === st && col("ts") >= prev &&
              col("ts") < prev + window, col("ts"))
          }
        df.withColumn(s"f_$st", min(hit).over(w))
    }
    withFloors.groupBy(col("user"))
      .agg(max(col(s"f_${steps.head}")).as(s"f_${steps.head}"),
        steps.tail.map(st => max(col(s"f_$st")).as(s"f_$st")): _*)
  }

  /** The bounded funnel summary over [[stages]] output (or [[fold]]
    * state): stage counts + step-over-step conversion in integer e4. */
  def summary(floors: DataFrame, steps: Seq[String]): DataFrame = {
    val counts = count(lit(1)).as("n_users") +:
      steps.map(st => count(col(s"f_$st")).as(s"stage_$st"))
    val one = floors.agg(counts.head, counts.tail: _*)
    val convs = steps.sliding(2).collect { case Seq(a, b) =>
      s"(stage_$b * 10000) div greatest(stage_$a, 1) AS conv_${b}_e4"
    }.toSeq
    one.selectExpr("n_users" +: steps.map(st => s"stage_$st") ++:
      convs: _*)
  }

  /** Fold a batch of events into stored per-user funnel state
    * (`user`, `f_<step>`..., `frontier`). Empty state via
    * [[initState]]. Returns the new state; [[summary]] reads it.
    *
    * Append-only contract, enforced loudly (the [[Attribution.fold]]
    * guard): every batch event must be AT-OR-AFTER its user's stored
    * frontier. Equality is legal — a coarse-timestamp source
    * routinely splits a same-ts tie group across micro-batches, and a
    * strict guard would wedge the stream on a history the batch
    * rebuild handles fine. What makes equality EXACT and not just
    * accepted: floors alone do not summarize the frontier instant (an
    * old event AT the frontier can qualify retroactively once a later
    * same-ts event sets the previous stage's floor — e.g. b@10 folded
    * before a@10 arrives must still yield f_b = 10), so the state
    * additionally retains the frontier tie group's step multiset
    * (`frontier_steps`, bounded by the tie-group size) and every fold
    * replays it as virtual events beside the batch.
    *
    * Scale shape: untouched users pass through a broadcast anti-join;
    * only the batch's users re-window, and the windows run over the
    * BATCH (+ tie-group) alone — state contributes k floors and one
    * tie group per user, never history. */
  def fold(state: DataFrame, events: DataFrame, steps: Seq[String],
           window: Column): DataFrame = {
    val users = events.select("user").distinct()
    val untouched = state.join(broadcast(users), Seq("user"), "left_anti")
    val touchedState = state.join(broadcast(users), Seq("user"), "left_semi")
    val seeds = touchedState.select(
      col("user") +: col("frontier").as("_sf") +:
        col("frontier_steps").as("_sfs") +:
        steps.map(st => col(s"f_$st").as(s"_s_$st")): _*)
    // when().otherwise(raise_error): pass/raise is branch-structural,
    // not reliant on Or-disjunct evaluation order
    val guarded = events.join(broadcast(seeds), Seq("user"), "left")
      .filter(when(col("_sf").isNull || col("ts") >= col("_sf"),
          lit(true))
        .otherwise(raise_error(concat(
          lit("funnel fold is append-only: event at "),
          col("ts").cast("string"), lit(" before stored frontier "),
          col("_sf").cast("string"),
          lit(" — backfill requires a rebuild from the raw event log")))))
    // the stored frontier tie group rides along as virtual events (its
    // floors contribution is idempotent — mins — and it is the ONLY
    // old history a same-ts continuation can still qualify)
    val virtual = seeds.filter(col("_sf").isNotNull)
      .select(Seq(col("user"), col("_sf"), col("_sfs")) ++
        steps.map(st => col(s"_s_$st")): _*)
      .withColumn("step", explode(col("_sfs")))
      .withColumn("ts", col("_sf"))
      .select(guarded.columns.map(col).toSeq: _*)
    val replay = guarded.unionByName(virtual)
    // the same chained windows as [[stages]], seeded with the stored
    // floors: a stage already set stays set (floors only fill once)
    val w = Window.partitionBy(col("user"))
    val withFloors = steps.zipWithIndex.foldLeft(replay) {
      case (df, (st, i)) =>
        val hit =
          if (i == 0) when(col("step") === st, col("ts"))
          else {
            val prev = col(s"f_${steps(i - 1)}")
            when(col("step") === st && col("ts") >= prev &&
              col("ts") < prev + window, col("ts"))
          }
        df.withColumn(s"f_$st",
          coalesce(col(s"_s_$st"), min(hit).over(w)))
    }
    val folded = withFloors
      .withColumn("_front", max(col("ts")).over(w))
      .groupBy(col("user"))
      .agg(max(col("_front")).as("frontier"),
        array_sort(collect_list(when(col("ts") === col("_front"),
          col("step")))).as("frontier_steps") +:
          steps.map(st => max(col(s"f_$st")).as(s"f_$st")): _*)
      .select(state.columns.map(col): _*)
    untouched.unionByName(folded)
  }

  /** Empty fold state with the right schema. */
  def initState(events: DataFrame, steps: Seq[String]): DataFrame =
    stages(events.limit(0), steps, lit(0L))
      .withColumn("frontier", lit(null).cast("long"))
      .withColumn("frontier_steps",
        lit(null).cast("array<string>"))
}
