package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Multi-touch attribution — credit each conversion's preceding touch
  * events within a lookback window under the three standard models
  * (first-touch, last-touch, linear), the marketing-warehouse twin of
  * the reference's event ingestion (its `events` stream records the
  * touches; the reference never aggregates them — extension surface
  * like q136/q138, and the q149 conversion-latency machinery's
  * natural completion).
  *
  * The naive lowering is a per-user RANGE join (touch.ts ∈
  * (conv.ts − L, conv.ts]) whose pair expansion is touches-in-window ×
  * conversions — quadratic on hot users and unbounded at 100 TB. This
  * computes the same credits with NO range join, riding the
  * [[AsOfJoin]] union trick twice over per-channel RUNNING COUNTS:
  *
  *   1. touches annotate per user (one hash exchange): `idx` =
  *      row_number, `cum_<ch>` = running touch count per channel —
  *      a prefix-sum timeline of the user's touch history;
  *   2. every conversion as-of probes the timeline at `ts` (counts
  *      and last channel AT conversion) and at `ts − L` (counts AT
  *      the window start) — window counts are the DIFFERENCE of two
  *      prefix reads, the Fenwick idiom, each probe one backward
  *      as-of (union + window, no join, inclusive at the probe);
  *   3. the first touch INSIDE the window is the raw touch with
  *      `idx = n0 + 1` — one equi-join on (user, idx), never a scan
  *      back through the window.
  *
  * Credits per attributed conversion (n1 > n0): first-touch → that
  * idx-(n0+1) touch's channel; last-touch → the as-of-at-`ts` channel
  * (inside the window whenever any touch is); linear → each channel
  * `(c1 − c0) · 10^6 div (n1 − n0)` — INTEGER millionths (the e6
  * discipline: bigint sums hash identically across engines; the ≤
  * (n−1)/10^6 truncation shortfall per conversion is the documented
  * price). Touches at exactly `ts − L` fall outside, at exactly `ts`
  * inside — half-open (ts − L, ts], the q186 interval convention.
  *
  * Scale shape: three user-hash exchanges (annotate, two as-of
  * unions) + one conversions-scale equi-join — everything linear in
  * events, per-user state never materializes a window's touch set.
  * Ties: touch order is (ts, tie); multiple touches on one timestamp
  * collapse to their last row for the as-of timeline (prefix counts
  * are taken AFTER the whole tie group — deterministic), while
  * first-touch reads the RAW sequence, so an intra-group first is
  * still found by its own idx.
  */
object Attribution {

  /** Per-conversion credit columns. `touches`: (`user`, `ts`,
    * `channel`, `tie`) — `tie` breaks equal-timestamp touch order
    * (a unique event id). `conversions`: (`user`, `ts`) + any
    * passthrough columns, preserved on the output. Adds: `n_touches`
    * (in-window count; 0 ⇒ unattributed, credit columns null),
    * `first_ch`, `last_ch`, and `lin_<ch>_e6` per channel. `lookback`
    * must subtract from `ts`'s type — an interval for timestamps, a
    * µs literal for the `ts_us` long clock. */
  def perConversion(touches: DataFrame, conversions: DataFrame,
                    channels: Seq[String], lookback: Column): DataFrame = {
    require(channels.nonEmpty, "attribution needs at least one channel")
    val w = Window.partitionBy(col("user")).orderBy(col("ts"), col("tie"))
    val annotated = touches
      .withColumn("idx", row_number().over(w))
      .withColumns(channels.map(ch => s"cum_$ch" ->
        sum(when(col("channel") === ch, 1L).otherwise(0L)).over(w)).toMap)
    // unique (user, ts) rows for the as-of timeline: the LAST row of
    // each tie group carries the whole group's prefix counts
    val groupAggs = Seq(max(col("idx")).as("idx"),
      max_by(col("channel"), col("idx")).as("channel")) ++
      channels.map(ch => max(col(s"cum_$ch")).as(s"cum_$ch"))
    val grouped = annotated
      .groupBy(col("user"), col("ts"))
      .agg(groupAggs.head, groupAggs.tail: _*)
    val convSide = Seq(col("user"), col("ts"), col("idx").as("n1"),
      col("channel").as("last_ch")) ++
      channels.map(ch => col(s"cum_$ch").as(s"c1_$ch"))
    val atConv = AsOfJoin.backward(
      conversions, "user", "ts", grouped.select(convSide: _*),
      "user", "ts", Seq("n1", "last_ch") ++ channels.map(ch => s"c1_$ch"))
    val startSide = Seq(col("user"), col("ts"), col("idx").as("n0")) ++
      channels.map(ch => col(s"cum_$ch").as(s"c0_$ch"))
    val atStart = AsOfJoin.backward(
      atConv.withColumn("ts0", col("ts") - lookback),
      "user", "ts0", grouped.select(startSide: _*),
      "user", "ts", Seq("n0") ++ channels.map(ch => s"c0_$ch"))
    val counted = atStart
      .withColumn("_n1", coalesce(col("n1"), lit(0)))
      .withColumn("_n0", coalesce(col("n0"), lit(0)))
      .withColumn("n_touches", col("_n1") - col("_n0"))
    val firsts = annotated.select(col("user").as("_fu"),
      col("idx").as("_fidx"), col("channel").as("_fch"))
    counted
      .join(firsts, col("user") === col("_fu") &&
        col("_fidx") === col("_n0") + 1 && col("n_touches") > 0, "left")
      .withColumn("first_ch", col("_fch"))
      .withColumn("last_ch",
        when(col("n_touches") > 0, col("last_ch")))
      .withColumns(channels.map(ch => s"lin_${ch}_e6" ->
        when(col("n_touches") > 0,
          expr(s"(coalesce(c1_$ch, 0L) - coalesce(c0_$ch, 0L)) " +
            s"* 1000000L div (_n1 - _n0)"))).toMap)
      .drop((Seq("ts0", "n1", "n0", "_n1", "_n0", "_fu", "_fidx", "_fch") ++
        channels.flatMap(ch => Seq(s"c1_$ch", s"c0_$ch"))): _*)
  }

  /** The per-channel rollup: one row per channel with first/last
    * conversion counts and summed linear credit (e6). ONE aggregation
    * pass over [[perConversion]] + a bounded `stack` unpivot. */
  def byChannel(perConv: DataFrame, channels: Seq[String]): DataFrame = {
    val aggs = channels.flatMap { ch =>
      Seq(sum(when(col("first_ch") === ch, 1L).otherwise(0L)).as(s"f_$ch"),
        sum(when(col("last_ch") === ch, 1L).otherwise(0L)).as(s"l_$ch"),
        sum(coalesce(col(s"lin_${ch}_e6"), lit(0L))).as(s"lin_$ch"))
    }
    val one = perConv.agg(aggs.head, aggs.tail: _*)
    val stack = channels.map(ch =>
      s"'$ch', f_$ch, l_$ch, lin_$ch").mkString(", ")
    one.selectExpr(s"stack(${channels.size}, $stack) AS " +
      "(channel, first_touch, last_touch, linear_e6)")
  }
}
