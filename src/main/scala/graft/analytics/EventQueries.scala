package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{AsOfJoin, RangeJoin}

/** Event-time operators over the harness `events` table: as-of join,
  * gap sessionization, session windows, tumbling windows, range join.
  * The reference has no temporal operators (SURVEY §2 E/I — "entirely
  * absent") — these are the extension surface a training-data /
  * telemetry pipeline needs, each with a DuckDB oracle.
  *
  * Precision note: every temporal comparison here is done on **epoch
  * micros** (`ts_us`, Long) so both engines order and bucket
  * identically whatever the generator wrote `ts` as — see
  * [[Tables.tsUs]] for the ns-Long / µs-NTZ schema handling; the
  * oracle side is uniformly `epoch_us(ts)`.
  */
object EventQueries {
  import Tables._

  private val US_PER_HOUR = 3600L * 1000000L

  /** events with `ts_us` (epoch micros, Long) — the canonical clock,
    * derived schema-robustly by [[Tables.tsUs]] (the generator has
    * shipped both ns-Long and µs-NTZ encodings of `ts`; µs is the one
    * clock both engines agree on). Shared with ExtendedQueries — the
    * micro-second convention must have exactly one definition. */
  private[analytics] def ev(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.withColumn("ts_us", Tables.tsUs(e))
  }

  /** q169's round-`r` DuckDB CTEs — the exponential-mechanism peel
    * unrolled (static SQL cannot loop): weight, cumulative interval,
    * draw, winner, and the next round's candidate set. `g$r` must
    * exist (g1 is the counts rollup); emits w/c/s$r and g${r+1}.
    * Every aggregate is cast back to BIGINT (DuckDB sums BIGINT into
    * HUGEINT, which would drift the schema AND the mod arithmetic). */
  private def duckTopkRound(r: Int): String = {
    val u = DpNoise.duckUniformModSql(s"'topk|r$r'", "total_weight")
    s"""
    w$r AS (SELECT event_type, n,
              (CAST(1 AS BIGINT) << CAST(40 - least(
                 (SELECT max(n) FROM g$r) - n, 40) AS INT)) AS weight
            FROM g$r),
    c$r AS (SELECT event_type, n, weight,
              CAST(sum(weight) OVER (ORDER BY event_type
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
              CAST((SELECT sum(weight) FROM w$r) AS BIGINT)
                AS total_weight
            FROM w$r),
    s$r AS (SELECT CAST($r AS BIGINT) AS topk_rank, event_type, n,
              weight, total_weight, CAST($u AS BIGINT) AS draw
            FROM c$r WHERE $u >= cum - weight AND $u < cum),
    g${r + 1} AS (SELECT event_type, n FROM g$r
              WHERE event_type NOT IN (SELECT event_type FROM s$r))"""
  }

  /** q173's per-quantile DuckDB CTEs — the exponential-mechanism
    * quantile draw unrolled: cumulative ranks over the bucket counts
    * `bg`, distance to the ceil(q·n) target, max-shifted clipped
    * base-2 weights, cumulative interval, PRF draw, winner. Every
    * aggregate cast back to BIGINT (HUGEINT drift). */
  private def duckQuantRound(qpct: Int): String = {
    val u = DpNoise.duckUniformModSql(s"'quantile|p$qpct'", "total_weight")
    s"""
    qa$qpct AS (SELECT b, cnt,
               CAST(sum(cnt) OVER (ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               ((SELECT n FROM nn) * $qpct + 99) // 100 AS t
             FROM bg),
    qb$qpct AS (SELECT b, cnt, cum, t, abs(cum - t) AS d FROM qa$qpct),
    qc$qpct AS (SELECT b, cnt, cum, t, d,
               (CAST(1 AS BIGINT) << CAST(40 - least(
                  d - (SELECT min(d) FROM qb$qpct), 40) AS INT)) AS weight
             FROM qb$qpct),
    qd$qpct AS (SELECT *, CAST(sum(weight) OVER (ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cw,
               CAST((SELECT sum(weight) FROM qc$qpct) AS BIGINT)
                 AS total_weight
             FROM qc$qpct),
    qs$qpct AS (SELECT CAST($qpct AS BIGINT) AS q_pct, b AS bucket,
               b * 200 AS lo_cents, b * 200 + 200 AS hi_cents,
               cnt, cum, t AS target_rank, weight, total_weight,
               CAST($u AS BIGINT) AS draw
             FROM qd$qpct WHERE $u >= cw - weight AND $u < cw)"""
  }

  /** Purchases deduped per (user_id, ts_us) keeping the highest
    * event_id — ns ties collapse under µs truncation; both as-of joins
    * (q30 backward, q47 forward) and their oracles use this exact
    * tiebreak. */
  private[analytics] def purchasesDeduped(e: DataFrame,
                                          valueAlias: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("ts_us"))
      .orderBy(col("event_id").desc)
    e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn", "event_id")
      .withColumnRenamed("value", valueAlias)
  }

  /** Channels/lookback/inputs for the attribution family — ONE
    * definition for q188/q196/q197 and the streaming twin's spec, so
    * a window-semantics change cannot diverge the models. */
  private[graft] val attributionChannels = Seq("click", "view")
  private[graft] val attributionLookback = lit(7L * 86400 * 1000000)
  private[graft] def attributionInputs(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val e = ev(s, d)
    val touches = e.filter(col("event_type").isin(attributionChannels: _*))
      .select(col("user_id").as("user"), col("ts_us").as("ts"),
        col("event_type").as("channel"), col("event_id").as("tie"))
    val conversions = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("user"), col("ts_us").as("ts"))
    (touches, conversions)
  }

  /** The naive-range-join window census CTEs every attribution oracle
    * replays: per-conversion window rows (w), counts/extremes (per),
    * first/last channels (fl). */
  private val attributionWindowCtes = """t AS (
          SELECT user_id AS u, epoch_us(ts) AS ts,
                 event_type AS ch,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS idx
          FROM events WHERE event_type IN ('click', 'view')),
        c AS (SELECT user_id AS u, epoch_us(ts) AS ts, event_id AS cid
              FROM events WHERE event_type = 'purchase'),
        w AS (SELECT c.cid, t.ch, t.idx
              FROM c JOIN t ON t.u = c.u
                AND t.ts > c.ts - 604800000000 AND t.ts <= c.ts),
        per AS (SELECT cid, count(*) AS n, min(idx) AS fidx,
                       max(idx) AS lidx
                FROM w GROUP BY cid),
        fl AS (SELECT p.cid, f.ch AS first_ch, l.ch AS last_ch
               FROM per p
               JOIN w f ON f.cid = p.cid AND f.idx = p.fidx
               JOIN w l ON l.cid = p.cid AND l.idx = p.lidx)"""

  /** q188's full-replay oracle — also q197's verbatim (fold≡rebuild,
    * the q187 discipline). */
  private val attributionOracle = s"""
        WITH $attributionWindowCtes,
        lin AS (SELECT wch.ch,
                       CAST(sum((wch.k * 1000000) // p.n) AS BIGINT) AS lin
                FROM (SELECT cid, ch, count(*) AS k
                      FROM w GROUP BY cid, ch) wch
                JOIN per p USING (cid) GROUP BY wch.ch)
        SELECT chs.ch AS channel,
               coalesce(f.cnt, 0) AS first_touch,
               coalesce(l.cnt, 0) AS last_touch,
               coalesce(lin.lin, 0) AS linear_e6
        FROM (VALUES ('click'), ('view')) chs(ch)
        LEFT JOIN (SELECT first_ch AS ch, count(*) AS cnt
                   FROM fl GROUP BY 1) f ON f.ch = chs.ch
        LEFT JOIN (SELECT last_ch AS ch, count(*) AS cnt
                   FROM fl GROUP BY 1) l ON l.ch = chs.ch
        LEFT JOIN lin ON lin.ch = chs.ch
        ORDER BY channel"""

  /** q198's full-replay time-decay oracle — also q206's VERBATIM (the
    * fold-twin hash match IS the fold ≡ rebuild proof, the q205
    * discipline). */
  private val decayOracle = """
        WITH t AS (SELECT user_id AS u, epoch_us(ts) AS ts,
                          event_type AS ch
                   FROM events WHERE event_type IN ('click', 'view')),
        c AS (SELECT user_id AS u, epoch_us(ts) AS ts
              FROM events WHERE event_type = 'purchase'),
        w AS (SELECT t.ch,
                     65536 >> CAST((c.ts - t.ts) // 86400000000 AS INT)
                       AS w
              FROM c JOIN t ON t.u = c.u
                AND t.ts > c.ts - 604800000000 AND t.ts <= c.ts)
        SELECT chs.ch AS channel,
               coalesce(s.dw, 0) AS decay_w,
               coalesce(s.n, 0) AS n_weighted
        FROM (VALUES ('click'), ('view')) chs(ch)
        LEFT JOIN (SELECT ch, CAST(sum(w) AS BIGINT) AS dw,
                          count(*) AS n
                   FROM w GROUP BY ch) s ON s.ch = chs.ch
        ORDER BY channel"""

  /** q199's full-replay 2-channel Markov oracle — also q205's verbatim
    * (fold≡rebuild, the q187/q197 discipline): the whole chain window +
    * 12-cell count + guarded closed form, matching
    * [[Attribution.markovFromCounts]] step for step. */
  private val markov2Oracle = """
        WITH ev AS (
          SELECT user_id AS u, epoch_us(ts) AS ts,
                 CASE WHEN event_type = 'purchase'
                      THEN 9223372036854775807 ELSE event_id END AS tie,
                 CASE WHEN event_type = 'purchase' THEN 'CONV'
                      ELSE event_type END AS st
          FROM events
          WHERE event_type IN ('click', 'view', 'purchase')),
        tr AS (SELECT st,
                      coalesce(lag(st) OVER w, 'CONV') AS prev,
                      lead(st) OVER w AS nxt
               FROM ev WINDOW w AS (PARTITION BY u ORDER BY ts, tie)),
        cells AS (
          SELECT CASE WHEN prev = 'CONV' THEN 'S' ELSE prev END
                   AS from_st, st AS to_st FROM tr
          UNION ALL
          SELECT st, 'NULL' FROM tr WHERE st <> 'CONV' AND nxt IS NULL),
        m AS (SELECT
            CAST(sum(CASE WHEN from_st='S' AND to_st='click' THEN 1 ELSE 0 END) AS BIGINT) AS nsc,
            CAST(sum(CASE WHEN from_st='S' AND to_st='view' THEN 1 ELSE 0 END) AS BIGINT) AS nsv,
            CAST(sum(CASE WHEN from_st='S' AND to_st='CONV' THEN 1 ELSE 0 END) AS BIGINT) AS nsk,
            CAST(sum(CASE WHEN from_st='click' AND to_st='click' THEN 1 ELSE 0 END) AS BIGINT) AS ncc,
            CAST(sum(CASE WHEN from_st='click' AND to_st='view' THEN 1 ELSE 0 END) AS BIGINT) AS ncv,
            CAST(sum(CASE WHEN from_st='click' AND to_st='CONV' THEN 1 ELSE 0 END) AS BIGINT) AS nck,
            CAST(sum(CASE WHEN from_st='click' AND to_st='NULL' THEN 1 ELSE 0 END) AS BIGINT) AS ncn,
            CAST(sum(CASE WHEN from_st='view' AND to_st='click' THEN 1 ELSE 0 END) AS BIGINT) AS nvc,
            CAST(sum(CASE WHEN from_st='view' AND to_st='view' THEN 1 ELSE 0 END) AS BIGINT) AS nvv,
            CAST(sum(CASE WHEN from_st='view' AND to_st='CONV' THEN 1 ELSE 0 END) AS BIGINT) AS nvk,
            CAST(sum(CASE WHEN from_st='view' AND to_st='NULL' THEN 1 ELSE 0 END) AS BIGINT) AS nvn
          FROM cells),
        r AS (SELECT *, nsc + nsv + nsk AS rs,
                     ncc + ncv + nck + ncn AS rc,
                     nvc + nvv + nvk + nvn AS rv FROM m),
        base AS (SELECT *,
                   (rc - ncc) * (rv - nvv) - ncv * nvc AS det,
                   nck * (rv - nvv) + ncv * nvk AS acn,
                   (rc - ncc) * nvk + nvc * nck AS avn FROM r),
        probs AS (SELECT
            (nsc * ((acn * 1000000) // greatest(det, 1))
             + nsv * ((avn * 1000000) // greatest(det, 1))
             + nsk * 1000000) // greatest(rs, 1) AS as_e6,
            (nsv * ((nvk * 1000000) // greatest(rv - nvv, 1))
             + nsk * 1000000) // greatest(rs, 1) AS asc_e6,
            (nsc * ((nck * 1000000) // greatest(rc - ncc, 1))
             + nsk * 1000000) // greatest(rs, 1) AS asv_e6,
            nsk + nck + nvk AS total_conv
          FROM base),
        re AS (SELECT
            1000000 - (asc_e6 * 1000000) // greatest(as_e6, 1) AS re_c,
            1000000 - (asv_e6 * 1000000) // greatest(as_e6, 1) AS re_v,
            as_e6, total_conv
          FROM probs)
        SELECT chs.ch AS channel,
               CAST(CASE chs.ch WHEN 'click' THEN re_c ELSE re_v END
                 AS BIGINT) AS removal_e6,
               CAST(CASE chs.ch
                 WHEN 'click' THEN
                   (total_conv * re_c) // greatest(re_c + re_v, 1)
                 ELSE (total_conv * re_v) // greatest(re_c + re_v, 1) END
                 AS BIGINT) AS credited_conv,
               CAST(as_e6 AS BIGINT) AS p_conv_e6
        FROM re, (VALUES ('click'), ('view')) chs(ch)
        ORDER BY channel"""

  /** q202's channel set — alphabetical so the stacked output's
    * ORDER BY channel is stable. */
  private val markov3Channels = Seq("click", "signup", "view")

  /** q200/q203's funnel definition — ONE source for the batch build
    * and the incremental fold, so step semantics cannot diverge. */
  private val funnelSteps = Seq("signup", "click", "purchase")
  private def funnelEvents(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id").as("user"), col("ts_us").as("ts"),
        col("event_type").as("step"))

  /** The funnel floor CTE chain (signup→click→purchase windows) every
    * funnel oracle replays — ONE definition so q200/q203/q204 cannot
    * diverge on window or step semantics. */
  private val funnelFloorCtes = """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                          event_type AS ty
                   FROM events WHERE user_id IS NOT NULL),
        s1 AS (SELECT *, min(CASE WHEN ty = 'signup' THEN t END)
                 OVER (PARTITION BY u) AS s1 FROM e),
        c1 AS (SELECT *, min(CASE WHEN ty = 'click' AND t >= s1
                 AND t < s1 + 604800000000 THEN t END)
                 OVER (PARTITION BY u) AS c1 FROM s1),
        p1 AS (SELECT *, min(CASE WHEN ty = 'purchase' AND t >= c1
                 AND t < c1 + 604800000000 THEN t END)
                 OVER (PARTITION BY u) AS p1 FROM c1),
        pu AS (SELECT u, max(s1) AS s1, max(c1) AS c1, max(p1) AS p1
               FROM p1 GROUP BY u)"""

  /** q200's full-replay funnel oracle — also q203's verbatim
    * (fold≡rebuild, the q187/q197 discipline). */
  private val q200OracleSql = s"""
        $funnelFloorCtes
        SELECT count(*) AS n_users,
               count(s1) AS stage_signup,
               count(c1) AS stage_click,
               count(p1) AS stage_purchase,
               (count(c1) * 10000) // greatest(count(s1), 1)
                 AS conv_click_e4,
               (count(p1) * 10000) // greatest(count(c1), 1)
                 AS conv_purchase_e4
        FROM pu"""

  val queries: Map[String, QuerySpec] = Map(

    // ── as-of join (backward, inclusive) ───────────────────────────
    // For every click, the value of the user's latest purchase at or
    // before the click. Union + running-last-value trick: ONE shuffle
    // on user_id (operators/AsOfJoin.scala) vs the theta-join
    // explosion a naive formulation gives.
    "q30_asof_join" -> QuerySpec(
      build = (s, d) => {
        val e = ev(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val purchases = purchasesDeduped(e, "last_purchase_value")
        AsOfJoin.backward(clicks, "user_id", "ts_us",
            purchases, "user_id", "ts_us", Seq("last_purchase_value"))
          .select(col("event_id"), col("user_id"),
            col("last_purchase_value"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH e AS (SELECT event_id, ts, user_id, event_type, value,
                          epoch_us(ts) AS ts_us FROM events),
        p AS (
          SELECT user_id AS u, ts_us AS t, value AS v
          FROM (SELECT user_id, ts_us, value, ROW_NUMBER() OVER (
                  PARTITION BY user_id, ts_us ORDER BY event_id DESC) AS rn
                FROM e WHERE event_type = 'purchase')
          WHERE rn = 1)
        SELECT event_id, user_id, p.v AS last_purchase_value
        FROM (SELECT * FROM e WHERE event_type = 'click') c
        ASOF LEFT JOIN p ON c.user_id = p.u AND c.ts_us >= p.t
        ORDER BY event_id"""),
      bench = true),

    // ── gap sessionization (manual: lag + cumulative flag sum) ─────
    // New session when the gap since the previous event of the same
    // user exceeds 30 min. One shuffle on user_id; both window passes
    // share the same (user_id | ts) sort.
    "q31_sessionize" -> QuerySpec(
      build = (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        val sessions = ev(s, d)
          .withColumn("_prev", lag(col("ts_us"), 1).over(byUser))
          .withColumn("_new",
            when(col("_prev").isNull ||
              col("ts_us") - col("_prev") > gapUs, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        sessions.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n")).as("max_session_events"),
            sum(col("n")).as("n_events"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
        flagged AS (
          SELECT user_id, ts_us, event_id,
                 CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
                        OR lag(ts_us) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        sess AS (
          SELECT user_id,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n
          FROM sess GROUP BY user_id, session_id)
        SELECT user_id, count(*) AS n_sessions,
               max(n) AS max_session_events,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM per_session GROUP BY user_id ORDER BY user_id""")),

    // ── session_window (Spark-native session windows, batch) ───────
    // Spark semantics: events merge while next_ts < prev_ts + gap, so
    // a NEW session starts at diff >= gap; window end = last ts + gap.
    "q32_session_window" -> QuerySpec(
      build = (s, d) => ev(s, d)
        .withColumn("ts_t", timestamp_micros(col("ts_us")))
        .groupBy(col("user_id"), session_window(col("ts_t"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      oracle = Some("""
        WITH t AS (
          SELECT user_id, epoch_us(ts) AS ts_us, value,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                        OR lag(epoch_us(ts)) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
        sess AS (
          SELECT user_id, ts_us, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM t)
        SELECT user_id,
               make_timestamp(min(ts_us)) AS session_start,
               make_timestamp(max(ts_us) + 1800000000) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start""")),

    // ── tumbling event-time windows ────────────────────────────────
    "q33_hourly_windows" -> QuerySpec(
      build = (s, d) => ev(s, d)
        .withColumn("ts_t", timestamp_micros(col("ts_us")))
        .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("hour", "event_type"),
      oracle = Some("""
        SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
      bench = true),

    // ── range join (point-in-interval, bucketed equi-join) ─────────
    // Clicks landing inside the 1-hour window after each purchase of
    // the same user. operators/RangeJoin.scala: grid-bucketed so it's
    // a hash join, not a nested loop (the oracle's theta join is the
    // semantics, not the plan).
    "q34_range_join" -> QuerySpec(
      build = (s, d) => {
        val e = ev(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"),
            col("event_id").as("click_id"))
        val intervals = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts_us").as("p_start"),
            (col("ts_us") + lit(US_PER_HOUR)).as("p_end"),
            col("event_id").as("purchase_id"))
        RangeJoin.pointInInterval(
            clicks, "user_id", "ts_us",
            intervals, "p_user", "p_start", "p_end",
            Seq("purchase_id"), bucketWidth = US_PER_HOUR)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("click_id")).as("n_clicks"),
            countDistinct(col("purchase_id")).as("n_purchases"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_us(ts) AS ts_us FROM events)
        SELECT c.user_id, count(*) AS n_pairs,
               count(DISTINCT c.event_id) AS n_clicks,
               count(DISTINCT p.event_id) AS n_purchases
        FROM (SELECT * FROM e WHERE event_type = 'click') c
        JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND c.ts_us >= p.ts_us AND c.ts_us < p.ts_us + 3600000000
        GROUP BY c.user_id ORDER BY c.user_id""")),

    // ── half-life decayed engagement counters ──────────────────────
    // The trending/recency score a feed or feature store keeps per
    // (user, event type): each event contributes 65536 >> age_days —
    // an exact power-of-two half-life (one day = one halving, floored
    // at 2^-16) instead of exp(-λ·age), so the score is INTEGER and
    // order-free exact in both engines (no transcendentals, no FP
    // summation order). Reference instant = max event time (a 1-row
    // lazy broadcast, the q111 stats pattern); the aggregation is one
    // map-side-combined groupBy — corpus-scale cost is the scan.
    "q133_decayed_counts" -> QuerySpec(
      build = (s, d) => {
        val e = ev(s, d)
        val ref = e.agg(max(col("ts_us")).as("ref_us"))
        e.crossJoin(broadcast(ref))
          .withColumn("age_d",
            expr("CAST((ref_us - ts_us) div 86400000000 AS INT)"))
          .withColumn("w",
            expr("CAST(shiftright(65536, least(age_d, 16)) AS BIGINT)"))
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("w")).as("decay_score"))
          .orderBy("user_id", "event_type")
      },
      oracle = Some("""
        WITH ref AS (SELECT max(epoch_us(ts)) ref_us FROM events),
        w AS (SELECT user_id, event_type,
                65536 >> least(CAST((ref.ref_us - epoch_us(ts))
                  // 86400000000 AS INT), 16) w
              FROM events, ref)
        SELECT user_id, event_type, count(*) n_events,
               CAST(sum(w) AS BIGINT) decay_score
        FROM w GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ── cohort retention (day grain — the corpus spans ~1 month) ───
    // The activation/retention matrix a product-analytics pipeline
    // computes daily: users cohorted by FIRST-seen day, per (cohort,
    // day-offset ≤ 7) distinct active users and the retention rate in
    // integer e4 (order-free exact). Shape: ONE user-keyed exchange
    // serves the (user, day) dedup AND the per-user first-day window
    // (subset clustering), then one bounded (cohort, offset) agg; the
    // cohort-size denominator is a window over the offset-0 rows of
    // that SAME tiny aggregate — nothing event-scale moves twice.
    "q138_cohort_retention" -> QuerySpec(
      build = (s, d) => {
        val act = ev(s, d)
          .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
          .repartition(col("user_id"))
          .distinct()
        val ret = act
          .withColumn("cohort_day",
            min(col("day")).over(Window.partitionBy(col("user_id"))))
          .withColumn("offset_d", col("day") - col("cohort_day"))
          .filter(col("offset_d") <= 7)
          .groupBy(col("cohort_day"), col("offset_d"))
          .agg(count(lit(1)).as("n_active"))
        // denominator via a window over the TINY aggregated frame — a
        // self-join on the offset-0 slice would duplicate the whole
        // event-scale subtree into the broadcast side (PlanSpec pins
        // the single scan)
        ret
          .withColumn("_n_cohort",
            max(when(col("offset_d") === 0, col("n_active")))
              .over(Window.partitionBy(col("cohort_day"))))
          .select(col("cohort_day"), col("offset_d"), col("n_active"),
            expr("n_active * 10000 div _n_cohort").as("retention_e4"))
          .orderBy("cohort_day", "offset_d")
      },
      oracle = Some("""
        WITH act AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 86400000000 AS day
                     FROM events),
        f AS (SELECT user_id, day,
                     min(day) OVER (PARTITION BY user_id) cohort_day
              FROM act),
        r AS (SELECT cohort_day, day - cohort_day AS offset_d,
                     count(*) n_active
              FROM f WHERE day - cohort_day <= 7 GROUP BY 1, 2),
        s AS (SELECT cohort_day, n_active AS n_cohort FROM r
              WHERE offset_d = 0)
        SELECT r.cohort_day, r.offset_d, r.n_active,
               r.n_active * 10000 // s.n_cohort AS retention_e4
        FROM r JOIN s USING (cohort_day)
        ORDER BY r.cohort_day, r.offset_d"""),
      bench = true),

    // ── hourly volume anomalies (robust median/MAD flagging) ───────
    // The pipeline-health monitor an event feed runs continuously:
    // per event type, hourly counts scored against the type's own
    // MEDIAN and MAD (median absolute deviation) — the robust pair
    // that a traffic spike can't poison the way it poisons mean/σ
    // (one 10× hour drags a mean-based threshold; the median barely
    // moves). An hour is anomalous when |c − med| > 3·max(MAD, 1) —
    // the MAD floor keeps a perfectly flat type (MAD 0) from flagging
    // every ±1 jitter. All-integer: nearest-rank (lower) medians, no
    // interpolation, so both engines pick the identical element.
    //
    // Scale shape: the ONE event-scale exchange is the hourly rollup
    // (map-side combined to |types|×|hours| rows — the persisted
    // frame every later step reads); medians/MAD/flags run on that
    // bounded frame (report-scale windows, never over raw events).
    // The worst hour rides out via one arg-max struct, not a join.
    "q145_hourly_anomalies" -> QuerySpec(
      build = (s, d) => {
        // MEMORY CONTRACT: |types|×|hours| rows — persisted so the
        // median pass, the MAD pass, and the final scan share one
        // event-scale rollup
        val counts = ev(s, d)
          .select(col("event_type"), expr("ts_us div 3600000000").as("hr"))
          .groupBy(col("event_type"), col("hr"))
          .agg(count(lit(1)).as("c"))
          .persist()
        val th = robustThresholds(counts)
        val dev = counts.join(broadcast(th), "event_type")
          .withColumn("dev", abs(col("c") - col("med")))
        dev
          .withColumn("anom",
            (col("dev") > lit(3) * greatest(col("mad"), lit(1L)))
              .cast("int"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            sum(col("anom")).cast("long").as("n_anom"),
            max(struct(col("dev"), (-col("hr")).as("_nh"), col("c")))
              .as("_w"))
          .select(col("event_type"), col("n_hours"), col("med"),
            col("mad"), col("n_anom"),
            (-col("_w._nh")).as("worst_hr"), col("_w.c").as("worst_c"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                          count(*) c
                   FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, min(c) med FROM (
                SELECT event_type, c,
                       row_number() OVER (PARTITION BY event_type
                         ORDER BY c, hr) rn,
                       count(*) OVER (PARTITION BY event_type) n
                FROM c) WHERE rn * 2 >= n GROUP BY 1),
        d AS (SELECT c.event_type, c.hr, c.c, m.med,
                     abs(c.c - m.med) dev
              FROM c JOIN m USING (event_type)),
        md AS (SELECT event_type, min(dev) mad FROM (
                 SELECT event_type, dev,
                        row_number() OVER (PARTITION BY event_type
                          ORDER BY dev, hr) rn,
                        count(*) OVER (PARTITION BY event_type) n
                 FROM d) WHERE rn * 2 >= n GROUP BY 1),
        f AS (SELECT d.event_type, d.hr, d.c, d.med, d.dev, md.mad,
                     CASE WHEN d.dev > 3 * greatest(md.mad, 1)
                          THEN 1 ELSE 0 END anom
              FROM d JOIN md USING (event_type)),
        w AS (SELECT event_type, hr worst_hr, c worst_c FROM (
                SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY dev DESC, hr ASC) rw FROM f)
              WHERE rw = 1)
        SELECT f.event_type, count(*) AS n_hours,
               CAST(max(f.med) AS BIGINT) AS med,
               CAST(max(f.mad) AS BIGINT) AS mad,
               CAST(sum(f.anom) AS BIGINT) AS n_anom,
               CAST(max(w.worst_hr) AS BIGINT) AS worst_hr,
               CAST(max(w.worst_c) AS BIGINT) AS worst_c
        FROM f JOIN w USING (event_type)
        GROUP BY 1 ORDER BY 1"""),
      bench = true),

    // ── conversion latency distribution (click → purchase) ─────────
    // The funnel-health number product analytics watches: for each
    // purchase, the time since the SAME user's most recent click (the
    // q30 backward as-of semantics, reversed to purchase-side), and
    // the latency distribution p50/p90/p99 in seconds from the
    // log-histogram sketch. Integer end to end: latency = integer-div
    // µs→s, quantiles are nearest-rank bucket lower bounds, max is
    // exact. A purchase with no preceding click counts in n_purchases
    // but carries no latency (null skips the sketch) — n_converted is
    // the funnel's numerator.
    //
    // Scale shape: the as-of join is the single-shuffle union trick
    // (operators/AsOfJoin — never a per-row subquery), then ONE
    // 2 KiB-state aggregate over the joined frame; the quantile
    // extraction is the window-free fold because the frame is 1 row.
    // An exact latency percentile would sort every conversion (the
    // q81 shape — fine once, wrong as a dashboard query).
    "q149_conversion_latency" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        val e = ev(s, d)
        // AsOfJoin's contract: the right side is unique per (key,
        // time). Today the payload IS the time so duplicate clicks
        // would tie harmlessly, but honoring the precondition (the
        // oracle's SELECT DISTINCT) keeps any future payload column
        // deterministic
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"),
            col("ts_us").as("click_ts"))
          .dropDuplicates("user_id", "ts_us")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), col("event_id"))
        val conv = graft.operators.AsOfJoin.backward(
            purchases, "user_id", "ts_us",
            clicks, "user_id", "ts_us", Seq("click_ts"))
          .withColumn("lat",
            when(col("click_ts").isNotNull,
              expr("(ts_us - click_ts) div 1000000")))
        val hist = toC(graft.plans.HistAgg(toE(col("lat")))
          .toAggregateExpression())
        def qb(p: Int) =
          expr(graft.plans.HistAgg.quantileBucketSql("_h", "_total", p))
        def lo(name: String) = expr(graft.plans.HistAgg.loSparkSql(name))
        conv.agg(count(lit(1)).as("n_purchases"),
            count(col("lat")).as("n_converted"),
            max(col("lat")).as("max_latency_s"),
            hist.as("_h"))
          .withColumn("_total",
            expr("aggregate(_h, CAST(0 AS BIGINT), (a, x) -> a + x)"))
          .withColumn("_b50", qb(50)).withColumn("_b90", qb(90))
          .withColumn("_b99", qb(99))
          .select(col("n_purchases"), col("n_converted"),
            lo("_b50").as("p50_lo"), lo("_b90").as("p90_lo"),
            lo("_b99").as("p99_lo"), col("max_latency_s"))
      },
      oracle = Some(s"""
        WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_us(ts) AS ts_us FROM events),
        c AS (SELECT DISTINCT user_id AS u, ts_us AS t FROM e
              WHERE event_type = 'click'),
        p AS (SELECT user_id, ts_us FROM e WHERE event_type = 'purchase'),
        j AS (SELECT p.ts_us, c.t AS click_ts
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.u AND p.ts_us >= c.t),
        l AS (SELECT (ts_us - click_ts) // 1000000 AS lat FROM j
              WHERE click_ts IS NOT NULL),
        bk AS (SELECT CASE WHEN lat < 8 THEN lat
                    ELSE ((length(bin(lat)) - 2) * 4
                          + ((lat >> (length(bin(lat)) - 3)) & 3))
               END AS b FROM l),
        c2 AS (SELECT b, count(*) c FROM bk GROUP BY 1),
        cum AS (SELECT b, c,
                  sum(c) OVER (ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
                  sum(c) OVER () total
                FROM c2),
        q AS (SELECT
                min(CASE WHEN cum * 100 >= 50 * total THEN b END) b50,
                min(CASE WHEN cum * 100 >= 90 * total THEN b END) b90,
                min(CASE WHEN cum * 100 >= 99 * total THEN b END) b99
              FROM cum)
        SELECT (SELECT count(*) FROM j) AS n_purchases,
               (SELECT count(*) FROM l) AS n_converted,
               ${graft.plans.HistAgg.loDuckSql("b50")} AS p50_lo,
               ${graft.plans.HistAgg.loDuckSql("b90")} AS p90_lo,
               ${graft.plans.HistAgg.loDuckSql("b99")} AS p99_lo,
               (SELECT CAST(max(lat) AS BIGINT) FROM l) AS max_latency_s
        FROM q"""),
      bench = true),

    // ── event transition matrix (Markov next-event structure) ──────
    // Per (from_type → to_type) over each user's time-ordered event
    // sequence: transition counts and integer-e4 row-stochastic
    // probabilities — the structure next-event prediction, funnel
    // design, and bot detection (a user whose transitions are too
    // deterministic) all read. Tie order is pinned (ts, then
    // event_id) so the sequence — and the matrix — is identical
    // cross-engine.
    //
    // Scale shape: sequence ops need the per-user order, so the ONE
    // event-scale exchange is the user-keyed sort window (lead);
    // the pair rollup map-side-combines to ≤|types|² rows and the
    // row totals come from a window over THAT tiny frame (the q138
    // denominator trick — never a second event-scale pass).
    // ── differentially-private count release (discrete Laplace) ────
    // The release half of the privacy story (q156 measures risk; this
    // is how a platform PUBLISHES corpus statistics anyway): per-type
    // event counts released under ε = ln 2 pure DP via the two-sided
    // geometric ("discrete Laplace") mechanism, P(Z=z) ∝ 2^{-|z|} —
    // the integer mechanism of Ghosh-Roughgarden-Sundararajan, so no
    // float noise and no transcendentals anywhere. The sampler is
    // pure integer arithmetic: a 60-bit md5 of (secret | release key)
    // maps to u ∈ [0, 3·2^40); u < 2^40 → z = 0; otherwise the
    // parity of v = u − 2^40 gives the sign and the count of leading
    // one-bits of v div 2 (in 40 bits) gives the magnitude —
    // P(k) = 2^{-k}, leftover mass clamped to k = 40 (the residue
    // reduction carries a documented ~2^-19 bias toward z = 0 — see
    // [[DpNoise]]). Both engines replay the identical bits, so the
    // release is hash-checked.
    //
    // Noise is a PRF of (secret, key) — both parts deliberate. The
    // SECRET ([[DpNoise.OracleSecret]] here, and ONLY here: this is
    // the verification twin, whose job is proving the mechanism's
    // arithmetic cross-engine; production releases pass
    // [[DpNoise.secretFromConf]] material the audience cannot know,
    // else the "noise" is recomputable and subtractable). The KEY
    // seeding gives stable noise per release key — the "consistent
    // noise" practice of production DP query systems (re-running a
    // release must NOT hand an attacker fresh samples to average
    // away); rotating the release epoch re-seeds. The exact count
    // rides along here so the oracle can audit the mechanism — a
    // production view drops it.
    // Scale shape: one map-side-combined event rollup; the mechanism
    // runs on the |types|-bounded frame.
    "q157_dp_release" -> QuerySpec(
      build = (s, d) =>
        ev(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("noise",
            DpNoise.noiseFor(col("event_type"), DpNoise.OracleSecret))
          .select(col("event_type"), col("n"), col("noise"),
            (col("n") + col("noise")).as("released"))
          .orderBy("event_type"),
      oracle = Some(s"""
        WITH g AS (SELECT event_type, count(*) n FROM events GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(${DpNoise.duckNoiseSql("event_type")} AS BIGINT)
                 AS noise,
               CAST(n + ${DpNoise.duckNoiseSql("event_type")} AS BIGINT)
                 AS released
        FROM g ORDER BY event_type"""),
      bench = true),

    // ── DP histogram release of the quasi-identifier marginal ──────
    // q156 flags the (type, dow, hod) cells as re-identification risk;
    // this is how the platform still PUBLISHES activity shape: the
    // (event_type, day-of-week) marginal histogram with per-cell
    // discrete-Laplace noise ([[DpNoise]]), each cell its own release
    // key. Cells partition the events, so this is PARALLEL composition
    // — the whole histogram costs one ε = ln 2, not |cells|·ε. The
    // exact count rides along for the oracle audit; a production view
    // drops it (the q157 convention).
    // Scale shape: one map-side-combined event rollup; the mechanism
    // runs on the |types|×7-bounded cell frame.
    "q159_dp_histogram" -> QuerySpec(
      build = (s, d) =>
        ev(s, d)
          .select(col("event_type"),
            expr("(ts_us div 86400000000 + 4) % 7").as("dow"))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n"))
          .withColumn("noise", DpNoise.noiseFor(
            concat(col("event_type"), lit("|"), col("dow")),
            DpNoise.OracleSecret))
          .select(col("event_type"), col("dow"), col("n"), col("noise"),
            (col("n") + col("noise")).as("released"))
          .orderBy("event_type", "dow"),
      oracle = Some(s"""
        WITH g AS (SELECT event_type,
                          (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                          count(*) n
                   FROM events GROUP BY 1, 2)
        SELECT event_type, CAST(dow AS BIGINT) AS dow,
               CAST(n AS BIGINT) AS n,
               CAST(${DpNoise.duckNoiseSql("event_type || '|' || dow::VARCHAR")}
                 AS BIGINT) AS noise,
               CAST(n + ${DpNoise.duckNoiseSql("event_type || '|' || dow::VARCHAR")}
                 AS BIGINT) AS released
        FROM g ORDER BY event_type, dow"""),
      bench = true),

    // ── privacy-budget ledger (sequential composition, accounted) ──
    // The shipped DP releases (q157, q159, q163, q164, q169, q173,
    // the streaming hourly feed) all draw on the same events table; by sequential
    // composition the table's actual spend is their SUM, and before
    // this ledger nothing accounted for it — "a few cheap releases"
    // is one expensive one. One row per shipped release
    // (alphabetical): its mechanism, its ε in integer micro-nats
    // (ln 2 → 693147), how many cells it released on THIS dataset,
    // and the sequential running total. Within a ROW-level release the
    // cells partition the rows — PARALLEL composition, one ε per
    // release regardless of cell count; q163's USER-level release has
    // no such partition (a user spans cells), so its own row already
    // carries |cells|·ε. [[DpLedger]] is the operator
    // (versioned-parquet record/load for the audit trail); this is
    // its hash-checkable report.
    // Scale shape: one narrow event scan, three map-side-combined
    // distinct rollups; the ledger itself is |releases|-bounded.
    "q161_dp_ledger" -> QuerySpec(
      build = (s, d) => DpLedger.ledger(ev(s, d)),
      oracle = Some(s"""
        WITH e AS (SELECT event_type,
                          (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                          epoch_us(ts) // 3600000000 AS hr
                   FROM events),
        c1 AS (SELECT count(DISTINCT event_type) n FROM e),
        c2 AS (SELECT count(*) n FROM (SELECT DISTINCT event_type, dow
                                       FROM e)),
        c3 AS (SELECT count(*) n FROM (SELECT DISTINCT hr, event_type
                                       FROM e)),
        l AS (
          SELECT 'q157_counts_by_type' AS release,
                 'discrete_laplace' AS mechanism,
                 ${DpLedger.EpsLn2E6} AS eps_e6,
                 (SELECT n FROM c1) AS n_cells
          UNION ALL
          SELECT 'q159_hist_type_dow', 'discrete_laplace',
                 ${DpLedger.EpsLn2E6}, (SELECT n FROM c2)
          UNION ALL
          SELECT 'q163_dp_user_counts', 'discrete_laplace',
                 (SELECT n FROM c1) * ${DpLedger.EpsLn2E6},
                 (SELECT n FROM c1)
          UNION ALL
          SELECT 'q164_dp_bounded_sum', 'discrete_laplace_smoothed',
                 (SELECT n FROM c1) * ${DpLedger.EpsLn2E6},
                 (SELECT n FROM c1)
          UNION ALL
          SELECT 'q169_dp_topk_select', 'exponential',
                 3 * ${DpLedger.EpsLn2E6}, 3
          UNION ALL
          SELECT 'q173_dp_quantile', 'exponential',
                 12 * ${DpLedger.EpsLn2E6}, 3
          UNION ALL
          SELECT 'q185_svt_first_anomaly', 'svt_above_threshold',
                 4 * ${DpLedger.EpsLn2E6}, 1
          UNION ALL
          SELECT 'stream_hourly_counts', 'discrete_laplace',
                 ${DpLedger.EpsLn2E6}, (SELECT n FROM c3))
        SELECT release, mechanism, CAST(eps_e6 AS BIGINT) AS eps_e6,
               CAST(n_cells AS BIGINT) AS n_cells,
               CAST(sum(eps_e6) OVER (ORDER BY release)
                 AS BIGINT) AS cum_eps_e6
        FROM l ORDER BY release"""),
      bench = true),

    // ── DP post-processing (free): peak-day profile from q159 ──────
    // The third leg of the DP story (mechanism → composition →
    // post-processing): any function of ALREADY-RELEASED values costs
    // ZERO additional ε — the post-processing invariance of DP — so
    // this query adds NO ledger row. It consumes ONLY q159's released
    // column (never the exact counts riding along for the oracle):
    // per type, negatives clamped to 0 (a valid, utility-improving
    // post-process), the peak day of week, and the peak's share in
    // integer e4. This is what a consumer dashboard should do with a
    // DP histogram — derive, don't re-query; every re-query of the
    // raw data is a new ε the ledger would have to charge.
    // Scale shape: q159's rollup + arithmetic on the |types|×7 frame.
    "q166_dp_postprocess" -> QuerySpec(
      build = (s, d) => {
        val released = queries("q159_dp_histogram").build(s, d)
          .select(col("event_type"), col("dow"), col("released"))
          .withColumn("r", greatest(col("released"), lit(0L)))
        released
          .groupBy(col("event_type"))
          .agg(sum(col("r")).as("total_released"),
            max(struct(col("r").as("r"), (-col("dow")).as("nd")))
              .as("_pk"))
          .select(col("event_type"), col("total_released"),
            (-col("_pk.nd")).as("peak_dow"),
            // integer division (`div`): FP division + cast could round
            // up across the floor at exact multiples
            expr("_pk.r * 10000 div greatest(total_released, 1)")
              .as("peak_share_e4"))
          .orderBy("event_type")
      },
      oracle = Some(s"""
        WITH g AS (SELECT event_type,
                          (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                          count(*) n
                   FROM events GROUP BY 1, 2),
        rel AS (SELECT event_type, dow,
                  greatest(CAST(n +
                    ${DpNoise.duckNoiseSql("event_type || '|' || dow::VARCHAR")}
                    AS BIGINT), 0) AS r
                FROM g),
        tot AS (SELECT event_type, CAST(sum(r) AS BIGINT) total_released
                FROM rel GROUP BY 1),
        pk AS (SELECT event_type, dow, r FROM (
                 SELECT *, row_number() OVER (PARTITION BY event_type
                          ORDER BY r DESC, dow ASC) AS rn
                 FROM rel)
               WHERE rn = 1)
        SELECT t.event_type, t.total_released,
               CAST(pk.dow AS BIGINT) AS peak_dow,
               CAST(pk.r * 10000 // greatest(t.total_released, 1)
                 AS BIGINT) AS peak_share_e4
        FROM tot t JOIN pk ON pk.event_type = t.event_type
        ORDER BY t.event_type"""),
      bench = true),

    // ── USER-level DP release (contribution-bounded distinct counts) ─
    // q157/q159 are ROW-level DP: the protected unit is one event, and
    // since each event lands in exactly one cell, the cells partition
    // the data and the whole release costs one ε (parallel
    // composition). A platform that promises USER-level privacy needs
    // more: here the released statistic is the per-type DISTINCT-USER
    // count, so each user's contribution per cell is bounded at 1 by
    // construction (the distinct is the clamp) and per-cell
    // sensitivity is 1 — but one user can appear in EVERY cell, so
    // the cells do NOT partition users and parallel composition does
    // NOT apply: the release honestly costs |cells|·ε = |types|·ln 2,
    // which is exactly what its [[DpLedger]] row records (q161's
    // eps_e6 for this release is measured from the data as
    // n_cells × 693147). The exact count rides along for the oracle
    // audit — a production view drops it (the q157 convention).
    // Scale shape: one map-side-combined (type, user) distinct rollup
    // — the q156 exchange — then the mechanism on the |types|-bounded
    // frame.
    "q163_dp_user_counts" -> QuerySpec(
      build = (s, d) =>
        ev(s, d).groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .withColumn("noise", DpNoise.noiseFor(
            concat(lit("users|"), col("event_type")),
            DpNoise.OracleSecret))
          .select(col("event_type"), col("n_users"), col("noise"),
            (col("n_users") + col("noise")).as("released"))
          .orderBy("event_type"),
      oracle = Some(s"""
        WITH g AS (SELECT event_type, count(DISTINCT user_id) n
                   FROM events GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_users,
               CAST(${DpNoise.duckNoiseSql("'users|' || event_type")}
                 AS BIGINT) AS noise,
               CAST(n + ${DpNoise.duckNoiseSql("'users|' || event_type")}
                 AS BIGINT) AS released
        FROM g ORDER BY event_type"""),
      bench = true),

    // ── contribution-bounded SUM release (user-level DP on values) ─
    // The fourth shape of the DP toolkit (counts → histogram →
    // distinct users → bounded sums): per-type revenue released at
    // USER-level privacy. A raw sum has unbounded sensitivity — one
    // whale user moves it arbitrarily, so no finite noise protects
    // them. The fix is the standard contribution bound: each user's
    // per-type value total (integer cents — floor(value·100 + 0.5) is
    // the same correctly-rounded IEEE step in both engines) is CLAMPED
    // to [0, C] (C = 10000 cents), making user-removal sensitivity
    // exactly C. The mechanism is then Z = C·G + U (released =
    // clamped_sum + C·g + u): G the ε-unit discrete-Laplace draw, U an
    // INDEPENDENT uniform on [-C/2, C/2) that smooths the lattice —
    // the r11 advisor's high finding was that C·G alone is ≡ 0
    // (mod C), so the release leaked clamped_sum mod C exactly
    // (disjoint supports across neighbors ⇒ real ε = ∞). With the
    // smoothing term every integer z decomposes uniquely as C·g + u,
    // a ≤C neighbor shift moves g by at most 1, and P(Z=z)/P(Z=z+δ)
    // ≤ 2 — the ε = ln 2 guarantee now actually holds, with full
    // integer support (see DpNoise.uniformFor for the proof). The
    // residual E[U] = -0.5 cent bias is documented, not hidden.
    // Clamping is a utility/privacy TRADE the release owner tunes:
    // heavy spenders are deliberately under-counted so they can hide.
    // Cells (types) again do not partition USERS, so the ledger
    // prices this release at |cells|·ε, like q163 — and with this fix
    // the mechanism actually PROVIDES the ε the q161 ledger records.
    // Exact aggregates ride for the oracle audit — a production view
    // drops them.
    // Scale shape: one map-side-combined (type, user) rollup, clamp
    // on the rollup, mechanism on the |types|-bounded frame.
    "q164_dp_bounded_sum" -> QuerySpec(
      build = (s, d) =>
        ev(s, d).filter(col("value").isNotNull)
          .select(col("event_type"), col("user_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("v_e2"))
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(col("v_e2")).as("uv"))
          .withColumn("contrib",
            least(greatest(col("uv"), lit(0L)), lit(10000L)))
          .groupBy(col("event_type"))
          .agg(sum(col("contrib")).as("clamped_sum_e2"),
            count(lit(1)).as("n_users_contributing"))
          .withColumn("noise", DpNoise.noiseFor(
            concat(lit("sum|"), col("event_type")),
            DpNoise.OracleSecret))
          .withColumn("smooth", DpNoise.uniformFor(
            concat(lit("sum|"), col("event_type")),
            DpNoise.OracleSecret, 10000L) - lit(5000L))
          .select(col("event_type"), col("clamped_sum_e2"),
            col("n_users_contributing"), col("noise"), col("smooth"),
            (col("clamped_sum_e2") + lit(10000L) * col("noise")
              + col("smooth")).as("released_e2"))
          .orderBy("event_type"),
      oracle = Some(s"""
        WITH e AS (SELECT event_type, user_id,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) v
                   FROM events WHERE value IS NOT NULL),
        u AS (SELECT event_type, user_id,
                     CAST(least(greatest(sum(v), 0), 10000) AS BIGINT) c
              FROM e GROUP BY 1, 2),
        g AS (SELECT event_type, CAST(sum(c) AS BIGINT) s,
                     count(*) n
              FROM u GROUP BY 1)
        SELECT event_type, s AS clamped_sum_e2,
               CAST(n AS BIGINT) AS n_users_contributing,
               CAST(${DpNoise.duckNoiseSql("'sum|' || event_type")}
                 AS BIGINT) AS noise,
               CAST(${DpNoise.duckUniformSql("'sum|' || event_type", 10000L)}
                 - 5000 AS BIGINT) AS smooth,
               CAST(s + 10000 * ${DpNoise.duckNoiseSql("'sum|' || event_type")}
                 + ${DpNoise.duckUniformSql("'sum|' || event_type", 10000L)}
                 - 5000 AS BIGINT) AS released_e2
        FROM g ORDER BY event_type"""),
      bench = true),

    // ── exponential mechanism: private top-k selection (q169) ──────
    // The fifth DP shape (counts → histogram → distinct users →
    // bounded sums → SELECTION): release which k event types are most
    // frequent WITHOUT releasing the counts. Noisy-counts-then-sort
    // answers this at the cost of releasing |types| noisy values; the
    // exponential mechanism releases only the selection, with utility
    // u(type) = its event count.
    //
    // Mechanism, all-integer so both engines replay the same bits:
    // weights are base-2, max-shifted, clipped — w_i = 2^(40 − min(m −
    // c_i, 40)) with m = max count among REMAINING candidates — then
    // one uniform draw U on [0, Σw) ([[DpNoise.uniformModFor]], domain
    // separator "dpq0", key "topk|r<round>") picks the candidate whose
    // cumulative-weight interval (alphabetical candidate order)
    // contains U. Selected candidates are peeled and the next round
    // re-weights the remainder — k adaptive rounds, ε each, k·ε total
    // by sequential composition (the q161 ledger row).
    //
    // ε = ln 2 per round, PROOF (the clip and the data-dependent shift
    // are the subtle parts): a neighboring dataset changes ONE count
    // by 1, so either (a) m is unchanged and only the changed type's
    // shift s_i = m − c_i moves by 1 — its weight moves by a factor
    // ≤ 2 (min(·,40) is 1-Lipschitz) and every other weight is fixed,
    // so the total W moves by a factor ≤ 2 — or (b) m moves by 1,
    // which happens only when the changed type attains (or solely
    // held) the max: then ITS shift stays 0 and every OTHER shift
    // moves by 1, again each weight ≤ 2× and W ≤ 2×. The case "my
    // weight 2× one way AND W 2× the other" cannot occur — in (a) W
    // moves WITH the one changed weight, in (b) the winner's weight
    // does not move at all — so P(i) = w_i/W changes by ≤ 2 = e^(ln 2)
    // for every candidate, both directions. (An UNSHIFTED 2^c_i would
    // give the same ratios — the shift exists so weights fit in 64
    // bits; the clip only ever fires on candidates ≥ 2⁴⁰× below the
    // max, and the Lipschitz bound covers it.)
    //
    // Honesty notes: (1) the candidate DOMAIN is the types present in
    // the data — treated as public, the same convention every release
    // here uses for group keys (q157/q159/q163/q164 all emit
    // data-derived type rows); (2) the draw is the consistent-noise
    // PRF convention of the whole DP family (stable per secret+key;
    // q157's doc); (3) exact counts/weights/draws RIDE for the oracle
    // audit — a production view releases topk_rank + event_type ONLY
    // (the q157 convention), since the audit columns obviously reveal
    // the counts.
    // Scale shape: ONE event-scale map-side-combined rollup, then ONE
    // |types|-bounded driver collect (the convention every DP release
    // here uses — the released frame IS bounded by the public
    // candidate domain); the k peels run ENTIRELY on the driver over
    // the collected rows (r20 — they previously ran as column
    // expressions over a LocalRelation, and the 3 rounds × (2
    // crossJoin subjobs + global window + anti-join) cost ~1.5-2 s of
    // pure Catalyst/AQE overhead at ANY data size; the events table is
    // scanned exactly once either way, and the driver arithmetic is
    // bit-identical: shiftleft = Long <<, pmod of the non-negative
    // 60-bit PRF = %, DpNoise.uniformModLocal is the same MD5 bytes).
    "q169_dp_topk_select" -> QuerySpec(
      build = (s, d) => {
        val k = 3
        val countRows = ev(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        // alphabetical candidate order = the cumulative-interval order
        var cands = countRows.sortBy(_._1).toSeq
        val rows = (1 to k).map { r =>
          val m = cands.map(_._2).max
          val weighted = cands.map { case (t, n) =>
            (t, n, 1L << (40L - math.min(m - n, 40L)).toInt) }
          val tot = weighted.map(_._3).sum
          val draw = DpNoise.uniformModLocal(s"topk|r$r",
            DpNoise.OracleSecret, tot)
          var cum = 0L
          val win = weighted.map { case (t, n, w) =>
            cum += w; (t, n, w, cum)
          }.find { case (_, _, w, c) => draw >= c - w && draw < c }.get
          cands = cands.filterNot(_._1 == win._1)
          org.apache.spark.sql.Row(
            r.toLong, win._1, win._2, win._3, tot, draw)
        }
        import org.apache.spark.sql.types.{LongType, StringType,
          StructField, StructType}
        s.createDataFrame(java.util.Arrays.asList(rows: _*),
          StructType(Seq(StructField("topk_rank", LongType),
            StructField("event_type", StringType),
            StructField("n", LongType), StructField("weight", LongType),
            StructField("total_weight", LongType),
            StructField("draw", LongType))))
      },
      oracle = Some(s"""
        WITH g1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1),
        ${duckTopkRound(1)},
        ${duckTopkRound(2)},
        ${duckTopkRound(3)}
        SELECT * FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
                       UNION ALL SELECT * FROM s3)
        ORDER BY topk_rank"""),
      bench = true),

    // ── DP quantile release (exponential mechanism over intervals) ─
    // The aggregate the DP family still lacked: "what is the p50 of
    // `value`?" answered without the exact order statistics ever
    // leaving the pipeline. Standard DP-quantile shape (Smith 2011
    // lineage): the PUBLIC domain [0, 512.00] splits into 256
    // fixed 2.00-wide buckets (cents-integer edges — no data-dependent
    // binning to leak); per candidate bucket the utility is
    // −|cum_rank − target| with target = ceil(q·n); base-2 max-shifted
    // clipped weights and one dpq0-separated PRF draw select the
    // released INTERVAL (lo_cents, hi_cents) — p25/p50/p90 as three
    // sequential draws.
    //
    // ε = 4·ln 2 per draw, PROOF: a neighboring dataset moves every
    // cum_rank by ≤ 1 AND the target by ≤ 1, so each bucket's distance
    // d moves by ≤ 2 and its unshifted weight 2^(−d) by ≤ 4× — the
    // total moves ≤ 4× with them, so every P(i) moves ≤ 16 = e^(4·ln2)
    // (the max-shift cancels in P(i) exactly; the 40-bit clip differs
    // from the unclipped mechanism by ≤ 255·2⁻⁴⁰ < 2⁻³¹ total
    // variation — documented slack, not claimed away). Three draws
    // compose sequentially: the q161 ledger prices the release at
    // 12·ln 2 with 3 data-independent cells.
    //
    // Honesty notes (the family's conventions): candidates are the
    // OCCUPIED buckets (the same data-derived-domain convention every
    // release here uses); exact counts/ranks/draws RIDE for the
    // oracle audit — a production view releases (q_pct, lo_cents,
    // hi_cents) only.
    // Scale shape: ONE event-scale map-side-combined bucket rollup,
    // then a ≤256-row collect and three draws of DRIVER arithmetic
    // (r20, the q169 lesson completed: the LocalRelation column
    // version still paid 3 × (2 crossJoin subjobs + 2 global windows)
    // of Catalyst/AQE overhead at any data size; the driver integers
    // are bit-identical — shiftleft = Long <<, pmod of the
    // non-negative 60-bit PRF = %, same MD5 bytes via
    // DpNoise.uniformModLocal).
    "q173_dp_quantile" -> QuerySpec(
      build = (s, d) => {
        val W = 200L // bucket width in cents; 256 buckets over [0, 512)
        val bcounts = ev(s, d)
          .select(least(greatest(floor(col("value") * 100), lit(0.0)),
            lit(51199.0)).cast("long").as("cents"))
          .select(call_function("div", col("cents"), lit(W)).as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1) // bucket order = the cumulative-interval order
        val n = bcounts.map(_._2).sum
        val rows = Seq(25, 50, 90).map { qpct =>
          val t = (n * qpct + 99) / 100 // ceil(q·n), driver integers
          var cr = 0L
          val cum = bcounts.map { case (b, cnt) =>
            cr += cnt; (b, cnt, cr, math.abs(cr - t))
          }
          val dm = cum.map(_._4).min
          val weighted = cum.map { case (b, cnt, c, dist) =>
            (b, cnt, c, 1L << (40L - math.min(dist - dm, 40L)).toInt)
          }
          val tot = weighted.map(_._4).sum
          val draw = DpNoise.uniformModLocal(s"quantile|p$qpct",
            DpNoise.OracleSecret, tot)
          var cw = 0L
          val win = weighted.map { case (b, cnt, c, w) =>
            cw += w; (b, cnt, c, w, cw)
          }.find { case (_, _, _, w, c) => draw >= c - w && draw < c }.get
          org.apache.spark.sql.Row(qpct.toLong, win._1, win._1 * W,
            win._1 * W + W, win._2, win._3, t, win._4, tot, draw)
        }
        import org.apache.spark.sql.types.{LongType, StructField,
          StructType}
        s.createDataFrame(java.util.Arrays.asList(rows: _*),
          StructType(Seq("q_pct", "bucket", "lo_cents", "hi_cents",
            "cnt", "cum", "target_rank", "weight", "total_weight",
            "draw").map(StructField(_, LongType))))
      },
      oracle = Some(s"""
        WITH bg AS (SELECT CAST(least(greatest(floor(value * 100), 0),
                      51199) AS BIGINT) // 200 AS b,
                      count(*) AS cnt
                    FROM events GROUP BY 1),
        nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM bg),
        ${duckQuantRound(25)},
        ${duckQuantRound(50)},
        ${duckQuantRound(90)}
        SELECT * FROM (SELECT * FROM qs25 UNION ALL SELECT * FROM qs50
                       UNION ALL SELECT * FROM qs90)
        ORDER BY q_pct"""),
      bench = true),

    // ── k-anonymity census over behavioral quasi-identifiers ───────
    // The quantitative privacy audit beside q78's PII scrub: treating
    // (event_type, day-of-week, hour-of-day) as a quasi-identifier
    // cell, how many cells — and how many event rows — sit in small
    // anonymity sets? A cell whose distinct-user count k is 1 pins a
    // behavior pattern to ONE user; releasing (or training on) event
    // data without this census is how "anonymized" logs re-identify.
    // Buckets: k=1, 2-4, 5-19, ≥20 (the conventional risk bands).
    // All-integer: dow/hod by epoch-microsecond arithmetic (NOT
    // engine date functions, whose week conventions differ).
    //
    // Scale shape: the ONE event-scale exchange is the (cell, user)
    // rollup with map-side combine; k and the census run on the
    // |types|×7×24-bounded cell frame. Nothing event-scale moves
    // twice — per-cell event counts ride the same rollup as sums.
    "q156_anonymity_census" -> QuerySpec(
      build = (s, d) => {
        val cellUser = ev(s, d)
          .select(col("event_type"),
            expr("(ts_us div 86400000000 + 4) % 7").as("dow"),
            expr("(ts_us div 3600000000) % 24").as("hod"),
            col("user_id"))
          .groupBy(col("event_type"), col("dow"), col("hod"),
            col("user_id"))
          .agg(count(lit(1)).as("n_ev"))
        val cells = cellUser
          .groupBy(col("event_type"), col("dow"), col("hod"))
          .agg(count(lit(1)).as("k"), sum(col("n_ev")).as("n_events"))
        cells
          .select(
            when(col("k") === 1, "k=1")
              .when(col("k") <= 4, "k=2-4")
              .when(col("k") <= 19, "k=5-19")
              .otherwise("k>=20").as("k_bucket"),
            col("k"), col("n_events"))
          .groupBy(col("k_bucket"))
          .agg(count(lit(1)).as("n_cells"),
            sum(col("k")).as("n_user_slots"),
            sum(col("n_events")).as("n_events"))
          .orderBy("k_bucket")
      },
      oracle = Some("""
        WITH e AS (SELECT event_type, user_id,
                          (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                          (epoch_us(ts) // 3600000000) % 24 AS hod
                   FROM events),
        cu AS (SELECT event_type, dow, hod, user_id, count(*) n_ev
               FROM e GROUP BY 1, 2, 3, 4),
        c AS (SELECT event_type, dow, hod, count(*) k, sum(n_ev) n_events
              FROM cu GROUP BY 1, 2, 3),
        b AS (SELECT CASE WHEN k = 1 THEN 'k=1'
                          WHEN k <= 4 THEN 'k=2-4'
                          WHEN k <= 19 THEN 'k=5-19'
                          ELSE 'k>=20' END AS k_bucket,
                     k, n_events
              FROM c)
        SELECT k_bucket, count(*) AS n_cells,
               CAST(sum(k) AS BIGINT) AS n_user_slots,
               CAST(sum(n_events) AS BIGINT) AS n_events
        FROM b GROUP BY 1 ORDER BY k_bucket"""),
      bench = true),

    "q151_event_transitions" -> QuerySpec(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        ev(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("_tot",
            sum(col("n")).over(Window.partitionBy(col("from_type"))))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 10000 div _tot").as("p_e4"))
          .orderBy("from_type", "to_type")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, event_id,
                          epoch_us(ts) AS ts_us FROM events),
        t AS (SELECT event_type AS from_type,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS to_type
              FROM e),
        g AS (SELECT from_type, to_type, count(*) n FROM t
              WHERE to_type IS NOT NULL GROUP BY 1, 2),
        f AS (SELECT from_type, sum(n) tot FROM g GROUP BY 1)
        SELECT g.from_type, g.to_type, CAST(g.n AS BIGINT) AS n,
               CAST(g.n * 10000 // f.tot AS BIGINT) AS p_e4
        FROM g JOIN f USING (from_type)
        ORDER BY from_type, to_type"""),
      bench = true),

    // ── sparse vector technique: AboveThreshold release (r14) ──────
    // The DP primitive the shipped family lacked: answer "which is
    // the FIRST query in a public scan order to exceed a threshold"
    // at a TOTAL cost independent of how many below-threshold queries
    // were examined — the reason SVT exists (naively, scanning 35
    // cells costs 35 noisy releases; AboveThreshold pays for the
    // threshold draw and the one halting query only).
    //
    // Setup: the public query stream is the (event_type, day-of-week)
    // cell space in (type, dow) order — cell identities are metadata,
    // counts are the secrets. The threshold itself derives from a
    // RELEASED total (one ε = ln 2 draw), then T = 1.2× the released
    // mean cell count — pure post-processing of a released value, so
    // T is public. AboveThreshold then draws ρ on the threshold and
    // ν_i per scanned cell, halting at the first c_i + ν_i ≥ T + ρ.
    //
    // ε accounting (the Dwork–Roth AboveThreshold proof, discrete):
    // a neighboring dataset moves every cell count by ≤ 1 and the
    // total by ≤ 1. P[halt = k] factors through (a) the threshold
    // noise absorbing a ±1 shift — the geometric sampler's
    // P(z)/P(z+δ) ≤ 2^{|δ|} gives a factor ≤ 2; (b) the halting
    // cell's noise absorbing a ±2 relative shift (its count AND the
    // threshold each move ≤ 1) — factor ≤ 4; the below-threshold
    // comparisons cancel in the ratio (the SVT argument). With the
    // released-total draw: ε = ln 2 + ln 2 + 2·ln 2 = 4·ln 2,
    // priced as the q161 ledger's `q185_svt_first_anomaly` row.
    // Released output: the halting cell's identity + scan position,
    // the released total and the public T — nothing else (exact
    // counts never leave; an empty frame is the ⊥ "none above"
    // outcome). OracleSecret keys the draws here ONLY so DuckDB can
    // replay the arithmetic — production passes secretFromConf.
    //
    // Scale shape: ONE map-side-combined event rollup to the 35-row
    // cell frame; every SVT step is arithmetic on that bounded frame
    // (the 1-row total broadcast, a bounded-frame window for scan
    // position). Non-vacuous: the halt lands at position 5/16/24 at
    // sf0.001/0.01/0.1 — the scan genuinely walks past below-threshold
    // cells.
    "q185_svt_release" -> QuerySpec(
      build = (s, d) => {
        val sec = DpNoise.OracleSecret
        val cells = ev(s, d)
          .groupBy(col("event_type"),
            expr("(ts_us div 86400000000 + 4) % 7").as("dow"))
          .agg(count(lit(1)).as("c"))
        val scanW = Window.orderBy(col("event_type"), col("dow"))
        cells
          .withColumn("pos", row_number().over(scanW))
          .crossJoin(broadcast(cells.agg(
            sum(col("c")).cast("long").as("total"))))
          .withColumn("released_total",
            col("total") + DpNoise.noiseFor(lit("svt_total"), sec))
          .withColumn("t_pub", expr("released_total * 12 div 350"))
          .withColumn("rho", DpNoise.noiseFor(lit("svt_thresh"), sec))
          .withColumn("nu", DpNoise.noiseFor(
            concat(lit("svt|"), col("event_type"), lit("|"),
              col("dow").cast("string")), sec))
          .filter(col("c") + col("nu") >= col("t_pub") + col("rho"))
          .orderBy("pos").limit(1)
          .select(col("pos").as("hit_pos"),
            col("event_type").as("hit_type"), col("dow").as("hit_dow"),
            col("released_total"), col("t_pub"),
            lit(4 * DpLedger.EpsLn2E6).as("eps_e6"))
      },
      oracle = Some(s"""
        WITH cells AS (
          SELECT event_type,
                 (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                 count(*) AS c
          FROM events GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cells),
        rel AS (SELECT total + ${DpNoise.duckNoiseSql("'svt_total'")}
                  AS released_total FROM tot),
        th AS (SELECT released_total,
                      released_total * 12 // 350 AS t_pub,
                      ${DpNoise.duckNoiseSql("'svt_thresh'")} AS rho
               FROM rel),
        scored AS (
          SELECT event_type, dow, c,
                 ROW_NUMBER() OVER (ORDER BY event_type, dow) AS pos,
                 ${DpNoise.duckNoiseSql(
                   "'svt|' || event_type || '|' || CAST(dow AS VARCHAR)")}
                   AS nu
          FROM cells)
        SELECT s.pos AS hit_pos, s.event_type AS hit_type,
               CAST(s.dow AS BIGINT) AS hit_dow,
               CAST(th.released_total AS BIGINT) AS released_total,
               CAST(th.t_pub AS BIGINT) AS t_pub,
               CAST(${4 * DpLedger.EpsLn2E6} AS BIGINT) AS eps_e6
        FROM scored s, th
        WHERE s.c + s.nu >= th.t_pub + th.rho
        ORDER BY s.pos LIMIT 1"""),
      bench = true),

    // ── multi-touch attribution (r15) ──────────────────────────────
    // First/last/linear credit for every purchase's view/click touches
    // in a 7-day lookback — computed WITHOUT the per-user range join
    // (touches × conversions pair expansion, quadratic on hot users):
    // per-channel running counts on the touch timeline + two backward
    // as-of probes per conversion (prefix-difference counts, the
    // Fenwick idiom) + one (user, idx) equi-join for the first touch.
    // The oracle replays the NAIVE range join — the hash match proves
    // the prefix arithmetic computes exactly the window the join
    // scans. Linear credit in integer millionths (e6 discipline).
    "q188_attribution" -> QuerySpec(
      build = (s, d) => {
        val (touches, conversions) = attributionInputs(s, d)
        val per = Attribution.perConversion(touches, conversions,
          attributionChannels, attributionLookback)
        Attribution.byChannel(per, attributionChannels).orderBy("channel")
      },
      oracle = Some(attributionOracle),
      bench = true),

    // ── position-based (U-shaped) attribution (r16) ────────────────
    // The fourth credit model over the SAME prefix-sum reads as q188
    // (the verdict's point: models are weightings of one window
    // census, not new joins): 40% first touch, 40% last, 20% split
    // over the middles, integer e6. A channel's middle count is
    // k_ch − [first] − [last] — k_ch rides out of perConversion
    // (keepCounts), no extra pass. The oracle replays the naive range
    // join + the same CASE arithmetic over its window census.
    "q196_attribution_position" -> QuerySpec(
      build = (s, d) => {
        val (touches, conversions) = attributionInputs(s, d)
        val per = Attribution.perConversion(touches, conversions,
          attributionChannels, attributionLookback, keepCounts = true)
        Attribution.positionByChannel(per, attributionChannels)
          .orderBy("channel")
      },
      oracle = Some(s"""
        WITH $attributionWindowCtes,
        k AS (SELECT cid, ch, count(*) AS k FROM w GROUP BY cid, ch),
        cred AS (SELECT k.ch,
                   CAST(sum(CASE
                     WHEN p.n = 1 THEN k.k * 1000000
                     WHEN p.n = 2 THEN
                       ((CASE WHEN fl.first_ch = k.ch THEN 1 ELSE 0 END)
                        + (CASE WHEN fl.last_ch = k.ch THEN 1 ELSE 0 END))
                       * 500000
                     ELSE
                       ((CASE WHEN fl.first_ch = k.ch THEN 1 ELSE 0 END)
                        + (CASE WHEN fl.last_ch = k.ch THEN 1 ELSE 0 END))
                       * 400000 +
                       (k.k
                        - (CASE WHEN fl.first_ch = k.ch THEN 1 ELSE 0 END)
                        - (CASE WHEN fl.last_ch = k.ch THEN 1 ELSE 0 END))
                       * (200000 // (p.n - 2))
                     END) AS BIGINT) AS cr
                 FROM k JOIN per p USING (cid) JOIN fl ON fl.cid = k.cid
                 GROUP BY k.ch)
        SELECT chs.ch AS channel, coalesce(cred.cr, 0) AS position_e6
        FROM (VALUES ('click'), ('view')) chs(ch)
        LEFT JOIN cred ON cred.ch = chs.ch
        ORDER BY channel"""),
      bench = true),

    // ── incremental attribution fold (r16) ─────────────────────────
    // q188 as MAINTENANCE, the q187/q183 discipline applied to the
    // attribution family: the event stream splits into three ten-day
    // batches (per-user append-only by construction), each batch's
    // purchases credited by Attribution.fold against the bounded
    // per-user state (lookback-horizon touches + one floor sentinel
    // — O(rate × 7 days) per user, NOT the touch history), and the
    // oracle is q188's full-replay SQL verbatim: the hash match IS
    // the fold≡rebuild proof, state pruning included (the 10-day
    // batches are wider than the 7-day lookback, so the prune
    // genuinely drops rows between folds).
    "q197_attribution_fold" -> QuerySpec(
      build = (s, d) => {
        val (touches, conversions) = attributionInputs(s, d)
        // batch cuts at 2024-01-11 / 2024-01-21 (events span Jan 2024)
        val cuts = Seq(1704931200000000L, 1705795200000000L)
        val bounds = (Long.MinValue +: cuts).zip(cuts :+ Long.MaxValue)
        def slice(f: DataFrame, lo: Long, hi: Long) =
          f.filter(col("ts") >= lo && col("ts") < hi)
        var state = Attribution.initState(touches, attributionChannels)
        val credits = bounds.zipWithIndex.map { case ((lo, hi), i) =>
          // non-final folds pin the shared timeline under a 2-consumer
          // scope (r20): the eager state checkpoint below is consumer 1
          // and the final credits aggregation consumer 2 — without the
          // pin every fold's state read + batch window + guards
          // evaluated TWICE (once per consumer), measured as most of
          // q197's wall (PhaseProbe: 4.6 s build + 4.1 s exec at sf0.1,
          // both re-running the same timelines). The LAST fold's state
          // is never read, so its credits are the timeline's single
          // consumer — plain fold, no pin to manage.
          val (cr, next) =
            if (i < bounds.size - 1) Attribution.foldScoped(state,
              slice(touches, lo, hi), slice(conversions, lo, hi),
              attributionChannels, attributionLookback)
            else Attribution.fold(state,
              slice(touches, lo, hi), slice(conversions, lo, hi),
              attributionChannels, attributionLookback)
          // cut each INTERMEDIATE state's lineage (horizon-bounded, so
          // the materialization is small): lazily chained, state N's
          // subtree would re-evaluate inside every later fold's
          // credits AND state — measured 40 s at 100× vs ~14 s cut.
          // The last batch's state is never read — don't pay for it.
          // The production twin (AttributionStream) materializes state
          // to parquet per batch and never pays any of this.
          state = if (i < bounds.size - 1) graft.Checkpoints.cut(next)
                  else next
          cr
        }.reduce(_.unionByName(_))
        Attribution.byChannel(credits, attributionChannels)
          .orderBy("channel")
      },
      oracle = Some(attributionOracle),
      bench = true),

    // ── time-decay attribution (r16) ───────────────────────────────
    // The fifth model: each in-window touch weighted 65536 >> age_days
    // (the q133 power-of-2 shift — integer-exact in both engines;
    // day-grain half-life). Unlike first/last/linear/position, a
    // per-pair age makes the (touch, conversion) pair set inherently
    // necessary — no prefix-sum shortcut exists for non-telescoping
    // weights — so the honest plan ENUMERATES exactly the true
    // in-window pairs and nothing more: conversions become 7-day
    // intervals and RangeJoin's bucketed equi-join on (user, time
    // bucket) produces each pair once (output-bound cost, the q180
    // discipline), vs the naive theta join's nested-loop expansion.
    "q198_attribution_decay" -> QuerySpec(
      build = (s, d) => {
        val (touches, conversions) = attributionInputs(s, d)
        val day = 86400000000L
        // half-open (ts-7d, ts] as a [s, e) interval in µs
        val iv = conversions.select(col("user").as("cu"),
          (col("ts") - lit(7L * day) + 1).as("_ws"),
          (col("ts") + 1).as("_we"), col("ts").as("cts"))
        val pairs = graft.operators.RangeJoin.pointInInterval(
          touches, "user", "ts", iv, "cu", "_ws", "_we",
          Seq("cts"), bucketWidth = 7L * day)
        val credited = pairs
          .withColumn("w", expr(
            Attribution.decayWeightSql(s"(cts - ts) div $day")))
          .groupBy(col("channel"))
          .agg(sum(col("w")).as("decay_w"),
            count(lit(1)).as("n_weighted"))
        val chs = s.createDataFrame(
          attributionChannels.map(Tuple1(_))).toDF("channel")
        chs.join(credited, Seq("channel"), "left")
          .select(col("channel"),
            coalesce(col("decay_w"), lit(0L)).as("decay_w"),
            coalesce(col("n_weighted"), lit(0L)).as("n_weighted"))
          .orderBy("channel")
      },
      oracle = Some(decayOracle),
      bench = true),

    // ── Markov (removal-effect) attribution (r16) ──────────────────
    // The DATA-DRIVEN model: journeys as a first-order Markov chain
    // over states {START, click, view} with absorbers {CONV, NULL};
    // a channel's credit is its removal effect — how much of the
    // baseline conversion probability disappears when every
    // transition into that channel is rerouted to NULL — normalized
    // across channels and scaled by total conversions. Chain
    // construction is one lag window over each user's (touch ∪
    // purchase) timeline (journeys reset after a purchase; an
    // end-of-user touch absorbs to NULL), the transition matrix a
    // single 12-cell conditional aggregate, and the 2-transient-state
    // absorption system solves in CLOSED FORM from the integer counts
    // (det / cofactor arithmetic) — fixed-point e6 at each division
    // (`div` == DuckDB `//`), so the oracle replays every step
    // bit-for-bit. Everything after the one user-hash window is a
    // bounded 1-row frame: nothing event-scale ever re-shuffles.
    "q199_attribution_markov" -> QuerySpec(
      build = (s, d) => {
        val (touches, conversions) = attributionInputs(s, d)
        Attribution.markovByChannel(touches, conversions,
          chA = "click", chB = "view")
      },
      oracle = Some(markov2Oracle),
      bench = true),

    // ── ordered conversion funnel (r16) ────────────────────────────
    // The product-analytics staple the transition matrix (q151) and
    // attribution family circle around: users progressing through an
    // ORDERED step sequence — first signup, then first click AT OR
    // AFTER it (within 7 days), then first purchase at or after that
    // click (within 7 days) — earliest-completion semantics. Three
    // chained min-over-partition windows on ONE user-hash exchange
    // (each stage's floor is the previous stage's column — no joins,
    // no re-shuffle: same partitioning, Catalyst stacks the Window
    // nodes on one sort), then a per-user rollup and a single
    // bounded summary row. Conversion rates in integer e4.
    "q200_funnel" -> QuerySpec(
      build = (s, d) => Funnel.summary(
        Funnel.stages(funnelEvents(s, d), funnelSteps,
          lit(7L * 86400 * 1000000)), funnelSteps),
      oracle = Some(q200OracleSql),
      bench = true),

    // ── top session paths (r16) ────────────────────────────────────
    // The journey census over q31's sessions: each session's ordered
    // event-type sequence (first 8 events — bounded row width), the
    // ten most common paths. Per-session order comes from ONE
    // array_sort over the collected (ts, tie, type) structs — the
    // sort is session-local (bounded), never a global sort; the
    // top-10 is a TakeOrdered, not a full path-table sort. Total
    // order (count desc, path asc) keeps rank-boundary ties
    // deterministic cross-engine.
    "q201_top_paths" -> QuerySpec(
      build = (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        ev(s, d).filter(col("user_id").isNotNull)
          .withColumn("_prev", lag(col("ts_us"), 1).over(byUser))
          .withColumn("_new", when(col("_prev").isNull ||
            col("ts_us") - col("_prev") > gapUs, 1).otherwise(0))
          .withColumn("session_id", sum(col("_new"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(array_sort(collect_list(struct(col("ts_us"),
            col("event_id"), col("event_type")))).as("evs"))
          .select(concat_ws(">",
            slice(expr("transform(evs, x -> x.event_type)"), 1, 8))
            .as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(10)
      },
      oracle = Some("""
        WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                          event_id AS eid, event_type AS ty
                   FROM events WHERE user_id IS NOT NULL),
        s AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS nw
              FROM e WINDOW w AS (PARTITION BY u ORDER BY t, eid)),
        s2 AS (SELECT *, sum(nw) OVER (PARTITION BY u ORDER BY t, eid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sid FROM s),
        p AS (SELECT array_to_string(list(ty ORDER BY t, eid)[:8], '>')
                 AS path
              FROM s2 GROUP BY u, sid)
        SELECT path, count(*) AS n_sessions
        FROM p GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 10"""),
      bench = true),

    // ── N-channel Markov attribution (r16) ─────────────────────────
    // q199 generalized past the 2-transient closed form: THREE touch
    // channels (click, signup, view). Cofactor arithmetic grows as
    // count^3 and overflows BIGINT at scale, so absorption comes from
    // 24 UNROLLED fixed-point Jacobi rounds in integer e6 — the q136
    // unrolled-PageRank recipe: magnitudes stay ≤ count·10^6 at ANY
    // scale, and the oracle replays the same 24 rounds from the SAME
    // generator (markovNOracleSql — the two engines share one formula
    // source and cannot drift). One event-scale chain window; the
    // 4 systems × 24 rounds all ride a bounded 1-row count frame.
    "q202_markov_multichannel" -> QuerySpec(
      build = (s, d) => {
        val e = ev(s, d)
        val chs = markov3Channels
        val touches = e.filter(col("event_type").isin(chs: _*))
          .select(col("user_id").as("user"), col("ts_us").as("ts"),
            col("event_type").as("channel"), col("event_id").as("tie"))
        val conversions = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("user"), col("ts_us").as("ts"))
        Attribution.markovNByChannel(touches, conversions, chs)
      },
      oracle = Some(Attribution.markovNOracleSql(markov3Channels)),
      bench = true),

    // ── incremental funnel fold (r16) ──────────────────────────────
    // q200 as MAINTENANCE (the q187/q197 discipline, third member):
    // per-user state is just the k stage floors + the event-time
    // frontier — O(1) per user, no event retained — because stages
    // fill once, in order, and append-only arrival means no older
    // event can ever satisfy a stage set later. Three ten-day batches
    // fold sequentially; the oracle is q200's full-replay SQL
    // VERBATIM: the hash match is the fold≡rebuild proof.
    "q203_funnel_fold" -> QuerySpec(
      build = (s, d) => {
        val evs = funnelEvents(s, d)
        val cuts = Seq(1704931200000000L, 1705795200000000L)
        val bounds = (Long.MinValue +: cuts).zip(cuts :+ Long.MaxValue)
        val state = bounds.foldLeft(
          Funnel.initState(evs, funnelSteps)) { case (st, (lo, hi)) =>
          graft.Checkpoints.cut(Funnel.fold(st,
            evs.filter(col("ts") >= lo && col("ts") < hi),
            funnelSteps, lit(7L * 86400 * 1000000)))
        }
        Funnel.summary(state, funnelSteps)
      },
      oracle = Some(q200OracleSql),
      bench = true),

    // ── funnel stage-latency distribution (r16) ────────────────────
    // How long each completed funnel transition takes — q149 prices
    // click→purchase latency approximately (hist sketch, event-pair
    // grain); this is the STAGE-grain exact report over the q200
    // floors: per transition, n / min / max / integer-µs mean and the
    // exact nearest-rank-lower median (both engines pick the identical
    // element; the value at a rank of a sorted multiset is unique, so
    // ties cannot diverge). Scale shape: the floors frame is USER-
    // grain (already reduced by the funnel's one exchange); the
    // per-transition rank window sorts user-grain rows only, never
    // events.
    "q204_funnel_latency" -> QuerySpec(
      build = (s, d) => {
        val floors = Funnel.stages(funnelEvents(s, d), funnelSteps,
          lit(7L * 86400 * 1000000))
        val lats = funnelSteps.sliding(2).collect { case Seq(a, b) =>
          floors.filter(col(s"f_$b").isNotNull)
            .select(lit(s"${a}_to_$b").as("transition"),
              (col(s"f_$b") - col(s"f_$a")).as("lat_us"))
        }.reduce(_.unionByName(_))
        lats
          .withColumn("rn", row_number().over(Window
            .partitionBy(col("transition")).orderBy(col("lat_us"))))
          .withColumn("n", count(lit(1)).over(Window
            .partitionBy(col("transition"))))
          .groupBy(col("transition"))
          .agg(max(col("n")).as("n"),
            min(col("lat_us")).as("min_us"),
            max(col("lat_us")).as("max_us"),
            expr("sum(lat_us) div max(n)").as("avg_us"),
            max(when(col("rn") === expr("(n + 1) div 2"),
              col("lat_us"))).as("p50_us"))
          .orderBy("transition")
      },
      oracle = Some(s"""
        $funnelFloorCtes,
        lat AS (
          SELECT 'signup_to_click' AS transition, c1 - s1 AS lat_us
          FROM pu WHERE c1 IS NOT NULL
          UNION ALL
          SELECT 'click_to_purchase', p1 - c1
          FROM pu WHERE p1 IS NOT NULL),
        r AS (SELECT *,
                row_number() OVER (PARTITION BY transition
                  ORDER BY lat_us) AS rn,
                count(*) OVER (PARTITION BY transition) AS n
              FROM lat)
        SELECT transition, max(n) AS n,
               min(lat_us) AS min_us, max(lat_us) AS max_us,
               CAST(sum(lat_us) // max(n) AS BIGINT) AS avg_us,
               max(CASE WHEN rn = (n + 1) // 2 THEN lat_us END)
                 AS p50_us
        FROM r GROUP BY transition ORDER BY transition"""),
      bench = true),

    // ── incremental Markov attribution fold (r17) ──────────────────
    // q199 as MAINTENANCE (the q197/q203 discipline, the last r16
    // model without a fold twin). Transition counts are ASSOCIATIVE,
    // so the state is the bounded (from_st, to_st, n) cell table plus
    // ONE frontier row per user (the only predecessor a future event
    // can have); each fold's chain window runs over (batch ∪ one
    // virtual frontier row per touched user) — batch-scale — and the
    // virtual row RETRACTS (n = −1) the NULL absorption its own fold
    // counted, so the summed cells equal the one-shot chain's exactly.
    // Serve recomputes the guarded closed form from the counts
    // (Attribution.markovServe shares markovFromCounts with q199);
    // the oracle is q199's full-replay SQL verbatim — the hash match
    // IS the fold ≡ rebuild proof.
    "q205_markov_fold" -> QuerySpec(
      build = (s, d) => {
        val (touches, conversions) = attributionInputs(s, d)
        val cuts = Seq(1704931200000000L, 1705795200000000L)
        val bounds = (Long.MinValue +: cuts).zip(cuts :+ Long.MaxValue)
        def slice(f: DataFrame, lo: Long, hi: Long) =
          f.filter(col("ts") >= lo && col("ts") < hi)
        var (frontier, cells) =
          Attribution.markovInitState(touches, conversions)
        bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
          // non-final folds pin the shared chain window (r20): both
          // state cuts below read it, and unpinned it evaluated twice
          // per fold (PhaseProbe: ~70% of q205's wall was these build-
          // time cuts). Cuts run eagerly, so the release thunk fires
          // right here. The LAST fold's cells are the window's single
          // consumer (the serve; its frontier is never read) — plain
          // fold.
          if (i < bounds.size - 1) {
            val (nf, nc, release) = Attribution.markovFoldPinned(
              frontier, cells,
              slice(touches, lo, hi), slice(conversions, lo, hi))
            // cut intermediate state lineage (the q197 lesson): lazily
            // chained, fold N's window would re-evaluate inside every
            // later fold. Frontier is user-grain, cells ~20 rows.
            frontier = graft.Checkpoints.cut(nf)
            cells = graft.Checkpoints.cut(nc)
            release()
          } else {
            val (nf, nc) = Attribution.markovFold(frontier, cells,
              slice(touches, lo, hi), slice(conversions, lo, hi))
            frontier = nf
            cells = nc
          }
        }
        Attribution.markovServe(cells, chA = "click", chB = "view")
      },
      oracle = Some(markov2Oracle),
      bench = true),

    // ── incremental time-decay attribution (r17) ───────────────────
    // q198's fold twin, closing the family: every attribution model
    // now has an incremental path. State is (per-user horizon touch
    // rows — the q197 prune shape minus the prefix annotations; one
    // bounded decay-total row per channel). Each fold enumerates
    // EXACTLY its batch conversions' in-window pairs via q198's
    // bucketed point-in-interval plan over (stored horizon ∪ batch),
    // adds the integer 65536 >> age_days weights into the totals, and
    // prunes the horizon. The oracle is q198's full-replay SQL
    // VERBATIM — the hash match is the fold ≡ rebuild proof.
    "q206_decay_fold" -> QuerySpec(
      build = (s, d) => {
        val (touches, conversions) = attributionInputs(s, d)
        val cuts = Seq(1704931200000000L, 1705795200000000L)
        val bounds = (Long.MinValue +: cuts).zip(cuts :+ Long.MaxValue)
        def slice(f: DataFrame, lo: Long, hi: Long) =
          f.filter(col("ts") >= lo && col("ts") < hi)
        var (horizon, totals) = Attribution.decayInitState(touches)
        bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
          // non-final folds pin the shared timeline (r20, the q205
          // shape): both state cuts read it — unpinned, the guards +
          // horizon union evaluated twice per fold (PhaseProbe: q206
          // was 2.6 s build vs 0.09 s exec — nearly ALL the wall was
          // these duplicated build-time cuts). The LAST fold's totals
          // are the timeline's single consumer (horizon never read).
          if (i < bounds.size - 1) {
            val (nh, nt, release) = Attribution.decayFoldPinned(
              horizon, totals,
              slice(touches, lo, hi), slice(conversions, lo, hi),
              lookbackUs = 7L * 86400000000L)
            // cut intermediate state lineage (the q197 lesson); horizon
            // is user-grain, totals |channels| rows
            horizon = graft.Checkpoints.cut(nh)
            totals = graft.Checkpoints.cut(nt)
            release()
          } else {
            val (nh, nt) = Attribution.decayFold(horizon, totals,
              slice(touches, lo, hi), slice(conversions, lo, hi),
              lookbackUs = 7L * 86400000000L)
            horizon = nh
            totals = nt
          }
        }
        Attribution.decayServe(totals, attributionChannels)
      },
      oracle = Some(decayOracle),
      bench = true),

    // ── incremental N-channel Markov attribution (r17) ─────────────
    // q202's fold twin, for free: markovFold's cell state is
    // CHANNEL-AGNOSTIC (each transition counts under whatever states
    // appear in the chain), so the same fold that serves q199's
    // 2-channel closed form (q205) serves q202's N-channel Jacobi
    // recipe — only the serve half differs (markovNServe shares
    // markovNFromCounts with the one-shot q202; one formula source).
    // The oracle is q202's generated SQL VERBATIM: fold ≡ rebuild.
    "q207_markov_n_fold" -> QuerySpec(
      build = (s, d) => {
        val e = ev(s, d)
        val chs = markov3Channels
        val touches = e.filter(col("event_type").isin(chs: _*))
          .select(col("user_id").as("user"), col("ts_us").as("ts"),
            col("event_type").as("channel"), col("event_id").as("tie"))
        val conversions = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("user"), col("ts_us").as("ts"))
        val cuts = Seq(1704931200000000L, 1705795200000000L)
        val bounds = (Long.MinValue +: cuts).zip(cuts :+ Long.MaxValue)
        def slice(f: DataFrame, lo: Long, hi: Long) =
          f.filter(col("ts") >= lo && col("ts") < hi)
        var (frontier, cells) =
          Attribution.markovInitState(touches, conversions)
        bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
          // pinned non-final folds — the q205 shape (see that entry)
          if (i < bounds.size - 1) {
            val (nf, nc, release) = Attribution.markovFoldPinned(
              frontier, cells,
              slice(touches, lo, hi), slice(conversions, lo, hi))
            frontier = graft.Checkpoints.cut(nf)
            cells = graft.Checkpoints.cut(nc)
            release()
          } else {
            val (nf, nc) = Attribution.markovFold(frontier, cells,
              slice(touches, lo, hi), slice(conversions, lo, hi))
            frontier = nf
            cells = nc
          }
        }
        Attribution.markovNServe(cells, chs)
      },
      oracle = Some(Attribution.markovNOracleSql(markov3Channels)),
      bench = true)

  )

  /** q145's per-type robust (median, MAD) pair over an hourly count
    * frame (event_type, hr, c) — THE threshold definition, factored so
    * the streaming monitor's refresh
    * ([[graft.streaming.EventStreams.writeAnomalyThresholds]]) derives
    * EXACTLY the thresholds the audited batch query flags with (no
    * drift possible). Nearest-rank LOWER medians, all-integer: the
    * smallest value whose ascending rank reaches ceil(n/2) — rn*2 >= n
    * — with `hr` as the deterministic tie-break. Report-scale input
    * (|types|×|hours| rows), so the windows here never see raw
    * events. */
  private[graft] def robustThresholds(counts: DataFrame): DataFrame = {
    def medianOf(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type"))
      df.withColumn("_rn", row_number().over(
          w.orderBy(col(v).asc, col("hr").asc)))
        .withColumn("_n", count(lit(1)).over(w))
        .filter(col("_rn") * 2 >= col("_n"))
        .groupBy(col("event_type")).agg(min(col(v)).as(out))
    }
    val med = medianOf(counts, "c", "med")
    val dev = counts.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("c") - col("med")))
    med.join(medianOf(dev, "dev", "mad"), "event_type")
  }
}
