package graft.analytics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset operators (SURVEY §1.4: `Dataset[T]` where type
  * safety helps): KeyValueGroupedDataset.mapGroups for per-key
  * imperative logic that SQL can't express cleanly, and a custom
  * typed Aggregator (UDAF) — both oracle-checked against SQL
  * re-formulations.
  */
object TypedQueries {

  case class UserEvent(user_id: Long, ts_us: Long, event_type: String)

  /** First click→purchase conversion per user via mapGroups: find the
    * first click, then the first purchase at/after it — a two-phase
    * scan that is natural imperative code and a correlated-subquery
    * contortion in SQL. */
  case class Conversion(user_id: Long, first_click_us: Long,
                        first_purchase_us: Long, latency_us: Long)

  /** Geometric mean as a typed Aggregator: sum of logs + count.
    * Demonstrates the custom-UDAF surface; the oracle recomputes it as
    * exp(avg(ln(x))). */
  class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, QuerySpec] = Map(

    // ── typed mapGroups: per-user conversion funnel ────────────────
    "q56_typed_funnel" -> QuerySpec(
      build = (s, d) => {
        import s.implicits._
        val ev = EventQueries.ev(s, d)
          .select(col("user_id"), col("ts_us"), col("event_type"))
          .as[UserEvent]
        ev.groupByKey(_.user_id)
          .flatMapGroups { (uid, it) =>
            val events = it.toSeq.sortBy(_.ts_us)
            val firstClick = events.find(_.event_type == "click")
            firstClick.flatMap { c =>
              events.find(e => e.event_type == "purchase" && e.ts_us >= c.ts_us)
                .map(p => Conversion(uid, c.ts_us, p.ts_us, p.ts_us - c.ts_us))
            }.iterator
          }
          .toDF()
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type
                   FROM events),
        fc AS (SELECT user_id, min(ts_us) AS first_click_us
               FROM e WHERE event_type = 'click' GROUP BY user_id),
        fp AS (SELECT e.user_id, fc.first_click_us,
                      min(e.ts_us) AS first_purchase_us
               FROM e JOIN fc ON e.user_id = fc.user_id
               WHERE e.event_type = 'purchase'
                 AND e.ts_us >= fc.first_click_us
               GROUP BY e.user_id, fc.first_click_us)
        SELECT user_id, first_click_us, first_purchase_us,
               first_purchase_us - first_click_us AS latency_us
        FROM fp ORDER BY user_id""")),

    // ── custom typed Aggregator (UDAF): geometric mean ─────────────
    "q57_geomean_udaf" -> QuerySpec(
      build = (s, d) => {
        import s.implicits._
        val geo = udaf(new GeoMean, Encoders.scalaDouble)
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(StableRound.r4(geo(col("o_totalprice"))).as("geo_mean"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      oracle = Some(s"""
        SELECT o_orderpriority,
               ${StableRound.sql4("exp(avg(ln(o_totalprice)))")} AS geo_mean,
               count(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
