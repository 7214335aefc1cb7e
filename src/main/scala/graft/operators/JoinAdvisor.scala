package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight join planning from measurements, not guesses — the
  * consumer the q150/q148 estimator family was built for. Before
  * launching a 100 TB join, two cheap passes per side answer the three
  * questions that pick the physical strategy:
  *
  *   1. ''How big is each side?''  (row count — the broadcast test)
  *   2. ''How skewed are the keys?''  (per-key degree rollup: distinct
  *      keys + max single-key row count — q148's degree-shape signal,
  *      distilled to what the decision needs)
  *   3. ''How big is the OUTPUT?''  (AGMS/Count-Sketch inner product —
  *      q150's unbiased join-size estimate, reported so the caller can
  *      size `spark.sql.shuffle.partitions` for the result)
  *
  * Cost contract: per side, ONE narrow constant-state sketch pass
  * (8 KiB buffer, no keyed exchange) and ONE map-side-combined degree
  * rollup (the only exchange, distinct-key-scale — the price of
  * actually knowing your skew; estimating a max from a sketch can
  * only bound it from below). Nothing here shuffles a row of payload.
  *
  * Decision thresholds (THE documented contract — callers tune per
  * cluster):
  *
  *   - `broadcastMaxRows` (default 1,000,000): a side at or below this
  *     row count broadcasts (≈64 MB at 64 B/row — inside Spark's
  *     default 10 MB auto threshold × the headroom an explicit
  *     broadcast hint is for). Smaller side wins ties.
  *   - `skewFactor` (default 4): with even hashing each reducer gets
  *     n/partitions rows; a SINGLE key holding more than skewFactor ×
  *     that share stalls its reducer ≥skewFactor× past the stage
  *     average (AQE's skewedPartitionFactor=5 is the same idea,
  *     measured post-shuffle; here it is measured pre-shuffle, which
  *     also covers hash joins and pre-AQE stacks).
  *   - salts = ceil(maxKeyRows / evenShare) clamped to [2, 32]:
  *     enough replicas to bring the hot key back to the even share,
  *     capped so the dim-side replication (×salts) stays bounded.
  *
  * The recommendation maps directly onto the repo's operators:
  * `BroadcastSide` → `broadcast()` hint, `Salted` →
  * [[SaltedJoin.inner]], `ShuffleHash` → `hint("shuffle_hash")`.
  */
object JoinAdvisor {

  sealed trait Strategy
  /** Broadcast `side` ("left" | "right"). */
  case class BroadcastSide(side: String) extends Strategy
  /** Plain shuffled hash join — both sides big, no dominating key. */
  case object ShuffleHash extends Strategy
  /** [[SaltedJoin]] with this many salts — a hot key would stall a
    * plain shuffle. */
  case class Salted(numSalts: Int) extends Strategy

  /** Per-side evidence: rows, distinct join keys, heaviest key. */
  case class SideStats(rows: Long, distinctKeys: Long, maxKeyRows: Long)

  /** The recommendation plus everything it was decided from. */
  case class Advice(strategy: Strategy, left: SideStats, right: SideStats,
                    estJoinRows: Long)

  def recommend(left: DataFrame, leftKey: String,
                right: DataFrame, rightKey: String,
                partitions: Int = 32,
                broadcastMaxRows: Long = 1000000L,
                skewFactor: Long = 4L): Advice = {
    require(partitions >= 1 && broadcastMaxRows >= 0 && skewFactor >= 1)
    val (ls, lsk) = measure(left, leftKey)
    val (rs, rsk) = measure(right, rightKey)
    Advice(choose(ls, rs, partitions, broadcastMaxRows, skewFactor),
      ls, rs, amsEstimate(lsk, rsk))
  }

  /** The threshold decision from measured stats — THE documented
    * contract, factored out of [[recommend]] so join types that
    * cannot broadcast the preserved side (left/left_semi/left_anti
    * may only broadcast the right — see [[SaltedJoin.auto]]) re-take
    * the SAME decision with the left branch masked off, and so a
    * caller that measured its sides on a cheaper dominating frame
    * can decide without re-measuring. With `canBroadcastLeft` the
    * decision is exactly the pre-r12 one: smaller fitting side
    * broadcasts, else the hot-key test picks Salted(n) or
    * ShuffleHash. */
  def choose(ls: SideStats, rs: SideStats, partitions: Int,
             broadcastMaxRows: Long, skewFactor: Long,
             canBroadcastLeft: Boolean = true): Strategy = {
    val leftFits = canBroadcastLeft && ls.rows <= broadcastMaxRows
    val rightFits = rs.rows <= broadcastMaxRows
    if (leftFits && (ls.rows <= rs.rows || !rightFits)) BroadcastSide("left")
    else if (rightFits) BroadcastSide("right")
    else {
      val bigger = if (ls.rows >= rs.rows) ls else rs
      val evenShare = math.max(bigger.rows / partitions, 1L)
      val hottest = math.max(ls.maxKeyRows, rs.maxKeyRows)
      if (hottest > skewFactor * evenShare) {
        val n = math.min(32L,
          math.max(2L, (hottest + evenShare - 1) / evenShare)).toInt
        Salted(n)
      } else ShuffleHash
    }
  }

  /** Turn [[Advice.estJoinRows]] into the knob it exists for: the
    * shuffle-partition count of the stage CONSUMING the join. With
    * even hashing each reducer handles estRows/partitions rows, so
    * partitions = ceil(estRows·bytesPerRow / targetPartitionBytes)
    * keeps every post-join partition near the target (default 128 MB —
    * the HDFS-block-sized unit Spark's own maxPartitionBytes uses),
    * instead of inheriting a global `spark.sql.shuffle.partitions`
    * that is simultaneously too big for small joins (scheduling
    * overhead) and too small for blow-ups (spill). `bytesPerRow` is
    * the caller's schema knowledge (default 64 B — a handful of
    * numeric columns); clamp bounds keep a wild estimate from
    * degenerating to 1 task or millions. */
  def suggestShufflePartitions(estJoinRows: Long, bytesPerRow: Long = 64L,
                               targetPartitionBytes: Long = 128L << 20,
                               minPartitions: Int = 2,
                               maxPartitions: Int = 1 << 16): Int = {
    require(estJoinRows >= 0 && bytesPerRow > 0 && targetPartitionBytes > 0)
    require(1 <= minPartitions && minPartitions <= maxPartitions)
    val bytes = estJoinRows.toDouble * bytesPerRow
    val n = math.ceil(bytes / targetPartitionBytes)
    math.min(maxPartitions.toDouble, math.max(minPartitions.toDouble, n))
      .toInt
  }

  /** One degree rollup (the exchange) + one narrow sketch pass.
    * NULL join keys are excluded up front (the r10 advisor catch):
    * the advised joins are equi-joins, which drop null keys, so a
    * null-heavy column must not read as the hottest key (falsely
    * triggering Salted) or inflate the broadcast-side row counts —
    * and the sketch pass already skips null hashes, so filtering
    * here also makes the two passes consistent. */
  private def measure(df0: DataFrame, key: String)
      : (SideStats, Array[Long]) = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
    val df = df0.filter(col(key).isNotNull)
    val deg = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n"),
        count(lit(1)).as("nd"),
        coalesce(max(col("c")), lit(0L)).as("mx"))
      .head()
    val cs = toC(graft.plans.CountSketchAgg(toE(col("h")))
      .toAggregateExpression())
    val sk = df.select(h60(col(key)).as("h")).agg(cs.as("s"))
      .head().getSeq[Long](0).toArray
    (SideStats(deg.getLong(0), deg.getLong(1), deg.getLong(2)), sk)
  }

  /** q150's canonical hash: md5-derived 60-bit key over the string
    * cast, so the estimate is comparable across key types. */
  private def h60(c: Column): Column =
    graft.text.TextQueries.md5Hash60(c.cast("string"))

  /** q150's AGMS inner product, driver-side over the two 8 KiB
    * buffers: per independent row j, Σ_b a[j][b]·b[j][b]; the median
    * of the 4 rows (floor-mean of the middle pair — the q150 rule)
    * tames the ‖A‖₂‖B‖₂/√w variance. Never negative-clamped: the
    * caller sees the raw unbiased estimate, floored at 0. */
  private def amsEstimate(a: Array[Long], b: Array[Long]): Long = {
    val w = graft.plans.CmsAgg.w
    val dots = (0 until graft.plans.CmsAgg.d).map { j =>
      var s = 0L; var i = 0
      while (i < w) { s += a(j * w + i) * b(j * w + i); i += 1 }
      s
    }.sorted
    math.max(0L, (dots(1) + dots(2)) >> 1)
  }
}
