package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.analytics.Funnel

/** Streaming funnel maintenance — the stream twin of q203's
  * [[Funnel.fold]] (the fold family's streaming coverage, sixth
  * member): each micro-batch of (user, ts, step) events folds into the
  * stored per-user floor state at batch cost, and [[serveSummary]]
  * reads the funnel report one trigger after the events arrive. State
  * is O(users × steps) — floors and a frontier per user, never events.
  *
  * Idempotence is the [[RollupStream.foldBatch]] versioned-store
  * discipline verbatim: batch `id` folds from the latest state version
  * STRICTLY BELOW `id` and claims `v<id>` by staged swap — a replay
  * rebuilds `v<id>` from exactly the same input. Ordering contract
  * inherited from [[Funnel.fold]] and enforced loudly there: per-user
  * event-time order across micro-batches.
  *
  * Scale contract (r17): state lives in [[BucketedStateStore]],
  * hash-bucketed by user — a fold reads and rewrites ONLY the buckets
  * containing the batch's users (the manifest references the rest in
  * their previous owners), so per-batch write cost tracks the batch,
  * not the user population; the r16 store rewrote the full user-grain
  * table every trigger. */
object FunnelStream {

  def maintainFunnel(events: DataFrame, steps: Seq[String],
                     windowUs: Long, storeDir: String,
                     checkpointDir: String,
                     buckets: Int = 64): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        foldBatch(df, id, steps, windowUs, storeDir, buckets)
        ()
      }
      .start()

  /** One micro-batch's fold — factored so the replay property is
    * unit-testable. */
  private[graft] def foldBatch(batch: DataFrame, id: Long,
                               steps: Seq[String], windowUs: Long,
                               storeDir: String, buckets: Int = 64)
      : BucketedStateStore.FoldStats = {
    val w = org.apache.spark.sql.functions.lit(windowUs)
    BucketedStateStore.foldBatch(batch, id, storeDir, Seq("user"), buckets,
      init = b => Funnel.fold(Funnel.initState(b, steps), b, steps, w),
      fold = (slice, b) => Funnel.fold(slice, b, steps, w))
  }

  /** The funnel report from the latest complete state version. */
  def serveSummary(spark: SparkSession, storeDir: String,
                   steps: Seq[String]): DataFrame =
    Funnel.summary(BucketedStateStore.readAll(spark,
      java.nio.file.Paths.get(storeDir), "funnel"), steps)

  /** Drop superseded state versions, keeping the newest `keep` plus
    * whatever their manifests still reference. */
  def prune(storeDir: String, keep: Int = 2): Unit =
    BucketedStateStore.prune(storeDir, keep)
}
