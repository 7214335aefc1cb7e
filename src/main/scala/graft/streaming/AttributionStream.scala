package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.analytics.Attribution

/** Streaming multi-touch attribution — the stream twin of q197's
  * [[Attribution.fold]], completing the fold family's streaming
  * coverage (rollups: [[RollupStream]]; SCD2: [[Scd2Stream]]; vectors:
  * [[VectorIngest]]; postings: [[Bm25Ingest]]): each micro-batch of
  * raw events splits into touches and conversions, the conversions are
  * credited against the stored per-user timeline (lookback-horizon
  * touches + one floor sentinel — O(rate × lookback) state per user,
  * never the touch history), per-conversion credits land in
  * `creditsDir/batch=<id>`, and the pruned timeline becomes the next
  * version of the state store.
  *
  * Idempotence under foreachBatch's AT-LEAST-ONCE contract is the
  * [[RollupStream.foldBatch]] versioned-store discipline verbatim:
  * batch `id` reads the latest state version STRICTLY BELOW `id` and
  * writes `v<id>` by staged swap, so a replay rebuilds `v<id>` from
  * exactly the same input state; the credit sink overwrites its own
  * `batch=<id>` directory (the [[EventStreams.writeFlagsBatch]]
  * pattern) instead of appending duplicates.
  *
  * Ordering contract (inherited from [[Attribution.fold]], enforced
  * loudly there): per-user event-time order across micro-batches —
  * touches strictly after the user's stored frontier, conversions
  * at-or-after it. Out-of-order backfill needs pruned rows and must
  * replay [[Attribution.perConversion]] over the raw log instead. */
object AttributionStream {

  /** Start the maintainer over a raw event stream with columns
    * (`user`, `ts`, `channel`, `tie`) where `channel` ∈ `channels`
    * marks a touch and `channel` == `conversionType` a conversion. */
  def maintainAttribution(events: DataFrame, channels: Seq[String],
                          conversionType: String, lookbackUs: Long,
                          storeDir: String, creditsDir: String,
                          checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        foldBatch(df, id, channels, conversionType, lookbackUs,
          storeDir, creditsDir)
      }
      .start()

  /** One micro-batch's fold — factored so the replay property is
    * unit-testable: calling this twice with the same `id` leaves both
    * the store and the credit output row-identical. */
  private[graft] def foldBatch(batch: DataFrame, id: Long,
                               channels: Seq[String],
                               conversionType: String, lookbackUs: Long,
                               storeDir: String,
                               creditsDir: String): Unit = {
    val s = batch.sparkSession
    val root = java.nio.file.Paths.get(storeDir)
    java.nio.file.Files.createDirectories(root)
    RollupStream.sweepTmp(root)
    val touches = batch.filter(col("channel").isin(channels: _*))
      .select(col("user"), col("ts"), col("channel"), col("tie"))
    val conversions = batch.filter(col("channel") === conversionType)
      .select(col("user"), col("ts"), col("tie").as("cid"))
    val state = latestBefore(root, id) match {
      case Some(v) => s.read.parquet(root.resolve(s"v$v").toString)
      case None    => Attribution.initState(touches, channels)
    }
    // pinned fold: the credit write and the state write are two
    // ACTIONS over the shared (stored slice ∪ annotated batch)
    // timeline — unpinned they would evaluate the state read + batch
    // window + guards twice per micro-batch
    val (credits, nextState, release) = Attribution.foldPinned(state,
      touches, conversions, channels,
      org.apache.spark.sql.functions.lit(lookbackUs))
    try {
      // credits first: if we crash between the two writes, the replay
      // re-reads the OLD state version (v<id> not yet swapped) and
      // overwrites batch=<id> with identical rows
      credits.write.mode("overwrite").parquet(s"$creditsDir/batch=$id")
      val tmp = root.resolve("_tmp-" + java.util.UUID.randomUUID)
      nextState.write.mode("overwrite").parquet(tmp.toString)
      val dest = root.resolve(s"v$id")
      graft.text.Artifacts.deleteRecursively(dest) // stale replay output
      java.nio.file.Files.move(tmp, dest,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally release()
  }

  /** All credited conversions so far (every batch directory). */
  def serveCredits(spark: org.apache.spark.sql.SparkSession,
                   creditsDir: String): DataFrame =
    spark.read.parquet(creditsDir)

  /** Drop superseded state versions, keeping the newest `keep`. */
  def prune(storeDir: String, keep: Int = 2): Unit =
    graft.etl.VersionedDir.prune(storeDir, keep)

  private def latestBefore(root: java.nio.file.Path, id: Long)
      : Option[Long] = graft.etl.VersionedDir.latestBefore(root, id)
}
