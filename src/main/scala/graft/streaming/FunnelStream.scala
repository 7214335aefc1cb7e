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
  * event-time order across micro-batches. */
object FunnelStream {

  def maintainFunnel(events: DataFrame, steps: Seq[String],
                     windowUs: Long, storeDir: String,
                     checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        foldBatch(df, id, steps, windowUs, storeDir)
      }
      .start()

  /** One micro-batch's fold — factored so the replay property is
    * unit-testable. */
  private[graft] def foldBatch(batch: DataFrame, id: Long,
                               steps: Seq[String], windowUs: Long,
                               storeDir: String): Unit = {
    val s = batch.sparkSession
    val root = java.nio.file.Paths.get(storeDir)
    java.nio.file.Files.createDirectories(root)
    RollupStream.sweepTmp(root)
    val state = graft.etl.VersionedDir.latestBefore(root, id) match {
      case Some(v) => s.read.parquet(root.resolve(s"v$v").toString)
      case None    => Funnel.initState(batch, steps)
    }
    val next = Funnel.fold(state, batch, steps,
      org.apache.spark.sql.functions.lit(windowUs))
    val tmp = root.resolve("_tmp-" + java.util.UUID.randomUUID)
    next.write.mode("overwrite").parquet(tmp.toString)
    val dest = root.resolve(s"v$id")
    graft.text.Artifacts.deleteRecursively(dest) // stale replay output
    java.nio.file.Files.move(tmp, dest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The funnel report from the latest complete state version. */
  def serveSummary(spark: SparkSession, storeDir: String,
                   steps: Seq[String]): DataFrame = {
    val root = java.nio.file.Paths.get(storeDir)
    val v = graft.etl.VersionedDir.versions(root).maxOption
      .getOrElse(sys.error(s"no funnel state under $storeDir"))
    Funnel.summary(
      spark.read.parquet(root.resolve(s"v$v").toString), steps)
  }

  /** Drop superseded state versions, keeping the newest `keep`. */
  def prune(storeDir: String, keep: Int = 2): Unit =
    graft.etl.VersionedDir.prune(storeDir, keep)
}
