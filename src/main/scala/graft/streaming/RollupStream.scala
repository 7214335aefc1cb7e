package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.CascadedRollup
import graft.operators.CascadedRollup.Agg

/** Streaming maintenance of a rollup's finest-grain state — the
  * stream twin of q176's [[CascadedRollup.foldFinest]] ingest fold.
  *
  * Each micro-batch folds into a stored finest-grain aggregate table
  * at batch + GROUP scale (the historical fact rows are never
  * re-read), and every rollup level re-derives from that state on
  * demand via [[CascadedRollup.cascadeFrom]] — so a live multi-level
  * dashboard costs |groups| per refresh, not a corpus re-aggregation.
  *
  * Idempotence under foreachBatch's AT-LEAST-ONCE contract: a naive
  * read-fold-overwrite store corrupts on replay (the replayed batch
  * would fold into state that already contains it — sums double).
  * The store is therefore VERSIONED BY BATCH ID: batch `id` reads the
  * latest version STRICTLY BELOW `id` and writes `v<id>` by staged
  * swap (write tmp → delete any stale `v<id>` from a crashed attempt
  * → atomic rename), so a replay rebuilds `v<id>` from exactly the
  * same input state and overwrites its own output — the
  * `batch=<id>`-directory discipline of
  * [[EventStreams.writeFlagsBatch]], upgraded to a read-modify-write
  * fold. Readers take the highest complete version; a crash between
  * delete and rename leaves `v<id>` missing, which the replay
  * recreates, and never a half-written dir (tmp is underscore-hidden
  * so even a listing race cannot read it as a version).
  *
  * Scale contract: the versioned state is the FINEST-GRAIN frame —
  * |groups| rows, group-scale, the same "metadata not data" budget as
  * [[graft.etl.VersionedDir]] (retention: old versions are
  * supersedable; [[prune]] keeps the last `keep`). Append-only
  * semantics, as [[CascadedRollup.foldFinest]] documents: sum/count
  * retract, min/max do not.
  */
object RollupStream {

  /** Start the maintainer: every micro-batch of raw fact rows folds
    * into the versioned finest-grain store under `storeDir`. */
  def maintainRollup(facts: DataFrame, dims: Seq[String], aggs: Seq[Agg],
                     storeDir: String, checkpointDir: String)
      : StreamingQuery =
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        foldBatch(df, id, dims, aggs, storeDir)
      }
      .start()

  /** One micro-batch's fold — factored so the replay property is
    * unit-testable: calling this twice with the same `id` leaves the
    * store row-identical (the second call re-reads the same
    * below-`id` input state and overwrites its own `v<id>`). */
  private[graft] def foldBatch(batch: DataFrame, id: Long,
                               dims: Seq[String], aggs: Seq[Agg],
                               storeDir: String): Unit = {
    val s = batch.sparkSession
    val root = java.nio.file.Paths.get(storeDir)
    java.nio.file.Files.createDirectories(root)
    sweepTmp(root) // a crash between write and move leaks `_tmp-*`;
                   // this fold is the single writer, so any survivor
                   // is stale by definition (SilverStore.sweepTmp's
                   // discipline)
    val folded = latestBefore(root, id) match {
      case Some(v) =>
        CascadedRollup.foldFinest(
          s.read.parquet(root.resolve(s"v$v").toString),
          batch, dims, aggs)
      case None => CascadedRollup.aggregateFinest(batch, dims, aggs)
    }
    val tmp = root.resolve("_tmp-" + java.util.UUID.randomUUID)
    folded.write.mode("overwrite").parquet(tmp.toString)
    val dest = root.resolve(s"v$id")
    graft.text.Artifacts.deleteRecursively(dest) // stale replay output
    java.nio.file.Files.move(tmp, dest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Serve every rollup level from the maintained state — group-scale
    * input, no fact-table access. */
  def serveRollup(spark: SparkSession, storeDir: String,
                  dims: Seq[String], aggs: Seq[Agg]): DataFrame = {
    val root = java.nio.file.Paths.get(storeDir)
    val v = latest(root).getOrElse(
      sys.error(s"no rollup state under $storeDir"))
    CascadedRollup.cascadeFrom(
      spark.read.parquet(root.resolve(s"v$v").toString), dims, aggs)
  }

  /** Drop superseded versions, keeping the newest `keep` (each is a
    * complete group-scale snapshot, so retention is a pure
    * storage/lineage choice — replay never reaches past the previous
    * version). */
  def prune(storeDir: String, keep: Int = 2): Unit =
    graft.etl.VersionedDir.prune(storeDir, keep)

  /** Delete orphaned `_tmp-*` staging dirs (a crash between the tmp
    * write and the atomic move leaks one; nothing else ever cleans
    * them, so they would accumulate across restarts). Called by the
    * single writer before staging its own tmp. */
  private[graft] def sweepTmp(root: java.nio.file.Path): Unit =
    graft.etl.VersionedDir.sweep(root, "_tmp-")

  private def latest(root: java.nio.file.Path): Option[Long] =
    graft.etl.VersionedDir.versions(root).maxOption

  private def latestBefore(root: java.nio.file.Path, id: Long)
      : Option[Long] = graft.etl.VersionedDir.latestBefore(root, id)
}
