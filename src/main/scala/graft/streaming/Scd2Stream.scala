package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.Scd2

/** Streaming maintenance of an SCD TYPE-2 dimension — the stream twin
  * of q187's [[Scd2.fold]], completing the fold family's streaming
  * coverage (rollups: [[RollupStream]]; vectors: [[VectorIngest]];
  * retrieval postings: [[Bm25Ingest]]; now the interval dimension):
  * each micro-batch of change rows folds into the stored interval
  * table at BATCH scale — untouched keys pass through the broadcast
  * anti-join, only touched keys' histories re-window ([[Scd2.fold]]'s
  * contract) — so an as-of probe (q186) served from the store sees new
  * versions one trigger after the change arrives, with history intact.
  *
  * Idempotence under foreachBatch's AT-LEAST-ONCE contract is the
  * [[RollupStream.foldBatch]] versioned-store discipline verbatim: a
  * naive read-fold-overwrite corrupts on replay (the replayed batch
  * would fold into state that already closed its intervals), so batch
  * `id` reads the latest version STRICTLY BELOW `id` and writes
  * `v<id>` by staged swap — a replay rebuilds `v<id>` from exactly
  * the same input state and overwrites its own output.
  *
  * Ordering contract (inherited from [[Scd2.fold]], enforced loudly
  * there): every change must sequence strictly after its key's stored
  * current version — the stream must be per-key ordered across
  * micro-batches (a CDC log offset in `seqCols` gives this for free);
  * out-of-order backfill is a [[Scd2.build]] over the raw log, not a
  * stream fold.
  *
  * Scale contract (r17): state lives in [[BucketedStateStore]],
  * hash-bucketed by the dimension key — a fold reads and rewrites
  * ONLY the buckets containing the batch's keys (the manifest
  * references the rest in their previous owners), so per-batch write
  * cost tracks the batch, not the dimension; the r16 store rewrote
  * the complete interval table every trigger. */
object Scd2Stream {

  /** Start the maintainer: every micro-batch of raw change rows folds
    * into the versioned interval store under `storeDir`. */
  def maintainScd2(changes: DataFrame, keys: Seq[String],
                   seqCols: Seq[String], attrs: Seq[String],
                   storeDir: String, checkpointDir: String,
                   compress: Boolean = true,
                   buckets: Int = 64): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        foldBatch(df, id, keys, seqCols, attrs, storeDir, compress,
          buckets)
        ()
      }
      .start()

  /** One micro-batch's fold — factored so the replay property is
    * unit-testable: calling this twice with the same `id` leaves the
    * store row-identical. */
  private[graft] def foldBatch(batch: DataFrame, id: Long,
                               keys: Seq[String], seqCols: Seq[String],
                               attrs: Seq[String], storeDir: String,
                               compress: Boolean = true,
                               buckets: Int = 64)
      : BucketedStateStore.FoldStats =
    BucketedStateStore.foldBatch(batch, id, storeDir, keys, buckets,
      init = b => Scd2.build(b, keys, seqCols, attrs, compress),
      fold = (slice, b) =>
        Scd2.fold(slice, b, keys, seqCols, attrs, compress))

  /** The maintained interval table (latest complete version) — the
    * frame q186's as-of probe joins facts against. */
  def serveScd2(spark: SparkSession, storeDir: String): DataFrame =
    BucketedStateStore.readAll(spark,
      java.nio.file.Paths.get(storeDir), "scd2")

  /** Drop superseded versions, keeping the newest `keep` plus whatever
    * their manifests still reference. */
  def prune(storeDir: String, keep: Int = 2): Unit =
    BucketedStateStore.prune(storeDir, keep)
}
