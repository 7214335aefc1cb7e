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
  * swap, so a replay rebuilds `v<id>` from exactly the same input
  * state and overwrites its own output — the `batch=<id>`-directory
  * discipline of [[EventStreams.writeFlagsBatch]], upgraded to a
  * read-modify-write fold.
  *
  * Scale contract (r17): state lives in [[BucketedStateStore]] — rows
  * hash-bucket by the FULL dims tuple, a batch's fold reads and
  * rewrites ONLY the buckets its groups hash into, and the version
  * manifest references untouched buckets in their previous owners.
  * Per-batch write cost is therefore O(|touched buckets|), never
  * O(|groups|) — the LabelStore publication discipline; the r16 store
  * rewrote the complete group table every trigger. [[foldBatch]]
  * returns the [[BucketedStateStore.FoldStats]] evidence. Distributive
  * aggs only, as [[CascadedRollup.foldFinest]] documents: sum/count
  * retract, min/max do not (append-only ingest).
  */
object RollupStream {

  /** Start the maintainer: every micro-batch of raw fact rows folds
    * into the versioned finest-grain store under `storeDir`. */
  def maintainRollup(facts: DataFrame, dims: Seq[String], aggs: Seq[Agg],
                     storeDir: String, checkpointDir: String,
                     buckets: Int = 64): StreamingQuery =
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        foldBatch(df, id, dims, aggs, storeDir, buckets)
        ()
      }
      .start()

  /** One micro-batch's fold — factored so the replay property is
    * unit-testable: calling this twice with the same `id` leaves the
    * store row-identical (the second call re-reads the same
    * below-`id` input state and overwrites its own `v<id>`). */
  private[graft] def foldBatch(batch: DataFrame, id: Long,
                               dims: Seq[String], aggs: Seq[Agg],
                               storeDir: String, buckets: Int = 64)
      : BucketedStateStore.FoldStats =
    BucketedStateStore.foldBatch(batch, id, storeDir, dims, buckets,
      init = b => CascadedRollup.aggregateFinest(b, dims, aggs),
      fold = (slice, b) => CascadedRollup.foldFinest(slice, b, dims, aggs))

  /** Serve every rollup level from the maintained state — group-scale
    * input, no fact-table access. */
  def serveRollup(spark: SparkSession, storeDir: String,
                  dims: Seq[String], aggs: Seq[Agg]): DataFrame =
    CascadedRollup.cascadeFrom(
      BucketedStateStore.readAll(spark,
        java.nio.file.Paths.get(storeDir), "rollup"), dims, aggs)

  /** Drop superseded versions, keeping the newest `keep` plus whatever
    * their manifests still reference. */
  def prune(storeDir: String, keep: Int = 2): Unit =
    BucketedStateStore.prune(storeDir, keep)
}
