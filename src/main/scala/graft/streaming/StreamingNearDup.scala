package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming MinHash-LSH near-duplicate suppression — the continuous
  * twin of q25/q73's batch near-dedup, for an always-on ingest where
  * today's crawl must not re-admit yesterday's documents.
  *
  * Shape: the per-document signature is the same narrow
  * `minhash_signature` kernel as q25 (one pass, no shuffle), and the
  * cross-batch memory is a registered-buckets table — (band, ha, hb)
  * keys of every document ever seen — kept as parquet and consulted
  * with a left-semi join per micro-batch. A document is suppressed when
  * it shares ANY band bucket with an earlier document: earlier batch
  * (bucket already registered) or earlier `doc_id` in the same batch
  * (the q25 in-batch rule, so a single-batch run is exactly the batch
  * operator).
  *
  * This is deliberately a `foreachBatch` composition of batch
  * operators rather than `flatMapGroupsWithState`: the keep/drop
  * decision needs all 8 buckets of a document while stateful ops key
  * by ONE group, and chaining a stateful band-pass into a per-doc
  * aggregation is unsupported. The micro-batch join against a
  * compacted state table is the standard production pattern.
  *
  * Scale: per batch the corpus-side work is one signature scan + one
  * semi-join + one bucket groupBy on batch-sized data; the state table
  * grows by O(8 × new docs) small fixed-width rows and is periodically
  * compactable with SilverStore.compact. At 1000-executor scale the
  * state read is a parquet scan pruned to the join keys; bucketing the
  * state table on (band, ha, hb) turns the semi-join shuffle-free.
  *
  * Exactly-once: outputs are written per micro-batch to
  * `_batch=<id>` subdirectories with overwrite, so a replayed batch
  * (crash between write and checkpoint commit) rewrites the same
  * directories instead of duplicating rows.
  */
object StreamingNearDup {

  /** (doc_id, band, ha, hb) band buckets — q25's banding via the ONE
    * shared definition (TextQueries.explodeBands): 16 minhash pieces,
    * 8 bands of 2. */
  def bandBuckets(docs: DataFrame): DataFrame =
    graft.text.TextQueries.explodeBands(
      docs.select(col("doc_id"),
          graft.text.TextFunctions.minhash_signature(col("text"), 3).as("sig"))
        .filter(col("sig").isNotNull))

  /** doc_ids of batch documents whose band buckets are already
    * registered. Join order is the scale contract (StreamingSpec pins
    * the plan): the state side is 8 rows per document EVER seen and
    * must stream through a hash probe built from a BROADCAST of the
    * micro-batch's buckets — never be shuffled. */
  private[graft] def stateHits(st: DataFrame,
                               buckets: DataFrame): DataFrame =
    st.select("band", "ha", "hb")
      .join(broadcast(buckets), Seq("band", "ha", "hb"))
      .select(col("doc_id")).distinct()

  /** One micro-batch of near-dup suppression: returns nothing, appends
    * survivors to `keptDir` and their buckets to `stateDir` (both under
    * `_batch=<batchId>` for idempotent replay). */
  def dedupBatch(batch: DataFrame, batchId: Long,
                 stateDir: String, keptDir: String): Unit = {
    val spark = batch.sparkSession
    val buckets = bandBuckets(batch).cache()
    try {
      val registered: Option[DataFrame] = {
        val p = new Path(stateDir)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          // a REPLAYED batch (crash between write and checkpoint
          // commit) finds its own _batch=<id> partition already
          // registered; reading it back would make every document
          // self-collide and overwrite the kept output as empty —
          // exclude the current batch id from the state read
          Some(spark.read.parquet(stateDir)
            .filter(col("_batch") =!= batchId))
        else None
      }
      // suppressed by an earlier batch: any bucket already registered.
      // Join ORDER matters at scale: the state is 8 rows per document
      // EVER seen, the batch is one micro-batch — so probe the state
      // scan with a BROADCAST of the batch's buckets (state-side rows
      // stream through the hash probe, never shuffled). The naive
      // `batch left_semi state` would shuffle the entire state table
      // every trigger (left-semi can only broadcast its right side).
      val hitState = registered match {
        case Some(st) => stateHits(st, buckets)
        case None => spark.range(0).select(col("id").as("doc_id"))
      }
      // suppressed within the batch: q25's rule — every doc in a bucket
      // except the earliest (by doc_id) is removed
      val hitBatch = buckets
        .groupBy(col("band"), col("ha"), col("hb"))
        .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")) > 1)
        // length = size(docs): slice clamps to the array end; an
        // Int.MaxValue length would overflow to empty under
        // interpreted (non-codegen) evaluation
        .select(explode(slice(col("docs"), lit(2), size(col("docs")))).as("doc_id"))
        .distinct()
      val removed = hitBatch.unionByName(hitState).distinct()
      val kept = batch.join(removed, Seq("doc_id"), "left_anti")

      kept.write.mode("overwrite").parquet(s"$keptDir/_batch=$batchId")
      // register buckets of ALL batch docs (removed ones included) —
      // the batch rule bases removal on earlier documents whether or
      // not those survived, and registering only survivors would let a
      // near-dup of a REMOVED doc slip through later
      buckets.select("band", "ha", "hb").distinct()
        .write.mode("overwrite").parquet(s"$stateDir/_batch=$batchId")
    } finally buckets.unpersist()
  }

  /** Compact the registered-buckets state: one `_batch=N` dir lands
    * per micro-batch, so a long-lived stream accumulates 10⁶ small
    * dirs and listing cost eats the semi-join (the same small-files
    * problem SilverStore.compact solves for Silver tables). Rewrites
    * the whole state as ONE deduplicated `_batch=-1` partition (-1 is
    * never a real batch id, so the replay exclusion filter is
    * unaffected) via write-aside + atomic rename. Run while the
    * stream is STOPPED — it is the state's single writer then.
    * Returns (dirs_before, rows_after). */
  def compactState(spark: SparkSession, stateDir: String): (Int, Long) = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return (0, 0L)
    val before = fs.listStatus(p).count(_.isDirectory)
    val tmp = new Path(p.getParent, p.getName + s"-compact-${java.util.UUID.randomUUID}")
    spark.read.parquet(stateDir).select("band", "ha", "hb").distinct()
      .write.parquet(new Path(tmp, "_batch=-1").toString)
    val rows = spark.read.parquet(tmp.toString).count()
    fs.delete(p, true)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"state compaction swap failed for $stateDir")
    (before, rows)
  }

  /** Drain everything pending from `docs` (a streaming frame with
    * doc_id/text) through the near-dup filter and stop. */
  def runAvailableNow(docs: DataFrame, checkpointDir: String,
                      stateDir: String, keptDir: String): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        dedupBatch(batch, id, stateDir, keptDir)
      }
      .start()
}
