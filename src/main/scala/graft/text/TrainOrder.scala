package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.Tables

/** The full-epoch training-order writer — the operator a training run
  * actually consumes; q92's manifest is its spot-checkable summary.
  *
  * Every document gets a pseudo-random sort key md5(epoch-seed |
  * doc_id) — a pure function of the key, so the global order is
  * reproducible across reshards, retries, and engines (the q71/q75
  * determinism discipline applied to ORDERING) — and a shard from the
  * key's top 32 bits. The epoch is then written shard-partitioned,
  * each shard's file(s) in key order.
  *
  * Scale shape: NO global sort and NO window. `repartition(shard)`
  * is one hash exchange; `sortWithinPartitions(shard, k)` is a
  * spillable per-task external sort (constant memory at any shard
  * size); `partitionBy("shard")` splits a task's rows into per-shard
  * files PRESERVING row order, so each shard directory's file order
  * IS the epoch order. At 100 TB the shard count is chosen so a shard
  * fits a task comfortably (e.g. 10k+ shards, not 8) — shards/task
  * layout changes, the on-disk contract does not.
  */
object TrainOrder {

  /** Documents with their epoch sort key and shard — the shared
    * keying logic of q92 (manifest), q100 (fingerprint), and
    * [[writeEpoch]]. */
  def epochOrder(docs: DataFrame, epoch: Int, shards: Int): DataFrame =
    docs
      .withColumn("k",
        md5(concat(lit(s"epoch$epoch|"), col("doc_id").cast("string"))))
      .withColumn("shard",
        expr("conv(substring(k, 1, 8), 16, 10)").cast("long") % shards)

  /** Write the complete epoch order for the documents under `d` to
    * `out`: one directory per shard, rows in md5-key order on disk. */
  def writeEpoch(s: SparkSession, d: String, out: String,
                 epoch: Int = 0, shards: Int = 8): Unit =
    writeEpochOf(Tables.documents(s, d), out, epoch, shards)

  /** Frame-based twin of [[writeEpoch]] for callers that already hold
    * a curated subset (graft.Curation) rather than a dataset dir. Same
    * keying, same on-disk contract. */
  def writeEpochOf(docs: DataFrame, out: String,
                   epoch: Int = 0, shards: Int = 8): Unit =
    epochOrder(docs, epoch, shards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("k"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)

  /** [[epochOrder]] with a CURRICULUM major key: each document gets a
    * quality band (`band` 0 = lowest .. bands−1 = highest, from the
    * shared composite quality score, plus `q_e4` for auditing), and
    * the on-disk order within each shard becomes (band, md5 key) —
    * a sequential reader sees low → high quality with reproducible
    * intra-band shuffle (flip `ascending` for the hard-first
    * curriculum). Band math is floor(q·bands) clamped to bands−1 —
    * the q160 audit replays it in DuckDB. Null text scores q_e4 = 0
    * (the COALESCE below): without it quality_score(null) is null,
    * and both engines' null-skipping least() would silently promote
    * null-text documents into the TOP band — the r10 advisor catch. */
  def curriculumOrder(docs: DataFrame, epoch: Int, shards: Int,
                      bands: Int): DataFrame =
    epochOrder(docs, epoch, shards)
      .withColumn("q_e4",
        coalesce(
          floor(TextFunctions.quality_score(col("text")) * 10000 + 0.5)
            .cast("long"),
          lit(0L)))
      .withColumn("band",
        least(expr("q_e4 * " + bands + " div 10000"), lit(bands - 1L)))

  /** The curriculum twin of [[writeEpochOf]]: shard-partitioned, rows
    * per shard in (band, key) order. Same scale contract — one hash
    * exchange, spillable per-task sorts, no global sort, no window. */
  def writeCurriculumEpochOf(docs: DataFrame, out: String,
                             epoch: Int = 0, shards: Int = 8,
                             bands: Int = 8,
                             ascending: Boolean = true): Unit =
    curriculumOrder(docs, epoch, shards, bands)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"),
        if (ascending) col("band").asc else col("band").desc, col("k"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
}
