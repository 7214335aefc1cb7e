package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming Bronze ingestion (SURVEY §2 A1-A3 / I).
  *
  * The reference's "streaming" is one Cloud Function invocation per
  * landed file (`README.md:184`, GCS `object.finalize`), with the Drive
  * mover marking files consumed by reparenting
  * (`ingesta-drive-gcs/src/index.ts:119-126`). The Spark-native
  * equivalent is a Structured Streaming **file source** over the landing
  * prefix:
  *
  *  - new-file discovery == the event trigger (each file becomes part of
  *    exactly one micro-batch, tracked in the checkpoint log — replaces
  *    the Drive nuevos/procesados move);
  *  - `Trigger.AvailableNow` == "process everything that has landed,
  *    then stop" (the batch-ETL replay mode);
  *  - `cleanSource=archive` == the move-to-procesados semantics;
  *  - `foreachBatch` runs the SAME batch Silver transform per
  *    micro-batch, so batch and streaming share one code path.
  *
  * Scale: file listing is incremental (only new files per batch);
  * `maxFilesPerTrigger` bounds micro-batch size so a backlog of 10⁶
  * landed files cannot produce one giant batch.
  */
object StreamingIngest {

  /** Streaming equivalent of [[graft.etl.BronzeReader.read]] — same CSV
    * contract, same metadata columns. */
  def bronzeStream(spark: SparkSession, landingDir: String,
                   schema: StructType,
                   maxFilesPerTrigger: Int = 1000,
                   archiveDir: Option[String] = None): DataFrame = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt", StringType, nullable = true))
    val r = spark.readStream
      .schema(withCorrupt)
      .option("delimiter", ";")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("enforceSchema", "false")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    val archived = archiveDir match {
      case Some(dir) =>
        r.option("cleanSource", "archive").option("sourceArchiveDir", dir)
      case None => r
    }
    archived.csv(landingDir)
      .withColumn("_source_file",
        element_at(split(input_file_name(), "/"), -1))
      .withColumn("_load_date", current_date())
    // NB: no `_row_id` here — monotonically_increasing_id is rejected
    // on streaming frames; runAvailableNow stamps it per micro-batch.
  }

  /** Run `transform` over every pending file batch and stop — the
    * replayable per-file micro-batch loop of the reference ETL. The
    * checkpoint gives exactly-once per file: a crashed run re-processes
    * only unacknowledged batches. Each micro-batch (a plain batch
    * DataFrame) gets file-order `_row_id`s here — the Silver pipelines'
    * last-wins dedup and child ordering depend on them, and the id
    * expression is not allowed on the unbounded frame itself. */
  def runAvailableNow(bronze: DataFrame, checkpointDir: String)
                     (transform: (DataFrame, Long) => Unit): StreamingQuery =
    bronze.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // File-order ids: within a file, monotonically_increasing_id
        // follows split offsets; ACROSS files Spark packs partitions by
        // size (largest first), so the raw id would scramble file order
        // and break last-wins dedup between a stale file and its newer
        // correction. Ranking by (_source_file, in-file id) restores the
        // reference's landing order (file names carry dates). The global
        // window is acceptable for one bounded micro-batch (the batch
        // pipelines see one file per call).
        val withIds =
          if (batch.columns.contains("_row_id")) batch
          else {
            val w = org.apache.spark.sql.expressions.Window
              .orderBy(col("_source_file"), monotonically_increasing_id())
            batch.withColumn("_row_id", row_number().over(w).cast("long"))
          }
        transform(withIds, id)
      }
      .start()
}
