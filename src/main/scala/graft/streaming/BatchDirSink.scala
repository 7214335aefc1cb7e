package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.etl.VersionedDir

/** The bounded-growth discipline for `foreachBatch` append sinks that
  * write one `batch=<id>` directory per trigger (the idempotent
  * overwrite-own-directory pattern of [[EventStreams.writeFlagsBatch]]
  * and [[AttributionStream.foldBatch]]'s credit write): one directory
  * per trigger is replay-safe but grows FOREVER (~500k dirs/year at a
  * 1-minute trigger — a listing-scale problem long before a data-scale
  * one). [[compact]] merges all but the newest batch directory (the
  * only id `foreachBatch` can still replay) into a versioned
  * `_compacted` store with a `through` watermark, and [[serve]] reads
  * compacted ∪ above-watermark dirs — row-identical across compaction,
  * with a stale replay of an already-compacted id EXCLUDED by the
  * watermark instead of double-served.
  *
  * Crash safety is the [[graft.etl.VersionedDir]] idiom: the merged
  * payload (rows + watermark sidecar) stages completely and lands by
  * atomic claim; a crash before the claim changes nothing, a crash
  * after it leaves stale batch dirs at-or-below the watermark that
  * [[serve]] already excludes and the next [[compact]] sweeps.
  *
  * Shared by the attribution credit sink
  * ([[AttributionStream.compactCredits]]) and the anomaly-flags sink
  * ([[EventStreams.compactFlags]]) — one recipe, two sinks, the specs
  * pin each end to end. */
object BatchDirSink {

  /** Everything written so far — WITH the `batch` provenance column
    * (the micro-batch id, long): the compacted store (if a compaction
    * ran — `batch` preserved as a data column) plus every `batch=<id>`
    * directory ABOVE the compaction watermark, read under `basePath`
    * so the partition column survives the explicit leaf-dir listing.
    * A stale replay directory of an already-compacted id is excluded
    * rather than double-served. Fails with a descriptive error when
    * the sink is empty (`what` names it). */
  def serve(spark: SparkSession, dir: String, what: String): DataFrame = {
    val (through, compacted) = compactedState(spark, dir)
    val fresh = batchDirs(dir).filter(_._1 > through)
    val parts = compacted.toSeq ++
      (if (fresh.isEmpty) Nil
       else Seq(readBatchDirs(spark, dir, fresh)))
    require(parts.nonEmpty,
      s"no $what batches yet under $dir — the maintainer has not " +
        "completed a micro-batch (or the directory is wrong)")
    parts.reduce(_ unionByName _)
  }

  /** Merge every `batch=<id>` directory EXCEPT the newest into the
    * versioned `_compacted` store, then delete the merged directories.
    * Returns the new watermark (or the old one when there was nothing
    * to compact). See the object doc for the crash-safety argument. */
  def compact(spark: SparkSession, dir: String): Long = {
    val dirs = batchDirs(dir)
    val (through, compacted) = compactedState(spark, dir)
    if (dirs.isEmpty) return through
    val newest = dirs.map(_._1).max
    val newThrough = math.max(newest - 1, through)
    val merge = dirs.filter(d => d._1 > through && d._1 < newest)
    val stale = dirs.filter(_._1 <= through) // already-compacted replays
    if (merge.nonEmpty || newThrough > through) {
      val root = Paths.get(dir, "_compacted")
      Files.createDirectories(root)
      VersionedDir.sweep(root, "._stage-")
      val stage = root.resolve("._stage-" + java.util.UUID.randomUUID)
      val merged = (compacted.toSeq ++
        (if (merge.isEmpty) Nil
         else Seq(readBatchDirs(spark, dir, merge))))
        .reduceOption(_ unionByName _)
      merged match {
        case Some(df) =>
          df.write.mode("overwrite")
            .parquet(stage.resolve("rows").toString)
        case None => Files.createDirectories(stage.resolve("rows"))
      }
      Files.writeString(stage.resolve("through"), newThrough.toString)
      VersionedDir.claim(root, stage)
      VersionedDir.prune(root.toString, 2)
    }
    // merged dirs and stale replay leftovers are now redundant — their
    // rows are served from the compacted store
    (merge ++ stale).foreach(d =>
      graft.text.Artifacts.deleteRecursively(Paths.get(d._2)))
    newThrough
  }

  /** Explicit `batch=<id>` leaf dirs under a shared basePath, so the
    * `batch` partition column is inferred; cast long (inference would
    * type small ids int) so compacted data rows union losslessly. */
  private def readBatchDirs(spark: SparkSession, dir: String,
                            dirs: Seq[(Long, String)]): DataFrame =
    spark.read.option("basePath", dir).parquet(dirs.map(_._2): _*)
      .withColumn("batch", col("batch").cast("long"))

  /** (watermark, compacted rows) from the newest complete `_compacted`
    * version; (-1, None) when compaction has never run. */
  private def compactedState(spark: SparkSession, dir: String)
      : (Long, Option[DataFrame]) = {
    val root = Paths.get(dir, "_compacted")
    VersionedDir.versions(root).maxOption match {
      case None => (-1L, None)
      case Some(v) =>
        val vdir = root.resolve(s"v$v")
        val through = Files.readString(vdir.resolve("through")).trim.toLong
        val rows = vdir.resolve("rows")
        val hasRows = Files.isDirectory(rows) && {
          val st = Files.list(rows)
          try st.anyMatch(p =>
            p.getFileName.toString.startsWith("part-"))
          finally st.close()
        }
        (through, if (!hasRows) None else {
          val df = spark.read.parquet(rows.toString)
          // a store compacted before rows carried their provenance
          // column has no `batch` — null-fill it (the ids are gone for
          // good: merged rows predate the column) so serve/compact
          // union cleanly instead of throwing on the schema gap
          Some(if (df.columns.contains("batch")) df
               else df.withColumn("batch",
                 org.apache.spark.sql.functions.lit(null).cast("long")))
        })
    }
  }

  private def batchDirs(dir: String): Seq[(Long, String)] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Nil
    val st = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("batch=\\d+"))
        .map(n => n.drop(6).toLong ->
          root.resolve(n).toString).toSeq.sortBy(_._1)
    } finally st.close()
  }
}
