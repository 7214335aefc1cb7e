package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-backed Silver table store with atomic snapshot swap.
  *
  * The reference's sink is Postgres with per-statement transactions;
  * our equivalent storage contract (SURVEY §7 "Design stance") is a
  * directory per table, replaced atomically: write the new snapshot to
  * `_tmp/<table>-<nonce>`, then rename over the live dir. Readers see
  * either the old or the new snapshot, never a partial write. Uses the
  * Hadoop FileSystem API so the same code runs on HDFS/object-store
  * committers, not just local disk.
  *
  * Scale note: snapshot-rewrite merge is O(table) per batch, which is
  * the right trade for dimension/entity tables (small-to-medium); the
  * historized child tables are append-only (`append`), so the 100 TB
  * growth path never rewrites them.
  */
final class SilverStore(val spark: SparkSession, val root: String) {
  private val hadoopConf = spark.sessionState.newHadoopConf()
  private def fs = new Path(root).getFileSystem(hadoopConf)

  private def tablePath(table: String) = new Path(root, table)

  def exists(table: String): Boolean = fs.exists(tablePath(table))

  /** Bucketed layout (MergeOps.mergeBucketed): entity tables partition
    * their directory by `_bucket=NN` (hash of the natural key mod
    * nBuckets) so a MERGE prunes its target scan to — and rewrites —
    * ONLY the buckets containing changed keys. The column is storage
    * layout, not schema: every logical read drops it. */
  val bucketCol = "_bucket"

  def isBucketed(table: String): Boolean =
    exists(table) && fs.listStatus(tablePath(table))
      .exists(_.getPath.getName.startsWith(s"$bucketCol="))

  /** Read a table; empty DataFrame with the given schema when absent. */
  def read(table: String, schema: StructType): DataFrame =
    if (isBucketed(table)) readBucketed(table, schema).drop(bucketCol)
    else if (exists(table)) spark.read.schema(schema).parquet(tablePath(table).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Read without a schema expectation (table must exist). */
  def read(table: String): DataFrame = {
    val df = spark.read.parquet(tablePath(table).toString)
    if (df.columns.contains(bucketCol)) df.drop(bucketCol) else df
  }

  /** Bucketed read KEEPING the `_bucket` partition column, so a filter
    * on it prunes at the FileIndex (only touched bucket dirs are even
    * listed). Empty frame (with `_bucket`) when the table is absent. */
  def readBucketed(table: String, schema: StructType): DataFrame = {
    val withBucket = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(bucketCol,
        org.apache.spark.sql.types.IntegerType, nullable = true))
    if (exists(table))
      spark.read.schema(withBucket).parquet(tablePath(table).toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withBucket)
  }

  /** Swap ONLY the given `_bucket=NN` subdirectories with the matching
    * partitions of `df` (which must carry `_bucket`): the bucketed
    * MERGE's write path. Untouched bucket directories are not listed,
    * read, or rewritten — their files stay byte-identical.
    *
    * Atomicity is PER BUCKET (rename per partition dir): a concurrent
    * reader can see bucket A new while bucket B is still old. That is
    * the reference's own consistency unit — its per-row
    * `INSERT ... ON CONFLICT` transactions commit row by row — so
    * cross-bucket readers were never promised a snapshot there either.
    * Use [[overwrite]] when a whole-table snapshot swap is required. */
  def overwriteBuckets(table: String, df: DataFrame, buckets: Seq[Int]): Unit = {
    val tmp = new Path(root, s"_tmp/$table-${java.util.UUID.randomUUID}")
    df.write.mode("overwrite").partitionBy(bucketCol).parquet(tmp.toString)
    val f = fs
    val live = tablePath(table)
    f.mkdirs(live)
    buckets.foreach { b =>
      val src = new Path(tmp, s"$bucketCol=$b")
      val dst = new Path(live, s"$bucketCol=$b")
      if (f.exists(dst)) f.delete(dst, true)
      // a touched bucket can end up empty (all its rows deleted
      // upstream); absent src then simply leaves the bucket removed
      if (f.exists(src) && !f.rename(src, dst))
        throw new java.io.IOException(s"bucket swap failed for $table/$b")
    }
    f.delete(tmp, true)
  }

  /** Max-surrogate-id sidecar for bucketed tables: avoids a full-table
    * id scan per merge batch. Underscore prefix keeps it invisible to
    * parquet readers. */
  private def maxIdPath(table: String) = new Path(tablePath(table), "_graft_maxid")

  def writeMaxId(table: String, v: Int): Unit = {
    val out = fs.create(maxIdPath(table), true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  def readMaxId(table: String): Option[Int] =
    if (!fs.exists(maxIdPath(table))) None
    else {
      val in = fs.open(maxIdPath(table))
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }

  /** Atomically replace the table with `df` (materializes to a temp
    * dir first, so `df` may read from the table it replaces).
    * `partitionCols` preserves a partitioned directory layout. */
  def overwrite(table: String, df: DataFrame,
                partitionCols: Seq[String] = Nil): Unit = {
    val tmp = new Path(root, s"_tmp/$table-${java.util.UUID.randomUUID}")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    val live = tablePath(table)
    val f = fs
    if (f.exists(live)) f.delete(live, true)
    f.mkdirs(live.getParent)
    if (!f.rename(tmp, live))
      throw new java.io.IOException(s"atomic swap failed for $table")
  }

  /** Historized append (H4/H5): children tables only grow. */
  def append(table: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(tablePath(table).toString)

  /** Append partitioned by `partitionCols` (e.g. `_load_date`): at
    * scale, historized tables are laid out so date-ranged reads prune
    * at the FileIndex — `read(table).filter(col("_load_date") === d)`
    * touches one partition directory, not the table. */
  def appendPartitioned(table: String, df: DataFrame,
                        partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*)
      .parquet(tablePath(table).toString)

  /** Compact an append-only table: per-file micro-batches accumulate
    * one small parquet file per append (the classic small-files
    * problem — at 10⁶ landed files the NAMENODE/listing cost dwarfs the
    * data). Rewrites the table to ~`targetFileBytes` files via the same
    * atomic snapshot swap as `overwrite`, so readers never see a
    * partial compaction. Returns (files_before, files_after). */
  def compact(table: String, partitionCols: Seq[String] = Nil,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val live = tablePath(table)
    val f = fs
    def parquetFiles(p: Path): Int = {
      val it = f.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = parquetFiles(live)
    val totalBytes = f.getContentSummary(live).getLength
    val parts = math.max(1, (totalBytes / targetFileBytes).toInt)
    import org.apache.spark.sql.functions._
    // bucketed tables keep their `_bucket=` layout through compaction
    val partitionCols0 =
      if (partitionCols.isEmpty && isBucketed(table)) Seq(bucketCol)
      else partitionCols
    def rawRead() = spark.read.parquet(live.toString)
    val compacted =
      if (partitionCols0.isEmpty) read(table).repartition(parts)
      else {
        // shuffle on (partition value, salt): repartitioning on the
        // partition columns ALONE would send every row of a hot
        // partition value to one task and emit one oversized file per
        // value; the salt spreads each value over up to `parts` tasks
        // while the write's partitionBy keeps the directory layout
        val df = rawRead()
        val dataCols = df.columns.filterNot(partitionCols0.contains)
        df.withColumn("_salt",
            pmod(xxhash64(dataCols.map(col).toIndexedSeq: _*), lit(parts)))
          .repartition(parts,
            (partitionCols0 :+ "_salt").map(col).toIndexedSeq: _*)
          .drop("_salt")
      }
    val savedMaxId = readMaxId(table) // snapshot swap drops the sidecar
    overwrite(table, compacted, partitionCols0)
    savedMaxId.foreach(writeMaxId(table, _))
    (before, parquetFiles(live))
  }
}
