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

  // bucketedness is a layout property that only this store's writes can
  // change — cache it so hot read paths don't pay exists()+LIST per call
  private val bucketedCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def isBucketed(table: String): Boolean =
    bucketedCache.computeIfAbsent(table, _ =>
      exists(table) && fs.listStatus(tablePath(table))
        .exists(_.getPath.getName.startsWith(s"$bucketCol="))).booleanValue()

  private def invalidate(table: String): Unit = bucketedCache.remove(table)

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

  /** Stage a bucketed write: materialize `df` (which must carry
    * `_bucket`) under `_tmp`, partitioned by bucket. Returns the temp
    * path for [[commitBuckets]] — the split lets the caller derive
    * facts from the STAGED data (e.g. the new max id) before anything
    * becomes visible. */
  def stageBuckets(table: String, df: DataFrame): Path = {
    val tmp = new Path(root, s"_tmp/$table-${java.util.UUID.randomUUID}")
    df.write.mode("overwrite").partitionBy(bucketCol).parquet(tmp.toString)
    tmp
  }

  /** Swap ONLY the given `_bucket=NN` subdirectories of the staged
    * write into the live table: the bucketed MERGE's commit. Untouched
    * bucket directories are not listed, read, or rewritten — their
    * files stay byte-identical.
    *
    * Each bucket swaps via rename-aside (old dir is moved aside, new
    * renamed in, aside deleted; a failed rename-in restores the aside)
    * so no IN-PROCESS failure mode leaves a bucket with its data
    * deleted. A PROCESS CRASH between the aside-rename and the
    * rename-in leaves the bucket's only copy in the dot-prefixed aside
    * dir — invisible to parquet readers until [[repairBuckets]] (run at
    * the start of every bucketed merge) restores it; with a
    * single-writer merge discipline the window therefore closes before
    * the next merge can re-insert the bucket's keys.
    * Atomicity is PER BUCKET: a concurrent reader can see bucket A new
    * while bucket B is still old. That is the reference's own
    * consistency unit — its per-row `INSERT ... ON CONFLICT`
    * transactions commit row by row — so cross-bucket readers were
    * never promised a snapshot there either. Use [[overwrite]] when a
    * whole-table snapshot swap is required. */
  def commitBuckets(table: String, tmp: Path, buckets: Seq[Int]): Unit = {
    val f = fs
    // the staged root must exist: an individual missing bucket dir
    // under it means "bucket intentionally emptied", but a missing
    // ROOT means the staging was lost (crashed writer, misfired
    // sweep) — proceeding would delete every touched bucket's data
    if (!f.exists(tmp))
      throw new java.io.IOException(
        s"staged dir $tmp is gone — refusing to commit $table")
    val live = tablePath(table)
    f.mkdirs(live)
    buckets.foreach { b =>
      val src = new Path(tmp, s"$bucketCol=$b")
      val dst = new Path(live, s"$bucketCol=$b")
      val aside = new Path(live, s".$bucketCol=$b-old")
      val hadOld = f.exists(dst)
      if (hadOld && !f.rename(dst, aside))
        throw new java.io.IOException(s"bucket aside-rename failed for $table/$b")
      // a touched bucket can end up empty (all its rows deleted
      // upstream); absent src then simply leaves the bucket removed
      if (f.exists(src) && !f.rename(src, dst)) {
        if (hadOld) f.rename(aside, dst) // restore — no data lost
        throw new java.io.IOException(s"bucket swap failed for $table/$b")
      }
      if (hadOld) f.delete(aside, true)
    }
    f.delete(tmp, true)
    invalidate(table)
  }

  /** Repair the [[commitBuckets]] crash window: a process death between
    * the aside-rename and the rename-in strands the bucket's only copy
    * in `.{_bucket=N}-old`. For each orphaned aside dir: live bucket
    * missing → restore the aside (old data comes back; the interrupted
    * merge re-runs later); live bucket present → the swap completed
    * and only the aside-delete was lost → drop the aside. Idempotent;
    * MergeOps.mergeBucketed calls it before every merge. */
  def repairBuckets(table: String): Int = {
    val live = tablePath(table)
    val f = fs
    if (!f.exists(live)) return 0
    var repaired = 0
    f.listStatus(live).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(s".$bucketCol=") && name.endsWith("-old")) {
        val dst = new Path(live, name.stripPrefix(".").stripSuffix("-old"))
        if (!f.exists(dst)) {
          if (!f.rename(st.getPath, dst))
            throw new java.io.IOException(
              s"aside restore failed for $table/$name")
        } else f.delete(st.getPath, true)
        repaired += 1
        invalidate(table)
      }
    }
    repaired
  }

  /** Discard a staged-but-uncommitted write (failure cleanup): live
    * buckets are consistent per bucket, so the staged copy is never
    * the only copy of anything. */
  def discardStaged(tmp: Path): Unit =
    try fs.delete(tmp, true) catch { case _: Exception => () }

  /** Sweep stale entries under `root/_tmp`: a crash between staging
    * and commit leaks the whole staged dataset there. Only entries
    * older than `olderThanMs` go (a fresh entry may belong to an
    * in-flight writer). Called from the WRITER path (mergeBucketed)
    * under the store's single-writer discipline — NOT from the
    * constructor: a read-only store reaping a paused writer's staging
    * would turn that writer's commit into data loss (commitBuckets
    * also guards by refusing a vanished staged root). */
  def sweepTmp(olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val tmpRoot = new Path(root, "_tmp")
    val f = fs
    if (!f.exists(tmpRoot)) 0
    else {
      val cutoff = System.currentTimeMillis() - olderThanMs
      val stale = f.listStatus(tmpRoot).filter(_.getModificationTime < cutoff)
      stale.foreach(st => f.delete(st.getPath, true))
      stale.length
    }
  }

  /** Sidecar for bucketed tables: the surrogate-id high-water mark
    * (avoids a full-table id scan per merge batch) and the bucket
    * count the layout was created with (a later caller passing a
    * different nBuckets must not shear the layout). Written atomically
    * (temp + rename); the dot prefix keeps it invisible to parquet
    * readers. Crash contract: the meta is written BEFORE the bucket
    * commit with the staged max, so a crash between the two leaves the
    * mark too HIGH — id gaps, never id collisions. */
  private def metaPath(table: String) = new Path(tablePath(table), ".graft_meta")

  def writeMeta(table: String, maxId: Int, nBuckets: Int): Unit = {
    val f = fs
    f.mkdirs(tablePath(table))
    val tmp = new Path(tablePath(table), s".graft_meta-${java.util.UUID.randomUUID}")
    val out = f.create(tmp, true)
    try out.write(s"$maxId,$nBuckets".getBytes("UTF-8")) finally out.close()
    if (f.exists(metaPath(table))) f.delete(metaPath(table), false)
    if (!f.rename(tmp, metaPath(table)))
      throw new java.io.IOException(s"meta write failed for $table")
  }

  /** (maxId, nBuckets); None when absent or unreadable — callers fall
    * back to a full scan + the default layout, never crash. */
  def readMeta(table: String): Option[(Int, Int)] =
    try {
      if (!fs.exists(metaPath(table))) None
      else {
        val in = fs.open(metaPath(table))
        val s = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
        val Array(m, n) = s.trim.split(',')
        Some((m.toInt, n.toInt))
      }
    } catch { case _: Exception => None }

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
    invalidate(table)
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
    val savedMeta = readMeta(table) // snapshot swap drops the sidecar
    overwrite(table, compacted, partitionCols0)
    savedMeta.foreach { case (m, n) => writeMeta(table, m, n) }
    (before, parquetFiles(live))
  }
}
