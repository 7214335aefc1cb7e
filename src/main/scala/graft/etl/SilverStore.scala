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

  /** Read a table; empty DataFrame with the given schema when absent. */
  def read(table: String, schema: StructType): DataFrame =
    if (exists(table)) spark.read.schema(schema).parquet(tablePath(table).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Read without a schema expectation (table must exist). */
  def read(table: String): DataFrame =
    spark.read.parquet(tablePath(table).toString)

  /** Atomically replace the table with `df` (materializes to a temp
    * dir first, so `df` may read from the table it replaces). */
  def overwrite(table: String, df: DataFrame): Unit = {
    val tmp = new Path(root, s"_tmp/$table-${java.util.UUID.randomUUID}")
    df.write.mode("overwrite").parquet(tmp.toString)
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
}
