package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.{MergeOps, SilverStore}

/** Measures what the bucketed MERGE actually buys: seed a table with
  * `nRows` keys, then apply a tiny update batch and report how many
  * bytes/files each strategy rewrites.
  * `runMain graft.tools.MergeBench <nRows> <batchRows> [nBuckets]` */
object MergeBench {
  def main(a: Array[String]): Unit = {
    val nRows = if (a.nonEmpty) a(0).toInt else 200000
    val batch = if (a.length > 1) a(1).toInt else 20
    val nBuckets = if (a.length > 2) a(2).toInt else 32
    val spark = graft.GraftSession.create()
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("k", StringType),
      StructField("v", StringType)))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    def parquets(root: String): Seq[java.io.File] =
      walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
    def dirBytes(root: String): (Long, Int) = {
      val fs = parquets(root)
      (fs.map(_.length).sum, fs.length)
    }
    def fileState(root: String): Map[String, Long] =
      parquets(root).map(f => f.getPath -> f.lastModified).toMap

    val root = java.nio.file.Files.createTempDirectory("mergebench").toString
    val store = new SilverStore(spark, root)
    val seed = (1 to nRows).toDF("i")
      .select(concat(lit("key"), col("i")).as("k"),
        concat(lit("v"), col("i")).as("v"))
    MergeOps.mergeBucketed(store, "t", schema, seed, Seq("k"), "id", Seq("v"), nBuckets = nBuckets)
    val (tableBytes, tableFiles) = dirBytes(s"$root/t")
    println(s"[mergebench] table: $nRows rows, $tableBytes bytes, $tableFiles files")

    val before = fileState(s"$root/t")
    val upd = (1 to batch).toDF("i")
      .select(concat(lit("key"), col("i") * lit(97)).as("k"),
        lit("updated").as("v"))
    val t0 = System.nanoTime()
    MergeOps.mergeBucketed(store, "t", schema, upd, Seq("k"), "id", Seq("v"))
    val secs = (System.nanoTime() - t0) / 1e9
    val after = fileState(s"$root/t")
    val rewritten = after.filterNot { case (p, m) => before.get(p).contains(m) }
    val rewrittenBytes = rewritten.keys
      .map(p => new java.io.File(p).length).sum
    println(f"[mergebench] $batch-row batch: $secs%.2f s, rewrote " +
      f"${rewritten.size} files / $rewrittenBytes bytes " +
      f"(${rewrittenBytes * 100.0 / tableBytes}%.1f%% of table)")
    // scratch data only — don't leave a 200k-row table per run in /tmp
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
      f.delete()
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
