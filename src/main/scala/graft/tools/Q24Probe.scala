package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Stage-cost probe for q24's packed-long index (mirrors the shipped
  * formulation so optimization effort goes where the seconds are; the
  * round-5 packing came out of this probe showing the index-build
  * shuffle at ~2/3 of wall time). Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Q24Probe /tmp/sf10"
  */
object Q24Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val hs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("lang"),
        shingle_hashes(col("text"), 3).as("hs"))
      .select(
        (shiftleft(col("doc_id"), 20) + size(col("hs"))).as("dn"),
        explode(col("hs")).as("sh"),
        expr("cast(conv(substring(md5(lang), 1, 15), 16, 10) as bigint)")
          .as("lk"))
      .select(col("dn"), col("sh").bitwiseXOR(col("lk")).as("skey"))
    time("explode only (no shuffle)") { hs.count() }

    val posts = hs.groupBy(col("skey"))
      .agg(array_sort(collect_list(col("dn"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= 128)
    time("index build (1st shuffle)") { posts.count() }

    time("full q24 (both shuffles)") {
      graft.SparkEntry.queries("q24_jaccard_pairs")(spark, d).count()
    }
    spark.stop()
  }
}
