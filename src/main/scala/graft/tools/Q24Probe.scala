package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Scratch stage-cost probe for q24 (not part of the build): times the
  * inverted-index build alone vs the full query so optimization effort
  * goes where the seconds are. Run:
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

    val docs = spark.read.parquet(s"$d/documents.parquet")
    val hs = docs.select(col("doc_id"), col("lang"),
        shingle_hashes(col("text"), 3).as("hs"))
      .select(col("doc_id"), col("lang"), explode(col("hs")).as("s"),
        size(col("hs")).as("n"))

    time("explode only (no shuffle)") { hs.count() }

    val posts = hs.groupBy(col("lang"), col("s"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n"))))
        .as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= 128)
    time("index build (1st shuffle)") { posts.count() }

    val pairs = posts
      .select(explode(graft.text.TextQueries.pairExpand(col("docs"))).as("p"))
      .select(col("p.x.doc_id").as("da"), col("p.y.doc_id").as("db"),
        col("p.x.n").as("na"), col("p.y.n").as("nb"))
    val full = pairs.groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("shared"),
        first(col("na")).as("_na"), first(col("nb")).as("_nb"))
      .withColumn("jaccard", graft.analytics.StableRound.r4(
        col("shared").cast("double") / (col("_na") + col("_nb") - col("shared"))))
      .filter(col("jaccard") >= 0.3)
    time("full (both shuffles)") { full.count() }
    spark.stop()
  }
}
