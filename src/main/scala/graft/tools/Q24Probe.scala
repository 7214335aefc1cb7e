package graft.tools

import org.apache.spark.sql.SparkSession

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

    // the EXACT shipped stages, via the shared helpers — no drift
    val hs = graft.text.TextQueries.jaccardIndexRows(
      graft.analytics.Tables.documents(spark, d))
    time("explode only (no shuffle)") { hs.count() }
    time("index build (1st shuffle)") {
      graft.text.TextQueries.jaccardPostings(hs).count()
    }

    time("full q24 (both shuffles)") {
      graft.SparkEntry.queries("q24_jaccard_pairs")(spark, d).count()
    }
    spark.stop()
  }
}
