package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isolate the q136/q208 serve loop's per-stage cost: time 3 stepRank
  * iterations over the maintained bucketed edge table under different
  * edge-side strategies (persist cache / direct bucketed re-scan /
  * plain-parquet copy), min-of-3 warm. Measurement tool only.
  *
  * runMain graft.tools.StepRankProbe <sfDir>
  */
object StepRankProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val d = a(0)
    // q208's fixture store (already materialized by a prior run)
    val store = graft.text.Artifacts.dirMulti(d,
      "edgefold_b64_i3_v2", Seq("lineitem.parquet", "orders.parquet"))
      .resolve("state").toString
    def serve(ed: DataFrame): Long = {
      val nodes = ed.select(col("src").as("node")).distinct()
      val n = nodes.count()
      val rInit = 1000000000000L / n
      val base = rInit * 15 / 100
      var rank = nodes.select(col("node"), lit(rInit).as("r"))
      for (_ <- 1 to 3) {
        rank = ed.join(rank.hint("shuffle_hash"), ed("src") === rank("node"))
          .select(col("dst"), (col("w") * expr("r div d")).as("contrib"))
          .groupBy(col("dst")).agg(sum(col("contrib")).as("sc"))
          .select(col("dst").as("node"),
            (lit(base) + expr("(85 * sc) div 100")).as("r"))
      }
      rank.select(max(col("r"))).collect()(0).getLong(0)
    }
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val v = f
        ((System.nanoTime() - t0) / 1e9, v)
      }
      println(f"[probe] $label%-28s min ${ts.map(_._1).min}%.3f s " +
        ts.map(t => f"${t._1}%.2f").mkString("[", ",", "]") +
        s" v=${ts.head._2}")
    }
    // warm codegen
    serve(graft.analytics.EdgeFold.degreedEdgesBucketed(spark, store))
    time("bucketed+persist") {
      val ed = graft.analytics.EdgeFold.degreedEdgesBucketed(spark, store)
        .persist()
      try serve(ed) finally ed.unpersist(false)
    }
    time("bucketed, no persist") {
      serve(graft.analytics.EdgeFold.degreedEdgesBucketed(spark, store))
    }
    // plain-parquet copy of the same rows (no bucketing info): joins
    // must exchange the edge side every iteration — the lower bound the
    // bucketed layout is supposed to beat
    val flat = java.nio.file.Files.createTempDirectory("steprank")
      .resolve("flat").toString
    graft.analytics.EdgeFold.degreedEdgesBucketed(spark, store)
      .write.parquet(flat)
    time("plain parquet, no persist") { serve(spark.read.parquet(flat)) }
    time("plain parquet + persist") {
      val ed = spark.read.parquet(flat).persist()
      try serve(ed) finally ed.unpersist(false)
    }
    time("plain parquet repart(src)") {
      val ed = spark.read.parquet(flat).repartition(col("src")).persist()
      try serve(ed) finally ed.unpersist(false)
    }
    spark.stop()
  }
}
