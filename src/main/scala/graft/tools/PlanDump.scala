package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` output for declared queries to files —
  * the optimization-round evidence artifact (plans/r<N>/<q>_before.txt
  * / _after.txt; the judge reads these instead of running Spark).
  *
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1[,q2,…]|bench]`
  *
  * Each query is EXECUTED first (count()) so AQE finalizes and the
  * formatted text reflects the plan that actually ran (final shuffle
  * reads, runtime-chosen join strategies), then written as
  * `<outDir>/<query>_<suffix>.txt`. A comma list selects by exact name
  * or prefix (the QueryBench convention); `bench` selects the
  * bench-flagged headline set. */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val d = a(0)
    val out = Paths.get(a(1))
    Files.createDirectories(out)
    val suffix = a(2)
    val names: Seq[String] =
      if (a.length < 4 || a(3) == "bench")
        graft.SparkEntry.specs.filter(_._2.bench).keys.toSeq.sorted
      else a(3).split(",").toSeq.flatMap { q =>
        require(q.nonEmpty, s"empty query name in '${a(3)}'")
        val ks = graft.SparkEntry.queries.keySet
        val matched =
          if (ks(q)) Seq(q) else ks.filter(_.startsWith(q)).toSeq.sorted
        require(matched.nonEmpty, s"no query matches '$q'")
        matched
      }
    for (q <- names.distinct) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.count() // finalize AQE so the dump is the executed plan
      val secs = (System.nanoTime() - t0) / 1e9
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val f = out.resolve(s"${q}_$suffix.txt")
      Files.write(f, txt.getBytes(StandardCharsets.UTF_8))
      println(f"[plandump] $q -> $f (${txt.length} chars, $secs%.2f s)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
