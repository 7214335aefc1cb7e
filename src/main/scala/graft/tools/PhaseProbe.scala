package graft.tools

/** Split a query's wall time into driver-side phases vs execution —
  * the measure-first instrument for queries whose cost might be plan
  * SIZE (analysis/optimization of huge expression trees) rather than
  * data:
  *
  *   build    construct the DataFrame (Scala tree building)
  *   plan     force analysis + optimization + physical planning
  *            (queryExecution.executedPlan — no jobs run)
  *   exec     count() — job execution (includes AQE re-planning and
  *            any codegen compilation not yet cached)
  *
  * `runMain graft.tools.PhaseProbe <q1[,q2,…]> <sfDir> [runs]` —
  * run 1 is cold, later runs warm (codegen cache hit). Comma list /
  * prefix selection follows QueryBench. */
object PhaseProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val d = a(1)
    val runs = if (a.length > 2) a(2).toInt else 2
    val names = a(0).split(",").toSeq.flatMap { q =>
      require(q.nonEmpty, s"empty query name in '${a(0)}'")
      val ks = graft.SparkEntry.queries.keySet
      val matched =
        if (ks(q)) Seq(q) else ks.filter(_.startsWith(q)).toSeq.sorted
      require(matched.nonEmpty, s"no query matches '$q'")
      matched
    }
    for (q <- names; i <- 1 to runs) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, d)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force plan, no execution
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"[phase] $q run$i: build ${(t1 - t0) / 1e9}%.2f s, " +
        f"plan ${(t2 - t1) / 1e9}%.2f s, exec ${(t3 - t2) / 1e9}%.2f s " +
        f"($n rows)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
