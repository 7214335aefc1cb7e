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
    // Deterministic structural counters beside the wall clocks: wall
    // time on a shared host carries contention noise, but the number
    // of jobs/stages/tasks a query schedules — and to a lesser degree
    // its summed executor task time — is a property of the PLAN, so a
    // structural optimization (a removed duplicate evaluation, a
    // reused cache) shows up here even when the wall clock lies.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          Option(t.taskMetrics).foreach(m =>
            taskMs.addAndGet(m.executorRunTime))
        }
        // per-stage attribution (printed when PHASE_STAGES=1): which
        // stage a query's task time actually lands in
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          if (sys.env.get("PHASE_STAGES").contains("1")) {
            val i = s.stageInfo
            val ms = i.taskMetrics.executorRunTime
            if (ms > 200) {
              val m = i.taskMetrics
              println(
                f"[stage] ${i.stageId}%4d ${ms}%7d ms ${i.numTasks}%4d tasks " +
                  f"cpu ${m.executorCpuTime / 1000000}%d gc ${m.jvmGCTime}%d " +
                  f"deser ${m.executorDeserializeTime}%d " +
                  f"fetch ${m.shuffleReadMetrics.fetchWaitTime}%d " +
                  f"in ${m.inputMetrics.recordsRead}%d " +
                  f"sr ${m.shuffleReadMetrics.recordsRead}%d " +
                  i.name.take(60))
              if (ms > 5000) i.details.linesIterator.take(6)
                .foreach(l => println(s"[stage]        $l"))
            }
          }
        }
      })
    for (q <- names; i <- 1 to runs) {
      def snap() = (jobs.get, stages.get, tasks.get, taskMs.get)
      val s0 = snap()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, d)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force plan, no execution
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      Thread.sleep(300) // listener bus drain (no public flush API)
      val s1 = snap()
      println(f"[phase] $q run$i: build ${(t1 - t0) / 1e9}%.2f s, " +
        f"plan ${(t2 - t1) / 1e9}%.2f s, exec ${(t3 - t2) / 1e9}%.2f s " +
        f"($n rows) jobs ${s1._1 - s0._1} stages ${s1._2 - s0._2} " +
        f"tasks ${s1._3 - s0._3} taskMs ${s1._4 - s0._4}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
