package graft.tools

/** Single-query timing harness for scale experiments:
  * `runMain graft.tools.QueryBench <queryName> <sfDir> [runs]`.
  * Run 1 is cold (file listing + page cache), later runs warm —
  * both numbers matter when reading a scale ratio. Materializes via
  * `count()` — the SAME method Bench times with, so numbers from the
  * two tools are comparable (collect() would additionally execute the
  * top-level sort and ship every row to the driver). */
object QueryBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val q = a(0); val d = a(1)
    val runs = if (a.length > 2) a(2).toInt else 2
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).count()
      println(f"[querybench] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
