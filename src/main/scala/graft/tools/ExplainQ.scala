package graft.tools
object ExplainQ {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val df = graft.SparkEntry.queries(a(0))(spark, a(1))
    if (a.length > 2 && a(2) == "collect") df.collect() else df.count()  // let AQE finalize
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
