package graft.tools
object ExplainQ {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val df = graft.SparkEntry.queries(a(0))(spark, a(1))
    df.count()  // let AQE finalize
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
