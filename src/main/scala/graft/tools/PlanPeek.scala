package graft.tools
object PlanPeek {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- a(0).split(",")) {
      println(s"==== $q")
      println(graft.SparkEntry.queries(q)(spark, a(1))
        .queryExecution.executedPlan.toString.take(2500))
    }
    spark.stop()
  }
}
