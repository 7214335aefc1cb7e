package graft.tools

/** Scratch probe (round 19): fold ≡ rebuild for the degree-in-state
  * bucketed edge store — q208 vs q136 and q209 vs q139 row equality at
  * a given SF dir. Throwaway harness. */
object GraphServeProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graphserveprobe")
    sys.props("graft.artifacts.dir") = tmp.toString
    try {
      def rows(n: String) = graft.SparkEntry.queries(n)(spark, sf)
        .collect().map(_.toString).toSeq
      val pairs = Seq("q136_pagerank" -> "q208_pagerank_fold",
                      "q139_ppr_related" -> "q209_ppr_fold",
                      "q136_pagerank" -> "q210_pagerank_delta_serve")
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (rows(a), rows(b))
        println(s"== $a vs $b: ${if (ra == rb) "IDENTICAL" else "DIFFER"}" +
          s" (${ra.size} rows)")
        if (ra != rb) {
          println("  a: " + ra.take(5).mkString(" | "))
          println("  b: " + rb.take(5).mkString(" | "))
        }
      }
    } finally graft.text.Artifacts.deleteRecursively(tmp)
    spark.stop()
  }
}
