package graft.tools

import org.apache.spark.sql.functions._

/** Serve-cost-∝-affected-neighborhood evidence for the q210 rank
  * delta-serve (the r18 directive's FoldBench-style cell, applied to
  * the SERVE half): on a graph whose k-hop neighborhoods stay small, a
  * sliver fold's delta serve should cost ~flat as the GRAPH grows,
  * while the full maintained serve grows with |E|.
  *
  *   runMain graft.tools.DeltaServeBench [nodeCounts] [sliverPairs]
  *   (defaults: 10000,100000,1000000  1)
  *
  * Method: the graph is a both-direction ring of n nodes (the sparse
  * regime the delta path is FOR — the 3-hop out-neighborhood of a
  * changed pair is ~8 nodes at ANY n; the dense-bipartite TPC-H
  * fixture saturates and takes the hybrid's full-serve fallback, the
  * honest complement measured in the bench table). Per n: fold the
  * ring (untimed — production already maintains the store), publish
  * the rank history (untimed — it is the previous full serve), fold a
  * sliver of `sliverPairs` extra parallel edges, then time (min of 3)
  * the DELTA serve vs the FULL maintained serve, both forced by
  * count() over the final rank table. Also reports `mode` (the hybrid
  * must stay on the delta path) and |A∪C| per hop summed (`affected`)
  * so the flat column is attributable: delta cost tracks the
  * neighborhood, full cost tracks |E|. */
object DeltaServeBench {

  def main(a: Array[String]): Unit = {
    val ns = (if (a.length > 0) a(0) else "10000,100000,1000000")
      .split(",").map(_.toLong).toSeq
    val sliverPairs = if (a.length > 1) a(1).toInt else 1
    val reps = 3
    val s = graft.GraftSession.create()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-deltaservebench")

    println(f"${"n"}%9s ${"|E|"}%9s ${"delta"}%8s ${"full"}%8s " +
      f"${"ratio"}%6s ${"mode"}%6s")
    ns.foreach { n =>
      val store = tmp.resolve(s"state-$n").toString
      val hist = tmp.resolve(s"hist-$n").toString
      // both-direction ring, generated distributed (no driver seq)
      val ring = s.range(n).select(col("id").as("src"),
          ((col("id") + 1) % n).as("dst"))
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
        .select(col("p.src"), col("p.dst"))
      val buckets = 64
      graft.analytics.EdgeFold.fold(ring, 1L, store, buckets)
      graft.analytics.RankHistory.publish(s, store, hist)
      val sliver = (0 until sliverPairs).flatMap(i =>
        Seq((i.toLong, (i + 1L) % n), ((i + 1L) % n, i.toLong)))
        .toDF("src", "dst")
      graft.analytics.EdgeFold.fold(sliver, 2L, store, buckets)
      val changed = sliver.select(col("src")).distinct()

      def timeMin(f: => Long): Double = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min

      val tDelta = timeMin(
        graft.analytics.RankHistory.withDeltaServedRanks(
          s, store, hist, changed)(_.count()))
      val mode = graft.analytics.RankHistory.lastServeMode
      val tFull = timeMin(
        graft.analytics.ExtendedQueries.withMaintainedPagerankRanks(
          s, store)(_.count()))
      println(f"$n%9d ${2 * n}%9d $tDelta%7.2fs $tFull%7.2fs " +
        f"${tFull / tDelta}%5.1fx $mode%6s")
    }
    graft.text.Artifacts.deleteRecursively(tmp)
    s.stop()
  }
}
