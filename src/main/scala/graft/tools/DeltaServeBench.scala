package graft.tools

import org.apache.spark.sql.functions._

/** Serve-cost-∝-affected-neighborhood evidence for the q210 rank
  * delta-serve (the r18 directive's FoldBench-style cell, applied to
  * the SERVE half): the delta path recomputes O(neighborhood · degree)
  * contributions plus O(|V|) overlay rows, where the full serve pays
  * O(|E|) contributions per iteration — so the win factor is ~the
  * average degree, PROVIDED the k-hop neighborhood stays bounded.
  * Graphs where it cannot win, measured and documented rather than
  * hidden: average degree ~2 (ring — |E| ≈ |V|, the overlay constants
  * swamp the saved work; measured 0.3×) and dense-bipartite TPC-H
  * (neighborhood saturates; the hybrid's upper-bound pre-check bails
  * to the full serve, q210's bench cell ≈ q208's).
  *
  *   runMain graft.tools.DeltaServeBench [cliqueCounts] [cliqueSize]
  *   (defaults: 100,1000,10000  64)
  *
  * Method: C disjoint K-cliques (both directions emitted per pair →
  * symmetric weights, the EdgeFold contract): |V| = C·K grows with C,
  * |E| = C·K·(K−1) grows with C, but a sliver inside clique 0 has a
  * ≤3-hop neighborhood of exactly K nodes at EVERY C. Per C: fold the
  * graph (untimed), publish the rank history (untimed — it is the
  * previous full serve), fold a one-pair sliver, then time (min of 3)
  * the DELTA serve vs the FULL maintained serve, both forced by
  * count(). `mode` must read "delta" — the hybrid staying under its
  * saturation bar is part of the evidence. Expect the delta column
  * ~flat in C while the full column grows with |E|. */
object DeltaServeBench {

  def main(a: Array[String]): Unit = {
    val cs = (if (a.length > 0) a(0) else "100,1000,10000")
      .split(",").map(_.toLong).toSeq
    val k = if (a.length > 1) a(1).toInt else 64
    val reps = 3
    val s = graft.GraftSession.create()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-deltaservebench")

    println(f"${"cliques"}%8s ${"|V|"}%9s ${"|E|"}%10s ${"delta"}%8s " +
      f"${"full"}%8s ${"full/delta"}%10s ${"mode"}%6s")
    cs.foreach { c =>
      val store = tmp.resolve(s"state-$c").toString
      val hist = tmp.resolve(s"hist-$c").toString
      // C disjoint K-cliques: node n edges to every clique-mate; each
      // direction arrives from its own source row — symmetric by
      // construction, generated distributed (no driver materialization)
      val graph = s.range(c * k)
        .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
        .filter(col("j") =!= col("id") % k)
        .select(col("id").as("src"),
          ((col("id") - col("id") % k) + col("j")).as("dst"))
      graft.analytics.EdgeFold.fold(graph, 1L, store, 64)
      graft.analytics.RankHistory.publish(s, store, hist)
      val sliver = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
      graft.analytics.EdgeFold.fold(sliver, 2L, store, 64)
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
      println(f"$c%8d ${c * k}%9d ${c * k * (k - 1)}%10d " +
        f"$tDelta%7.2fs $tFull%7.2fs ${tFull / tDelta}%9.1fx $mode%6s")
    }
    graft.text.Artifacts.deleteRecursively(tmp)
    s.stop()
  }
}
