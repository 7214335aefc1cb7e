package graft.tools

import org.apache.spark.sql.functions._

/** Scale measurement for [[graft.operators.EditSimJoin]] — the
  * evidence behind the blocking's one argued (previously unmeasured)
  * bound: "the df-ascending prefix ordering keeps hot shared
  * boilerplate out of the posting lists, so candidate growth tracks
  * true matches, not n²".
  *
  *   runMain graft.tools.EditSimScale <sfDir> [multiples] [t] [q]
  *   (defaults: /root/testdata/sf0.1  1,10  2  2)
  *
  * Method: q180's exact input shape (customer %10 slice, `c_name` —
  * the worst case the prefix ordering exists for: every string
  * shares the `Customer#0000…` prefix and only tail digits differ),
  * replicated M× with DISTINCT re-keyed names (digits shifted by the
  * replica offset so replicas add new vocabulary, the way a bigger
  * customer table would). Per cell:
  *
  *   - `n`        strings entering the join
  *   - `cand`     deduped candidate pairs the verify pass scans
  *                ([[graft.operators.EditSimJoin.candidates]])
  *   - `match`    true pairs at edit distance ≤ t
  *   - `cand/n`   the per-string candidate load — the number that
  *                must stay ~flat for the blocking to survive 100×
  *                (n² blocking would grow it linearly in n)
  *   - `sec`      end-to-end join wall time, min of 2 passes
  *
  * Read-off: if `cand/n` at M=10 is within ~2× of M=1 while n grew
  * 10×, the posting-collision term is bounded and the plan survives
  * scale-up; super-linear growth here is the signal to df-cap the
  * posting lists (the q24 PostingIndex 128-cap recipe). */
object EditSimScale {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val d = if (a.length > 0) a(0) else "/root/testdata/sf0.1"
    val multiples = (if (a.length > 1) a(1) else "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val t = if (a.length > 2) a(2).toInt else 2
    val qg = if (a.length > 3) a(3).toInt else 2

    val base = graft.analytics.Tables.customer(spark, d)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))

    println("[editsim]   M        n       cand      match   cand/n     sec")
    multiples.foreach { m =>
      require(m <= 10, "digit rotation supports up to 10 replicas")
      // replica r rotates the name's digits by r: a BIJECTION on the
      // digit alphabet, so within-replica edit distances are exactly
      // the base slice's (true matches scale LINEARLY, m x base),
      // cross-replica distances are ~9 digit positions >> t (no new
      // matches), and every replica still shares the hot
      // `Customer#0…` boilerplate grams — the posting-df stress this
      // probe exists to measure
      val digits = "0123456789"
      val strs = (0 until m).map { r =>
        base.select((col("id") + lit(r.toLong * 10000000L)).as("id"),
          translate(col("s"), digits,
            digits.drop(r) + digits.take(r)).as("s"))
      }.reduce(_ unionByName _)
      strs.persist(); val n = strs.count()
      val cand = graft.operators.EditSimJoin
        .candidates(strs, "id", "s", t, qg).count()
      val matches = graft.operators.EditSimJoin
        .join(strs, "id", "s", t, qg).count()
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.EditSimJoin.join(strs, "id", "s", t, qg).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[editsim] $m%3d $n%8d $cand%10d $matches%10d " +
        f"${cand.toDouble / n}%8.1f $sec%7.2f")
      strs.unpersist()
    }
    spark.stop()
  }
}
