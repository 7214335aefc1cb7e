package graft.tools

import org.apache.spark.sql.functions._

/** Self-contained runnable demo of the curation facade: runs the full
  * [[graft.Curation]] funnel (quality floor → Gopher repetition filter
  * → reference-LM perplexity tail drop → Bloom-gated decontamination → exact dedup → cluster
  * near-dedup → UniMax language-budget mixture → reproducible epoch
  * order) over a test-data dir, using the dataset's own 3% hash-band
  * slice as the evaluation set (the q77 convention) and its `src0`
  * slice as the LM reference (the q128 convention), prints the
  * per-stage survivor counts and the epoch shard layout.
  *
  * `sbt "runMain graft.tools.CurationDemo [sfDir [outDir]]"`
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val sfDir = if (args.length >= 1) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length >= 2) args(1)
      else java.nio.file.Files.createTempDirectory("graft-epoch").toString

    val docs = graft.analytics.Tables.documents(spark, sfDir)
    // eval set: the deterministic 3% hash-band slice (q77's bench)
    val bench = docs.filter(graft.text.TextQueries.hashBand100 < 3)
    // LM reference: the known-good source slice (q128's convention)
    val lmRef = docs.filter(col("source") === "src0")

    val report = graft.Curation.curate(spark, sfDir,
      bench = Some(bench), lmRef = Some(lmRef), repetition = true,
      unimax = true,
      epochDir = Some(outDir))

    report.stages.foreach(s =>
      println(f"[curation] stage ${s.stage}: ${s.name}%-15s ${s.n_docs}%8d docs"))
    val shards = spark.read.parquet(outDir)
    println(s"[curation] epoch written to $outDir: " +
      s"${shards.count()} rows in " +
      s"${shards.select(col("shard")).distinct().count()} shards")

    // the monitoring view of the INPUT corpus (q122: sketch-backed
    // counts, length percentiles, distinct-token estimates)
    graft.Curation.reportCard(spark, sfDir).collect().foreach { r =>
      println(f"[report] ${r.getAs[String]("source")}%-12s " +
        f"docs=${r.getAs[Long]("n_docs")}%6d " +
        f"tokens=${r.getAs[Long]("total_tokens")}%8d " +
        f"len p50/p90/p99=${r.getAs[Long]("p50_lo")}/" +
        f"${r.getAs[Long]("p90_lo")}/${r.getAs[Long]("p99_lo")} " +
        f"~distinct_toks=${r.getAs[Double]("distinct_tokens_est")}%.0f")
    }

    // the rest of the data card (q141 overlap / q143 drift / q144
    // leakage) — headline numbers only; full frames are the card
    val card = graft.Curation.dataCard(spark, sfDir)
    // single-source corpora have no pairs; a corpus without src0 has
    // no drift reference — print the fact rather than throwing
    card.overlap.orderBy(col("n_shared").desc).take(1).headOption match {
      case Some(ov) =>
        println(f"[card] heaviest overlap: ${ov.getAs[String]("src_a")}<->" +
          f"${ov.getAs[String]("src_b")} shared=${ov.getAs[Long]("n_shared")} " +
          f"(sketch est ${ov.getAs[Double]("est_inter")}%.0f)")
      case None => println("[card] no source pairs (single-source corpus)")
    }
    card.drift.orderBy(col("tv_vs_ref_e4").desc).take(1).headOption match {
      case Some(dr) =>
        println(s"[card] max drift vs src0: ${dr.getAs[String]("source")} " +
          s"tv_e4=${dr.getAs[Long]("tv_vs_ref_e4")}")
      case None => println("[card] no drift reference (no src0 in corpus)")
    }
    val gr = card.growth.orderBy(col("decile")).collect()
    if (gr.length >= 2) {
      val tot = gr.last.getAs[Long]("cum_distinct_shingles")
      val lastNew = tot - gr(gr.length - 2).getAs[Long]("cum_distinct_shingles")
      println(s"[card] novelty: last corpus decile added $lastNew new " +
        s"shingles of $tot total" +
        (if (lastNew * 20 < tot) "  (flattening: tail re-treads the head)"
         else ""))
    }
    val leaks = card.leakage.filter(col("leaking") === 1)
      .agg(coalesce(sum(col("n_pairs")), lit(0L))).head().getLong(0)
    println(s"[card] near-dup pairs straddling train/val/test: $leaks" +
      (if (leaks > 0) "  (fix: split on cluster reps, q147)" else ""))
    spark.stop()
  }
}
