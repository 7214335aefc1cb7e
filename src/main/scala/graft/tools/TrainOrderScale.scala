package graft.tools

/** Scale exercise for [[graft.text.TrainOrder.writeEpoch]] at a
  * realistic shard count:
  * `runMain graft.tools.TrainOrderScale <sfDir> <outDir> [shards]`.
  *
  * The scaladoc contract promises 10k+ shards at 100 TB while the spec
  * runs shards=8; this drives the SAME writer at shards=1024 over the
  * 100× corpus and verifies what changes with shard count:
  *  - file layout: `repartition(col("shard"))` puts one shard's rows in
  *    exactly one task, and `partitionBy` splits a task's sorted run
  *    into per-shard files PRESERVING order — so every occupied shard
  *    dir must hold exactly ONE parquet file (files == shards, not
  *    tasks × shards — the small-file failure mode this rules out);
  *  - conservation: read-back row count equals the input corpus;
  *  - order: for a shard sample, the on-disk row order is ascending in
  *    the md5 epoch key (the full-order cross-engine proof is q100's
  *    fingerprint; here the subject is the 1024-shard layout).
  */
object TrainOrderScale {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val d = a(0)
    val out = a(1)
    val shards = if (a.length > 2) a(2).toInt else 1024
    val t0 = System.nanoTime()
    graft.text.TrainOrder.writeEpoch(spark, d, out, epoch = 0, shards = shards)
    val secs = (System.nanoTime() - t0) / 1e9
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    val filesPerShard = dirs.map(_.listFiles()
      .count(f => f.getName.endsWith(".parquet")))
    println(f"[trainorder] shards=$shards occupied=${dirs.length} " +
      f"files=${filesPerShard.sum} maxFilesPerShard=${filesPerShard.max} " +
      f"write=$secs%.1f s")
    require(filesPerShard.max == 1,
      s"one file per shard expected, max=${filesPerShard.max}")
    val docs = graft.analytics.Tables.documents(spark, d).count()
    val back = spark.read.parquet(out).count()
    require(docs == back, s"row loss: wrote $back of $docs")
    // order check on a 16-shard sample: each dir is one small file →
    // one input partition → collect() preserves on-disk row order
    dirs.sortBy(_.getName).take(16).foreach { dd =>
      val ks = spark.read.parquet(dd.toString)
        .select("k").collect().map(_.getString(0)).toSeq
      require(ks.nonEmpty && ks.zip(ks.tail).forall { case (x, y) => x <= y },
        s"${dd.getName}: rows not in epoch-key order on disk")
    }
    println(s"[trainorder] PASS: 1 file/shard, $back rows conserved, " +
      "sampled shards in key order")
    spark.stop()
  }
}
