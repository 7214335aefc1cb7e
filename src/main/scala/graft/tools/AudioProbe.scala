package graft.tools

import org.apache.spark.sql.functions._

/** Stage-timing probe for the q101 audio decode path:
  * `runMain graft.tools.AudioProbe <sfDir> [runs]`. The r7 verdict
  * hypothesized the 100× cost was per-row AudioSystem SPI dispatch;
  * round 8 cached the SPI registry and the number barely moved, so
  * this probe isolates where the time actually goes: the pure codec
  * (driver loop, no Spark), the scan+wrap (Dataset map only), and the
  * shipped wrap+decode pipeline. */
object AudioProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val d = a(0)
    val runs = if (a.length > 1) a(1).toInt else 2
    import spark.implicits._
    import graft.multimodal.MediaOps

    def time(name: String)(f: => Long): Unit =
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[audioprobe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }

    def texts = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]

    // pure codec, single driver thread: wrap + decode, no Spark at all
    val local = texts.limit(20000).collect()
    time("codec-1thread-20k") {
      var acc = 0L
      local.foreach { case (_, t) =>
        val wav = MediaOps.JdkAudioCodec.wavWrap(t.getBytes("UTF-8"), 16000)
        acc += MediaOps.JdkAudioCodec.features(wav, 8).map(_._2).getOrElse(-1L)
      }
      acc
    }
    // Spark scan + typed map to MediaRecord (wrap only, no decode)
    def recs = texts.map { case (id, t) =>
      MediaOps.MediaRecord(id, "audio",
        MediaOps.JdkAudioCodec.wavWrap(t.getBytes("UTF-8"), 16000),
        MediaOps.MediaMeta("wav", 0, 0, 0, 0L))
    }
    time("scan+wrap")(recs.map(_.bytes.length.toLong)
      .agg(sum("value")).head.getLong(0))
    // the shipped path: wrap + batched decode
    time("wrap+decode")(MediaOps.decode(recs, dim = 8)
      .agg(sum(col("durationMs"))).head.getLong(0))
    // manual fuse: same wrap + same codec calls, but one mapPartitions
    // over the scan — no MediaRecord Dataset boundary in between
    time("fused-decode") {
      texts.mapPartitions { it =>
        it.map { case (_, t) =>
          val wav = MediaOps.JdkAudioCodec.wavWrap(t.getBytes("UTF-8"), 16000)
          MediaOps.JdkAudioCodec.features(wav, 8).map(_._2).getOrElse(-1L)
        }
      }.agg(sum("value")).head.getLong(0)
    }
    spark.stop()
  }
}
