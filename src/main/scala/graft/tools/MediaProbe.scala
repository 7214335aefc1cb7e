package graft.tools

import org.apache.spark.sql.functions._

/** Stage-timing probe for the q85 media near-dup pipeline:
  * `runMain graft.tools.MediaProbe <sfDir> [runs]`. Times each prefix
  * of the pipeline (scan → fingerprint embed → banding → capped
  * posting lists → pairs → full query incl. rerank) so a scale
  * regression names its stage. Shares the SHIPPED building blocks
  * (q85Embeddings, hyperplaneBand12, candidatePairs, the full query
  * build) — the probe can't drift from the query. `hash(...)` forces
  * whole-array computation where a narrow aggregate would let the
  * optimizer prune the embed down to one element. */
object MediaProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val d = a(0)
    val runs = if (a.length > 1) a(1).toInt else 2
    import graft.multimodal.{MediaOps, MediaQueries}
    import graft.similarity.SimilarityQueries.hyperplaneBand12

    def time(name: String)(f: => Long): Unit =
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[mediaprobe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }

    val media = MediaOps.mediaFromDocuments(spark, d)
    def emb = MediaQueries.q85Embeddings(spark, d)

    def banded = emb.select(col("vec_id"), col("kind"), col("blen"),
      posexplode(array(hyperplaneBand12(col("embedding"), 0),
        hyperplaneBand12(col("embedding"), 1))).as(Seq("band", "bucket")))
    def pairs = MediaQueries.candidatePairs(emb, Seq("blen"))

    time("scan")(media.agg(sum(length(col("bytes")))).head.getLong(0))
    time("embed")(emb.agg(sum(hash(col("embedding")))).head.getLong(0))
    time("banded")(banded.agg(sum(col("bucket"))).head.getLong(0))
    time("pairs")(pairs.count())
    time("full")(MediaQueries.queries("q85_media_neardup").build(spark, d).count())
    spark.stop()
  }
}
