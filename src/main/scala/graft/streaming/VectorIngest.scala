package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.VectorStore

/** Streaming maintenance of the [[VectorStore]] ANN ingest store —
  * the vector feed's twin of [[RollupStream.maintainRollup]]: each
  * micro-batch of (vec_id, embedding) rows assigns itself under the
  * store's FIXED geometry (one narrow batch-scale pass) and lands in
  * its `_c=` inverted-list partitions, so a search served from the
  * store sees new vectors one trigger after they arrive — no index
  * rebuild, no corpus re-scan, per-trigger cost batch-scale by
  * construction ([[VectorStore.fold]]'s contract).
  *
  * Idempotence under foreachBatch's AT-LEAST-ONCE contract comes from
  * [[VectorStore.foldBatch]]'s batch-scoped file names: a replayed
  * batch id sweeps and rewrites ITS OWN files instead of appending
  * duplicates beside them (StreamingSpec pins replay == no change).
  * The store must exist ([[VectorStore.init]]) before the stream
  * starts — geometry is trained, never streamed. */
object VectorIngest {

  def maintainVectorStore(vectors: DataFrame, storeDir: String,
                          checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        VectorStore.foldBatch(df.sparkSession, storeDir, df, id)
        ()
      }
      .start()
}
