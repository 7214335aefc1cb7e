package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.Bm25Store

/** Streaming maintenance of the [[Bm25Store]] retrieval index — the
  * document feed's twin of [[VectorIngest.maintainVectorStore]]: each
  * micro-batch of (doc_id, text) rows tokenizes itself (one
  * batch-scale pass) and lands its posting rows in their `_tb=`
  * partitions and its doc lengths in `_db=`, so a BM25 query served
  * from the store sees new documents one trigger after they arrive —
  * no index rebuild, no corpus re-tokenize, per-trigger cost
  * batch-scale by construction ([[Bm25Store.fold]]'s contract). df
  * and n_docs/avgdl need no maintenance at all: the store derives
  * them at read time, so they are correct the moment the append
  * lands.
  *
  * Idempotence under foreachBatch's AT-LEAST-ONCE contract comes from
  * [[Bm25Store.foldBatch]]'s batch-scoped file names: a replayed
  * batch id sweeps and rewrites ITS OWN files instead of appending
  * duplicates beside them (StreamingSpec pins replay == no change).
  * The store must exist ([[Bm25Store.init]]) before the stream
  * starts. */
object Bm25Ingest {

  def maintainBm25Store(docs: DataFrame, storeDir: String,
                        checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        Bm25Store.foldBatch(df.sparkSession, storeDir, df, id)
        ()
      }
      .start()
}
