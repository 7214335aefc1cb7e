package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.analytics.EdgeFold

/** Streaming maintenance of the fulfillment graph — the stream twin
  * of q208's [[EdgeFold.fold]], completing the graph family's
  * streaming coverage (the r17 verdict's last artifact family without
  * an incremental path; rollups: [[RollupStream]], SCD2:
  * [[Scd2Stream]], attribution/markov/decay: [[AttributionStream]],
  * funnel: [[FunnelStream]]): each micro-batch of directed edge rows
  * (src, dst — one row per new parallel edge, e.g.
  * [[graft.analytics.ExtendedQueries.fulfillmentEdgesFrom]] over the
  * batch's fact rows) folds into the weighted edge relation by
  * per-(src, dst) weight addition, and the rank reports re-derive
  * from the maintained state on demand — graph-scale serve cost,
  * never a corpus-scale edge rebuild per refresh.
  *
  * Idempotence under foreachBatch's AT-LEAST-ONCE contract is the
  * [[RollupStream.foldBatch]] versioned-store discipline verbatim
  * (weight addition is exactly a distributive rollup over the
  * (src, dst) dims); state is hash-bucketed by src — the
  * [[graft.analytics.EdgeIndex]] co-location key — so a fold rewrites
  * only the buckets containing the batch's sources. */
object GraphStream {

  /** Start the maintainer: every micro-batch of (src, dst) edge rows
    * folds into the versioned weighted-edge store under `storeDir`. */
  def maintainEdges(edges: DataFrame, storeDir: String,
                    checkpointDir: String,
                    buckets: Int = 64): StreamingQuery =
    edges.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        EdgeFold.fold(df, id, storeDir, buckets)
        ()
      }
      .start()

  /** The complete maintained weighted edge relation (src, dst, w, d —
    * the out-degree is maintained in-state, see [[EdgeFold.fold]]). */
  def serveEdges(spark: SparkSession, storeDir: String): DataFrame =
    EdgeFold.edges(spark, storeDir)

  /** The maintained relation as the composed BUCKETED scan — the
    * zero-exchange serve-side frame ([[EdgeFold.degreedEdgesBucketed]]). */
  def serveEdgesBucketed(spark: SparkSession, storeDir: String): DataFrame =
    EdgeFold.degreedEdgesBucketed(spark, storeDir)

  /** Drop superseded versions (the store's layered prune). */
  def prune(storeDir: String, keep: Int = 2): Unit =
    EdgeFold.prune(storeDir, keep)
}
