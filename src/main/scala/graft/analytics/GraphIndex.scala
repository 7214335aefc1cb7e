package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.text.Artifacts

/** Materialized graph-centrality structures — the
  * [[graft.text.PairIndex]] artifact recipe applied to the q136
  * PageRank ranks. The rank table is a per-dataset structure (a pure
  * function of lineitem ⋈ orders), |V| rows — rank-scale, orders of
  * magnitude smaller than the edge list it took three shuffle
  * iterations to produce — so it is exactly the thing to pay for once:
  * feed ranking, influence-weighted sampling, and the q137 top-k all
  * read parquet ever after.
  *
  * Keys on BOTH inputs' content fingerprints
  * ([[Artifacts.dirMulti]]): a parquet-level rewrite of either table
  * rebuilds, byte-identical copies reuse. The build runs the SAME
  * [[ExtendedQueries.pagerankRanks]] pipeline the direct query uses,
  * so artifact and query cannot drift; the artifact name encodes the
  * iteration count.
  */
/** The degree-denormalized fulfillment edge list (src, dst, d) — the
  * postings-table of graph queries: any walk/centrality/neighborhood
  * query starts from exactly this relation, so it materializes once
  * per (lineitem, orders) fingerprint and iterative consumers (q139
  * personalized PageRank) pay parquet read + frontier-scale work,
  * never the corpus-scale build. Built from the SAME
  * [[ExtendedQueries.fulfillmentEdges]] definition the q136 direct
  * path uses. */
object EdgeIndex {

  /** (src, dst, d) for the fulfillment graph under `d`, from the
    * artifact when present, else built and materialized. */
  def load(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = Artifacts.dirMulti(d, "fulfillment_edges_v1",
      Seq("lineitem.parquet", "orders.parquet"))
    Artifacts.materialize(dir) { tmp =>
      val e = ExtendedQueries.fulfillmentEdges(s, d).persist()
      try {
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        e.join(deg, "src")
          .write.mode("overwrite").parquet(tmp.resolve("edges").toString)
      } finally e.unpersist()
    }
    s.read.parquet(dir.resolve("edges").toString)
  }
}

object RankIndex {

  /** (node, rank_scaled) for every node of the fulfillment graph under
    * `d`, from the artifact when present, else built via the q136
    * pipeline and materialized. */
  def load(s: SparkSession, d: String): DataFrame = {
    val dir = Artifacts.dirMulti(d, "pagerank_i3_v1",
      Seq("lineitem.parquet", "orders.parquet"))
    Artifacts.materialize(dir) { tmp =>
      ExtendedQueries.pagerankRanks(s, d)
        .write.mode("overwrite").parquet(tmp.resolve("ranks").toString)
    }
    s.read.parquet(dir.resolve("ranks").toString)
  }
}
