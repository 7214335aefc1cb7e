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
  * path uses.
  *
  * Stored BUCKETED by src: a bucketed scan carries
  * HashPartitioning(src) through persist(), so every iteration's
  * rank⋈edges join exchanges ONLY the rank side — the edge table is
  * never re-shuffled, the co-located-join property a cluster keeps by
  * writing its graph bucketed (BucketingSpec proves the mechanism).
  * The catalog entry is session-scoped (in-memory catalog); the FILES
  * are the content-keyed artifact, re-registered per session via
  * CREATE TABLE ... LOCATION. */
object EdgeIndex {

  /** Bucket count — matches the production shuffle-partition sizing;
    * encoded in the artifact name (a layout parameter). */
  private[graft] val buckets = 32

  /** (src, dst, d) for the fulfillment graph under `d`, bucketed by
    * src, from the artifact when present, else built and
    * materialized. */
  def load(s: SparkSession, d: String): DataFrame = {
    val dir = Artifacts.dirMulti(d, s"fulfillment_edges_b${buckets}_v2",
      Seq("lineitem.parquet", "orders.parquet"))
    Artifacts.materialize(dir) { tmp =>
      val e = ExtendedQueries.fulfillmentEdges(s, d).persist()
      // bucketBy can only write through saveAsTable: stage an EXTERNAL
      // table at the tmp path, then drop the catalog entry (the files
      // stay) so materialize() can rename the dir into place
      val stage = "graft_edges_stage_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        ExtendedQueries.degreedEdges(e)
          .write.option("path", tmp.resolve("edges").toString)
          .bucketBy(buckets, "src").saveAsTable(stage)
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $stage")
        e.unpersist()
      }
    }
    // re-register the bucketed layout in THIS session's catalog. The
    // name keys on the FULL artifact location (content key AND root:
    // tests redirect the root, and a name keyed on content alone would
    // keep pointing a later root's table at a deleted path); losing a
    // concurrent CREATE race is success — the winner registered the
    // same definition. REFRESH drops any cached file listing from a
    // same-path rebuild.
    val name = "graft_edges_" + java.security.MessageDigest
      .getInstance("MD5").digest(dir.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    try s.sql(
      s"""CREATE TABLE IF NOT EXISTS $name (src BIGINT, dst BIGINT, d BIGINT)
          USING parquet CLUSTERED BY (src) INTO $buckets BUCKETS
          LOCATION '${dir.resolve("edges")}'""")
    catch { case _: org.apache.spark.sql.AnalysisException => () }
    s.sql(s"REFRESH TABLE $name")
    s.table(name)
  }
}

/** INCREMENTAL maintenance for the fulfillment graph — the fold twin
  * the artifact family was missing (r17 verdict: labels, vectors,
  * postings, rollups, SCD2, attribution, funnel, markov and decay all
  * fold; [[EdgeIndex]]/[[RankIndex]] rebuilt from scratch on any
  * lineitem/orders change). Edge counts are ASSOCIATIVE — a parallel
  * edge is a weight, so the maintained state is the weighted edge
  * relation (src, dst, w) and a batch of new fulfillment facts folds
  * by per-(src, dst) weight addition: key-local by construction, so
  * it rides the [[graft.streaming.BucketedStateStore]] touched-bucket
  * publication (hash-bucketed by src — the [[EdgeIndex]] co-location
  * key — a fold rewrites only the buckets containing the batch's
  * sources; per-batch write cost tracks the batch, not |E|).
  *
  * The serve half re-runs q136's fixed unrolled iterations from the
  * maintained edge table with WEIGHTED contributions: the oracle's
  * per-parallel-edge `r // d` terms sum to exactly `w · (r div d)`
  * (each parallel row contributes the identical integer), and the
  * degree is `Σ w` per src = the multiplicity count — so fold+serve
  * is integer-identical to the one-shot build, and q208's oracle is
  * q136's generated SQL verbatim over the union of the folded batches
  * (the q205/q207 fold ≡ rebuild proof pattern, ridden through the
  * driver's own hash gate). */
object EdgeFold {

  import org.apache.spark.sql.functions.{col, count, lit, sum}
  import graft.streaming.BucketedStateStore

  /** Fold a batch of raw directed edges (src, dst — one row per
    * parallel edge, [[ExtendedQueries.fulfillmentEdges]]' shape) into
    * the weighted edge state at `storeDir`. Micro-batch `id` follows
    * the store's replay discipline (a re-fold of the same id rebuilds
    * its own version from identical inputs). */
  def fold(edges: DataFrame, id: Long, storeDir: String,
           buckets: Int = 64): BucketedStateStore.FoldStats =
    BucketedStateStore.foldBatch(
      edges.select(col("src"), col("dst")), id, storeDir,
      Seq("src"), buckets,
      init = weights,
      fold = (slice, b) => slice.unionByName(weights(b))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w")))

  /** Batch edges collapsed to their weights — the associative unit. */
  private def weights(b: DataFrame): DataFrame =
    b.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))

  /** The complete maintained weighted edge relation (src, dst, w). */
  def edges(s: SparkSession, storeDir: String): DataFrame =
    BucketedStateStore.readAll(s,
      java.nio.file.Paths.get(storeDir), "edge")

  /** Drop superseded state versions (the store's layered prune). */
  def prune(storeDir: String, keep: Int = 2): Unit =
    BucketedStateStore.prune(storeDir, keep)
}

object RankIndex {

  /** (node, rank_scaled) for every node of the fulfillment graph under
    * `d`, from the artifact when present, else built via the q136
    * pipeline and materialized. */
  def load(s: SparkSession, d: String): DataFrame = {
    val dir = Artifacts.dirMulti(d, "pagerank_i3_v1",
      Seq("lineitem.parquet", "orders.parquet"))
    Artifacts.materialize(dir) { tmp =>
      ExtendedQueries.withPagerankRanks(s, d)(
        _.write.mode("overwrite").parquet(tmp.resolve("ranks").toString))
    }
    s.read.parquet(dir.resolve("ranks").toString)
  }
}
