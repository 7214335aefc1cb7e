package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.text.Bm25Store

/** The BM25 ingest store's contracts (the LabelStore discipline on the
  * retrieval half): fold-then-score == rebuild-then-score, stats track
  * every doc (including token-less ones), forget == rebuild-without,
  * and the `_meta` bucket guard fails fast. */
class Bm25StoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft-bm25store").toString

  // a tiny corpus with repeated terms (tf > 1), cross-doc terms
  // (df > 1), a token-less doc, and disjoint vocabularies so buckets
  // are non-trivially spread
  private def docs = Seq(
    (1L, "red widget red gear"),
    (2L, "red bolt blue gear"),
    (3L, "green lace green lace green"),
    (4L, "   "), // tokenizes to nothing — must still count in stats
    (5L, "blue widget chocolate bolt")
  ).toDF("doc_id", "text")

  private def qterms = Seq((1L, "red"), (1L, "gear"), (2L, "green"),
    (2L, "widget"), (3L, "blue")).toDF("qid", "t")

  private def scoredRows(dir: String): Set[(Long, Long, Long, Long)] =
    Bm25Store.scored(spark, dir, qterms)
      .select(col("qid"), col("doc_id"), col("tf"), col("df"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet

  test("fold == rebuild: postings, df, stats row-identical") {
    val inc = freshDir(); val full = freshDir()
    Bm25Store.init(spark, docs.filter(col("doc_id") <= 3), inc)
    val st = Bm25Store.fold(spark, inc, docs.filter(col("doc_id") > 3))
    assert(st.docsAdded === 2L && st.postingsAdded > 0L)
    Bm25Store.init(spark, docs, full)
    assert(scoredRows(inc) === scoredRows(full),
      "folded store must reproduce the full rebuild's scoring frame")
    val Array(sInc) = Bm25Store.stats(spark, inc).collect()
    val Array(sFull) = Bm25Store.stats(spark, full).collect()
    assert(sInc === sFull)
    // the token-less doc counts toward n_docs exactly as a direct
    // build would count it
    assert(sInc.getDouble(0) === 5.0)
  }

  test("forget == rebuild-without; stats self-heal from doclens") {
    val a = freshDir(); val b = freshDir()
    Bm25Store.init(spark, docs, a)
    val st = Bm25Store.forget(spark, a, Seq(2L, 4L).toDF("doc_id"))
    assert(st.docsRemoved === 2L && st.postingBucketsRewritten > 0)
    Bm25Store.init(spark, docs.filter(!col("doc_id").isin(2L, 4L)), b)
    assert(scoredRows(a) === scoredRows(b))
    assert(Bm25Store.stats(spark, a).collect() ===
      Bm25Store.stats(spark, b).collect())
    // idempotent: forgetting the same ids again is a no-op
    assert(Bm25Store.forget(spark, a, Seq(2L).toDF("doc_id"))
      .docsRemoved === 0L)
  }

  test("_meta guard: a store without its sidecar fails fast") {
    val dir = freshDir()
    Bm25Store.init(spark, docs, dir)
    Files.delete(Paths.get(dir, "_meta"))
    val ex = intercept[IllegalStateException] {
      Bm25Store.fold(spark, dir, docs.filter(col("doc_id") === 5L))
    }
    assert(ex.getMessage.contains("_meta"))
  }
}
