package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.similarity.VectorStore

/** The vector ingest store's two contracts (the LabelStore discipline
  * on the ANN half): fold-then-search == rebuild-then-search under the
  * same stored geometry, and every mutation touches ONLY the list
  * partitions it must (appends never rewrite, forgets rewrite just the
  * hit lists). */
class VectorStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshDir() =
    Files.createTempDirectory("graft-vecstore").toString

  private def emb = graft.analytics.Tables.embeddings(spark, sf)

  private def listRows(dir: String): Set[(Long, Long)] =
    VectorStore.lists(spark, dir).select(col("vec_id"), col("_c"))
      .collect().map(r => (r.getLong(0), r.get(1) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long    => l.longValue
      })).toSet

  test("fold == rebuild: lists and search row-identical under fixed geometry") {
    val isBatch = col("vec_id") >= 16 && col("vec_id") % 5 === 4
    val inc = freshDir(); val full = freshDir()
    VectorStore.init(spark, emb.filter(!isBatch), inc)
    val stats = VectorStore.fold(spark, inc, emb.filter(isBatch))
    assert(stats.vectorsAdded > 0 && stats.listsTouched > 0)
    // same centroids (vec_id < 16 all in the base slice) → the full
    // rebuild is directly comparable
    VectorStore.init(spark, emb, full)
    assert(listRows(inc) === listRows(full),
      "folded store must hold the full rebuild's assignment exactly")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def res(dir: String) = VectorStore.search(spark, dir, q, 2, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(res(inc) === res(full),
      "search over the folded store drifted from the rebuild")
  }

  test("fold appends without rewriting existing list files; empty fold is a no-op") {
    val isBatch = col("vec_id") >= 16 && col("vec_id") % 5 === 4
    val dir = freshDir()
    VectorStore.init(spark, emb.filter(!isBatch), dir)
    def snapshot(): Set[(String, Long)] = {
      val st = Files.walk(Paths.get(dir, "lists"))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.filter(Files.isRegularFile(_))
          .filter(_.getFileName.toString.startsWith("part-"))
          .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
          .toSet
      } finally st.close()
    }
    val before = snapshot()
    assert(VectorStore.fold(spark, dir,
      emb.filter(col("vec_id") < 0)) === VectorStore.FoldStats(0L, 0))
    VectorStore.fold(spark, dir, emb.filter(isBatch))
    val after = snapshot()
    assert(before.subsetOf(after),
      "a fold must only ADD files — existing list files stay untouched")
    assert(after.size > before.size, "the fold must have appended files")
  }

  test("forget rewrites only hit lists; emptied lists removed; unknown ids no-op") {
    val dir = freshDir()
    VectorStore.init(spark, emb, dir)
    import spark.implicits._
    // unknown id: nothing listed, nothing rewritten
    assert(VectorStore.forget(spark, dir, Seq(999999L).toDF("vec_id"))
      === VectorStore.ForgetStats(0L, 0))
    // forget one real non-centroid vector: exactly its list rewrites
    val victim = listRows(dir).filter(_._1 >= 16).head
    val untouched = listRows(dir).filter(t => t._2 != victim._2)
    assert(untouched.nonEmpty)
    val snapBefore = untouched.map(_._2).map { c =>
      val p = Paths.get(dir, "lists", s"_c=$c")
      c -> Files.getLastModifiedTime(p).toMillis
    }.toMap
    val st = VectorStore.forget(spark, dir, Seq(victim._1).toDF("vec_id"))
    assert(st === VectorStore.ForgetStats(1L, 1))
    assert(!listRows(dir).contains(victim))
    snapBefore.foreach { case (c, t) =>
      assert(Files.getLastModifiedTime(
        Paths.get(dir, "lists", s"_c=$c")).toMillis === t,
        s"list _c=$c was not hit and must not be rewritten")
    }
    // erase an entire list: its partition dir disappears
    val someList = listRows(dir).groupBy(_._2).minBy(_._2.size)
    val ids = someList._2.map(_._1).toSeq
    VectorStore.forget(spark, dir, ids.toDF("vec_id"))
    assert(!Files.exists(Paths.get(dir, "lists", s"_c=${someList._1}")),
      "a fully-forgotten list's partition dir must be removed")
  }
}
