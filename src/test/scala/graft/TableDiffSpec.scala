package graft

import org.apache.spark.sql.functions._
import graft.etl.{MergeOps, SilverStore, TableDiff}

/** [[graft.etl.TableDiff]] — the versioned-snapshot diff with the
  * bucket-fingerprint short-circuit (q170's operator). Pins:
  * identity diffs never run the row-level join; classification equals
  * the naive full-outer reference (bucket pruning row-invisible);
  * single-key churn prunes to one bucket; the fingerprint
  * distinguishes column-smear and null-vs-empty; the SilverStore form
  * prunes at the parquet PARTITION level. */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def mkTmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("identity diff: zero differing buckets, empty classified frame") {
    val v = (1 to 500).map(i => (i.toLong, s"val$i")).toDF("id", "v")
    val (d, stats) = TableDiff.diff(v, v, Seq("id"), 64)
    assert(stats.differing.isEmpty)
    assert(stats.added == 0 && stats.removed == 0 && stats.changed == 0)
    assert(d.count() == 0)
  }

  test("classification equals the naive full-outer reference (q170 shape)") {
    val dir = "/root/testdata/sf0.001"
    val base = graft.analytics.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val v2 = base.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .unionByName(base.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey",
          col("o_orderkey") + lit(1000000000000L)))
    val (d, stats) = TableDiff.diff(base, v2, Seq("o_orderkey"), 8)
    val got = d.select(col("diff_status"), col("o_orderkey")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // naive reference: unpruned full-outer join, value-level compare
    val ref = base.select(col("o_orderkey"),
        col("o_totalprice").as("p1"))
      .join(v2.select(col("o_orderkey"), col("o_totalprice").as("p2")),
        Seq("o_orderkey"), "full_outer")
      .withColumn("diff_status",
        when(col("p1").isNull, "added")
          .when(col("p2").isNull, "removed")
          .when(col("p1") =!= col("p2"), "changed"))
      .filter(col("diff_status").isNotNull)
      .select(col("diff_status"), col("o_orderkey")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == ref, "pruned diff drifted from the full reference")
    assert(stats.added > 0 && stats.removed > 0 && stats.changed > 0,
      "fixture must exercise all three classes")
    assert(stats.added + stats.removed + stats.changed == ref.size)
  }

  test("single-key churn prunes the row pass to exactly its bucket") {
    val v1 = (1 to 1000).map(i => (i.toLong, s"val$i")).toDF("id", "v")
    val v2 = v1.withColumn("v",
      when(col("id") === 777L, lit("churned")).otherwise(col("v")))
    val (d, stats) = TableDiff.diff(v1, v2, Seq("id"), 64)
    assert(stats.differing.size == 1,
      s"one changed key must flip one bucket: ${stats.differing}")
    assert(stats.changed == 1 && stats.added == 0 && stats.removed == 0)
    val row = d.collect().head
    assert(row.getString(0) == "changed" && row.getLong(1) == 777L)
  }

  test("fingerprint distinguishes column smear and null vs empty") {
    // ("ab","c") vs ("a","bc") concatenate identically without the
    // length prefix; null vs "" collide without the null marker
    val a = Seq((1L, "ab", "c"), (2L, null: String, "x"))
      .toDF("id", "x", "y")
    val b = Seq((1L, "a", "bc"), (2L, "", "x")).toDF("id", "x", "y")
    val (d, stats) = TableDiff.diff(a, b, Seq("id"), 4)
    assert(stats.changed == 2,
      s"both rows must classify as changed: $stats")
    assert(d.select(col("id")).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L))

    // the r13 xxhash64-specific hazard: XxHash64 SKIPS null inputs
    // (the running hash passes through), so (null,"x") and ("x",null)
    // would hash identically without the bit-packed null mask
    val c = Seq((3L, null: String, "x")).toDF("id", "x", "y")
    val e = Seq((3L, "x", null: String)).toDF("id", "x", "y")
    val (_, st2) = TableDiff.diff(c, e, Seq("id"), 4)
    assert(st2.changed == 1,
      s"a null-position swap must flip the fingerprint: $st2")
  }

  test("diffBucketed prunes at the parquet partition level") {
    import org.apache.spark.sql.types._
    val store = new SilverStore(spark, mkTmp("silver-diff"))
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("k", StringType),
      StructField("v", StringType),
      StructField("date_created", TimestampType),
      StructField("date_updated", TimestampType)))
    def src(rows: (String, String)*) = rows.toDF("k", "v")
    MergeOps.mergeBucketed(store, "t1", schema,
      src((1 to 120).map(i => s"key$i" -> s"v$i"): _*),
      Seq("k"), "id", Seq("v"))
    // t2 = byte-identical copy of t1 (same ids, same audit stamps),
    // then ONE key updated through the same bucketed merge
    val from = java.nio.file.Paths.get(store.root, "t1")
    val to = java.nio.file.Paths.get(store.root, "t2")
    val st = java.nio.file.Files.walk(from)
    try st.forEach { p =>
      val t = to.resolve(from.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    } finally st.close()
    MergeOps.mergeBucketed(store, "t2", schema, src("key7" -> "v7x"),
      Seq("k"), "id", Seq("v"))
    val (d, stats) = TableDiff.diffBucketed(store, "t1", store, "t2",
      Seq("k"))
    // the one churned key flips exactly one bucket...
    assert(stats.differing.size == 1, s"differing: ${stats.differing}")
    assert(stats.changed == 1 && stats.added == 0 && stats.removed == 0)
    assert(d.select(col("k")).collect().map(_.getString(0)).toSeq
      == Seq("key7"))
    // ...and the row-level scans carry it as a PARTITION filter
    val plan = d.queryExecution.executedPlan.toString
    val scans = plan.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(scans.exists(_.contains("_bucket")),
      s"row-level scan must prune _bucket partitions:\n$plan")
  }
}
