package graft

import org.apache.spark.sql.functions.col

/** plans.Spread — the scale-adaptive scan-parallelism floor for
  * CPU-dense kernels (r20). The contract: a frame whose file sources
  * cannot reach half the session's parallelism (the single-row-group
  * local-file case) is hash-repartitioned to the session's cores; a
  * frame that already scans wide is returned UNTOUCHED (at scale the
  * spread must be a no-op — nothing may be shuffled). */
class SpreadSpec extends SparkSpec {

  test("single-row-group file: spread repartitions to default parallelism") {
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    spark.range(1000).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assume(spark.sparkContext.defaultParallelism > 2)
    val before = df.rdd.getNumPartitions
    assert(before * 2 < spark.sparkContext.defaultParallelism,
      s"fixture not narrow enough ($before partitions)")
    val spread = plans.Spread.byKey(df, col("id"))
    assert(spread.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // rows unchanged
    assert(spread.count() == 1000)
    assert(spread.agg(org.apache.spark.sql.functions.sum("id"))
      .collect()(0).getLong(0) == 999L * 1000 / 2)
  }

  test("wide source (files >= cores): spread is the identity") {
    val dir = java.nio.file.Files.createTempDirectory("spreadw").toString
    val cores = spark.sparkContext.defaultParallelism
    spark.range(10000).toDF("id")
      .repartition(cores * 2)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val spread = plans.Spread.byKey(df, col("id"))
    // identity: same plan object semantics — no exchange added
    assert(spread eq df, "spread must not touch a wide scan")
  }

  test("non-file frame: spread is the identity") {
    val df = spark.range(100).toDF("id")
    assert(plans.Spread.byKey(df, col("id")) eq df)
  }
}
