package graft

import org.apache.spark.sql.functions._

/** Bucketed tables = the co-located join strategy for 100 TB: both
  * sides pre-hashed into the same bucket count on the join key, so a
  * repeated fact⋈dim or fact⋈fact join runs with ZERO shuffle — the
  * bucketed scan satisfies the join's distribution requirement.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key runs without a shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so distribution requirements matter
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .write.mode("overwrite").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("orders_bucketed")
      spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .write.mode("overwrite").bucketBy(8, "c_custkey")
        .sortBy("c_custkey").saveAsTable("customer_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")

      // and it still computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
