package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TopK

class TopKSpec extends SparkSpec {

  import spark.implicits._

  private def orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")

  test("TopK.perKey == row_number window formulation") {
    val viaOp = TopK.perKey(orders, Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    assert(viaOp === viaWindow)
  }

  test("TopK plan: partial + final exec around one exchange, no sort") {
    val df = TopK.perKey(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).length === 2,
      s"expected partial+final TopKPerKeyExec:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"),
      "final exec must cluster by the key")
    assert(!plan.contains("Sort "), s"bounded-heap top-k must not sort:\n$plan")
  }

  test("perKeyRanked == row_number window formulation, rank included") {
    val viaOp = TopK.perKeyRanked(orders, Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3, "rn")
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "rn", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    assert(viaOp === viaWindow)
  }

  test("perKeyRanked plan: no Sort, no Window — heaps emit the rank") {
    val df = TopK.perKeyRanked(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3, "rn")
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).length === 2,
      s"expected partial+final TopKPerKeyExec:\n$plan")
    assert(!plan.contains("Sort ") && !plan.contains("Window"),
      s"ranked top-k must not sort or window:\n$plan")
  }

  test("perKeySpillable == perKey == window formulation") {
    val viaAgg = TopK.perKeySpillable(orders, Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaOp = TopK.perKey(orders, Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaAgg === viaOp)
    // output schema must be the original columns, in order
    val cols = TopK.perKeySpillable(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc), 1).columns.toSeq
    assert(cols === orders.columns.toSeq)
  }

  test("perKeySpillable plans through ObjectHashAggregate (spillable path)") {
    val df = TopK.perKeySpillable(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the sort-fallback-capable aggregate:\n${plan.take(1200)}")
    assert(plan.contains("partial_top_k_rows"),
      "partial aggregation must bound the shuffle at k rows per mapper key")
  }

  test("perKeySpillable honors null orderings (desc_nulls_first)") {
    val df = Seq((1, Some(10.0)), (1, None), (1, Some(20.0)), (2, Some(5.0)))
      .toDF("g", "v")
    val got = TopK.perKeySpillable(df, Seq("g"),
        Seq(col("v").desc_nulls_first), 2)
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    // nulls first: group 1 keeps (null, 20.0), not (20.0, 10.0)
    assert(got === Set((1, None), (1, Some(20.0)), (2, Some(5.0))))
  }

  test("TopK handles k larger than group size and multiple keys") {
    val df = Seq((1, "a", 10), (1, "a", 20), (2, "b", 5))
      .toDF("g1", "g2", "v")
    val out = TopK.perKey(df, Seq("g1", "g2"), Seq(col("v").desc), 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(out === Set((1, "a", 10), (1, "a", 20), (2, "b", 5)))
  }
}
