package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.BloomJoin

/** [[graft.operators.BloomJoin]] — the pre-shuffle Bloom semi-filter
  * (q172's operator). Pins: row-identity with the plain join (pruning
  * row-invisible); zero false negatives + a measured probe-side
  * reduction; the membership filter physically below the probe-side
  * Exchange; and the probe-preserving-type refusal. */
class BloomJoinSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def fact = graft.analytics.Tables.events(spark, d)
    .select(col("user_id"), col("event_type"))
    .filter(col("user_id").isNotNull)

  private def dim = graft.analytics.Tables.customer(spark, d)
    .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") < 5)
    .select(col("c_custkey"))

  test("pruned inner join is row-identical to the plain join") {
    val got = BloomJoin.prunedJoin(fact, "user_id", dim, "c_custkey")
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = fact
    val dm = dim
    val want = f.join(dm, f("user_id") === dm("c_custkey"))
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce matches")
  }

  test("no false negatives; probe shuffle carries a fraction of the rows") {
    val total = fact.count()
    val pruned = BloomJoin.prunedProbe(fact, "user_id", dim, "c_custkey")
    val kept = pruned.count()
    val f = fact
    val dm = dim
    val trueMatch = f.join(dm, f("user_id") === dm("c_custkey"),
      "left_semi").count()
    // a set bit never clears: every true match must survive...
    assert(kept >= trueMatch)
    val keptKeys = pruned.select(col("user_id")).distinct().collect()
      .map(_.getLong(0)).toSet
    val matchKeys = dim.select(col("c_custkey")).collect()
      .map(_.getLong(0)).toSet
    val factKeys = fact.select(col("user_id")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert((matchKeys intersect factKeys).subsetOf(keptKeys),
      "false negative: a matching key was Bloom-rejected")
    // ...and the overwhelming majority of non-matches must NOT
    // (0.24% fp at 8192/4; the fixture's selectivity is ~10%)
    assert(kept < total / 2,
      s"Bloom should reject most of the probe side: kept $kept of $total")
  }

  test("membership test runs below every exchange (map-side, pre-shuffle)") {
    val j = BloomJoin.prunedJoin(fact, "user_id", dim, "c_custkey",
      "left_semi")
      .groupBy(col("event_type")).count()
    j.collect()
    // unwrap AQE (the Initial Plan section would duplicate nodes),
    // then use tree-print order — children below parents: the Bloom
    // bit test (element_at over the broadcast array; Catalyst folds
    // it into the scan-stage join condition, so there is no standalone
    // FilterExec to collect) must have every shuffle ABOVE it — no
    // "Exchange hashpartitioning" may print after it
    val s = (j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    val firstProbe = s.indexOf("element_at")
    assert(firstProbe >= 0, s"Bloom test missing from the plan:\n$s")
    assert(s.indexOf("Exchange hashpartitioning") >= 0,
      s"fixture lost its aggregation shuffle:\n$s")
    assert(s.indexOf("Exchange hashpartitioning", firstProbe) < 0,
      s"a shuffle ran BELOW the Bloom test:\n$s")
  }

  test("probe-preserving join types are refused") {
    intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(fact, "user_id", dim, "c_custkey", "left")
    }
  }
}
