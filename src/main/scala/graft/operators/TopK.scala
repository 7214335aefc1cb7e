package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

import graft.plans.{TopKPerKey, TopKStrategy}

/** Public API for the custom per-key top-k operator (see
  * [[graft.plans.TopKPerKey]] for the physical design). Returns the
  * top `k` rows per distinct key combination under `orderBy` — the
  * bounded-heap replacement for
  * `row_number().over(partitionBy(keys).orderBy(...)) <= k`.
  *
  * Make `orderBy` a TOTAL order (add a unique tiebreaker) for
  * deterministic results.
  */
object TopK {

  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
             k: Int): DataFrame = {
    val spark = df.sparkSession
    // registration guard looks at the PLANNER's effective strategies —
    // that covers GraftExtensions' injectPlannerStrategy too, which
    // never shows up in experimental.extraStrategies; the mutation is
    // synchronized because extraStrategies is a bare var on the session
    spark.synchronized {
      if (!spark.sessionState.planner.strategies.contains(TopKStrategy) &&
          !spark.experimental.extraStrategies.contains(TopKStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
      }
    }
    // Spark 4 Columns carry lazy ColumnNode trees; run them through the
    // analyzer (via a throwaway Sort plan) to obtain fully-resolved
    // catalyst SortOrders + key attributes consistent with df's plan
    val analyzedSort = df.sortWithinPartitions(orderBy: _*)
      .queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val child = analyzedSort.child
    val attrByName = child.output.map(a => a.name -> a).toMap
    val keyExprs = keys.map(n => attrByName.getOrElse(n,
      throw new IllegalArgumentException(
        s"TopK.perKey: no column '$n' in ${child.output.map(_.name)}")))
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark,
      TopKPerKey(keyExprs, analyzedSort.order, k, child))
  }
}
