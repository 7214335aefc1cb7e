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

  /** Spark 4 Columns carry lazy ColumnNode trees; run them through the
    * analyzer (via a throwaway Sort plan) to obtain fully-resolved
    * catalyst SortOrders + a child plan whose attributes they
    * reference, and validate the key names against it. Shared by both
    * top-k planning routes. */
  private def analyzedSortOf(df: DataFrame, keys: Seq[String],
                             orderBy: Seq[Column])
      : (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
         Seq[SortOrder],
         Seq[org.apache.spark.sql.catalyst.expressions.Attribute]) = {
    val analyzedSort = df.sortWithinPartitions(orderBy: _*)
      .queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val child = analyzedSort.child
    val attrByName = child.output.map(a => a.name -> a).toMap
    val keyAttrs = keys.map(n => attrByName.getOrElse(n,
      throw new IllegalArgumentException(
        s"TopK: no column '$n' in ${child.output.map(_.name)}")))
    (child, analyzedSort.order, keyAttrs)
  }

  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
             k: Int): DataFrame = topK(df, keys, orderBy, k, None)

  /** [[perKey]] plus a 1-based rank column (1 = best under `orderBy`) —
    * the drop-in replacement for the `row_number().over(...)  <= k`
    * idiom INCLUDING the rank output, still without any Sort or Window:
    * the final heap (≤ k rows per key) is sorted in O(k log k). */
  def perKeyRanked(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
                   k: Int, rankCol: String): DataFrame =
    topK(df, keys, orderBy, k, Some(rankCol))

  private def topK(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
                   k: Int, rankCol: Option[String]): DataFrame = {
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
    val (child, order, keyAttrs) = analyzedSortOf(df, keys, orderBy)
    val rankAttr = rankCol.map(n =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        n, org.apache.spark.sql.types.IntegerType, nullable = false)())
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark,
      TopKPerKey(keyAttrs, order, k, child, rankAttr))
  }

  /** Spill-SAFE variant: plans through Spark's aggregate machinery
    * ([[graft.plans.TopKRowsAgg]], a TypedImperativeAggregate), so
    * ObjectHashAggregateExec degrades to sort-based external
    * aggregation under memory pressure instead of OOMing — the choice
    * for UNBOUNDED key cardinality; [[perKey]]'s dedicated physical
    * operator is leaner for bounded keys. Identical results. */
  def perKeySpillable(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
                      k: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode}
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst}
    val spark = df.sparkSession
    val (child, order, _) = analyzedSortOf(df, keys, orderBy)
    val base = org.apache.spark.sql.graft.DatasetBridge.ofRows(spark, child)

    // input struct: ranking fields first (aliased, may duplicate
    // payload columns), then every output column as payload
    val nOrder = order.length
    val structCol = org.apache.spark.sql.functions.struct(
      (order.map(_.child) ++ child.output).zipWithIndex.map {
        case (e, i) => column(e).as(s"_f$i")
      }: _*)
    val agg = column(
      graft.plans.TopKRowsAgg(expression(structCol), k,
        // (isAscending, nullsFirst): full SortOrder semantics survive
        order.map(o => (o.direction == Ascending,
          o.nullOrdering == NullsFirst)))
        .toAggregateExpression())

    base.groupBy(keys.map(col): _*)
      .agg(agg.as("_top"))
      .select(explode(col("_top")).as("_row"))
      .select(child.output.zipWithIndex.map { case (a, i) =>
        col(s"_row._f${nOrder + i}").as(a.name)
      }: _*)
  }
}
