package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-key top-k as a first-class physical operator.
  *
  * The built-in formulation — `row_number().over(partitionBy(keys)
  * .orderBy(...)) <= k` — must SORT every key group in full: the
  * shuffle writes all rows and the window operator sorts each
  * partition, O(n log n) memory/spill-bound work for output of size
  * keys×k. This operator keeps a bounded heap of k rows per key:
  * O(n log k) comparisons, no sort, no spill needed while the
  * retained set fits.
  *
  * MEMORY CONTRACT: each task holds (distinct keys it sees) × k rows
  * on the JVM heap, untracked by Spark's memory manager — the right
  * operator when key cardinality is bounded (categories, tenants,
  * buckets). For unbounded keys (per-user over the open internet),
  * use [[graft.operators.TopK.perKeySpillable]] — the same semantics
  * as a TypedImperativeAggregate ([[TopKRowsAgg]]) riding
  * ObjectHashAggregateExec's sort-based external fallback, which
  * degrades gracefully instead of OOMing.
  *
  * Spark-first wiring, the (c) route of the design rules: logical node
  * → [[TopKStrategy]] (planner strategy, injectable via
  * `SparkSessionExtensions.injectPlannerStrategy` or
  * `spark.experimental.extraStrategies`) → [[TopKPerKeyExec]], which
  * declares `ClusteredDistribution(keys)` so Catalyst inserts exactly
  * one hash exchange (map-side the operator ALSO runs, shrinking the
  * shuffle to ≤ keys×k rows per mapper — a partial top-k, like a
  * partial aggregate).
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // normalize float/double keys (-0.0 == 0.0, canonical NaN) the
      // way Window.partitionBy gets normalized — UnsafeRow byte
      // equality in the heap map would otherwise split such groups
      val normKeys = keys.map(
        org.apache.spark.sql.graft.ColumnBridge.normalizeFloats)
      // partial (pre-shuffle) + final, exactly like partial aggregation
      TopKPerKeyExec(normKeys, order, k, partial = false,
        TopKPerKeyExec(normKeys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // heap head = WORST retained row (reverse ordering): a new row
      // replaces it when strictly better
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(rowProj(row).copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(rowProj(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
        .map(_.asInstanceOf[InternalRow])
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
