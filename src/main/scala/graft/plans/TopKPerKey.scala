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
                      child: LogicalPlan,
                      rankAttr: Option[Attribute] = None) extends UnaryNode {
  require(k >= 1)
  // rankAttr is a constructor field (minted once by the TopK API), NOT
  // derived here — optimizer copies of this node must keep the exprId
  // or downstream references stop resolving
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // rankAttr is born here, not consumed — without this the TreeNode
  // machinery counts the Attribute field as a reference and CheckAnalysis
  // reports it "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t @ TopKPerKey(keys, order, k, child, _) =>
      // normalize float/double keys (-0.0 == 0.0, canonical NaN) the
      // way Window.partitionBy gets normalized — UnsafeRow byte
      // equality in the heap map would otherwise split such groups
      val normKeys = keys.map(
        org.apache.spark.sql.graft.ColumnBridge.normalizeFloats)
      // partial (pre-shuffle) + final, exactly like partial aggregation;
      // only the final emits the optional rank column (1 = best)
      TopKPerKeyExec(normKeys, order, k, partial = false,
        TopKPerKeyExec(normKeys, order, k, partial = true,
          planLater(child)), rankAttr = t.rankAttr) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan,
                          rankAttr: Option[Attribute] = None)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  // a per-partition transformation: rows never move, so advertise the
  // child's partitioning (for the final stage that is the hash
  // exchange on `keys`). Without this the default UnknownPartitioning
  // makes EnsureRequirements insert a SECOND exchange on the same keys
  // for any downstream groupBy(keys) — observed back-to-back in the
  // q85/q87 cap-then-collect pipelines.
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val emitRank = rankAttr.isDefined
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
          // initial capacity stays SMALL and the queue grows on
          // demand: `limit` as the capacity preallocates a limit-slot
          // array per KEY, and a high-cardinality key set of tiny
          // groups (q85: near-singleton buckets under byte-length
          // blocking, cap 1025) then churns gigabytes of arrays —
          // measured 35 s of the 38 s q85 run at 100× before this
          heap = new java.util.PriorityQueue[UnsafeRow](
            math.min(limit, 16), ordering.reverse)
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
      if (!emitRank) {
        heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
          .map(_.asInstanceOf[InternalRow])
      } else {
        // final stage with a rank column: each heap holds <= k rows, so
        // sorting it is O(k log k) per key — the full-partition Sort a
        // row_number window would need is exactly what this avoids
        val outTypes = (childOutput.map(_.dataType) :+
          org.apache.spark.sql.types.IntegerType).toArray
        val proj = UnsafeProjection.create(outTypes)
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        heaps.values().asScala.iterator.flatMap { heap =>
          val arr = heap.toArray(new Array[UnsafeRow](heap.size))
          java.util.Arrays.sort(arr,
            ordering.asInstanceOf[java.util.Comparator[_ >: UnsafeRow]])
          arr.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            proj(joined(r, rankRow)).asInstanceOf[InternalRow]
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
