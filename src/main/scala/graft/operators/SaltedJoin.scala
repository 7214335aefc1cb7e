package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * A shuffled hash/sort-merge join sends every fact row with the same
  * key to ONE reducer — a hot key (power-law user, default value)
  * stalls the stage at 100 TB. Salting spreads each key over
  * `numSalts` reducers: fact rows get a salt derived from a
  * high-cardinality column, the dim side is replicated once per salt
  * value, and the join key becomes (key, salt). Join semantics are
  * EXACTLY those of the plain join — the salt only changes the
  * partitioning — which is what the oracle checks.
  *
  * This is the manual fallback; AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`) covers sort-merge joins
  * automatically, but salting also works for hash joins, pre-AQE
  * stacks, and deliberate replication factors.
  */
object SaltedJoin {

  /** Inner equi-join `fact.factKey == dim.dimKey`, salted `numSalts`
    * ways. `saltSrc` must be a fact-side column with per-row spread
    * (an id, a hash of several columns) — NOT the join key itself,
    * which would put every hot-key row back on one reducer. */
  def inner(fact: DataFrame, factKey: String,
            dim: DataFrame, dimKey: String,
            saltSrc: Column, numSalts: Int): DataFrame = {
    // null salt source must not drop the row (the contract is
    // plain-join semantics): null rows all land on salt 0
    val saltedFact = fact.withColumn("_salt",
      coalesce(pmod(saltSrc, lit(numSalts)), lit(0)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(typedlit((0 until numSalts).toArray)))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }

  /** Measured auto-dispatch (the [[JoinAdvisor]] consumer): inner
    * equi-join `left.leftKey == right.rightKey` whose physical
    * strategy is CHOSEN FROM THE DATA — [[JoinAdvisor.recommend]]'s
    * two cheap passes per side pick broadcast (a side fits), salted
    * (a hot key would stall a plain shuffle; `saltSrc` must resolve
    * against the HOT side — per-row spread, never the join key), or
    * plain shuffle-hash. Join semantics are identical on every branch
    * (the q162 oracle checks exactly that); only the physical plan —
    * and therefore whether the join survives a 100× skewed scale-up —
    * differs. Returns the joined frame plus the [[JoinAdvisor.Advice]]
    * it was dispatched on, so callers can log the evidence and size
    * downstream `shuffle.partitions` from `estJoinRows`.
    *
    * Output columns are left-then-right on every branch when names
    * are globally unique (the dim-join norm); with duplicate names
    * the branch's natural order is kept. */
  def auto(left: DataFrame, leftKey: String,
           right: DataFrame, rightKey: String,
           saltSrc: Column = monotonically_increasing_id(),
           partitions: Int = 32,
           broadcastMaxRows: Long = 1000000L,
           skewFactor: Long = 4L): (DataFrame, JoinAdvisor.Advice) = {
    val advice = JoinAdvisor.recommend(left, leftKey, right, rightKey,
      partitions, broadcastMaxRows, skewFactor)
    val joined = advice.strategy match {
      case JoinAdvisor.BroadcastSide("left") =>
        broadcast(left).join(right, left(leftKey) === right(rightKey))
      case JoinAdvisor.BroadcastSide(_) =>
        left.join(broadcast(right), left(leftKey) === right(rightKey))
      case JoinAdvisor.ShuffleHash =>
        left.hint("shuffle_hash").join(right,
          left(leftKey) === right(rightKey))
      case JoinAdvisor.Salted(n) =>
        // fact = the side whose key is hotter (the one salting exists
        // to spread); the other side is replicated n ways
        if (advice.left.maxKeyRows >= advice.right.maxKeyRows)
          inner(left, leftKey, right, rightKey, saltSrc, n)
        else inner(right, rightKey, left, leftKey, saltSrc, n)
    }
    val names = left.columns.toSeq ++ right.columns.toSeq
    val out = if (names.distinct.size == names.size)
      joined.select(names.map(col): _*) else joined
    (out, advice)
  }
}
