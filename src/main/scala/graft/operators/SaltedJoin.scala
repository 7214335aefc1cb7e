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
}
