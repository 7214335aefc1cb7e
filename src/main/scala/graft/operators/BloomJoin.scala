package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}

import graft.plans.BloomAgg

/** Bloom-pruned join — the pre-SHUFFLE semi-filter for the join shape
  * neither broadcast nor plain shuffle prices right at 100 TB: the
  * build side is too big to broadcast AS PAYLOAD, but its KEY SET
  * compresses into one [[graft.plans.BloomAgg]] bit array (1 KiB), and
  * the probe side is huge and mostly non-matching.
  *
  * Mechanics: one narrow pass over the build side's keys aggregates
  * the Bloom (single group — the map-side partials merge by bitwise
  * OR into one 128-long array); the array broadcasts into the probe
  * side's SCAN STAGE, where the k=4 bit tests reject rows whose key
  * cannot match BEFORE the join exchange — the probe shuffle carries
  * survivors only (selectivity s of the join ⇒ ~s + 0.24% of the probe
  * side moves, the Bloom's measured false-positive rate at its 8192/4
  * geometry). BloomJoinSpec pins the filter physically below the
  * probe-side Exchange and measures the row reduction.
  *
  * Correctness: a Bloom has NO false negatives (a set bit never
  * clears), so every true match survives the pre-filter; false
  * positives are dropped by the exact join that follows. The result
  * is therefore row-identical to the plain join — which is exactly
  * what q172's oracle replays (the full unpruned join in DuckDB; the
  * hash match proves the pruning is row-invisible, the q168/q170
  * proof shape). Restricted to `inner` and `left_semi`: for
  * probe-preserving types (left/full outer) the filter would delete
  * unmatched probe rows the join must keep. (Spark's own
  * runtime-bloom rewrite guards the same way; this operator makes the
  * decision explicit, measurable, and available below AQE.)
  *
  * Like the whole sketch family, membership rides the shared 60-bit
  * md5 ([[keyHash60]]), so the same helper serves decontamination
  * (q112) and join pruning. */
object BloomJoin {

  /** The family's 60-bit md5 key hash (the [[BloomAgg]] input
    * contract). */
  def keyHash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** One-row, one-column frame holding the Bloom bit array of the
    * (null-filtered) `key` column. */
  def bloomOf(build: DataFrame, key: String): DataFrame =
    build.filter(col(key).isNotNull)
      .agg(toC(BloomAgg(toE(keyHash60(col(key))))
        .toAggregateExpression()).as("_bloom"))

  /** The k-probe membership test of hash column `h` against bit-array
    * column `bloomCol` — true ⇔ maybe present, false ⇔ DEFINITELY
    * absent. Same bit arithmetic q112's oracle replays. */
  def mightContain(bloomCol: String, h: Column): Column =
    (0 until BloomAgg.k).map { f =>
      val idx = shiftright(h, BloomAgg.fieldBits * f)
        .bitwiseAND(lit((BloomAgg.m - 1).toLong))
      call_function("shiftright",
        element_at(col(bloomCol),
          call_function("div", idx, lit(64L)).cast("int") + lit(1)),
        idx.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L))
    }.reduce(_ * _) === lit(1L)

  /** `probe` ⋈ `build` on `probeKey = buildKey`, with the probe side
    * Bloom-pre-filtered map-side. `joinType` ∈ {inner, left_semi}. */
  def prunedJoin(probe: DataFrame, probeKey: String,
                 build: DataFrame, buildKey: String,
                 joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi")(joinType),
      s"Bloom pre-filtering drops unmatched probe rows, so only " +
        s"match-only join types are sound; got '$joinType'")
    val pruned = prunedProbe(probe, probeKey, build, buildKey)
    // name-based join condition: `build` appears BOTH inside the
    // pruned probe's plan (the Bloom aggregate subtree) and as the
    // join's right side, so Spark de-duplicates the right side's
    // attribute ids — captured `build(buildKey)` refs would dangle
    if (probeKey == buildKey) pruned.join(build, Seq(probeKey), joinType)
    else {
      require(!probe.columns.contains(buildKey) &&
        !build.columns.contains(probeKey),
        s"key names must be unambiguous across sides: $probeKey/$buildKey")
      pruned.join(build, col(probeKey) === col(buildKey), joinType)
    }
  }

  /** Just the pre-filtered probe side (callers composing their own
    * join/aggregation tail). */
  def prunedProbe(probe: DataFrame, probeKey: String,
                  build: DataFrame, buildKey: String): DataFrame =
    probe.crossJoin(broadcast(bloomOf(build, buildKey)))
      .filter(mightContain("_bloom", keyHash60(col(probeKey))))
      .drop("_bloom")
}
