package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout — multi-dimensional clustering
  * for scan pruning, the Delta/Iceberg `OPTIMIZE ZORDER BY` idea
  * expressed in plain Spark + parquet.
  *
  * A table sorted by ONE column prunes range scans on that column and
  * nothing else: at 100 TB, events laid out by time answer "last
  * hour" cheaply but "user X's history" reads everything. Interleaving
  * the bits of TWO dimensions' normalized values (the Morton code)
  * gives a single sort key whose contiguous ranges cover bounded
  * RECTANGLES in (A, B) space — so files/row-groups written in z-order
  * carry tight min/max footer stats on BOTH columns, and parquet's
  * predicate pushdown skips most of the table for a range filter on
  * EITHER dimension (~√s of the data for a selectivity-s band, vs s on
  * the sorted dimension and 1 on the other for a linear layout).
  *
  * Everything is integer-exact so the layout is reproducible and the
  * q171 locality audit hash-checks cross-engine:
  *
  *   - [[scaleTo16]]: `(x − mn)·65535 div max(mx − mn, 1)` — a
  *     rank-free affine bucketing onto the FULL [0, 65536) (small
  *     domains still use the curve's top bits), identical `div`
  *     semantics in Spark and DuckDB for the non-negative operands it
  *     is given. The multiply bounds the contract: the dimension
  *     RANGE must stay below 2⁴⁷ (see the method doc) — epoch days,
  *     entity keys and bucket ids qualify; µs clocks pre-divide;
  *   - [[spreadBits16]]: the classic 4-step magic-mask bit spread
  *     (0x00FF00FF → 0x0F0F0F0F → 0x33333333 → 0x55555555);
  *   - [[zValue]]: `spread(a) | spread(b) << 1` < 2³².
  *
  * [[writeZOrdered]] lays a frame out by `repartitionByRange(_z)` +
  * `sortWithinPartitions(_z)` (a range exchange + spillable per-task
  * sorts — no global sort; the [[graft.text.TrainOrder]] discipline)
  * and drops the key before writing: z-order is LAYOUT, not schema.
  * ZOrderSpec measures the payoff the design claims: a 10%-band filter
  * on the non-time dimension materializes a fraction of the z-ordered
  * table's rows while reading 100% of the time-sorted twin.
  *
  * Reference anchor: no counterpart — the reference's lake is
  * unordered CSV-to-rows; this is the extension-surface layout
  * operator its 100 TB successor needs. */
object ZOrder {

  /** Interleave-ready 16-bit spread: bit i of `c` moves to bit 2i.
    * `c` must already lie in [0, 65536). */
  def spreadBits16(c: Column): Column = {
    val s1 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(16711935L))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(252645135L))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(858993459L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(1431655765L))
  }

  /** The 32-bit Morton code of two pre-scaled [0, 65536) values. */
  def zValue(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** Affine integer bucketing of `x ∈ [mn, mx]` onto the FULL
    * [0, 65536) so small domains still use the curve's top bits:
    * `(x − mn)·65535 div max(mx − mn, 1)` — SQL `div`
    * (IntegralDivide), never float division. Contract: the dimension
    * RANGE must stay below 2⁴⁷ or the multiply overflows — epoch
    * days, entity keys, bucket ids all qualify; a µs-clock caller
    * pre-divides to seconds (the audit q171 uses days). */
  def scaleTo16(x: Column, mn: Column, mx: Column): Column =
    call_function("div", (x - mn) * lit(65535L),
      greatest(mx - mn, lit(1L)))

  /** The z key of `dimA`/`dimB` (both integral), min/max collected
    * from the frame itself via ONE eager 1-row aggregate and inlined
    * as literals — callers that know their domains pass literal
    * bounds through [[scaleTo16]] / [[zValue]] directly.
    *
    * The 2⁴⁷ range contract is enforced HERE, once, driver-side on
    * the collected bounds (a µs-clock caller fails loudly instead of
    * silently corrupting the layout) — NOT on the per-row path: the
    * fact-row projection stays the bare [[zValue]] arithmetic inside
    * whole-stage codegen, with no join, no conditional and no
    * `raise_error` (PlanSpec pins this; the guard-in-plan variant
    * cost q171 2.7× at sf0.1). The bounds job is a count-scale
    * map-side-combined aggregate — the same work the old broadcast
    * 1-row frame ran, just materialized eagerly. */
  def zKey(df: DataFrame, dimA: Column, dimB: Column): DataFrame = {
    val mm = df.agg(
      min(dimA.cast("long")), max(dimA.cast("long")),
      min(dimB.cast("long")), max(dimB.cast("long")),
      count(lit(1))).head
    if (mm.getLong(4) == 0L) {
      // empty frame: no rows to key — keep the schema contract
      df.withColumn("_z", lit(null).cast("long"))
    } else if ((0 to 3).exists(mm.isNullAt)) {
      // min/max ignore nulls, so a null aggregate here means one
      // dimension is all-null on a NON-empty frame — no meaningful
      // interleave exists; fail with the cause, not an NPE at getLong
      throw new IllegalArgumentException(
        "ZOrder.zKey: a z-order dimension is all-null over a non-empty" +
          " frame (null bounds: " +
          Seq("min(dimA)", "max(dimA)", "min(dimB)", "max(dimB)")
            .zipWithIndex.collect { case (n, i) if mm.isNullAt(i) => n }
            .mkString(", ") + ") — filter or coalesce the dimension")
    } else {
      val (mna, mxa, mnb, mxb) =
        (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
      require(math.max(mxa - mna, mxb - mnb) < (1L << 47),
        "ZOrder.zKey: a dimension range >= 2^47 overflows scaleTo16" +
          " — pre-scale the dimension (e.g. us -> s)")
      df.withColumn("_z", zValue(
        scaleTo16(dimA.cast("long"), lit(mna), lit(mxa)),
        scaleTo16(dimB.cast("long"), lit(mnb), lit(mxb))))
    }
  }

  /** Write `df` z-ordered by (`dimA`, `dimB`) into `files` parquet
    * files: range-exchange on the Morton key, per-task sort, key
    * dropped before the write (layout, not schema). Each file then
    * covers a bounded (A, B) rectangle, so its footer min/max prune
    * range filters on either dimension. */
  def writeZOrdered(df: DataFrame, dimA: Column, dimB: Column,
                    outDir: String, files: Int = 64): Unit = {
    require(files >= 1)
    zKey(df, dimA, dimB)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .select(df.columns.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
  }
}
