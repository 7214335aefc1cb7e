package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical ROLLUP via cascaded re-aggregation — the
  * Expand-free plan for multi-level totals at 100 TB.
  *
  * Spark's built-in `rollup(d1..dL)` (q35's `.cube` sibling) lowers to
  * an `Expand` node that emits L+1 COPIES of EVERY input row — one per
  * grouping level — BEFORE the aggregation exchange. On a corpus-scale
  * fact table that multiplies the map-side row stream (and the
  * partial-agg hash table's key space) by the hierarchy depth: a
  * 4-level rollup over 100 TB pushes ~500 TB of rows into the
  * aggregation.
  *
  * The cascade exploits what a hierarchy means: every coarser level is
  * a RE-aggregation of the level below it, so the fact table needs to
  * be aggregated exactly ONCE — at the finest grain — and each coarser
  * level folds the previous level's (group-scale, not corpus-scale)
  * result:
  *
  *   G_L  = fact.groupBy(d1..dL).agg(aggs)        // the ONLY pass over data
  *   G_k  = G_{k+1}.groupBy(d1..dk).agg(combine)  // |G_{k+1}| rows in
  *   out  = union of all levels, coarser dims null-filled + `lvl`
  *
  * This is valid precisely for DISTRIBUTIVE aggregates — ones with a
  * combine form: sum→sum, count→sum, min→min, max→max (avg ships as
  * sum+count and divides at the edge). [[Agg]] encodes the pair; the
  * operator refuses anything without one rather than silently
  * mis-combining (a median, for instance, does not cascade).
  *
  * Scale shape (PlanSpec pins it): ONE hash exchange of the fact table
  * keyed on the full dim tuple with map-side partial agg — identical
  * to a plain groupBy — then L group-scale exchanges over frames the
  * size of the FINEST grouping (|G_L|, typically orders of magnitude
  * below the fact table; the union is cheap because every input to it
  * is already aggregated). `.explain` shows zero `Expand` nodes,
  * where `rollup()` shows the L+1-projection Expand feeding the big
  * exchange.
  *
  * Null semantics: rollup marks "all values" with NULL, which is
  * ambiguous when a dim itself holds nulls — the emitted `lvl` column
  * (number of dims retained; L=finest, 0=grand total) disambiguates,
  * exactly like SQL's GROUPING_ID. The q175 oracle replays DuckDB's
  * native GROUP BY ROLLUP against this cascade, proving level-by-level
  * equivalence cross-engine.
  *
  * Reference anchor: the reference has no multi-level reporting at all
  * (SURVEY §2.D — its aggregates are row counters,
  * `etl-gcs-cloudsql/src/services/conductor.ts` keeps per-run totals);
  * this is extension surface priced for the lake-scale fact tables the
  * reference's CloudSQL sink could never hold.
  */
object CascadedRollup {

  /** One cascadable aggregate: `agg` runs at the finest level over the
    * raw column; `combine` folds a finer level's RESULT column into
    * the coarser level. Names are fixed so every level unions by name. */
  final case class Agg(name: String, agg: Column, combine: String => Column)

  /** sum(col) — combines as sum. */
  def sum_(c: String, as: String): Agg =
    Agg(as, sum(col(c)).as(as), n => sum(col(n)).as(n))

  /** count(*) — combines as sum, coalesced to 0 so the GLOBAL fold
    * (the grand-total / () grouping set) over an EMPTY finest frame
    * yields count 0, matching SQL `GROUP BY CUBE`/`ROLLUP` semantics
    * (sum-of-nothing is NULL; count-of-nothing is 0). On every
    * grouped fold the coalesce is a no-op — groups only exist where
    * rows exist and finest counts are never null. */
  def count_(as: String): Agg =
    Agg(as, count(lit(1)).as(as),
      n => coalesce(sum(col(n)), lit(0L)).as(n))

  /** min(col) — combines as min. */
  def min_(c: String, as: String): Agg =
    Agg(as, min(col(c)).as(as), n => min(col(n)).as(n))

  /** max(col) — combines as max. */
  def max_(c: String, as: String): Agg =
    Agg(as, max(col(c)).as(as), n => max(col(n)).as(n))

  /** The single corpus-scale pass: `df` aggregated at the finest grain
    * (the full `dims` tuple), map-side combined — a plain groupBy.
    * This frame is also the MAINTAINABLE state of the rollup: because
    * every [[Agg]] is distributive, [[foldFinest]] absorbs an ingest
    * batch into it at batch + group scale, and [[cascadeFrom]] re-derives
    * every coarser level without ever touching the fact table again. */
  def aggregateFinest(df: DataFrame, dims: Seq[String],
                      aggs: Seq[Agg]): DataFrame =
    df.groupBy(dims.map(col): _*).agg(aggs.head.agg,
      aggs.tail.map(_.agg): _*)

  /** Incremental maintenance of a finest-grain aggregate table: fold a
    * raw-fact `batch` into `storedFinest` (a prior [[aggregateFinest]]
    * result). The batch aggregates at BATCH scale, then combines with
    * the stored groups at GROUP scale — the original fact rows are
    * never re-read. Distributivity makes this exact:
    * `foldFinest(aggregateFinest(a), b) == aggregateFinest(a ∪ b)`
    * row-for-row, which q176's oracle proves cross-engine by replaying
    * the full recompute. (Deletions/updates need retractable aggs —
    * sum/count retract, min/max do not; this is append-only ingest,
    * the [[graft.text.LabelStore]] fold's contract.) */
  def foldFinest(storedFinest: DataFrame, batch: DataFrame,
                 dims: Seq[String], aggs: Seq[Agg]): DataFrame =
    storedFinest.unionByName(aggregateFinest(batch, dims, aggs))
      .groupBy(dims.map(col): _*)
      .agg(aggs.head.combine(aggs.head.name),
        aggs.tail.map(a => a.combine(a.name)): _*)

  /** Rollup `df` over the hierarchy `dims` (finest = the whole list,
    * then drop from the right, down to the grand total), computing
    * `aggs` at every level. Output columns: dims (coarser levels
    * null-filled), `lvl` (dims retained — L..0), then one column per
    * agg. Row-set identical to `df.rollup(dims).agg(...)` + GROUPING_ID,
    * but the fact table is scanned and shuffled exactly once. */
  def rollup(df: DataFrame, dims: Seq[String], aggs: Seq[Agg]): DataFrame = {
    require(dims.nonEmpty, "rollup needs at least one dim")
    require(aggs.nonEmpty, "rollup needs at least one aggregate")
    cascadeFrom(aggregateFinest(df, dims, aggs), dims, aggs)
  }

  /** The cascade half: every rollup level derived from an
    * already-aggregated finest-grain frame ([[aggregateFinest]] or a
    * [[foldFinest]]-maintained store) — group-scale folds only. */
  def cascadeFrom(finest: DataFrame, dims: Seq[String],
                  aggs: Seq[Agg]): DataFrame = {
    require(dims.nonEmpty, "rollup needs at least one dim")
    require(aggs.nonEmpty, "rollup needs at least one aggregate")
    val dimTypes = dims.map(d => d -> finest.schema(d).dataType).toMap
    def shape(level: DataFrame, kept: Seq[String]): DataFrame = {
      val nulled = dims.filterNot(kept.contains)
        .map(d => lit(null).cast(dimTypes(d)).as(d))
      level.select(kept.map(col) ++ nulled ++
        Seq(lit(kept.size).as("lvl")) ++ aggs.map(a => col(a.name)): _*)
    }
    // cascade: each coarser level folds the PREVIOUS level's result —
    // group-scale frames, never the fact table again
    val levels = Iterator.iterate((finest, dims)) { case (prev, kept) =>
      val coarser = kept.dropRight(1)
      val folded =
        if (coarser.isEmpty)
          prev.agg(aggs.head.combine(aggs.head.name),
            aggs.tail.map(a => a.combine(a.name)): _*)
        else
          prev.groupBy(coarser.map(col): _*)
            .agg(aggs.head.combine(aggs.head.name),
              aggs.tail.map(a => a.combine(a.name)): _*)
      (folded, coarser)
    }.take(dims.size + 1).toSeq
    levels.map { case (lv, kept) => shape(lv, kept) }
      .reduce(_.unionByName(_))
  }

  /** CUBE via the same cascade — all 2^L groupings, the fact table
    * still scanned and shuffled exactly ONCE. Spark's built-in
    * `cube()` Expands every fact row 2^L times pre-exchange (a
    * 3-dim cube over 100 TB shuffles ~800 TB); here each of the 2^L−1
    * coarser groupings folds from a PARENT grouping with exactly one
    * more dim (parent = the grouping plus its lowest-index missing
    * dim — always already computed because levels process in
    * descending dim count), so everything beyond the finest pass is
    * group-scale. The subset lattice means several groupings fold
    * from one parent — AQE's ReusedExchange collapses those onto a
    * single physical exchange per parent.
    *
    * Output: dims (missing ones null-filled) + `gid` (SQL
    * GROUPING_ID convention: bit set ⇔ the dim is AGGREGATED AWAY,
    * first dim = most significant bit — disambiguates cube-null from
    * data-null) + the aggs. Row-set identical to
    * `df.cube(dims).agg(...)` + grouping_id, which q182's DuckDB
    * `GROUP BY CUBE` oracle replays natively. */
  def cube(df: DataFrame, dims: Seq[String], aggs: Seq[Agg]): DataFrame = {
    require(dims.nonEmpty, "cube needs at least one dim")
    require(aggs.nonEmpty, "cube needs at least one aggregate")
    cubeFrom(aggregateFinest(df, dims, aggs), dims, aggs)
  }

  /** The cascade half of [[cube]], from a finest-grain frame (an
    * [[aggregateFinest]] result or a [[foldFinest]]-maintained store —
    * incremental cube maintenance falls out for free). */
  def cubeFrom(finest: DataFrame, dims: Seq[String],
               aggs: Seq[Agg]): DataFrame = {
    require(dims.nonEmpty, "cube needs at least one dim")
    require(aggs.nonEmpty, "cube needs at least one aggregate")
    require(dims.size <= 8,
      s"a ${dims.size}-dim cube is ${1 << dims.size} groupings — cap 8")
    val L = dims.size
    val full = (1 << L) - 1
    val dimTypes = dims.map(d => d -> finest.schema(d).dataType).toMap
    def kept(mask: Int): Seq[String] =
      dims.zipWithIndex.collect { case (d, i) if (mask & (1 << i)) != 0 => d }
    def combineAll(prev: DataFrame, ks: Seq[String]): DataFrame =
      if (ks.isEmpty)
        prev.agg(aggs.head.combine(aggs.head.name),
          aggs.tail.map(a => a.combine(a.name)): _*)
      else
        prev.groupBy(ks.map(col): _*)
          .agg(aggs.head.combine(aggs.head.name),
            aggs.tail.map(a => a.combine(a.name)): _*)
    val frames = scala.collection.mutable.Map[Int, DataFrame](full -> finest)
    // descending dim count: every parent is computed before its children
    (0 until full).sortBy(m => -Integer.bitCount(m)).foreach { m =>
      val lowestMissing = (0 until L).find(i => (m & (1 << i)) == 0).get
      frames(m) = combineAll(frames(m | (1 << lowestMissing)), kept(m))
    }
    frames.toSeq.sortBy(-_._1).map { case (m, f) =>
      val ks = kept(m)
      val nulled = dims.filterNot(ks.contains)
        .map(d => lit(null).cast(dimTypes(d)).as(d))
      val gid = (0 until L).map(i =>
        if ((m & (1 << i)) == 0) 1 << (L - 1 - i) else 0).sum
      f.select(ks.map(col) ++ nulled ++ Seq(lit(gid).as("gid")) ++
        aggs.map(a => col(a.name)): _*)
    }.reduce(_.unionByName(_))
  }
}
