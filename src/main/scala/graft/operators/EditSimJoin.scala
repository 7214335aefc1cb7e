package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — LOSSLESS blocking for
  * `levenshtein(a, b) <= t`, the entity-resolution join the
  * reference's unused `fast-levenshtein` dependency points at
  * (SURVEY §2.K; q41 is the quadratic census over a bounded vocab —
  * this is the operator form that survives an unbounded string set).
  *
  * The naive join is the O(n²) cross product q41 runs over its
  * 150-value vocabulary; at corpus scale the join must see only
  * CANDIDATE pairs, and — unlike the MinHash/Jaccard family (q24/q25),
  * which is allowed to miss — an edit-distance predicate is usually a
  * MATCHING rule, so the blocking must be provably complete. Two
  * classic devices, composed by string length:
  *
  *   - **prefix-filtered positional q-grams** (Gravano et al. 2001;
  *     the AllPairs/ED-Join prefix principle): strings within edit
  *     distance `t` share ≥ max(|r|,|s|) − q + 1 − q·t of their
  *     positional q-grams counting multiplicity (one edit destroys at
  *     most q grams). Encode the multiset as (gram, occurrence-index)
  *     elements, order every string's elements by ONE global key
  *     (ascending document frequency, then gram, then occurrence) and
  *     index only each string's FIRST q·t + 1 elements: any pair
  *     meeting the count bound must collide inside those prefixes
  *     (|A| − T + 1 ≤ q·t + 1 because T ≥ |A| − q·t). Posting lists
  *     thus hold the RAREST grams of each string — the hot shared
  *     boilerplate (`Customer#0000…`) sorts to the back and never
  *     enters a posting, which is what keeps list lengths (and the
  *     pair expansion) bounded on skewed real-world name sets.
  *   - **deletion variants** (the SymSpell/FastSS device) for the
  *     short tail: when BOTH strings are short enough that the count
  *     bound can reach zero (max(|r|,|s|) ≤ q·t + q − 1 ⇔ the pair can
  *     be within distance t sharing no gram at all), the gram filter
  *     is vacuous — but a string of length L has only Σ C(L,k), k ≤ t
  *     deletion variants, and two strings within edit distance t
  *     always share one. Deletion-position combinations are built
  *     in-row by t rounds of extend-by-a-strictly-larger-position —
  *     exactly the Σ C(L,k) combos, never a 2^L mask sweep (q=2, t=2
  *     means ≤ 16 combos per row; even at the L = 20 boundary the
  *     worst case is ~60 k combos where a mask enumeration would
  *     transiently hold 2^20 elements) — and the variants join
  *     exactly like postings.
  *
  * Candidates from both blocks union, dedup, and verify with ONE
  * `levenshtein` pass (built-in, codegen'd) — false candidates die
  * there, so the result is row-identical to the naive join, which is
  * exactly what q180's DuckDB oracle replays (the full quadratic join;
  * the hash match proves the blocking lossless — the q168/q170/q172
  * discipline).
  *
  * Scale shape: gram document frequencies are one token-scale groupBy
  * (vocab-bounded result), prefix selection one id-keyed groupBy with
  * an in-row sort of ≤ |s| elements (never a global window), and the
  * candidate join is an equi-join on (gram, occ) — no Cartesian
  * product anywhere (EditSimJoinSpec pins the plan). Postings and the
  * pair dedup carry ids + lengths only; strings attach once,
  * candidate-scale, for the verify. Verification cost is
  * candidate-scale, and candidates track true matches + the rare-gram
  * collision rate, not n².
  *
  * Choosing `q` — measured, not argued (`tools/EditSimScale`, r15, on
  * the worst-case `Customer#0000…` boilerplate at sf0.1 ×1 / ×10 with
  * distance-preserving digit-rotated replicas): the prefix principle
  * bounds WHICH elements enter postings, but posting LENGTH is
  * corpus_strings / vocab — once the gram vocabulary saturates
  * (9-digit ids under q=2 have ~10² digit grams), lists grow linearly
  * with the corpus and pair expansion quadratically. q=2: cand/string
  * 540 → 1533 across 10× (super-linear); q=3 (10³ digit grams):
  * 750 → 844 (flat, candidate growth back to match-tracking) at a
  * ~1.4× constant. Pick q so the plausible gram vocabulary stays well
  * above the string count; for digit-heavy keys that means q=3+.
  */
object EditSimJoin {

  /** [[join]] with the gram width picked by MEASUREMENT instead of by
    * the caller: the smallest `q` whose expected posting length
    * `n · (q·t + 1) / vocab(q)` stays under `postingCap` — the
    * q-selection rule the r15 EditSimScale table established, turned
    * into a pre-flight the way [[JoinAdvisor]] measures before
    * dispatching a join. The pre-flight is ONE token-scale pass
    * (every candidate width's grams explode from the same scan into
    * one bounded groupBy) plus a count; against the corpus-scale join
    * it guards, it is noise — and it is what makes the operator
    * self-tuning across 100× growth: digit-heavy keys saturate q=2's
    * ~10² gram vocabulary at thousands of strings and q=3's ~10³ at
    * hundreds of thousands (grams over a closed alphabet CANNOT
    * out-grow it), so the right width is a function of the data at
    * hand, not of the schema. */
  def joinAuto(strs: DataFrame, idCol: String, strCol: String,
               t: Int, postingCap: Int = 256): DataFrame =
    join(strs, idCol, strCol, t, chooseQ(strs, strCol, t, postingCap))

  /** The measured q-selection: smallest width whose expected posting
    * length is under the cap (else the largest feasible width).
    * Deterministic — approx_count_distinct's HLL registers fold
    * commutatively, so the estimate is partitioning-independent. */
  def chooseQ(strs: DataFrame, strCol: String, t: Int,
              postingCap: Int = 256): Int = {
    require(postingCap >= 1, "postingCap must be positive")
    // q·t + q − 1 <= 20 keeps the short block's in-row enumeration
    // bounded (same contract join() enforces)
    val qMax = math.min(7, 21 / (t + 1))
    require(qMax >= 2, s"t=$t leaves no feasible gram width")
    val s0 = strs.select(col(strCol).as("s")).filter(col("s").isNotNull)
    val n = s0.count()
    if (n == 0) return 2
    val vocab = s0
      .select(explode(expr(
        // the length filter drops the one sub-width stub a string
        // shorter than q emits (sequence is clamped at 0)
        (2 to qMax).map(q =>
          s"""filter(transform(sequence(0, greatest(length(s) - $q, 0)),
                i -> struct($q AS q, substring(s, i + 1, $q) AS g)),
                x -> length(x.g) = $q)""")
          .mkString("concat(", ", ", ")"))).as("e"))
      .groupBy(col("e.q")).agg(approx_count_distinct(col("e.g")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (2 to qMax).find { q =>
      vocab.get(q).exists(v => n.toDouble * (q * t + 1) / v <= postingCap)
    }.getOrElse(qMax)
  }

  /** All id pairs (`id_a` < `id_b`) whose strings are within edit
    * distance `t`, with the distance: exactly the rows of the naive
    * quadratic join. `strs` must carry a unique long id and a string
    * column; null strings never match. `q` is the gram width — any
    * width is LOSSLESS (it changes blocking, never the answer);
    * [[joinAuto]] picks it from the data's measured gram vocabulary,
    * which is what you want unless the width is already known. */
  def join(strs: DataFrame, idCol: String, strCol: String,
           t: Int, q: Int = 2): DataFrame =
    candidates(strs, idCol, strCol, t, q)
      .withColumn("ed", levenshtein(col("sa"), col("sb")))
      .filter(col("ed") <= t)
      .select(col("id_a"), col("id_b"), col("ed"))

  /** The deduped candidate set the verify pass scans (id_a, id_b, sa,
    * sb) — exposed so scale probes can price the blocking directly:
    * candidate count vs true-match count IS the blocking's selectivity
    * (`tools/EditSimScale` logs both; the df-ascending prefix claim is
    * measured there, not argued). */
  def candidates(strs: DataFrame, idCol: String, strCol: String,
                 t: Int, q: Int = 2): DataFrame = {
    require(t >= 1, "a zero threshold is an exact groupBy, not a join")
    require(q >= 2, "q-grams need q >= 2")
    val shortMax = q * t + q - 1 // count bound vacuous ⇔ BOTH lens <= this
    require(shortMax <= 20,
      s"deletion-variant block builds C(len, <=$t) combos: q=$q,t=$t puts " +
        s"the short boundary at $shortMax — beyond in-row enumeration")
    val s0 = strs
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))

    // ── long block: prefix-filtered positional q-gram postings ──
    // elements (gram, occ) per string, occ = index among equal grams
    // (multiset intersection == set intersection over these).
    // Postings and the pair join carry IDS + len ONLY — the strings
    // themselves never enter a posting row or the candidate dedup
    // (r15: at corpus scale every posting collision used to drag two
    // full strings through the join and the distinct; now pairs dedup
    // at 16 bytes/row and strings attach ONCE, candidate-scale, for
    // the verify)
    val grams = s0.filter(col("len") >= q)
      .withColumn("g", expr(
        s"transform(sequence(0, len - $q), i -> substring(s, i + 1, $q))"))
      .withColumn("e", expr(
        "transform(g, (x, i) -> struct(x AS gram," +
          " size(filter(slice(g, 1, i), y -> y = x)) AS occ))"))
      .select(col("id"), col("len"), explode(col("e")).as("e"))
      .select(col("id"), col("len"),
        col("e.gram").as("gram"), col("e.occ").as("occ"))
    // global element order: rarest gram first — ONE total order shared
    // by every string, the prefix principle's requirement
    val df = grams.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    val prefix = grams.join(df, Seq("gram"))
      .groupBy(col("id"))
      .agg(first(col("len")).as("len"),
        slice(sort_array(collect_list(
            struct(col("gdf"), col("gram"), col("occ")))),
          1, q * t + 1).as("pf"))
      .select(col("id"), col("len"), explode(col("pf")).as("p"))
      .select(col("id"), col("len"),
        col("p.gram").as("gram"), col("p.occ").as("occ"))
    val candLong = prefix.select(col("gram"), col("occ"),
        col("id").as("id_a"), col("len").as("la"))
      .join(prefix.select(col("gram"), col("occ"), col("id").as("id_b"),
        col("len").as("lb")), Seq("gram", "occ"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("la") - col("lb")) <= t)
      .select(col("id_a"), col("id_b"))

    // ── short block: ≤t-deletion variants, combos built directly ──
    // deletion-position combinations of size 0..t, each round
    // extending every combo by one STRICTLY LARGER position: exactly
    // Σ C(len, k) combos materialize — never the 2^len mask sweep
    // (the r14 form transiently held up to 2^20 elements per row)
    val combos = Iterator
      .iterate("array(cast(array() as array<int>))") { prev =>
        s"""flatten(transform($prev,
              c -> transform(
                filter(sequence(0, greatest(len - 1, 0)),
                       p -> p < len AND
                            p >= IF(size(c) = 0, 0,
                                    element_at(c, -1) + 1)),
                p -> concat(c, array(p)))))"""
      }
      .take(t + 1).reduce((a, b) => s"concat($a, $b)")
    val shorts = s0.filter(col("len") <= shortMax)
      .withColumn("v", explode(expr(
        s"""array_distinct(transform($combos,
              c -> concat_ws('', filter(
                     transform(sequence(0, greatest(len - 1, 0)),
                       i -> IF(i < len AND NOT array_contains(c, i),
                               substring(s, i + 1, 1), NULL)),
                     x -> x IS NOT NULL))))""")))
    val candShort = shorts.select(col("v"),
        col("id").as("id_a"), col("len").as("la"))
      .join(shorts.select(col("v"), col("id").as("id_b"),
        col("len").as("lb")), Seq("v"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("la") - col("lb")) <= t)
      .select(col("id_a"), col("id_b"))

    // dedup on the NARROW id pairs, then attach both strings once —
    // the verify pass in [[join]] runs ONE codegen levenshtein over
    // exactly these rows (both attach joins are candidate-scale;
    // AQE broadcasts s0 when it fits, shuffles on id when it does not)
    candLong.unionByName(candShort).distinct()
      .join(s0.select(col("id").as("id_a"), col("s").as("sa")), Seq("id_a"))
      .join(s0.select(col("id").as("id_b"), col("s").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
  }
}
