package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.analytics.{QuerySpec, StableRound, Tables}
import TextFunctions._

/** Data-curation operators for LLM training pipelines, on top of the
  * text surface in [[TextQueries]]: benchmark decontamination, PII
  * scrubbing, token-budget sequence packing, count-based bigram LM
  * statistics, and exact length percentiles.
  *
  * Same contract as the rest of the query surface: every operator is a
  * composition of codegen'd built-ins + the native text kernels, each
  * with a DuckDB oracle that replicates it bit-for-bit (md5-derived
  * hash bands, [[StableRound]] on doubles).
  *
  * The reference has no analytics surface (it is a row-at-a-time ETL,
  * see SURVEY §2.K); these extend the engine toward the BASELINE north
  * star the same way TextQueries q20-q27 do.
  */
object CurationQueries {

  import TextQueries.{hashBand100, duckHashBand}

  // PII patterns, spelled to mean the same thing under Java regex
  // (Spark) and RE2 (DuckDB): explicit character classes, no
  // lookaround, no backreferences.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+[0-9][0-9 ]{6,}[0-9]"

  /** Redact emails and phone numbers; the building block q78 audits. */
  def scrubPii(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** q89 trainer depth — the Spark loop and the unrolled oracle CTEs
    * are both generated from this ONE constant. */
  private val bpeIters = 3

  /** q84's scoring-table bound: the corpus is scored against only the
    * top-K bigrams by count (total-ordered, ties broken by (head,
    * next)). Bounds the broadcast regardless of vocabulary size; 512
    * is deliberately below the test corpus's ~916 distinct bigrams so
    * every oracle-checked SF exercises the cap, boundary ties
    * included. Baked into the oracle SQL — changing it changes
    * results. */
  private[graft] val bigramCap = 512

  /** q128 reference-LM constants: the LM trains on ONE fixed source
    * (the "known-good domain" — CCNet's Wikipedia role) and keeps only
    * its [[lmCap]] most frequent bigrams under the bigramCap ordering
    * rule, so the broadcast model is bounded no matter how large the
    * reference slice grows. lmCap sits below the reference slice's
    * distinct-bigram count at EVERY tested SF (712 at sf0.001) so the
    * cap — boundary ties included — is always exercised. Baked into
    * the oracle SQL. */
  private val lmRefSource = "src0"
  private val lmCap = 512

  /** Shared DuckDB fragment: tokenized non-null documents. */
  private val duckToks =
    """SELECT doc_id, source, string_split_regex(trim(text), '\s+') toks
      |FROM documents WHERE text IS NOT NULL""".stripMargin

  /** q93 GD hyperparameters — lr 2 with 4 full-batch iterations gives
    * a monotone accuracy ramp at every tested SF (larger rates
    * oscillate under the rational sigmoid); both the Spark loop and
    * the unrolled oracle CTEs are generated from these constants.
    * Declared BEFORE [[queries]] — the oracle SQL interpolates them at
    * object init (the bigramCap ordering rule). */
  private val gdIters = 4
  private val gdLr = 2

  /** The greedy BPE trainer loop behind q89 and q96: [[bpeIters]]
    * iterations of (pair-count over the word-frequency table -> argmax
    * -> fuse everywhere), words in the anchored symbol encoding
    * (begin \u0001 / end \u0002 markers, see the q89 comment).
    * Returns the merges in order; q89 reports them, q96 applies them.
    * Each iteration is vocab-bounded work + a 1-row argmax collect. */
  private def bpeMerges(s: org.apache.spark.sql.SparkSession, d: String)
      : Seq[(Int, String, String, Long)] = {
    val B = "\u0001"
    val E = "\u0002"
    var words = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(explode(tokens(col("text"))).as("w0"))
      .groupBy(col("w0")).agg(count(lit(1)).as("wc"))
      .filter(length(col("w0")) >= 2)
      .select(array_join(transform(sequence(lit(1), length(col("w0"))),
        i => concat(lit(B), col("w0").substr(i, lit(1)), lit(E))), "")
        .as("w"), col("wc"))
      .persist()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (it <- 1 to bpeIters) {
      val syms = words
        .select(split(col("w").substr(lit(2), length(col("w")) - 2),
          E + B).as("syms"), col("wc"))
        .filter(size(col("syms")) >= 2) // sequence(1,0) would throw
      val top = syms
        .select(col("wc"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()(0)
      val (a, b, f) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((it, a, b, f))
      if (it < bpeIters) { // the last argmax needs no fused table
        val next = words
          .select(call_function("replace", col("w"),
            lit(s"$B$a$E$B$b$E"), lit(s"$B$a$b$E")).as("w"),
            col("wc")).persist()
        next.count()
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    merges.result()
  }

  /** DuckDB CTE builders for the BPE merge replay, shared by the q89
    * and q96 oracles. `bpePairCte(i)` = the iteration-i argmax pair
    * over `w{i-1}`; `bpeMergeCte(i, carry)` = `w{i-1}` with that pair
    * fused, carrying `carry` columns through (q89 carries `wc`, q96
    * also the original `word` spelling). */
  private def bpePairCte(i: Int) = s"""
          p$i AS (
            SELECT sym[i] AS a, sym[i+1] AS b, sum(wc) AS freq
            FROM (SELECT string_split(substring(w, 2, length(w) - 2),
                    chr(2) || chr(1)) sym, wc
                  FROM w${i - 1}),
                 unnest(generate_series(1, len(sym) - 1)) AS u(i)
            GROUP BY 1, 2 ORDER BY freq DESC, a, b LIMIT 1)"""
  private def bpeMergeCte(i: Int, carry: String) = s"""
          w$i AS (
            SELECT replace(w,
                (SELECT chr(1)||a||chr(2)||chr(1)||b||chr(2) FROM p$i),
                (SELECT chr(1)||a||b||chr(2) FROM p$i)) AS w, $carry
            FROM w${i - 1})"""

  /** Converged duplicate-cluster labels from a near-dup pair set —
    * the engine of q82, factored so [[ClusterIndex]] materializes
    * exactly the labels the query aggregates. Runs `f` on the
    * converged (doc_id, rep) table while its backing cache is live,
    * then releases every block (f must therefore materialize what it
    * returns — aggregate + localCheckpoint, or write to parquet).
    *
    * Algorithm: iterative min-label propagation with POINTER DOUBLING
    * (rep := rep of my rep), which collapses a diameter-D chain in
    * O(log D) rounds instead of O(D) — the standard large-graph trick,
    * so a 100 TB corpus with freak long dup-chains still converges in
    * ~30 rounds. The initial labels are already one propagation ahead:
    * seed rep(v) = min(v, neighbors(v)) costs the same exchange as a
    * bare distinct-nodes init and saves a full round. Convergence is
    * detected from the label-sum invariant: every round takes a min
    * over a union that CONTAINS the previous labels, so rep values are
    * monotonically non-increasing and the (exact, decimal-128)
    * label sum is strictly decreasing until the closure is reached —
    * one cheap aggregate per round, replacing the old join-and-count
    * change detector and its per-round shuffle of both label tables.
    *
    * Each round's label table is rebased onto its materialized RDD
    * (persisted, previous round explicitly released — at most two
    * copies live). The rebase is the point: persist alone truncates
    * recompute but not the PLAN — every round embeds the previous
    * round's tree ~3× (prop, doubling) and the 3^rounds analyzer
    * blow-up OOMs the DRIVER at 100× before an executor lifts a
    * finger. An RDD-backed leaf keeps the per-round plan
    * constant-size while RDD lineage (linear in rounds) still allows
    * recompute after executor loss, which localCheckpoint would
    * forfeit. */
  def withDupClusterLabels[T](s: org.apache.spark.sql.SparkSession,
      pairs: org.apache.spark.sql.DataFrame)
      (f: org.apache.spark.sql.DataFrame => T): T = {
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
      .unionByName(pairs.select(col("db").as("src"), col("da").as("dst")))
      .persist()
    def rebase(df: org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val r = df.rdd.persist()
      (s.createDataFrame(r, df.schema), r)
    }
    // exact 38-digit sum: 10^13 labels of 10^13 never saturates it,
    // and an approximate (double) sum could miss a small label change
    // and return silently-split components
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal = {
      // sum over zero rows is NULL — a corpus with no near-dup pairs
      // (empty edge set) must converge on round one, not NPE
      val s = df.agg(sum(col("rep").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var (labels, labelsRdd) = rebase(
      edges.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src").as("doc_id"),
          least(col("src"), col("mn")).as("rep")))
    var prevSum = labelSum(labels) // also materializes the seed RDD
    var rounds = 0
    var converged = false
    val maxRounds = 50 // ample: doubling converges in O(log diameter)
    while (!converged && rounds < maxRounds) {
      // neighbor propagation (new min labels entering via edges) +
      // pointer doubling (rep of my rep)
      val prop = labels.join(edges, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id"), col("rep"))
      val doubled = labels.as("l")
        .join(labels.select(col("doc_id").as("r_doc"),
          col("rep").as("r_rep")), col("l.rep") === col("r_doc"))
        .select(col("l.doc_id").as("doc_id"), col("r_rep").as("rep"))
      val (next, nextRdd) = rebase(
        labels.unionByName(prop).unionByName(doubled)
          .groupBy("doc_id").agg(min("rep").as("rep")))
      val sumNow = labelSum(next) // materializes nextRdd
      converged = sumNow.compareTo(prevSum) == 0
      prevSum = sumNow
      labelsRdd.unpersist() // superseded round, never read again
      labels = next
      labelsRdd = nextRdd
      rounds += 1
    }
    // partially-propagated labels are WRONG clusters, and only the
    // oracle-checked SFs would notice — fail loudly, never return
    // silently-split components
    if (!converged)
      throw new IllegalStateException(
        s"dup-cluster label propagation did not converge in $maxRounds rounds")
    try f(labels)
    finally { labelsRdd.unpersist(); edges.unpersist() }
  }

  /** The q82/q108 rollup over converged labels: one row per duplicate
    * cluster. Unordered — callers append the presentation sort. */
  def clusterSummary(labels: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    labels.groupBy(col("rep").as("cluster_rep"))
      .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("max_doc"))

  /** Shared q82/q108 oracle: transitive closure of the q25 pairs via a
    * recursive CTE, rolled up per cluster. */
  private lazy val dupClusterOracleSql = s"""
        WITH RECURSIVE ${TextQueries.duckMinhashPairsCtes},
        ${TextQueries.duckClosureCtes}
        SELECT rep AS cluster_rep, count(*) AS n_docs,
               max(doc_id) AS max_doc
        FROM labels GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, QuerySpec] = Map(

    // ── benchmark decontamination (test-set overlap) ───────────────
    // The canonical pre-training hygiene step: drop training documents
    // that share long n-grams with an evaluation set. The "benchmark"
    // here is the deterministic 3% hash-band slice of the corpus (the
    // same banding primitive as the q71 splits), the overlap unit a
    // 5-word shingle.
    //
    // Scale shape: the benchmark side is small BY CONSTRUCTION (an
    // eval suite is a few thousand documents), so its distinct-shingle
    // set broadcasts; the corpus side is one narrow shingle explode +
    // one broadcast hash join + one partial-agg groupBy — the corpus
    // is never shuffled by value. Output is per (source, contaminated)
    // so the row count depends on the join's findings (honest under
    // count()-style consumers).
    "q77_decontaminate" -> QuerySpec(
      build = (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          .withColumn("band", hashBand100)
        val benchShingles = docs.filter(col("band") < 3)
          .select(explode(array_distinct(shingles(col("text"), 5))).as("sh"))
          .distinct()
        val corpus = docs.filter(col("band") >= 3)
        val hits = corpus
          .select(col("doc_id"),
            explode(array_distinct(shingles(col("text"), 5))).as("sh"))
          .join(broadcast(benchShingles), Seq("sh"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
        corpus.select(col("doc_id"), col("source"))
          .join(hits, Seq("doc_id"), "left")
          .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
          .groupBy(col("source"),
            (col("n_hit") > 0).cast("int").as("contaminated"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_hit")).as("total_hits"))
          .orderBy("source", "contaminated")
      },
      oracle = Some(s"""
        WITH docs AS (
          SELECT doc_id, source, text, $duckHashBand AS band
          FROM documents WHERE text IS NOT NULL),
        tok AS (SELECT doc_id, source, band,
                  string_split_regex(trim(text), '\\s+') toks FROM docs),
        sh AS (SELECT doc_id, source, band, unnest(list_distinct(
                 list_transform(
                   generate_series(1, greatest(len(toks)-4, 0)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3] || ' ' || toks[i+4]))) s
               FROM tok),
        bench AS (SELECT DISTINCT s FROM sh WHERE band < 3),
        hits AS (SELECT doc_id, count(*) n_hit
                 FROM (SELECT doc_id, s FROM sh WHERE band >= 3) c
                 JOIN bench USING (s) GROUP BY 1),
        perdoc AS (
          SELECT d.source, coalesce(h.n_hit, 0) n_hit
          FROM (SELECT doc_id, source FROM docs WHERE band >= 3) d
          LEFT JOIN hits h ON d.doc_id = h.doc_id)
        SELECT source,
               CAST(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END AS INTEGER)
                 AS contaminated,
               count(*) AS n_docs, CAST(sum(n_hit) AS BIGINT) AS total_hits
        FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true),

    // ── PII scrubbing audit ────────────────────────────────────────
    // Redaction as a per-row narrow transform (two regexp_replace
    // passes — codegen'd, no shuffle; streams at scan speed at 100 TB).
    // The synthetic corpus carries no organic PII, so the query plants
    // deterministic emails/phones into hash-banded slices first, then
    // proves the scrubber removes exactly what was planted
    // (n_residual must come back 0 for every source).
    "q78_pii_scrub" -> QuerySpec(
      build = (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          .withColumn("band", hashBand100)
        val planted = docs.withColumn("t",
          concat(col("text"),
            when(col("band") < 30,
              concat(lit(" contacto doc"), col("doc_id"),
                lit("@mail.example.com")))
            .when(col("band") < 50,
              concat(lit(" llame +56 9 "),
                lpad(pmod(col("doc_id"), lit(100000000)).cast("string"),
                  8, "0")))
            .otherwise(lit(""))))
        planted
          .withColumn("n_email", regexp_count(col("t"), lit(emailRe)))
          .withColumn("n_phone", regexp_count(col("t"), lit(phoneRe)))
          .withColumn("scrubbed", scrubPii(col("t")))
          .withColumn("n_residual",
            regexp_count(col("scrubbed"), lit(emailRe)) +
            regexp_count(col("scrubbed"), lit(phoneRe)))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_email")).cast("long").as("emails_redacted"),
            sum(col("n_phone")).cast("long").as("phones_redacted"),
            sum(col("n_residual")).cast("long").as("n_residual"),
            sum(length(col("t")) - length(col("scrubbed")))
              .cast("long").as("chars_delta"))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH planted AS (
          SELECT source, text ||
            CASE WHEN band < 30
                   THEN ' contacto doc' || doc_id::VARCHAR
                        || '@mail.example.com'
                 WHEN band < 50
                   THEN ' llame +56 9 '
                        || lpad((doc_id % 100000000)::VARCHAR, 8, '0')
                 ELSE '' END AS t
          FROM (SELECT doc_id, source, text, $duckHashBand AS band
                FROM documents WHERE text IS NOT NULL)),
        m AS (
          SELECT source, t,
            regexp_replace(regexp_replace(t, '$emailRe', '<EMAIL>', 'g'),
              '$phoneRe', '<PHONE>', 'g') AS scrubbed,
            len(regexp_extract_all(t, '$emailRe')) n_email,
            len(regexp_extract_all(t, '$phoneRe')) n_phone
          FROM planted)
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_email) AS BIGINT) AS emails_redacted,
               CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
               CAST(sum(len(regexp_extract_all(scrubbed, '$emailRe'))
                 + len(regexp_extract_all(scrubbed, '$phoneRe')))
                 AS BIGINT) AS n_residual,
               CAST(sum(length(t) - length(scrubbed)) AS BIGINT)
                 AS chars_delta
        FROM m GROUP BY 1 ORDER BY 1""")),

    // ── token-budget sequence packing ──────────────────────────────
    // Pre-training batches want documents packed into fixed token
    // budgets. Deterministic streaming packing: within each source,
    // documents in doc_id order are assigned to the 512-token bin
    // their cumulative token count STARTS in (a document crossing a
    // boundary spills into its starting bin — the standard greedy
    // variant that is pure window arithmetic, so it needs exactly one
    // shuffle on the partition key and replays identically on both
    // engines and any cluster size).
    "q79_pack_chunks" -> QuerySpec(
      build = (s, d) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            token_count(col("text")).as("n_tok"))
          .withColumn("bin",
            floor((sum(col("n_tok")).over(w) - col("n_tok")) / lit(512))
              .cast("long"))
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("n_tokens"))
          .orderBy("source", "bin")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        c AS (SELECT source,
                CAST(floor((sum(len(toks)) OVER (PARTITION BY source
                    ORDER BY doc_id) - len(toks)) / 512) AS BIGINT) AS bin,
                len(toks) AS n_tok
              FROM t)
        SELECT source, bin, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM c GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true),

    // ── count-based bigram LM statistics ───────────────────────────
    // The classic n-gram table behind perplexity-style quality
    // scoring: for every head token seen >= 100 times as a bigram
    // head, its most likely continuation and that continuation's
    // conditional probability (ties broken lexicographically).
    // Shape: one shingle(k=2) explode, a two-level partial-agg
    // groupBy, then ONE window shuffle on `head` shared by the total
    // and the argmax rank. Vocabulary-sized output — bounded no
    // matter the corpus size.
    "q80_bigram_lm" -> QuerySpec(
      build = (s, d) => {
        val bi = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(explode(shingles(col("text"), 2)).as("sh"))
          .select(split(col("sh"), " ").getItem(0).as("head"),
            split(col("sh"), " ").getItem(1).as("next_tok"))
        val cnt = bi.groupBy(col("head"), col("next_tok"))
          .agg(count(lit(1)).as("cnt"))
        val part = Window.partitionBy(col("head"))
        cnt
          .withColumn("head_total", sum(col("cnt")).over(part))
          .withColumn("rn", row_number().over(
            part.orderBy(col("cnt").desc, col("next_tok").asc)))
          .filter(col("rn") === 1 && col("head_total") >= 100)
          .select(col("head"), col("head_total").cast("long").as("head_total"),
            col("next_tok").as("top_next"), col("cnt").cast("long").as("top_cnt"),
            StableRound.r4(col("cnt").cast("double") / col("head_total"))
              .as("prob"))
          .orderBy("head")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        bi AS (SELECT unnest(list_transform(
                 generate_series(1, greatest(len(toks)-1, 0)),
                 i -> [toks[i], toks[i+1]])) AS pr FROM t),
        cnt AS (SELECT pr[1] head, pr[2] next_tok, count(*) cnt
                FROM bi GROUP BY 1, 2),
        r AS (SELECT head, next_tok, cnt,
                sum(cnt) OVER (PARTITION BY head) head_total,
                row_number() OVER (PARTITION BY head
                  ORDER BY cnt DESC, next_tok) rn
              FROM cnt)
        SELECT head, CAST(head_total AS BIGINT) AS head_total,
               next_tok AS top_next, CAST(cnt AS BIGINT) AS top_cnt,
               ${StableRound.sql4("cnt * 1.0 / head_total")} AS prob
        FROM r WHERE rn = 1 AND head_total >= 100 ORDER BY head""")),

    // ── duplicate-cluster resolution (connected components) ────────
    // LSH pairs say "these two are near-dups"; the DELETE decision
    // needs clusters — the transitive closure of pairs — so one
    // representative per component survives. Spark-first iterative
    // min-label propagation over the q25 pair edges: each round every
    // node takes the min label among itself and its neighbors; stops
    // when a round changes nothing (≤ component-diameter rounds — dup
    // clusters are shallow, so 2-4 in practice). Per round: one join +
    // one partial-agg groupBy on the EDGE set (pairs only, not the
    // corpus — singletons never enter). The oracle replays the closure
    // with a recursive CTE. The convergence loop's per-round count()
    // is a driver-side scalar, not a collect of data.
    "q82_dup_clusters" -> QuerySpec(
      build = (s, d) => {
        // the pair set comes from the [[PairIndex]] artifact — built
        // once per dataset (it IS the q25 result, oracle-equivalent
        // by construction), read from parquet by every later
        // invocation and by every other pair consumer. The clustering
        // below is the query's own work.
        val pairs = PairIndex.load(s, d).select(col("da"), col("db"))
        withDupClusterLabels(s, pairs) { labels =>
          // the summary is cluster-count-sized; cut its lineage so
          // the label table and the edge cache can be released instead
          // of leaking one node-scale cache per invocation (reliable
          // checkpoint under spark.graft.checkpoint.dir — Checkpoints)
          graft.Checkpoints.cut(clusterSummary(labels))
        }.orderBy("cluster_rep")
      },
      oracle = Some(dupClusterOracleSql),
      bench = true),

    // ── duplicate-cluster labels as a materialized artifact ────────
    // The q99 treatment applied to q82: cluster membership is exactly
    // the structure a curation run consults repeatedly (drop lists,
    // dedup reports, mixture design), so [[ClusterIndex]] materializes
    // the CONVERGED label table once per dataset and this query — the
    // read path every later consumer takes — answers from parquet in
    // artifact-scale time, never re-running label propagation. Same
    // oracle as q82: the read path must reproduce the build path
    // bit-for-bit.
    "q108_cluster_index" -> QuerySpec(
      build = (s, d) =>
        clusterSummary(ClusterIndex.load(s, d)).orderBy("cluster_rep"),
      oracle = Some(dupClusterOracleSql),
      bench = true),

    // ── overlapping chunking (RAG / context-window prep) ───────────
    // Split each document into 64-token chunks with a 48-token stride
    // (16-token overlap) — the retrieval-indexing cut. Pure per-row
    // arithmetic: tokenize once, explode chunk indices, fingerprint
    // each chunk (md5 of the joined tokens, so the oracle checks the
    // chunk CONTENT, not just counts). No shuffle until the
    // presentation sort.
    "q83_chunk_overlap" -> QuerySpec(
      build = (s, d) => {
        val ck = 64
        val stride = 48
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("n_tok", size(col("toks")))
          .withColumn("chunk_id", explode(sequence(lit(0),
            ceil(greatest(col("n_tok") - ck, lit(0)).cast("double") / stride)
              .cast("int"))))
          .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
            least(lit(ck), col("n_tok") - col("chunk_id") * stride)
              .as("n_chunk_tok"),
            md5(array_join(
              slice(col("toks"), col("chunk_id") * stride + 1, lit(ck)), " "))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        d AS (SELECT doc_id, toks, len(toks) n_tok FROM t),
        c AS (SELECT doc_id, toks, n_tok,
                unnest(generate_series(0,
                  CAST(ceil(greatest(n_tok - 64, 0) / 48.0) AS BIGINT)))
                  AS chunk_id
              FROM d)
        SELECT doc_id, chunk_id,
               CAST(least(64, n_tok - chunk_id * 48) AS INTEGER)
                 AS n_chunk_tok,
               md5(array_to_string(
                 toks[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' '))
                 AS chunk_md5
        FROM c ORDER BY doc_id, chunk_id""")),

    // ── bigram predictability scoring (LM-based quality filter) ────
    // The count-based cousin of perplexity filtering: score each
    // document by the mean conditional probability P(next | head) of
    // its bigrams under the corpus's own bigram table (q80's counts).
    // Predictable docs ≈ templated/boilerplate; surprising docs ≈
    // novel or noisy — both tails are what a curation pass inspects.
    // Probabilities are pure count ratios (no log), so the oracle
    // agrees bit-for-bit under StableRound.
    //
    // Scale shape: conditional probabilities are computed over the
    // FULL bigram count table (distinct-bigram-sized narrow rows — a
    // bounded partial-agg shuffle even on open text), but the corpus
    // is SCORED against only the [[bigramCap]] most frequent bigrams,
    // totally ordered by (count desc, head, next) so the cut is
    // deterministic on both engines. The cap is what makes the
    // corpus-side join broadcastable REGARDLESS of vocabulary size:
    // without it the scoring join degrades to a full shuffle of the
    // exploded corpus on open-vocabulary text (Heaps' law — the q24
    // df-cap lesson). Docs none of whose bigrams reach the top table
    // drop from the score, mirrored in the oracle. The corpus pays
    // TWO tokenize+shingle passes — one building the table, one
    // scoring — because recomputing the narrow codegen'd explode
    // beats caching the corpus-sized exploded bigrams.
    "q84_bigram_predictability" -> QuerySpec(
      build = (s, d) => {
        val bi = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            explode(shingles(col("text"), 2)).as("sh"))
          .select(col("doc_id"), col("source"),
            split(col("sh"), " ").getItem(0).as("head"),
            split(col("sh"), " ").getItem(1).as("next_tok"))
        val top = bi.groupBy(col("head"), col("next_tok"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("p", col("cnt").cast("double") /
            sum(col("cnt")).over(Window.partitionBy(col("head"))))
          .orderBy(col("cnt").desc, col("head").asc, col("next_tok").asc)
          .limit(bigramCap)
          .select(col("head"), col("next_tok"), col("p"))
        bi.join(broadcast(top), Seq("head", "next_tok"))
          .groupBy(col("doc_id"), col("source"))
          .agg(StableRound.r4(avg(col("p"))).as("pred"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            StableRound.r4(avg(col("pred"))).as("avg_pred"),
            StableRound.r4(min(col("pred"))).as("min_pred"),
            StableRound.r4(max(col("pred"))).as("max_pred"))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        bi AS (SELECT doc_id, source, pr[1] head, pr[2] next_tok FROM (
          SELECT doc_id, source, unnest(list_transform(
            generate_series(1, greatest(len(toks)-1, 0)),
            i -> [toks[i], toks[i+1]])) pr FROM t)),
        cnt AS (SELECT head, next_tok, count(*) cnt FROM bi GROUP BY 1, 2),
        p AS (SELECT head, next_tok, cnt,
                cnt * 1.0 / sum(cnt) OVER (PARTITION BY head) AS p
              FROM cnt),
        top AS (SELECT head, next_tok, p FROM p
                ORDER BY cnt DESC, head, next_tok LIMIT $bigramCap),
        pd AS (SELECT doc_id, source,
                 ${StableRound.sql4("avg(p)")} AS pred
               FROM bi JOIN top USING (head, next_tok) GROUP BY 1, 2)
        SELECT source, count(*) AS n_docs,
               ${StableRound.sql4("avg(pred)")} AS avg_pred,
               ${StableRound.sql4("min(pred)")} AS min_pred,
               ${StableRound.sql4("max(pred)")} AS max_pred
        FROM pd GROUP BY 1 ORDER BY 1"""),
      bench = true),

    // ── reference-LM perplexity partition (CCNet, Wenzek et al.) ───
    // The CCNet recipe Spark-first: a bigram LM trains on ONE known-
    // good source (lmRefSource — Wikipedia's role), every corpus doc
    // is scored by its mean conditional probability under that model,
    // and each source splits into head/middle/tail TERCILES by score —
    // the partition a pipeline feeds to curriculum sampling ("train on
    // head first") or quality filtering ("drop tail"). All arithmetic
    // integer-exact: in-model bigrams contribute their e4 probability
    // floor(cnt*1e4/head_total+0.5) clamped up to 1, out-of-model
    // bigrams the Laplace floor 1 (a doc of unseen text scores 1, not
    // 0 — CCNet's smoothing intent without transcendentals), and the
    // doc score is the integer-div mean. Scale: the model is the
    // lmCap-bounded broadcast (the KenLM-file shape — training is a
    // slice-scale groupBy, scoring a NARROW corpus pass with zero
    // token-scale exchange); the tercile split is one doc-grain
    // window per source (the q81 exact-percentile cost, far below
    // token grain; q120's sketch thresholds are the constant-state
    // alternative when even doc-grain sorting is too dear).
    "q128_perplexity_buckets" -> QuerySpec(
      build = (s, d) => {
        val docs = Tables.documents(s, d)
        val lm = referenceBigramLm(
          docBigrams(docs).filter(col("source") === lmRefSource))
        val scored = scoreAgainstLm(docs, lm)
        val part = Window.partitionBy(col("source"))
        val ranked = scored
          .withColumn("rn", row_number().over(
            part.orderBy(col("score_e4").desc, col("doc_id").asc)))
          .withColumn("n", count(lit(1)).over(part))
          .withColumn("bucket", expr(
            """CASE ((rn - 1) * 3) div n WHEN 0 THEN 'head'
               WHEN 1 THEN 'middle' ELSE 'tail' END"""))
        ranked.groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            expr("CAST(sum(score_e4) div count(1) AS BIGINT)").as("avg_e4"),
            min(col("score_e4")).as("min_e4"),
            max(col("score_e4")).as("max_e4"))
          .orderBy("source", "bucket")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        bi AS (SELECT doc_id, source, pr[1] head, pr[2] next_tok FROM (
          SELECT doc_id, source, unnest(list_transform(
            generate_series(1, greatest(len(toks)-1, 0)),
            i -> [toks[i], toks[i+1]])) pr FROM t)),
        cnt AS (SELECT head, next_tok, count(*) cnt FROM bi
                WHERE source = '$lmRefSource' GROUP BY 1, 2),
        lm AS (SELECT head, next_tok, greatest(CAST(floor(
                 cnt * 10000.0 / sum(cnt) OVER (PARTITION BY head)
                 + 0.5) AS BIGINT), 1) e
               FROM cnt ORDER BY cnt DESC, head, next_tok LIMIT $lmCap),
        pd AS (SELECT doc_id, source,
                 CAST(sum(coalesce(e, 1)) // count(*) AS BIGINT) score_e4
               FROM bi LEFT JOIN lm USING (head, next_tok) GROUP BY 1, 2),
        rkd AS (SELECT source, score_e4,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY score_e4 DESC, doc_id) rn,
                  count(*) OVER (PARTITION BY source) n
                FROM pd),
        b AS (SELECT source, score_e4,
                CASE ((rn - 1) * 3) // n WHEN 0 THEN 'head'
                  WHEN 1 THEN 'middle' ELSE 'tail' END bucket
              FROM rkd)
        SELECT source, bucket, count(*) n_docs,
               CAST(sum(score_e4) // count(*) AS BIGINT) avg_e4,
               min(score_e4) min_e4, max(score_e4) max_e4
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true),

    // ── BPE merge induction (first training iteration) ─────────────
    // Byte-pair-encoding training starts from the word-frequency
    // table: the most frequent ADJACENT character pair (weighted by
    // word count) becomes the first merge rule. This computes that
    // first iteration — the top-20 merge candidates.
    //
    // Scale shape: the corpus collapses to the distinct-word frequency
    // table FIRST (one partial-agg groupBy — vocabulary-bounded
    // output); the character-pair explode then runs over the VOCAB,
    // not the corpus, exactly how real BPE trainers are implemented.
    // Ties break lexicographically so the top-20 cut is total-ordered.
    "q86_bpe_first_merge" -> QuerySpec(
      build = (s, d) => {
        val words = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(explode(tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("wc"))
          .filter(length(col("w")) >= 2)
        words
          .select(col("wc"),
            explode(sequence(lit(1), length(col("w")) - 1)).as("i"),
            col("w"))
          .select(expr("substring(w, i, 2)").as("pair"), col("wc"))
          .groupBy(col("pair")).agg(sum(col("wc")).as("freq"))
          .orderBy(col("freq").desc, col("pair").asc)
          .limit(20)
      },
      oracle = Some(s"""
        WITH w AS (
          SELECT w, count(*) wc FROM (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) w
            FROM documents WHERE text IS NOT NULL)
          GROUP BY 1),
        p AS (
          SELECT substring(w, CAST(i AS INTEGER), 2) pair, wc FROM (
            SELECT w, wc, unnest(generate_series(1, length(w) - 1)) i
            FROM w WHERE length(w) >= 2))
        SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
        FROM p GROUP BY 1 ORDER BY freq DESC, pair LIMIT 20""")),

    // ── inverted posting lists (search-index build) ────────────────
    // The retrieval-side artifact next to q24's transient index: per
    // token (df >= 2 — a df-1 token indexes nothing), the SORTED
    // posting list truncated to its first 1024 entries — the standard
    // index-prefix cap, so no hot token can blow an aggregation buffer
    // into an unbounded string (the synthetic corpus's saturated vocab
    // exercises the truncation at sf0.1; a real deployment also drops
    // stopwords with a df ceiling). Lists serialize to CSV so the
    // cross-engine hash compares content, not engine-specific array
    // rendering.
    "q87_posting_lists" -> QuerySpec(
      build = (s, d) => {
        val dt = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
          .distinct() // posting lists hold distinct docs
        // df over everything (partial-agg'd scalars — bounded), but
        // the POSTING buffer is bounded BEFORE it materializes: the
        // bounded-heap operator keeps only the 1024 smallest doc_ids
        // per token, so a stopword-grade token never builds a
        // df-sized collect_list buffer just to be truncated after
        val df_ = dt.groupBy(col("t")).agg(count(lit(1)).as("df"))
        val prefix = graft.operators.TopK.perKey(dt, Seq("t"),
            Seq(col("doc_id").asc), 1024)
          .groupBy(col("t"))
          .agg(array_join(array_sort(collect_list(col("doc_id"))), ",")
            .as("postings"))
        df_.filter(col("df") >= 2).join(prefix, Seq("t"))
          .select(col("t"), col("df"), col("postings"))
          .orderBy("t")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        dt AS (SELECT DISTINCT doc_id, unnest(toks) AS t FROM t)
        SELECT t, count(*) AS df,
               array_to_string(
                 (list_sort(list(doc_id)))[1:1024], ',') AS postings
        FROM dt GROUP BY t HAVING count(*) >= 2
        ORDER BY t""")),

    // ── tf-idf top terms per document ──────────────────────────────
    // The classic relevance profile: each document's 3 most
    // characteristic terms by tf × N/df (the rational idf variant — a
    // log idf would hinge the hash on cross-engine transcendental
    // rounding). The rerank runs through the custom TopKPerKey
    // bounded-heap operator (partial+final heaps around one shuffle),
    // NOT a row_number window — the same no-Sort contract as the ANN
    // reranks, now on a text workload.
    "q88_tfidf_terms" -> QuerySpec(
      build = (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val terms = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
        val df_ = terms.groupBy(col("t"))
          .agg(count(lit(1)).as("df"))
        // corpus size as a LAZY one-row crossJoin (broadcast), not an
        // eager count() at plan-build time — building the plan must
        // not run a Spark job
        val nDf = docs.agg(count(lit(1)).cast("double").as("n_total"))
        val scored = terms.join(df_, Seq("t")).crossJoin(nDf)
          .select(col("doc_id"), col("t"),
            StableRound.r4(col("tf") * col("n_total") / col("df"))
              .as("score"))
        // idf comes from the FULL corpus; the per-doc rerank prunes to
        // the reported window first (per-key top-k is unaffected by
        // other keys, so filtering before the heap is free)
        graft.operators.TopK.perKeyRanked(
            scored.filter(col("doc_id") < 100), Seq("doc_id"),
            Seq(col("score").desc, col("t").asc), 3, "rank")
          .select(col("doc_id"), col("rank"), col("t"), col("score"))
          .orderBy("doc_id", "rank")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        terms AS (SELECT doc_id, unnest(toks) AS t FROM t),
        tf AS (SELECT doc_id, t, count(*) tf FROM terms GROUP BY 1, 2),
        df AS (SELECT t, count(*) df FROM tf GROUP BY 1),
        n AS (SELECT count(*) n FROM documents WHERE text IS NOT NULL),
        scored AS (
          SELECT doc_id, t,
                 ${StableRound.sql4("tf.tf * 1.0 * n.n / df.df")} AS score
          FROM tf JOIN df USING (t) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, t, score, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, t) AS rank
          FROM scored)
        SELECT doc_id, CAST(rank AS INTEGER) AS rank, t, score
        FROM ranked WHERE rank <= 3 AND doc_id < 100
        ORDER BY doc_id, rank""")),

    // ── BPE training loop (iterated merges) ────────────────────
    // q86 is the FIRST merge; this is the real trainer loop: 3
    // iterations of (count adjacent symbol pairs over the word-
    // frequency table → take the argmax → fuse it everywhere), the
    // algorithm behind every BPE tokenizer. Every symbol is stored
    // with its own begin (\u0001) and end (\u0002) marker, so the
    // pair pattern B·a·E·B·b·E can only match two complete adjacent
    // symbols and consecutive occurrences share no characters — ONE
    // plain non-overlapping replace IS the exact greedy BPE merge
    // (a boundary-SEPARATOR encoding is subtly wrong: self-pairs over
    // symbol runs >= 5 share the middle separator and replace skips
    // them; CurationSpec pins this against a reference symbol-list
    // trainer). The oracle unrolls the same three iterations in CTEs
    // (the q76 k-means pattern).
    //
    // Scale shape: the corpus collapses to the vocab-bounded word
    // table once; each iteration is pair-explode + partial-agg
    // groupBy + a 1-row argmax collect over the VOCAB (driver-safe,
    // like q76's centroid collect), never touching the corpus again.
    "q89_bpe_train" -> QuerySpec(
      build = (s, d) => {
        import s.implicits._
        bpeMerges(s, d).toDF("iter", "a", "b", "freq").orderBy("iter")
      },
      oracle = Some {
        s"""
        WITH t AS ($duckToks),
        wf AS (SELECT w0, count(*) wc FROM (
                 SELECT unnest(toks) w0 FROM t) GROUP BY 1
               HAVING length(w0) >= 2),
        w0 AS (SELECT array_to_string(
                 list_transform(generate_series(1, length(w0)),
                   i -> chr(1) || w0[i] || chr(2)), '') AS w, wc FROM wf),
        ${(1 until bpeIters).map(i =>
            s"${bpePairCte(i)}, ${bpeMergeCte(i, "wc")},").mkString("\n")}
        ${bpePairCte(bpeIters)}
        SELECT iter, a, b, CAST(freq AS BIGINT) AS freq FROM (
          SELECT CAST(1 AS INTEGER) iter, a, b, freq FROM p1
          ${(2 to bpeIters).map(i =>
              s"UNION ALL SELECT $i, a, b, freq FROM p$i").mkString("\n")})
        ORDER BY iter"""
      }),

    // ── exact length percentiles ───────────────────────────────────
    // Exact per-source p50/p90/p99 of document length — the profiling
    // twin of q50's sketched percentiles. Exact percentile buffers a
    // group's values, so this is the small-group/profiling path; at
    // 100 TB fact scale the approx_percentile in q50 is the operator
    // of record (same split as q15/q36 exact vs sketched distincts).
    "q81_length_percentiles" -> QuerySpec(
      build = (s, d) => {
        Tables.documents(s, d).filter(col("text").isNotNull)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            percentile(col("n_chars"), lit(0.5)).as("p50_raw"),
            percentile(col("n_chars"), lit(0.9)).as("p90_raw"),
            percentile(col("n_chars"), lit(0.99)).as("p99_raw"))
          .select(col("source"), col("n_docs"),
            col("min_chars"), col("max_chars"),
            StableRound.r4(col("p50_raw")).as("p50"),
            StableRound.r4(col("p90_raw")).as("p90"),
            StableRound.r4(col("p99_raw")).as("p99"))
          .orderBy("source")
      },
      oracle = Some(s"""
        SELECT source, count(*) AS n_docs,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               ${StableRound.sql4("quantile_cont(n_chars, 0.5)")} AS p50,
               ${StableRound.sql4("quantile_cont(n_chars, 0.9)")} AS p90,
               ${StableRound.sql4("quantile_cont(n_chars, 0.99)")} AS p99
        FROM documents WHERE text IS NOT NULL
        GROUP BY 1 ORDER BY 1""")),

    // ── cross-document duplicated-span coverage ────────────────────
    // The span-level dedup SIGNAL (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better"): a token 8-gram
    // position is duplicated when its shingle also occurs in some
    // OTHER document; per-source coverage = duplicated positions /
    // total positions. Doc-level dedup (q22–q26) misses this — two
    // distinct documents sharing a boilerplate paragraph score here
    // and nowhere else.
    //
    // Scale shape: one narrow shingle explode, then count-only
    // aggregations — (shingle, doc) → per-shingle doc counts → a 1:1
    // join back (shingle keys are unique on the nd side, so no row
    // expansion anywhere). A pathological universal shingle makes a
    // hot GROUP, not a hot pair-blowup: linear shuffles only, unlike
    // the q24 pair expansion this needs no df-cap to stay bounded.
    // The shuffle key is the q24 60-bit md5 hash, not the ~50-byte
    // shingle string — both engines hash identically, so the rare
    // collision merges the same two shingles on both sides.
    //
    // ONE position-scale exchange and NO join: the explicit
    // repartition(sh) below is the only time raw positions move, and
    // hash(sh) is a subset of every downstream grouping key, so the
    // perDoc groupBy (sh, doc_id, source) and the per-sh rollup both
    // plan exchange-free on top of it — one post-shuffle stage.
    // The join back is gone entirely via the complement identity:
    //   dup_grams = n_grams − unique_grams
    // n_grams (total positions per source) is pure token arithmetic
    // on the scan (greatest(token_count − 7, 0) — never shuffled),
    // and a shingle with nd == 1 has exactly ONE (doc, source) owner,
    // so unique_grams needs no join to recover its source. The naive
    // perDoc⋈nd formulation planned FIVE position-scale exchanges at
    // 100× (two independent 3-key aggs + an sh regroup + both join
    // sides): 48 s; this shape runs it in ~14 s.
    "q91_dup_spans" -> QuerySpec(
      build = (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val total = docs
          .select(col("source"),
            greatest(token_count(col("text")) - 7, lit(0))
              .cast("long").as("npos"))
          .groupBy(col("source")).agg(sum(col("npos")).as("n_grams"))
        val perDoc = docs
          .select(col("doc_id"), col("source"),
            explode(shingles(col("text"), 8)).as("sh_s"))
          .select(col("doc_id"), col("source"),
            TextQueries.md5Hash60(col("sh_s")).as("sh"))
          .repartition(col("sh"))
          // source is functionally dependent on doc_id — grouping by
          // it adds no cardinality, it just rides along
          .groupBy(col("sh"), col("doc_id"), col("source"))
          .agg(count(lit(1)).as("npos"))
        val uniq = perDoc.groupBy(col("sh"))
          .agg(count(lit(1)).as("nd"), max(col("source")).as("source"),
            sum(col("npos")).as("npos"))
          .filter(col("nd") === 1) // sole owner → source is well-defined
          .groupBy(col("source")).agg(sum(col("npos")).as("uniq_grams"))
        total.join(uniq, Seq("source"), "left")
          .select(col("source"), col("n_grams"),
            (col("n_grams") - coalesce(col("uniq_grams"), lit(0L)))
              .as("dup_grams"))
          .select(col("source"), col("n_grams"), col("dup_grams"),
            StableRound.r4(col("dup_grams").cast("double") / col("n_grams"))
              .as("dup_ratio"))
          .orderBy("source")
      },
      oracle = Some {
        val cat8 = (0 until 8).map(k => s"toks[i+$k]").mkString("||' '||")
        s"""
        WITH t AS ($duckToks),
        g AS (SELECT doc_id, source, unnest(list_transform(
                generate_series(1, greatest(len(toks)-7, 0)), i -> $cat8)) s
              FROM t),
        perdoc AS (SELECT ('0x' || substring(md5(s), 1, 15))::BIGINT h,
                          doc_id, any_value(source) source, count(*) npos
                   FROM g GROUP BY 1, 2),
        nd AS (SELECT h, count(*) nd FROM perdoc GROUP BY h)
        SELECT source, CAST(sum(npos) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN nd > 1 THEN npos ELSE 0 END) AS BIGINT)
                 AS dup_grams,
               ${StableRound.sql4(
                 "sum(CASE WHEN nd > 1 THEN npos ELSE 0 END)::DOUBLE / sum(npos)")}
                 AS dup_ratio
        FROM perdoc JOIN nd USING (h)
        GROUP BY source ORDER BY source"""
      },
      bench = true),

    // ── deterministic training order: shard + reproducible shuffle ──
    // The data-ordering step of a training run: every document gets a
    // pseudo-random sort key md5(epoch-seed | doc_id) — a pure
    // function of the key, so the global order is reproducible across
    // reshards, retries, and engines (the q71/q75 discipline applied
    // to ORDERING instead of membership) — and a shard from the key's
    // top bits. Output is the shard manifest: per-shard sizes plus the
    // first 3 documents in shard order as the spot-checkable head.
    //
    // Scale shape: shard assignment is a narrow per-row hash (no
    // sort); the only per-shard order materialized is the 3-row head
    // via the bounded-heap TopKPerKey. The FULL epoch order is
    // TrainOrder.writeEpoch (shard-partitioned sortWithinPartitions
    // write, never a global window); q100 hash-checks its ordering
    // logic cross-engine.
    "q92_train_order" -> QuerySpec(
      build = (s, d) => {
        val keyed = TrainOrder.epochOrder(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          epoch = 0, shards = 8)
        val stats = keyed.groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        val heads = graft.operators.TopK.perKeyRanked(keyed, Seq("shard"),
            Seq(col("k").asc), 3, "rk")
          .groupBy(col("shard"))
          // Serialized to a CSV string (the q87 recipe) so the oracle
          // harness can hash/sort the cell; order is defined by rk.
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rk"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")), ",").as("head_docs"))
        stats.join(heads, "shard")
          .select(col("shard"), col("n_docs"), col("n_chars"),
            col("head_docs"))
          .orderBy("shard")
      },
      oracle = Some("""
        WITH k AS (SELECT doc_id, n_chars,
                     md5('epoch0|' || doc_id::VARCHAR) AS kk,
                     ('0x' || substring(md5('epoch0|' || doc_id::VARCHAR),
                       1, 8))::BIGINT % 8 AS shard
                   FROM documents),
        h AS (SELECT shard,
                     array_to_string(list(doc_id::VARCHAR ORDER BY kk)[1:3],
                       ',') AS head_docs
              FROM k GROUP BY shard)
        SELECT k.shard AS shard, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               any_value(h.head_docs) AS head_docs
        FROM k JOIN h ON k.shard = h.shard
        GROUP BY k.shard ORDER BY shard""")),

    // ── learned quality classifier: logistic-regression GD loop ────
    // The trainable cousin of q21's hand-weighted score — curation
    // pipelines train small linear/fastText-style classifiers for
    // quality filtering; this is that training loop as pure DataFrame
    // ops. The label is the q21 quality gate over this corpus: the
    // fixture text contains no punctuation, so q21's punct term is
    // constant and the gate reduces to 0.3·lensat + 0.3·stopsat >
    // 0.21 — a known linear rule the model must recover. Features are
    // stopword saturation (x1, informative), LEXICAL DIVERSITY (x2, a
    // correlated nuisance — long docs repeat tokens, so GD learns a
    // negative weight it must balance; unlike punctuation it VARIES,
    // keeping its cross-engine parity non-vacuous), and length
    // saturation (x3). Accuracy ramps ~0.71 → ~0.89 at sf0.01 over 4
    // full-batch iterations at lr 2. The sigmoid is the RATIONAL
    // surrogate z -> 0.5 + z/(2(1+|z|)) — no transcendental exp, so
    // both engines replay every per-row value bit-for-bit (the q88
    // no-log discipline); per-iteration aggregates get the q76
    // treatment: r4-rounded on both sides, weights live as 4 driver
    // scalars (bounded collect).
    //
    // Scale shape: the design matrix is built once (one tokenize per
    // row, q21's multi-reference trick) and persisted at 4 doubles a
    // row; the loop runs gdIters+1 aggregate passes over it — the
    // accuracy of iteration i and the gradient of iteration i+1 are
    // both functions of w_i, so they share one scan. Iterations and
    // the final table are driver-bounded (4 rounds x 6 scalars).
    "q93_quality_classifier" -> QuerySpec(
      build = (s, d) => {
        import s.implicits._
        val allStops = stopwords.flatMap(_._2)
        val nTok = greatest(size(col("_toks")).cast("double"), lit(1.0))
        val feats = Tables.documents(s, d).filter(col("text").isNotNull)
          .withColumn("_toks", tokens(col("text")))
          .select(
            StableRound.r4(least(vocab_hits_t(col("_toks"), allStops)
              .cast("double") / nTok * lit(5.0), lit(1.0))).as("x1"),
            StableRound.r4(size(array_distinct(col("_toks")))
              .cast("double") / nTok).as("x2"),
            StableRound.r4(least(size(col("_toks")).cast("double")
              / lit(100.0), lit(1.0))).as("x3"))
          .withColumn("y",
            when(lit(0.3) * col("x3") + lit(0.3) * col("x1") > lit(0.21),
              lit(1.0)).otherwise(lit(0.0)))
          .persist()
        def r4d(x: Double) = math.floor(x * 10000 + 0.5) / 10000
        def z(w: Array[Double]) = lit(w(0)) + lit(w(1)) * col("x1") +
          lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
        def sigma(zc: org.apache.spark.sql.Column) =
          lit(0.5) + zc / (lit(2.0) * (lit(1.0) + abs(zc)))
        def gradCols(w: Array[Double]) = {
          val p = sigma(z(w))
          Seq(avg(col("y") - p).as("g0"),
            avg((col("y") - p) * col("x1")).as("g1"),
            avg((col("y") - p) * col("x2")).as("g2"),
            avg((col("y") - p) * col("x3")).as("g3"))
        }
        var w = Array(0.0, 0.0, 0.0, 0.0)
        var g = feats.select(gradCols(w): _*).collect()(0)
        val out = Seq.newBuilder[(Int, Double, Double, Double, Double, Double)]
        for (it <- 1 to gdIters) {
          w = Array.tabulate(4)(j => r4d(w(j) + gdLr * g.getDouble(j)))
          // one scan serves double duty: this iteration's accuracy and
          // the next one's gradient (the final pass's gradient is
          // simply unused)
          val pred = when(sigma(z(w)) > lit(0.5), lit(1.0)).otherwise(lit(0.0))
          val row = feats.select(gradCols(w) :+
            avg(when(pred === col("y"), lit(1.0)).otherwise(lit(0.0)))
              .as("acc"): _*).collect()(0)
          out += ((it, w(0), w(1), w(2), w(3),
            r4d(row.getAs[Double]("acc"))))
          g = row
        }
        feats.unpersist()
        out.result().toDF("iter", "b", "w1", "w2", "w3", "acc")
          .orderBy("iter")
      },
      oracle = Some {
        val allList = stopwords.flatMap(_._2)
          .map("'" + _ + "'").mkString(",")
        // every p-subtree joins the 1-row weight CTE instead of four
        // per-row scalar subqueries — DuckDB re-evaluates a scalar
        // subquery's whole CTE chain per reference, which went
        // exponential in the iteration depth
        def pOf(i: Int) =
          "SELECT y, x1, x2, x3, 0.5 + z / (2.0 * (1.0 + abs(z))) p FROM " +
          "(SELECT f.y, f.x1, f.x2, f.x3, " +
          s"w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 z " +
          s"FROM f CROSS JOIN w$i w)"
        def gCte(i: Int) =
          s"""g$i AS (SELECT avg(y - p) g0, avg((y - p) * x1) g1,
                avg((y - p) * x2) g2, avg((y - p) * x3) g3
              FROM (${pOf(i - 1)}))"""
        def wCte(i: Int) = s"w$i AS (SELECT " +
          Seq("b" -> "g0", "w1" -> "g1", "w2" -> "g2", "w3" -> "g3")
            .map { case (wc, gc) => StableRound.sql4(
              s"w.$wc + $gdLr.0 * g.$gc") + s" $wc" }
            .mkString(", ") + s" FROM w${i - 1} w CROSS JOIN g$i g)"
        def aCte(i: Int) =
          s"""a$i AS (SELECT ${StableRound.sql4(
                "avg(CASE WHEN (CASE WHEN p > 0.5 THEN 1.0 ELSE 0.0 END) = y" +
                " THEN 1.0 ELSE 0.0 END)")} acc
              FROM (${pOf(i)}))"""
        s"""
        WITH t AS ($duckToks),
        fx AS (SELECT
                ${StableRound.sql4(
                  s"least(len(list_filter(toks, t -> t IN ($allList))) * 1.0" +
                  " / greatest(len(toks), 1) * 5.0, 1.0)")} x1,
                ${StableRound.sql4(
                  "len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1)")} x2,
                ${StableRound.sql4("least(len(toks) / 100.0, 1.0)")} x3
              FROM t),
        f AS (SELECT *, CASE WHEN 0.3 * x3 + 0.3 * x1
                  > 0.21 THEN 1.0 ELSE 0.0 END y FROM fx),
        w0 AS (SELECT 0.0 b, 0.0 w1, 0.0 w2, 0.0 w3),
        ${(1 to gdIters).map(i => s"${gCte(i)}, ${wCte(i)}, ${aCte(i)}")
            .mkString(",\n")}
        SELECT * FROM (
          ${(1 to gdIters).map(i =>
              s"SELECT CAST($i AS INTEGER) iter, w.b, w.w1, w.w2, w.w3, " +
              s"a.acc FROM w$i w CROSS JOIN a$i a")
            .mkString(" UNION ALL ")})
        ORDER BY iter"""
      }),

    // ── BPE encode: apply the trained merges to the corpus ─────────
    // The missing half of q86/q89: induce → train → APPLY. The q89
    // trainer's merges are fused into every vocabulary word (chained
    // anchored replaces — each one IS the exact greedy merge, the q89
    // proof), and the corpus is scored against the encoded vocab:
    // per-source token/char/symbol counts and the chars-per-symbol
    // compression the tokenizer actually achieves.
    //
    // Scale shape: the merge replay runs on the vocab-bounded word
    // table (never the corpus); the corpus pays one explode + one
    // partial-agg groupBy to (source, word) and a join against the
    // encoded vocab — single-char words (excluded from training, one
    // symbol by definition) fill in via the left join's coalesce.
    "q96_bpe_encode" -> QuerySpec(
      build = (s, d) => {
        val B = "\u0001"
        val E = "\u0002"
        val merges = bpeMerges(s, d)
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
        val markers = array_join(
          transform(sequence(lit(1), length(col("word"))),
            i => concat(lit(B), col("word").substr(i, lit(1)), lit(E))), "")
        val encodedW = merges.foldLeft(markers: org.apache.spark.sql.Column) {
          case (acc, (_, a, b, _)) =>
            call_function("replace", acc,
              lit(s"$B$a$E$B$b$E"), lit(s"$B$a$b$E"))
        }
        val enc = base.select(explode(tokens(col("text"))).as("word"))
          .distinct()
          .filter(length(col("word")) >= 2)
          .select(col("word"), encodedW.as("w"))
          // symbol count = count of begin markers (one per symbol)
          .select(col("word"), (length(col("w")) -
            length(call_function("replace", col("w"), lit(B), lit(""))))
            .as("n_sym"))
        base.select(col("source"), explode(tokens(col("text"))).as("word"))
          .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
          .join(enc, Seq("word"), "left")
          .select(col("source"), col("word"), col("cnt"),
            coalesce(col("n_sym"), lit(1)).as("n_sym"))
          .groupBy(col("source"))
          .agg(sum(col("cnt")).as("n_tokens"),
            sum(length(col("word")).cast("long") * col("cnt")).as("n_chars"),
            sum(col("n_sym").cast("long") * col("cnt")).as("n_symbols"))
          .withColumn("compression",
            StableRound.r4(col("n_symbols").cast("double") / col("n_chars")))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        wf AS (SELECT word, count(*) wc FROM (
                 SELECT unnest(toks) word FROM t) GROUP BY 1
               HAVING length(word) >= 2),
        w0 AS (SELECT word, wc, array_to_string(
                 list_transform(generate_series(1, length(word)),
                   i -> chr(1) || word[i] || chr(2)), '') AS w FROM wf),
        ${(1 to bpeIters).map(i =>
            s"${bpePairCte(i)}, ${bpeMergeCte(i, "word, wc")},")
          .mkString("\n")}
        enc AS (SELECT word,
                  length(w) - length(replace(w, chr(1), '')) AS n_sym
                FROM w$bpeIters),
        tok AS (SELECT source, unnest(toks) AS word FROM t),
        pw AS (SELECT source, word, count(*) cnt FROM tok GROUP BY 1, 2),
        j AS (SELECT source, pw.word AS word, cnt,
                coalesce(enc.n_sym, 1) AS n_sym
              FROM pw LEFT JOIN enc ON pw.word = enc.word)
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
               CAST(sum(length(word) * cnt) AS BIGINT) AS n_chars,
               CAST(sum(n_sym * cnt) AS BIGINT) AS n_symbols,
               ${StableRound.sql4(
                 "sum(n_sym * cnt)::DOUBLE / sum(length(word) * cnt)")}
                 AS compression
        FROM j GROUP BY source ORDER BY source""")),

    // ── stratified sampling: k docs per source, reproducible ───────
    // Subsample every stratum to a fixed budget — the curation step
    // between mixture WEIGHTING (q75) and training ORDER (q92): pick
    // k docs per source uniformly, without replacement, and get the
    // SAME k on any engine, any partitioning, any retry. Rank key is
    // md5(seed | doc_id) — a pure function of the key (the q71/q75/q92
    // discipline), so the sample is a property of the dataset, not of
    // the run.
    //
    // Scale shape: per-source heads via the bounded-heap TopKPerKey
    // (k rows per key cross partial/final heaps) — never a
    // row_number window, which would shuffle-sort every row at 100 TB
    // to keep 5 per source.
    "q97_stratified_sample" -> QuerySpec(
      build = (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("k",
            md5(concat(lit("sample0|"), col("doc_id").cast("string"))))
        graft.operators.TopK.perKeyRanked(keyed, Seq("source"),
            Seq(col("k").asc), 5, "rk")
          .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
          .orderBy("source", "rk")
      },
      oracle = Some("""
        SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5('sample0|' || doc_id::VARCHAR)) AS rk
          FROM documents)
        WHERE rk <= 5 ORDER BY source, rk""")),

    // ── weighted sampling without replacement (priority sampling) ──
    // q97 samples UNIFORMLY; a training-data pipeline also needs
    // probability ∝ weight ("sample documents ∝ size/quality so the
    // subsample's token mass mirrors the corpus"). This is
    // Duffield–Lund–Thorup PRIORITY SAMPLING, integer-exact: each
    // item draws u ~ Uniform{1..2⁴⁰} as a pure PRF of (seed, doc_id)
    // (the q71/q75/q92/q97 reproducibility discipline — the sample is
    // a property of the dataset, not the run), gets priority
    // p = w·2⁴⁰ div u′ (the integer floor of w/u with u = u′/2⁴⁰ —
    // the 2⁴⁰ cancels, so p is in W UNITS directly; w = n_chars,
    // clamped ≥ 1 — w·2⁴⁰ < 2⁶³ for any document under 8 MB), and the
    // k highest priorities per stratum are the sample. τ = the
    // (k+1)-th priority is the stratum's threshold: est_w = max(w, τ)
    // is the DLT estimator whose per-stratum sum is unbiased for the
    // stratum's total weight (up to τ's integer-floor quantization —
    // < 1 char-unit); a stratum with ≤ k items keeps everything and
    // τ = 0, so est_w = w exactly.
    // CurationSpec replays the whole chain driver-side and checks the
    // estimator's mean over 200 seeds lands on the true total.
    //
    // Scale shape: one narrow scan computes u and p in codegen; the
    // per-stratum heads ride TopKPerKey bounded heaps (k+1 rows per
    // key cross the partial/final heaps — never a row_number window);
    // τ attaches via a ≤|sources|-row broadcast.
    "q174_priority_sample" -> QuerySpec(
      build = (s, d) => {
        val T = 1L << 40
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            greatest(coalesce(col("n_chars"), lit(0L)), lit(1L)).as("w"))
          .withColumn("u", pmod(TextQueries.md5Hash60(
            concat(lit("psamp0|"), col("doc_id").cast("string"))),
            lit(T)) + lit(1L))
          .withColumn("p",
            call_function("div", shiftleft(col("w"), 40), col("u")))
        val top = graft.operators.TopK.perKeyRanked(keyed,
          Seq("source"), Seq(col("p").desc, col("doc_id").asc), 6, "rk")
        val tau = top.filter(col("rk") === 6)
          .select(col("source"), col("p").as("tau"))
        top.filter(col("rk") <= 5)
          .join(broadcast(tau), Seq("source"), "left")
          .withColumn("tau", coalesce(col("tau"), lit(0L)))
          .select(col("source"), col("rk"), col("doc_id"), col("w"),
            col("p").as("priority"), col("tau"),
            greatest(col("w"), col("tau")).as("est_w"))
          .orderBy("source", "rk")
      },
      oracle = Some("""
        WITH b AS (SELECT doc_id, source,
                     greatest(coalesce(n_chars, 0), 1) AS w,
                     ('0x' || substring(md5('psamp0|' || doc_id::VARCHAR),
                       1, 15))::BIGINT % 1099511627776 + 1 AS u
                   FROM documents),
        p AS (SELECT doc_id, source, w,
                (w * 1099511627776) // u AS p FROM b),
        r AS (SELECT *, row_number() OVER (PARTITION BY source
                ORDER BY p DESC, doc_id) AS rk FROM p),
        tt AS (SELECT source, p AS tau FROM r WHERE rk = 6)
        SELECT r.source, CAST(rk AS INTEGER) AS rk, doc_id, w,
               p AS priority, coalesce(tau, 0) AS tau,
               greatest(w, coalesce(tau, 0)) AS est_w
        FROM r LEFT JOIN tt ON r.source = tt.source
        WHERE rk <= 5 ORDER BY r.source, rk""")),

    // ── cross-source overlap: the contamination matrix ─────────────
    // Which sources share content with which — the inter-source
    // counterpart of q77's corpus-vs-benchmark decontamination and the
    // aggregate view of q91's span signal: per source pair, the number
    // of distinct token 8-grams present in both, plus the containment
    // ratio n_shared / min(|A|, |B|) that mixture design reads to spot
    // a source that is mostly a subset of another.
    //
    // Scale shape: the source LIST is tiny by nature (a mixture
    // design reads this matrix — ≤62 sources by contract, enforced),
    // so the per-shingle source set is a LONG BITMASK, not a
    // collection: one codegen bit_or groupBy(sh) with map-side
    // partial aggregation (duplicate shingles within a partition —
    // boilerplate — collapse before the shuffle), then
    // groupBy(mask).count() collapses the shingle table to at most
    // 2^sources observed masks, and pair expansion, per-source
    // totals, and the containment ratios all run on that mask table —
    // driver-scale work. ONE position-scale exchange total, every
    // aggregate a codegen long op.
    "q98_source_overlap" -> QuerySpec(
      build = (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("source").isNotNull)
        // bounded collect: the distinct source list (q29's centroid-
        // literal discipline); sorted so bit positions are stable
        val srcs = OverlapIndex.sources(docs)
        // MEMORY CONTRACT: the mask table (bounded by min(distinct
        // shingles, 2^sources) rows) is persisted so the per-source
        // totals (a ≤62-row bounded collect inside overlapMatrix) and
        // the pair rollup share one computation of the position-scale
        // exchange. Scoped: the entry releases itself after the
        // query's first action (ScopedCache) — a curation run that
        // wants durable reuse uses the q99 disk artifact
        // (OverlapIndex.load) instead.
        graft.ScopedCache.withScopedCache(
          OverlapIndex.maskCounts(docs, srcs))(
          mc => OverlapIndex.overlapMatrix(mc, srcs))
      },
      oracle = Some(overlapOracleSql)),

    // ── overlap matrix served from the materialized index ──────────
    // Same result as q98 (same oracle, hash-checked), different cost
    // model: the corpus-scale shingle exchange is paid ONCE into a
    // parquet artifact (OverlapIndex.load) and every later invocation
    // — this session or the next — reads the ≤2^sources-row mask
    // table from disk. This is the artifact a curation run keeps next
    // to the dataset and consults from every downstream query; r6
    // measured the difference at 100× as 8.8 s cold vs 1.2 s reused.
    // Benched: pass 1 pays the build, later passes read — the min
    // documents the reuse contract.
    "q99_overlap_index" -> QuerySpec(
      build = (s, d) => {
        val (masks, srcs) = OverlapIndex.load(s, d)
        OverlapIndex.overlapMatrix(masks, srcs)
      },
      oracle = Some(overlapOracleSql),
      bench = true),

    // ── temperature-smoothed mixture sampling ───────────────────────
    // q75 applies HAND-PICKED per-source rates; this derives them from
    // the data: keep-rate ∝ sqrt(n_max / n_s) — the α=0.5 temperature
    // smoothing multilingual/multi-source training mixes use to
    // up-weight tail sources (expected kept mass ∝ sqrt(n_s), the
    // uniform↔proportional interpolation). The sqrt enters ONLY
    // through an integer band threshold floor(2000·sqrt(n_max/n_s))
    // capped at 10000: sqrt/divide/multiply are IEEE-correctly-rounded
    // in both engines, so the threshold — and with it every keep
    // decision — is bit-identical and hash-checked. Membership is the
    // q71/q75 discipline: md5(seed | doc_id) banded 0–9999, a pure
    // function of the key, reproducible across engines and reshards.
    //
    // Scale shape: per-source counts are one partial-agg groupBy to a
    // ≤sources-row table (n_max is a 1-row bounded collect); the
    // thresholds broadcast back onto the corpus; the keep test is
    // narrow per-row hash math; the report is one more partial-agg
    // groupBy. Two corpus exchanges total, both map-side-combined to
    // source cardinality.
    "q102_temperature_mix" -> QuerySpec(
      build = (s, d) => {
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
        val counts = base.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val nMax = counts.agg(max(col("n"))).head.getLong(0)
        val withTh = counts.select(col("source"), col("n"),
          least(floor(lit(2000.0) *
            sqrt(lit(nMax).cast("double") / col("n"))).cast("long"),
            lit(10000L)).as("threshold"))
        base.join(broadcast(withTh), "source")
          .withColumn("band",
            expr("conv(substring(md5(concat('mix0|', cast(doc_id as string))), 1, 8), 16, 10)")
              .cast("long") % 10000)
          .withColumn("kept", (col("band") < col("threshold")).cast("int"))
          .groupBy(col("source"))
          .agg(max(col("n")).as("n_docs"),
            max(col("threshold")).as("threshold"),
            sum(col("kept")).cast("long").as("n_kept"),
            sum(when(col("kept") === 1, col("n_chars")).otherwise(0L))
              .as("kept_chars"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH c AS (SELECT source, count(*) n FROM documents
                   WHERE text IS NOT NULL GROUP BY 1),
        m AS (SELECT max(n) nmax FROM c),
        t AS (SELECT source, n,
                LEAST(CAST(floor(2000 * sqrt(nmax * 1.0 / n)) AS BIGINT),
                  10000) AS th
              FROM c, m),
        k AS (SELECT d.source, d.n_chars, t.n, t.th,
                CASE WHEN ('0x' || substring(
                       md5('mix0|' || doc_id::VARCHAR), 1, 8))::BIGINT
                     % 10000 < t.th THEN 1 ELSE 0 END AS kept
              FROM documents d JOIN t ON d.source = t.source
              WHERE d.text IS NOT NULL)
        SELECT source, max(n) AS n_docs, max(th) AS threshold,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END)
                 AS BIGINT) AS kept_chars
        FROM k GROUP BY source ORDER BY source""")),

    // ── UniMax budget allocation across languages (Chung et al.) ───
    // The successor to temperature sampling (q102/q106): a token
    // budget (3/4 of the corpus) is WATER-FILLED across languages
    // under a one-epoch cap — every language gets the common level θ,
    // except languages too small to absorb it, which saturate at their
    // full size (never upsampled past 1 epoch). θ has a closed form:
    // sort languages by size ascending; rank r saturates iff
    // prefix_r + size_r·(n−r) ≤ min(budget, total) (a monotone
    // condition — the exact integer transcription of "the level is
    // above my cap"), and θ = (budget − Σ saturated) div (n − k).
    // On this corpus the cap BINDS at every SF (en is ~3× the rest:
    // 2 languages saturate at sf0.001, 4 at sf0.01/0.1) — both
    // branches are always exercised. The allocation then drives a
    // q102-style md5-band document sampler (keep-rate = effective
    // epochs, in e4). Scale: ONE token-scale exchange (the per-lang
    // sum, map-side combined); everything after is |langs| rows of
    // window arithmetic and a broadcast join back onto the corpus.
    "q130_unimax_mixture" -> QuerySpec(
      build = (s, d) => {
        // NOT spread (r20): token_count is too cheap to buy back the
        // text shuffle — the spread variant measured ~1.35× net at
        // sf0.1 (the Spread rule: kernel CPU must dominate the
        // repartition, as with the md5/minhash kernels)
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("lang"),
            graft.text.TextFunctions.token_count(col("text"))
              .cast("long").as("tc"))
        val alloc = unimaxAllocation(base)
        base.join(broadcast(alloc), "lang")
          .withColumn("band",
            expr("conv(substring(md5(concat('unimax0|', cast(doc_id as string))), 1, 8), 16, 10)")
              .cast("long") % 10000)
          .withColumn("kept", (col("band") < col("epochs_e4")).cast("long"))
          .groupBy(col("lang"))
          .agg(max(col("n_docs")).as("n_docs"),
            max(col("n_tokens")).as("n_tokens"),
            max(col("allocated")).as("allocated"),
            max(col("epochs_e4")).as("epochs_e4"),
            sum(col("kept")).as("n_kept"))
          .orderBy("lang")
      },
      oracle = Some(s"""
        WITH tc AS (SELECT doc_id, lang, len(toks) tc FROM (
                 SELECT d.doc_id, d.lang, string_split_regex(trim(d.text),
                   '\\s+') toks
                 FROM documents d WHERE d.text IS NOT NULL)),
        c AS (SELECT lang, count(*) n_docs, CAST(sum(tc) AS BIGINT) nt
              FROM tc GROUP BY 1),
        b AS (SELECT CAST(sum(nt) AS BIGINT) total, count(*) n,
                CAST((sum(nt) * 3) // 4 AS BIGINT) budget FROM c),
        rkd AS (SELECT c.*, b.total, b.n, b.budget,
                  ROW_NUMBER() OVER (ORDER BY nt, lang) r,
                  sum(nt) OVER (ORDER BY nt, lang) pk
                FROM c CROSS JOIN b),
        satd AS (SELECT *, CASE WHEN pk + nt * (n - r)
                     <= least(budget, total) THEN 1 ELSE 0 END sat
                 FROM rkd),
        lvl AS (SELECT coalesce(sum(CASE WHEN sat = 1 THEN nt END), 0) psat,
                  sum(sat) k, max(n) nn, max(budget) bb FROM satd),
        alc AS (SELECT s.lang, s.n_docs, s.nt,
                  CASE WHEN s.sat = 1 THEN s.nt
                    ELSE least(s.nt, (l.bb - l.psat) // (l.nn - l.k)) END
                    allocated
                FROM satd s CROSS JOIN lvl l),
        eff AS (SELECT lang, n_docs, nt,
                  CAST(allocated AS BIGINT) allocated,
                  CAST((allocated * 10000) // nt AS BIGINT) epochs_e4
                FROM alc),
        k2 AS (SELECT tc.lang, tc.doc_id, e.epochs_e4,
                 CASE WHEN ('0x' || substring(
                      md5('unimax0|' || tc.doc_id::VARCHAR), 1, 8))::BIGINT
                    % 10000 < e.epochs_e4 THEN 1 ELSE 0 END kept
               FROM tc JOIN eff e USING (lang))
        SELECT e.lang, e.n_docs, e.nt AS n_tokens, e.allocated,
               e.epochs_e4, CAST(sum(k2.kept) AS BIGINT) n_kept
        FROM eff e JOIN k2 ON k2.lang = e.lang
        GROUP BY 1, 2, 3, 4, 5 ORDER BY 1"""),
      bench = true),

    // ── full-epoch order fingerprint ────────────────────────────────
    // Cross-engine check of the COMPLETE training order (q92 only
    // spot-checks 3-doc heads): per shard, the md5 of every doc_id
    // concatenated in epoch-key order. The order is a pure function
    // of the md5 keys, so a matching fingerprint proves both engines
    // derive the identical full sequence — the same sequence
    // TrainOrder.writeEpoch lays out on disk (CurationSpec asserts
    // the disk order against this keying directly).
    //
    // Scale note: this is a VERIFICATION query — collect_list holds
    // one shard's doc_ids in a single aggregation buffer, fine at
    // oracle SF, not a production op. The production path never
    // materializes a shard in memory: writeEpoch streams it through
    // a spillable sortWithinPartitions.
    "q100_epoch_fingerprint" -> QuerySpec(
      build = (s, d) => {
        val keyed = TrainOrder.epochOrder(
          Tables.documents(s, d).select(col("doc_id")),
          epoch = 0, shards = 8)
        keyed.groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("k"), col("doc_id")))),
              x => x.getField("doc_id").cast("string")), ","))
              .as("order_md5"))
          .orderBy("shard")
      },
      oracle = Some("""
        SELECT shard, count(*) AS n_docs,
               md5(string_agg(doc_id::VARCHAR, ',' ORDER BY kk)) AS order_md5
        FROM (SELECT doc_id,
                     md5('epoch0|' || doc_id::VARCHAR) AS kk,
                     ('0x' || substring(md5('epoch0|' || doc_id::VARCHAR),
                       1, 8))::BIGINT % 8 AS shard
              FROM documents)
        GROUP BY shard ORDER BY shard""")),

    // ── corpus-level segment dedup with document reconstruction ─────
    // The C4/RefinedWeb discipline at segment granularity: split every
    // document into fixed 16-token chunks, keep only the globally
    // FIRST occurrence of each distinct chunk text (first = smallest
    // (doc_id, chunk_idx), a total order), and reconstruct each
    // document from its surviving chunks in position order. q91
    // measures duplicated-span MASS; this one performs the edit and
    // proves the rewritten corpus byte-for-byte: recon_hash_sum folds
    // the md5 of every reconstructed document into a per-source sum
    // both engines must reproduce exactly.
    //
    // Scale shape: three exchanges, each inherent. (1) the dedup
    // decision partitions occurrences by the FULL 128-bit md5 of the
    // chunk — not a 60-bit hash (at 10^12 chunks a 60-bit birthday
    // collision would silently delete live data) and not the raw
    // text (a 16-byte binary key hashes and sorts ~6× cheaper than a
    // ~100-byte string; collision probability at 10^12 chunks is
    // ~1e-15, below hardware error rates); a window min over that
    // partition is one exchange (vs two for groupBy-winners +
    // join-back). Hot boilerplate chunks skew their partition — AQE
    // skew handling splits them, and the min is a partial agg either
    // way. (2) per-doc reconstruction groups by
    // doc_id — collect_list holds ONE document's chunks (bounded by
    // doc length, the same bound the corpus's own rows obey).
    // (3) the per-source rollup is map-side-combined to |sources|
    // rows. The winner key doc_id*1e6+chunk_idx assumes docs under
    // 16M tokens (chunk_idx < 1e6) and doc_id < 9.2e12 — both hold
    // with headroom at 100 TB.
    "q103_segment_dedup" -> QuerySpec(
      build = (s, d) => {
        val chunks = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("source"),
            explode(transform(
              sequence(lit(0),
                ceil(size(col("toks")) / lit(16.0)).cast("int") - 1),
              i => struct(i.as("chunk_idx"),
                array_join(slice(col("toks"), i * 16 + 1, lit(16)), " ")
                  .as("chunk_text"),
                least(lit(16), size(col("toks")) - i * 16).as("chunk_len"))))
              .as("c"))
          .select(col("doc_id"), col("source"), col("c.*"))
        // dedup keys on the FULL 128-bit md5 of the chunk, not the
        // text: at 10^12 chunks a 128-bit key has ~1e-15 birthday
        // collision probability (the 60-bit objection does not apply),
        // and the dedup exchange then hashes/sorts 16-byte binaries
        // instead of ~100-byte strings. The rows still CARRY
        // chunk_text — it is the payload the per-doc reconstruction
        // downstream joins into newtext — so the win is the key
        // (partition hash + sort comparisons + one exchange column),
        // not the row payload.
        val firstWins = Window.partitionBy(unhex(md5(col("chunk_text"))))
        val kept = chunks
          .withColumn("wk", col("doc_id") * 1000000L + col("chunk_idx"))
          .withColumn("kept",
            (col("wk") === min(col("wk")).over(firstWins)).cast("int"))
        val docs = kept.groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("chunks_before"),
            sum(col("kept")).as("chunks_after"),
            sum(col("chunk_len")).as("toks_before"),
            sum(col("kept") * col("chunk_len")).as("toks_after"),
            array_join(transform(array_sort(collect_list(
              when(col("kept") === 1,
                struct(col("chunk_idx"), col("chunk_text"))))),
              x => x.getField("chunk_text")), " ").as("newtext"))
        // a document is "kept" iff ANY of its chunks won first-
        // occurrence — gate on the kept-chunk COUNT, not newtext != ''
        // (a whitespace-only doc's single kept chunk reconstructs to
        // the empty string, which is kept, not dropped; the oracle's
        // string_agg FILTER agrees with the count gate on that row but
        // not with the '' test)
        docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("chunks_after") > 0, 1).otherwise(0)).cast("long")
              .as("docs_kept"),
            sum(col("chunks_before")).cast("long").as("chunks_before"),
            sum(col("chunks_after")).cast("long").as("chunks_after"),
            sum(col("toks_before")).cast("long").as("tokens_before"),
            sum(col("toks_after")).cast("long").as("tokens_after"),
            sum(when(col("chunks_after") > 0,
              expr("conv(substring(md5(newtext), 1, 8), 16, 10)")
                .cast("long")).otherwise(0L)).as("recon_hash_sum"))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        ch AS (SELECT doc_id, source, i - 1 AS chunk_idx,
                 array_to_string(toks[(i-1)*16+1 : least(i*16, len(toks))],
                   ' ') AS chunk_text,
                 least(i*16, len(toks)) - (i-1)*16 AS chunk_len
               FROM t, unnest(generate_series(1,
                 CAST(ceil(len(toks)/16.0) AS BIGINT))) AS u(i)),
        k AS (SELECT *, CASE WHEN doc_id*1000000 + chunk_idx =
                  min(doc_id*1000000 + chunk_idx)
                    OVER (PARTITION BY md5(chunk_text))
                THEN 1 ELSE 0 END kept
              FROM ch),
        docs AS (SELECT doc_id, source,
                   count(*) chunks_before, sum(kept) chunks_after,
                   sum(chunk_len) toks_before, sum(kept*chunk_len) toks_after,
                   string_agg(chunk_text, ' ' ORDER BY chunk_idx)
                     FILTER (WHERE kept = 1) newtext
                 FROM k GROUP BY 1, 2)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN chunks_after > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS docs_kept,
               CAST(sum(chunks_before) AS BIGINT) AS chunks_before,
               CAST(sum(chunks_after) AS BIGINT) AS chunks_after,
               CAST(sum(toks_before) AS BIGINT) AS tokens_before,
               CAST(sum(toks_after) AS BIGINT) AS tokens_after,
               CAST(sum(CASE WHEN chunks_after > 0 THEN
                 ('0x' || substring(md5(coalesce(newtext, '')), 1, 8))::BIGINT
                 ELSE 0 END) AS BIGINT) AS recon_hash_sum
        FROM docs GROUP BY 1 ORDER BY 1"""),
      bench = true),

    // ── native HyperLogLog distinct-shingle counts, exactly replayed ─
    // The sketch path q50 could not oracle-check, rebuilt so it CAN:
    // approx_count_distinct's HLL++ internals are Spark-private, so
    // q50 is rows-only; [[graft.plans.HllAgg]] is the same sketch
    // idea with every step expressible in ANSI SQL from md5 — DuckDB
    // rebuilds all 512 registers per group and must match the
    // aggregate's integer summaries bit-for-bit, THEN the double
    // estimate. Counts distinct 8-token shingles per language next to
    // the exact answer; per-lang cardinalities (2.9k-10k at test SFs)
    // sit in the raw-estimator regime (> 2.5m = 1280), so no
    // small-range correction branch is exercised or needed.
    //
    // Scale shape: the per-row kernel emits 60-bit hashes, the
    // aggregate carries ONE 512-byte register array per (mapper,
    // lang) through its shuffle — the constant-state sketch that
    // answers distinct-counts over 100 TB in a single exchange. This
    // audit query ALSO wants the exact answer, so it dedups (lang, h)
    // explicitly first (16-byte rows, map-side combined) and feeds
    // the sketch the deduped stream — register maxima are idempotent
    // under duplicates, so the registers are unchanged, and the plan
    // never carries a register array keyed by anything finer than
    // lang. (Writing countDistinct + hll in ONE agg instead plans a
    // 512-byte partial buffer per (lang, hash) pair — the audit
    // column must not inflate the sketch's shuffle.) A production
    // run drops the dedup and the sketch rides the scan: one
    // exchange, 512 bytes per mapper per group.
    "q104_hll_distinct" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        val hll = toC(graft.plans.HllAgg(toE(col("h"))).toAggregateExpression())
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("lang"),
            explode(shingle_hashes(col("text"), 8)).as("h"))
          .distinct()
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_exact"), hll.as("_h"))
          .select(col("lang"), col("n_exact"),
            col("_h.sum_ranks").as("sum_ranks"),
            col("_h.zero_regs").as("zero_regs"),
            StableRound.r4(lit(graft.plans.HllAgg.alphaNum) /
              col("_h.s_scaled").cast("double")).as("hll_est"))
          .withColumn("err_pct", StableRound.r4(
            abs(col("hll_est") - col("n_exact")) / col("n_exact") * 100))
          .orderBy("lang")
      },
      oracle = Some {
        val cat8 = (0 until 8).map(k => s"toks[i+$k]").mkString("||' '||")
        s"""
        WITH t AS (SELECT doc_id, lang,
                     string_split_regex(trim(text), '\\s+') toks
                   FROM documents WHERE text IS NOT NULL),
        g AS (SELECT lang, unnest(list_transform(
                generate_series(1, greatest(len(toks)-7, 0)), i -> $cat8)) s
              FROM t),
        h AS (SELECT lang,
                ('0x' || substring(md5(s), 1, 15))::BIGINT h60 FROM g),
        r AS (SELECT lang, h60, h60 >> 51 AS idx,
                h60 & ((1::BIGINT << 51) - 1) AS rem FROM h),
        rk AS (SELECT lang, h60, idx,
                 CASE WHEN rem = 0 THEN 52
                      ELSE 52 - length(bin(rem)) END AS rnk
               FROM r),
        regs AS (SELECT lang, idx, max(rnk) mr FROM rk GROUP BY 1, 2),
        full_regs AS (SELECT l.lang, gr.idx, coalesce(regs.mr, 0) mr
               FROM (SELECT DISTINCT lang FROM t) l
               CROSS JOIN (SELECT unnest(generate_series(0, 511)) idx) gr
               LEFT JOIN regs ON regs.lang = l.lang AND regs.idx = gr.idx),
        agg AS (SELECT f.lang,
                  CAST(sum(f.mr) AS BIGINT) sum_ranks,
                  CAST(sum(CASE WHEN f.mr = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    zero_regs,
                  CAST(sum(1::BIGINT << (52 - f.mr)) AS BIGINT) s_scaled
                FROM full_regs f GROUP BY 1),
        ex AS (SELECT lang, count(DISTINCT h60) n_exact FROM r GROUP BY 1),
        est AS (SELECT a.lang, ex.n_exact, a.sum_ranks, a.zero_regs,
                  ${StableRound.sql4(
                    s"${graft.plans.HllAgg.alphaNum} / CAST(a.s_scaled AS DOUBLE)")}
                    AS hll_est
                FROM agg a JOIN ex USING (lang))
        SELECT lang, n_exact, sum_ranks, zero_regs, hll_est,
               ${StableRound.sql4("abs(hll_est - n_exact) / n_exact * 100")}
                 AS err_pct
        FROM est ORDER BY lang"""
      }),

    // ── cross-source overlap at SKETCH cost (HLL set algebra) ───────
    // q98/q99 price the exact overlap matrix with one position-scale
    // exchange (every shingle occurrence shuffles once). This is the
    // same matrix at MONITORING cost: per-source HLL register arrays
    // ([[graft.plans.HllRegsAgg]] — q104's sketch with the raw 512
    // registers as the result), pairwise UNION by elementwise max
    // (`zip_with(.., greatest)`), and inclusion–exclusion
    // |A∩B| ≈ |A| + |B| − |A∪B|. ONE constant-state exchange (512
    // bytes per mapper-source) replaces the shingle shuffle — the
    // nightly "did source overlap drift?" check a 100 TB corpus runs
    // daily, with q98 as the deep audit it escalates to. The exact
    // n_shared rides along from the [[OverlapIndex]] artifact (read
    // path, mask-table scale) so the query IS its own error report
    // (err_pct) — inclusion–exclusion stacks three ±4.6% estimates,
    // so small intersections drown in sketch noise (the reported
    // err_pct makes that honest instead of silent).
    //
    // Every piece is DuckDB-replayable: registers rebuilt per source,
    // pairwise max-merged on idx, the same alpha·m²/S estimate with
    // the one FP constant interpolated, r4 at the edges.
    "q141_sketch_overlap" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("source").isNotNull)
        val regsAgg = toC(graft.plans.HllRegsAgg(toE(col("h")))
          .toAggregateExpression())
        // MEMORY CONTRACT: |sources| rows × 4 KiB — persisted so the
        // a-side and b-side of the pair join share ONE corpus-scale
        // sketch pass (unpersisted, the self-join re-aggregates the
        // corpus twice). The source list comes from the DOCUMENTS
        // frame, not the shingle stream: a source whose docs are all
        // shorter than 8 tokens emits no shingles, and dropping it
        // here would silently omit its (near-zero-overlap) pair rows
        // while the oracle — which builds registers per DISTINCT
        // source with coalesce-0 — still reports them. Empty sketch =
        // the all-zero register array, exactly the oracle's.
        // MEMORY CONTRACT: ≤62 sources × 4 KiB register arrays —
        // persisted (scoped — released after the query's action) so
        // the pair expansion's two sides share one corpus-scale
        // sketch pass
        graft.ScopedCache.withScopedCache(docs
          .select(col("source")).distinct()
          .join(docs
            .select(col("source"),
              explode(shingle_hashes(col("text"), 8)).as("h"))
            .groupBy(col("source")).agg(regsAgg.as("regs")),
            Seq("source"), "left")
          .select(col("source"),
            coalesce(col("regs"),
              array_repeat(lit(0L), graft.plans.HllAgg.m))
              .as("regs"))) { regs =>
        // integer Σ 2^(52-M_j): the q104 s_scaled arithmetic over an
        // in-row array — exact, then ONE double division per estimate
        def ssSql(arr: String) =
          s"aggregate($arr, cast(0 as bigint), (acc, v) -> acc + shiftleft(cast(1 as bigint), 52 - cast(v as int)))"
        def est(arr: String) =
          lit(graft.plans.HllAgg.alphaNum) / expr(ssSql(arr)).cast("double")
        // deliberate bounded cross: |sources| × |sources| / 2 register
        // rows (≤62 sources by the OverlapIndex contract)
        val pairs = regs.select(col("source").as("src_a"), col("regs").as("ra"))
          .join(regs.select(col("source").as("src_b"), col("regs").as("rb")),
            col("src_a") < col("src_b"))
          .withColumn("ea", est("ra"))
          .withColumn("eb", est("rb"))
          .withColumn("ru", expr("zip_with(ra, rb, (x, y) -> greatest(x, y))"))
          .withColumn("eu", est("ru"))
          .withColumn("ei", greatest(col("ea") + col("eb") - col("eu"), lit(0.0)))
        val (masks, srcs) = OverlapIndex.load(s, d)
        val exact = OverlapIndex.overlapMatrix(masks, srcs)
          .select(col("src_a"), col("src_b"), col("n_shared"))
        pairs.join(exact, Seq("src_a", "src_b"), "left")
          .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
          .select(col("src_a"), col("src_b"),
            StableRound.r4(col("ea")).as("est_a"),
            StableRound.r4(col("eb")).as("est_b"),
            StableRound.r4(col("eu")).as("est_union"),
            StableRound.r4(col("ei")).as("est_inter"),
            col("n_shared"),
            StableRound.r4(abs(col("ei") - col("n_shared")) /
              greatest(col("n_shared"), lit(1L)) * 100).as("err_pct"))
          .orderBy("src_a", "src_b")
        }
      },
      oracle = Some {
        val cat8 = (0 until 8).map(k => s"toks[i+$k]").mkString("||' '||")
        s"""
        WITH t AS (SELECT doc_id, source,
                     string_split_regex(trim(text), '\\s+') toks
                   FROM documents
                   WHERE text IS NOT NULL AND source IS NOT NULL),
        g AS (SELECT source, unnest(list_transform(
                generate_series(1, greatest(len(toks)-7, 0)), i -> $cat8)) s
              FROM t),
        h AS (SELECT source,
                ('0x' || substring(md5(s), 1, 15))::BIGINT h60 FROM g),
        r AS (SELECT source, h60, h60 >> 51 AS idx,
                h60 & ((1::BIGINT << 51) - 1) AS rem FROM h),
        rk AS (SELECT source, idx,
                 CASE WHEN rem = 0 THEN 52
                      ELSE 52 - length(bin(rem)) END AS rnk
               FROM r),
        regs AS (SELECT source, idx, max(rnk) mr FROM rk GROUP BY 1, 2),
        full_regs AS (SELECT l.source, gr.idx, coalesce(regs.mr, 0) mr
               FROM (SELECT DISTINCT source FROM t) l
               CROSS JOIN (SELECT unnest(generate_series(0, 511)) idx) gr
               LEFT JOIN regs ON regs.source = l.source AND regs.idx = gr.idx),
        pr AS (SELECT a.source sa, b.source sb,
                 CAST(sum(1::BIGINT << (52 - a.mr)) AS BIGINT) ssa,
                 CAST(sum(1::BIGINT << (52 - b.mr)) AS BIGINT) ssb,
                 CAST(sum(1::BIGINT << (52 - greatest(a.mr, b.mr))) AS BIGINT)
                   ssu
               FROM full_regs a JOIN full_regs b
                 ON a.idx = b.idx AND a.source < b.source
               GROUP BY 1, 2),
        dh AS (SELECT DISTINCT source, h60 FROM h),
        ex AS (SELECT a.source sa, b.source sb, count(*) n_shared
               FROM dh a JOIN dh b ON a.h60 = b.h60 AND a.source < b.source
               GROUP BY 1, 2),
        est AS (SELECT pr.sa src_a, pr.sb src_b,
                  ${graft.plans.HllAgg.alphaNum} / CAST(ssa AS DOUBLE) ea,
                  ${graft.plans.HllAgg.alphaNum} / CAST(ssb AS DOUBLE) eb,
                  ${graft.plans.HllAgg.alphaNum} / CAST(ssu AS DOUBLE) eu,
                  coalesce(ex.n_shared, 0) n_shared
                FROM pr LEFT JOIN ex ON pr.sa = ex.sa AND pr.sb = ex.sb),
        f AS (SELECT src_a, src_b, ea, eb, eu,
                greatest(ea + eb - eu, 0.0) ei, n_shared FROM est)
        SELECT src_a, src_b,
               ${StableRound.sql4("ea")} AS est_a,
               ${StableRound.sql4("eb")} AS est_b,
               ${StableRound.sql4("eu")} AS est_union,
               ${StableRound.sql4("ei")} AS est_inter,
               CAST(n_shared AS BIGINT) AS n_shared,
               ${StableRound.sql4(
                 "abs(ei - n_shared) / greatest(n_shared, 1) * 100")}
                 AS err_pct
        FROM f ORDER BY src_a, src_b"""
      },
      bench = true),

    // ── Count-Min heavy-hitter frequencies, exactly replayed ────────
    // The frequency twin of q104: [[graft.plans.CmsAgg]] builds one
    // 4×256 Count-Min counter array per source (8 KiB state,
    // elementwise-ADD merge), and the query probes it with the global
    // top-16 tokens — estimate = min over the 4 rows of the counter
    // each hash byte lands in, never below the exact count (CMS is
    // one-sided). Every counter is an exact integer COUNT of rows by
    // hash byte, so DuckDB rebuilds all 1024 cells per source and the
    // probes, estimates, and overcounts hash-check bit-for-bit.
    //
    // Scale shape: the sketch rides the token scan in ONE exchange —
    // 8 KiB per (mapper, source) regardless of token count — where an
    // exact per-token groupBy shuffles the full vocabulary. The exact
    // per-(source, probe) counts here are the AUDIT columns (this
    // query proves the sketch's error behavior next to ground truth);
    // a production run keeps only the sketch + probe join. The probe
    // set is a 16-row TakeOrdered → broadcast; the probe join is
    // |sources| × 16 rows.
    "q110_cms_heavy_hitters" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        def h60(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c), 1, 15), 16, 10).cast("long")
        val tok = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("source"), explode(tokens(col("text"))).as("token"))
        val cms = toC(graft.plans.CmsAgg(toE(col("h"))).toAggregateExpression())
        val sketches = tok.withColumn("h", h60(col("token")))
          .groupBy(col("source")).agg(cms.as("cms"))
        // ONE token-scale exchange feeds both audit surfaces: the
        // probe set is the vocab-scale rollup of the exact counts
        // (persisted — vocab-bounded, and the probe branch and the
        // join branch would otherwise each re-pay the token groupBy)
        val exact = tok.groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("n_exact")).persist()
        val probes = exact.groupBy(col("token"))
          .agg(sum(col("n_exact")).as("n_global"))
          .orderBy(col("n_global").desc, col("token").asc).limit(16)
          .withColumn("ph", h60(col("token")))
        val est = least((0 until graft.plans.CmsAgg.d).map { j =>
          col("cms")(lit(j * graft.plans.CmsAgg.w) +
            shiftright(col("ph"), 8 * j).bitwiseAND(lit(255L)).cast("int"))
        }: _*)
        // deliberate bounded cross join: |sources| sketch rows × 16
        // broadcast probes
        sketches.crossJoin(broadcast(probes))
          .join(exact, Seq("source", "token"), "left")
          .select(col("source"), col("token"), col("n_global"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            est.as("cms_est"))
          .withColumn("overcount", col("cms_est") - col("n_exact"))
          .orderBy("source", "token")
      },
      oracle = Some {
        val cells = (0 until graft.plans.CmsAgg.d).map(j =>
          s"""coalesce((SELECT c.c FROM cnt c WHERE c.source = s.source
               AND c.j = $j AND c.b = ((p.ph >> ${8 * j}) & 255)), 0)""")
          .mkString(", ")
        s"""
        WITH t AS ($duckToks),
        tok AS (SELECT source, unnest(toks) AS token FROM t),
        cnt AS (SELECT source, j,
                  (('0x' || substring(md5(token), 1, 15))::BIGINT >> (8*j))
                    & 255 AS b, count(*) c
                FROM tok, unnest([0, 1, 2, 3]) AS u(j)
                GROUP BY 1, 2, 3),
        probes AS (SELECT token, count(*) n_global,
                     ('0x' || substring(md5(token), 1, 15))::BIGINT ph
                   FROM tok GROUP BY token
                   ORDER BY count(*) DESC, token ASC LIMIT 16),
        srcs AS (SELECT DISTINCT source FROM tok),
        exact AS (SELECT source, token, count(*) n_exact
                  FROM tok GROUP BY 1, 2),
        est AS (SELECT s.source, p.token, p.n_global,
                  coalesce(e.n_exact, 0) AS n_exact,
                  least($cells) AS cms_est
                FROM srcs s CROSS JOIN probes p
                LEFT JOIN exact e ON e.source = s.source AND e.token = p.token)
        SELECT source, token, n_global, CAST(n_exact AS BIGINT) AS n_exact,
               CAST(cms_est AS BIGINT) AS cms_est,
               CAST(cms_est - n_exact AS BIGINT) AS overcount
        FROM est ORDER BY source, token"""
      },
      bench = true),

    // ── BM25 retrieval (query set → top-5 docs per query) ───────────
    // Full-text relevance retrieval over the corpus — the operator a
    // RAG / eval-harness pipeline runs against the curated data. The
    // scoring is the BM25 family (k1=1.2, b=0.75 length-normalized tf
    // saturation) with the RATIONAL idf variant (N−df+0.5)/(df+0.5) —
    // q88's discipline: a log idf would hinge the cross-engine hash on
    // transcendental rounding, and rational idf preserves the same
    // per-term ordering. Per-(term, doc) scores quantize to INTEGER
    // ten-thousandths (the q95 ADC trick) so the per-(query, doc) sum
    // is an order-free exact integer — any partitioning, same hash.
    //
    // Scale shape: query terms are a bounded broadcast (≤6 query docs
    // × 8 terms); the corpus term table joins it BROADCAST (no corpus
    // shuffle on the probe side), df/dl are partial-agg'd rollups the
    // index build already pays, and the rerank is TopKPerKey bounded
    // heaps — never a row_number window over the corpus.
    "q111_bm25_topk" -> QuerySpec(
      build = (s, d) => {
        // spread before the tokenize kernel (guide §2.5; no-op at
        // scale): dtoks is evaluated by three subtrees (terms, dl,
        // stats) and each would otherwise run single-task on a
        // single-row-group local file
        val dtoks = graft.plans.Spread.byKey(
            Tables.documents(s, d).filter(col("text").isNotNull),
            col("doc_id"))
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        val dl = dtoks.select(col("doc_id"), size(col("toks")).as("dl"))
        // corpus size + average doc length as a LAZY 1-row crossJoin
        // (broadcast) — the q88 pattern, no job at plan-build time
        val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
        // queries: the first 8 distinct terms (token asc) of each doc
        // with doc_id <= 5 — deterministic and cross-engine-identical
        val qterms = bm25QueryTerms(s, d)
        // the corpus term table is PRUNED to query tokens BEFORE any
        // exchange: the explode is narrow, the broadcast semi-join
        // keeps only rows whose token some query mentions, and only
        // those shuffle into the tf groupBy — the exchange is sized by
        // docs-containing-query-tokens, never by the corpus token
        // count. df over the pruned table equals full-corpus df for
        // every surviving token (the filter is BY token), so the
        // scores are unchanged. Persisted (scoped — released after
        // the query's action): the df rollup and the scoring join
        // both read it.
        // explode_OUTER: the non-outer form makes the optimizer infer
        // `size(toks) > 0` and push it below the projection,
        // re-tokenizing the corpus per conjunct (q24's duplication);
        // the null rows an outer explode adds vanish in the inner
        // token join
        graft.ScopedCache.withScopedCache(dtoks
          .select(col("doc_id"), explode_outer(col("toks")).as("t"))
          .join(broadcast(qterms.select(col("t")).distinct()), Seq("t"))
          .groupBy(col("doc_id"), col("t"))
          .agg(count(lit(1)).as("tf"))) { terms =>
          val df_ = terms.groupBy(col("t")).agg(count(lit(1)).as("df"))
          bm25Rank(terms.join(broadcast(qterms), Seq("t"))
            .join(dl, Seq("doc_id")).join(df_, Seq("t")).crossJoin(stats))
        }
      },
      oracle = Some(bm25OracleSql),
      bench = true),

    // ── BM25 served from the materialized posting index ─────────────
    // The artifact treatment (q114's recipe) applied to q111's
    // per-dataset structure: [[Bm25Index]] pays the corpus tokenize +
    // tf/df/dl build ONCE, denormalized into self-contained postings
    // partitioned by a token hash bucket. The read path collects the
    // bounded query-term set (≤6 docs × 8 terms — the one driver-side
    // collect, and the point: the partition-pruning literal must exist
    // at plan time), prunes the posting read to the probed `_tb`
    // buckets — Spark partition pruning as the posting-list seek — and
    // scores with zero corpus-scale joins: the only exchange is the
    // (qid, doc) sum, sized by matched postings. Same oracle as q111:
    // the index path must reproduce the direct build bit-for-bit.
    "q116_bm25_from_index" -> QuerySpec(
      build = (s, d) => {
        val qterms = bm25QueryTerms(s, d)
        val buckets = qterms.select(col("t")).distinct()
          .collect().map(r => Bm25Index.bucketOf(r.getString(0)))
          .distinct.toSeq
        val post = Bm25Index.postings(s, d)
          .filter(col("_tb").isin(buckets: _*))
          .join(broadcast(qterms), Seq("t"))
        bm25Rank(post.crossJoin(broadcast(Bm25Index.stats(s, d))))
      },
      oracle = Some(bm25OracleSql),
      bench = true),

    // ── incremental BM25 index maintenance (r15) ────────────────────
    // [[graft.text.Bm25Store]]: the ingest-store triple completed —
    // documents ARRIVE, and rebuilding q116's immutable artifact per
    // batch re-tokenizes the corpus. The store keeps postings RAW
    // (df would stale under appends — it is DERIVED from the pruned
    // read at query time, where it equals full-corpus df because the
    // filter is by term; dl is doc-local, so it rides denormalized),
    // making fold append-only by construction. Here the corpus splits
    // 2:1, the store folds the later third, and the oracle is q111's
    // VERBATIM — the hash match IS the fold≡rebuild proof (the q183
    // discipline applied to text retrieval).
    "q191_bm25_incremental" -> QuerySpec(
      build = (s, d) => {
        val docs = Tables.documents(s, d)
        val isBatch = col("doc_id") % 3 === 1
        val store = Artifacts.dir(d, "bm25_store_v1")
        Artifacts.materialize(store) { tmp =>
          Bm25Store.init(s, docs.filter(!isBatch), tmp.toString)
          Bm25Store.fold(s, tmp.toString, docs.filter(isBatch))
        }
        bm25Rank(Bm25Store.scored(s, store.toString, bm25QueryTerms(s, d)))
      },
      oracle = Some(bm25OracleSql),
      bench = true),

    // ── chunk-grain BM25 retrieval (r15) ───────────────────────────
    // q192's chunker composed with q111's scoring: the retrieval unit
    // becomes the (doc, chunk) window — what a RAG pipeline actually
    // feeds a context window, with provenance kept (doc_id, chunk_idx,
    // token offset = chunk_idx·stride). Chunk df/avgdl are the CHUNK
    // corpus's own statistics (a term in 3 windows of one doc IS more
    // retrievable at chunk grain — that is the semantic, not a bug).
    // Same plan discipline as q111: the chunk-term explode prunes to
    // query tokens BEFORE any exchange, df over the pruned table
    // equals chunk-corpus df (the filter is by token), the tf groupBy
    // is the only token-scale exchange. The oracle replays chunking +
    // scoring wholesale.
    "q194_chunk_retrieval" -> QuerySpec(
      build = (s, d) => {
        val W = 32; val S = 24
        // spread before the tokenize kernel (guide §2.5; no-op at
        // scale). The l > 0 gate lives INSIDE the generator expression
        // (when(l > 0, …) + outer explode + null filter) instead of a
        // dt-level filter: a filter on the derived column pushes below
        // the projection and re-tokenizes the corpus per conjunct
        // (q24's duplication), and the non-outer explode's inferred
        // size filter did the same once more.
        val dt = graft.plans.Spread.byKey(
            Tables.documents(s, d).filter(col("text").isNotNull),
            col("doc_id"))
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("l", size(col("toks")))
        val chunks = dt.select(col("doc_id"), col("toks"), col("l"),
            explode_outer(when(col("l") > 0,
              expr(s"""filter(sequence(0, l - 1, $S),
              p -> p = 0 OR p + ${W - S} < l)"""))).as("p"))
          .filter(col("p").isNotNull)
          .select(col("doc_id"), expr(s"p div $S").as("ci"),
            expr(s"slice(toks, p + 1, $W)").as("ctoks"))
          .withColumn("dl", size(col("ctoks")))
        val stats = chunks.agg(count(lit(1)).cast("double").as("n_docs"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
        val qterms = bm25QueryTerms(s, d)
        graft.ScopedCache.withScopedCache(chunks
          .select(col("doc_id"), col("ci"), col("dl"),
            explode_outer(col("ctoks")).as("t"))
          .join(broadcast(qterms.select(col("t")).distinct()), Seq("t"))
          .groupBy(col("doc_id"), col("ci"), col("dl"), col("t"))
          .agg(count(lit(1)).as("tf"))) { terms =>
          val df_ = terms.groupBy(col("t")).agg(count(lit(1)).as("df"))
          val scored = terms.join(broadcast(qterms), Seq("t"))
            .join(broadcast(df_), Seq("t")).crossJoin(broadcast(stats))
            .select(col("qid"), col("doc_id"), col("ci"), bm25E.as("e"))
            .groupBy(col("qid"), col("doc_id"), col("ci"))
            .agg(sum(col("e")).as("score_e4"))
          graft.operators.TopK.perKeyRanked(scored, Seq("qid"),
              Seq(col("score_e4").desc, col("doc_id").asc,
                col("ci").asc), 5, "rank")
            .select(col("qid"), col("rank"), col("doc_id"),
              col("ci").as("chunk_idx"), col("score_e4"))
            .orderBy("qid", "rank")
        }
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        d AS (SELECT doc_id, toks, len(toks) AS l FROM t
              WHERE len(toks) > 0),
        ch AS (SELECT doc_id, p // 24 AS ci,
                      list_slice(toks, p + 1, least(p + 32, l)) AS ctoks
               FROM (SELECT doc_id, toks, l,
                            unnest([p FOR p IN range(0, l, 24)
                                    IF p = 0 OR p + 8 < l]) AS p
                     FROM d)),
        cdl AS (SELECT doc_id, ci, len(ctoks) AS dl FROM ch),
        cterms AS (SELECT doc_id, ci, tt AS t, count(*) AS tf FROM
                     (SELECT doc_id, ci, unnest(ctoks) AS tt FROM ch)
                   GROUP BY 1, 2, 3),
        cdf AS (SELECT t, count(*) AS df FROM cterms GROUP BY 1),
        cstats AS (SELECT CAST(count(*) AS DOUBLE) n_docs,
                          CAST(sum(dl) AS DOUBLE) / count(*) avgdl
                   FROM cdl),
        dterms AS (SELECT doc_id, tt AS t FROM
                     (SELECT doc_id, unnest(toks) tt FROM t)
                   GROUP BY 1, 2),
        qt0 AS (SELECT doc_id qid, t, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY t) rn
                FROM dterms WHERE doc_id <= 5),
        qt AS (SELECT qid, t FROM qt0 WHERE rn <= 8),
        sc AS (SELECT qt.qid, cterms.doc_id, cterms.ci,
                 CAST(floor(((s.n_docs - cdf.df + 0.5) / (cdf.df + 0.5)) *
                   ((cterms.tf * 2.2) / (cterms.tf + 1.2 *
                     (1.0 - 0.75 + 0.75 * cdl.dl / s.avgdl)))
                   * 10000 + 0.5) AS BIGINT) e
               FROM cterms JOIN qt USING (t) JOIN cdf USING (t)
               JOIN cdl ON cdl.doc_id = cterms.doc_id
                 AND cdl.ci = cterms.ci
               CROSS JOIN cstats s),
        agg AS (SELECT qid, doc_id, ci, CAST(sum(e) AS BIGINT) score_e4
                FROM sc GROUP BY 1, 2, 3),
        rk AS (SELECT qid, doc_id, ci, score_e4, ROW_NUMBER() OVER (
                 PARTITION BY qid ORDER BY score_e4 DESC, doc_id, ci)
                 rank FROM agg)
        SELECT qid, CAST(rank AS INTEGER) rank, doc_id,
               CAST(ci AS BIGINT) chunk_idx, score_e4
        FROM rk WHERE rank <= 5 ORDER BY qid, rank"""),
      bench = true),

    // ── Bloom-filter decontamination pre-filter, exactly replayed ───
    // The third sketch next to q104 (HLL: how many distinct) and q110
    // (CMS: how often): [[graft.plans.BloomAgg]] answers "definitely
    // absent or maybe present" in 1 KiB per group — the pre-filter a
    // 100 TB decontamination pass runs BEFORE the exact check, because
    // a Bloom miss (the overwhelming majority of corpus shingles) is
    // proof of absence and skips the expensive path; NO FALSE
    // NEGATIVES by construction, a set bit never clears. This audit
    // query builds one Bloom per source over its 8-gram shingle
    // hashes, probes it with a 64-shingle eval set, and reports bloom
    // hits NEXT TO exact membership — the false-positive count is the
    // sketch's measured error, and false negatives are structurally
    // zero (CurationSpec pins it). Every bit is replayable in SQL (bit
    // b of row f set iff any hash has (h >> 13f) & 8191 = b), so
    // DuckDB rebuilds membership as 4-field joins and the hit bits,
    // counts, and false positives hash-check bit-for-bit.
    //
    // Scale shape: the sketch rides the shingle scan in ONE exchange —
    // 1 KiB per (mapper, source); the probe set is a 64-row
    // TakeOrdered broadcast; the exact-membership audit prunes the
    // corpus stream by the broadcast probe set BEFORE its distinct
    // exchange (the q111 discipline), so nothing corpus-scale
    // shuffles.
    "q112_bloom_prefilter" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        val sh = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            explode(shingle_hashes(col("text"), 8)).as("h"))
        // eval set: first 64 distinct shingle hashes of docs 0-3
        val probes = sh.filter(col("doc_id") <= 3).select(col("h").as("ph"))
          .distinct().orderBy("ph").limit(64)
        val bloom = toC(graft.plans.BloomAgg(toE(col("h"))).toAggregateExpression())
        val srcBloom = sh.groupBy(col("source")).agg(bloom.as("bloom"))
        // exact membership, pruned by the broadcast probe set BEFORE
        // the distinct exchange
        val present = sh
          .join(broadcast(probes.withColumnRenamed("ph", "h")), Seq("h"))
          .select(col("source"), col("h").as("ph")).distinct()
          .withColumn("present", lit(1L))
        val hit = (0 until graft.plans.BloomAgg.k).map { f =>
          expr(s"""shiftright(element_at(bloom,
            CAST((shiftright(ph, ${graft.plans.BloomAgg.fieldBits * f}) & 8191)
              DIV 64 AS INT) + 1),
            CAST(shiftright(ph, ${graft.plans.BloomAgg.fieldBits * f}) & 63
              AS INT)) & 1""")
        }.reduce(_ * _)
        // deliberate bounded cross join: |sources| bloom rows × 64
        // broadcast probes
        srcBloom.crossJoin(broadcast(probes))
          .withColumn("hit", hit)
          .join(present, Seq("source", "ph"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_probes"),
            sum(coalesce(col("present"), lit(0L))).as("n_present"),
            sum(col("hit")).as("n_bloom_hits"))
          .withColumn("n_false_pos", col("n_bloom_hits") - col("n_present"))
          .orderBy("source")
      },
      // oracle note (SQL comments are stripped by oracleSql's
      // whitespace normalization, so it lives here): the Bloom array
      // is SHARED across the k probe positions — bit b is set iff ANY
      // field of ANY member hash equals b, so `fv` (the set-bit
      // relation) drops the field index, and a probe hits iff EACH of
      // its 4 field values finds a set bit, whatever field set it
      oracle = Some {
        val cat8 = (0 until 8).map(k => s"toks[i+$k]").mkString("||' '||")
        s"""
        WITH t AS (SELECT doc_id, source,
                     string_split_regex(trim(text), '\\s+') toks
                   FROM documents WHERE text IS NOT NULL),
        g AS (SELECT doc_id, source, unnest(list_transform(
                generate_series(1, greatest(len(toks)-7, 0)), i -> $cat8)) s
              FROM t),
        h AS (SELECT doc_id, source,
                ('0x' || substring(md5(s), 1, 15))::BIGINT h60 FROM g),
        probes AS (SELECT DISTINCT h60 ph FROM h WHERE doc_id <= 3
                   ORDER BY 1 LIMIT 64),
        srcs AS (SELECT DISTINCT source FROM h),
        fv AS (SELECT DISTINCT source, (h60 >> (13*f)) & 8191 v
               FROM h CROSS JOIN unnest([0, 1, 2, 3]) u(f)),
        hits AS (SELECT s.source, p.ph,
                   CASE WHEN count(DISTINCT pf.f) = 4 THEN 1 ELSE 0 END hit
                 FROM srcs s CROSS JOIN probes p
                 CROSS JOIN unnest([0, 1, 2, 3]) pf(f)
                 JOIN fv ON fv.source = s.source
                   AND fv.v = (p.ph >> (13 * pf.f)) & 8191
                 GROUP BY 1, 2),
        pres AS (SELECT DISTINCT source, h60 FROM h
                 WHERE h60 IN (SELECT ph FROM probes)),
        agg AS (SELECT s.source, p.ph, coalesce(ht.hit, 0) hit,
                  CASE WHEN pr.h60 IS NOT NULL THEN 1 ELSE 0 END present
                FROM srcs s CROSS JOIN probes p
                LEFT JOIN hits ht ON ht.source = s.source AND ht.ph = p.ph
                LEFT JOIN pres pr ON pr.source = s.source AND pr.h60 = p.ph)
        SELECT source, count(*) n_probes,
               CAST(sum(present) AS BIGINT) n_present,
               CAST(sum(hit) AS BIGINT) n_bloom_hits,
               CAST(sum(hit) - sum(present) AS BIGINT) n_false_pos
        FROM agg GROUP BY 1 ORDER BY 1"""
      },
      bench = true),

    // ── epoch-mix upsampling (per-language repeat factors) ──────────
    // The complement of q102: temperature smoothing by REPEATING tail
    // groups instead of dropping head ones — the multilingual mix
    // recipe (low-resource languages see >1 epochs so the trained
    // mix approaches the α=0.5 interpolation). Expected copies per
    // doc = sqrt(n_max/n_lang) ≥ 1, realized deterministically as an
    // integer scaled factor f = floor(1e4·sqrt(n_max/n)): every doc
    // gets f/1e4 whole replicas, plus one more iff its md5 band
    // lands under f mod 1e4 — the q71/q75 membership discipline, so
    // the exact replica multiset is a pure function of (lang counts,
    // doc_id) and both engines enumerate it identically.
    // replica_hash_sum folds md5('ord|'|doc_id|'|'|replica) over
    // every emitted replica: the cross-engine proof that the
    // enumerated copies (not just their count) match — those keys
    // are what a downstream epoch writer would sort by.
    //
    // Scale shape: identical to q102 — one partial-agg groupBy to
    // |langs| rows, broadcast back, narrow per-row hash math +
    // explode (bounded by the ≤10 replica cap), one partial-agg
    // rollup. The explode multiplies rows by at most
    // sqrt(n_max/n_min); mixing weights are clamped there so a
    // near-empty group cannot amplify unboundedly.
    "q106_epoch_upsample" -> QuerySpec(
      build = (s, d) => {
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
        val counts = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        val nMax = counts.agg(max(col("n"))).head.getLong(0)
        val withF = counts.select(col("lang"), col("n"),
          least(floor(lit(10000.0) *
            sqrt(lit(nMax).cast("double") / col("n"))).cast("long"),
            lit(100000L)).as("f_scaled"))
        base.select(col("lang"), col("doc_id"), col("n_chars"))
          .join(broadcast(withF), "lang")
          .withColumn("band",
            expr("conv(substring(md5(concat('up0|', cast(doc_id as string))), 1, 8), 16, 10)")
              .cast("long") % 10000)
          .withColumn("n_rep", expr("f_scaled div 10000") +
            when(col("band") < col("f_scaled") % 10000, 1L).otherwise(0L))
          .withColumn("rep", explode(sequence(lit(0L), col("n_rep") - 1)))
          .withColumn("rkey",
            expr("conv(substring(md5(concat('ord|', cast(doc_id as string), '|', cast(rep as string))), 1, 8), 16, 10)")
              .cast("long"))
          .groupBy(col("lang"))
          .agg(max(col("n")).as("n_docs"),
            max(col("f_scaled")).as("f_scaled"),
            count(lit(1)).as("n_replicas"),
            sum(col("rkey")).as("replica_hash_sum"),
            sum(col("n_chars")).cast("long").as("replica_chars"))
          .withColumn("upsample_ratio", StableRound.r4(
            col("n_replicas").cast("double") / col("n_docs").cast("double")))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH c AS (SELECT lang, count(*) n FROM documents
                   WHERE text IS NOT NULL GROUP BY 1),
        m AS (SELECT max(n) nmax FROM c),
        f AS (SELECT lang, n,
                LEAST(CAST(floor(10000 * sqrt(nmax * 1.0 / n)) AS BIGINT),
                  100000) AS f_scaled
              FROM c, m),
        r AS (SELECT d.lang, d.doc_id, d.n_chars, f.n, f.f_scaled,
                f.f_scaled // 10000 +
                CASE WHEN ('0x' || substring(
                       md5('up0|' || doc_id::VARCHAR), 1, 8))::BIGINT
                     % 10000 < f.f_scaled % 10000 THEN 1 ELSE 0 END AS n_rep
              FROM documents d JOIN f ON d.lang = f.lang
              WHERE d.text IS NOT NULL),
        e AS (SELECT lang, doc_id, n_chars, n, f_scaled,
                unnest(generate_series(0, n_rep - 1)) AS rep
              FROM r),
        k AS (SELECT lang, n, f_scaled, n_chars,
                ('0x' || substring(md5('ord|' || doc_id::VARCHAR || '|'
                  || rep::VARCHAR), 1, 8))::BIGINT AS rkey
              FROM e)
        SELECT lang, max(n) AS n_docs, max(f_scaled) AS f_scaled,
               count(*) AS n_replicas,
               CAST(sum(rkey) AS BIGINT) AS replica_hash_sum,
               CAST(sum(n_chars) AS BIGINT) AS replica_chars,
               floor((count(*)::DOUBLE / max(n)::DOUBLE) * 10000 + 0.5)
                 / 10000 AS upsample_ratio
        FROM k GROUP BY lang ORDER BY lang""")),

    // ── hashed importance resampling (DSIR-style data selection) ────
    // The data-SELECTION op the mixture family (q102/q106 reweight by
    // group) can't express: reweight each DOCUMENT toward a target
    // domain (Xie et al. 2023, "Data Selection for LMs via Importance
    // Resampling", the hashed-n-gram variant). Token unigrams hash
    // into 256 buckets; the target distribution comes from the
    // deterministic 3% hash-band slice (q77's eval-set convention),
    // the proposal from the rest of the corpus; a document's weight
    // is the mean per-token probability ratio and it is kept iff its
    // md5 band falls under the weight — documents that look like the
    // target survive proportionally more often.
    //
    // Everything is INTEGER: bucket scores are Laplace-smoothed ratio
    // estimates in ten-thousandths computed with integer division
    // ((tc+1)(R+256)·10⁴ div (rc+1)(T+256) — fits a long through
    // ~10¹² corpus tokens), per-doc weights are integer-div means of
    // those, so no transcendental or FP value ever enters the hash.
    //
    // Scale shape: ONE token-scale pass collapses to ≤256 rows under
    // map-side combine (the q110 discipline) and collects 2 KiB to
    // the driver; scoring is then a pure NARROW scan — the 256-entry
    // score table rides the closure as an array literal (the q29
    // centroid trick) and per-doc weights fold inside `aggregate`,
    // zero scoring exchange; the rollup is |sources|-bounded.
    "q115_importance_resample" -> QuerySpec(
      build = (s, d) => {
        // NOT spread (r20): one whitespace tokenize per pass is too
        // cheap to buy back the text shuffle (measured ~1.1-1.2× net
        // at sf0.1 when spread); the explode_outer below still keeps
        // the kernel single-evaluation
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          .withColumn("band", hashBand100)
        def bucketOf(t: org.apache.spark.sql.Column) =
          TextQueries.md5Hash60(t).bitwiseAND(lit(255L))
        val bcounts = docs
          .select(col("band"), explode_outer(tokens(col("text"))).as("t"))
          .filter(col("t").isNotNull)
          .groupBy(bucketOf(col("t")).as("b"))
          .agg(sum(when(col("band") < 3, 1L).otherwise(0L)).as("tc"),
            sum(when(col("band") >= 3, 1L).otherwise(0L)).as("rc"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        val tTot = bcounts.values.map(_._1).sum
        val rTot = bcounts.values.map(_._2).sum
        val scores: Array[Long] = Array.tabulate(256) { b =>
          val (tc, rc) = bcounts.getOrElse(b.toLong, (0L, 0L))
          ((tc + 1) * (rTot + 256) * 10000L) / ((rc + 1) * (tTot + 256))
        }
        val scoreLit = typedlit(scores)
        docs.filter(col("band") >= 3)
          .withColumn("_toks", tokens(col("text")))
          .withColumn("_ss", aggregate(
            transform(col("_toks"),
              t => element_at(scoreLit, bucketOf(t).cast("int") + lit(1))),
            lit(0L), (acc, x) => acc + x))
          .withColumn("_w", expr("_ss div size(_toks)"))
          .withColumn("_kept", (expr(
            "conv(substring(md5(concat('dsir0|', cast(doc_id as string))), 1, 8), 16, 10)")
            .cast("long") % 10000 < least(col("_w"), lit(10000L)))
            .cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("_kept")).as("n_kept"),
            sum(col("_w")).as("w_sum"),
            sum(col("_kept") * col("n_chars")).as("kept_chars"))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH t AS (SELECT doc_id, source, n_chars,
                     string_split_regex(trim(text), '\\s+') toks,
                     ${TextQueries.duckHashBand} AS band
                   FROM documents WHERE text IS NOT NULL),
        tok AS (SELECT doc_id, source, band,
                  ((('0x' || substring(md5(tk), 1, 15))::BIGINT) & 255) AS b
                FROM (SELECT doc_id, source, band, unnest(toks) tk FROM t)),
        cnt AS (SELECT b, sum(CASE WHEN band < 3 THEN 1 ELSE 0 END) tc,
                       sum(CASE WHEN band >= 3 THEN 1 ELSE 0 END) rc
                FROM tok GROUP BY b),
        tot AS (SELECT sum(tc) tt, sum(rc) rt FROM cnt),
        sc AS (SELECT g.b,
                 (((coalesce(c.tc, 0) + 1) * (tot.rt + 256) * 10000)
                   // ((coalesce(c.rc, 0) + 1) * (tot.tt + 256))) AS s
               FROM (SELECT unnest(generate_series(0, 255)) b) g
               LEFT JOIN cnt c ON c.b = g.b CROSS JOIN tot),
        dw AS (SELECT tok.doc_id, tok.source, count(*) n_toks, sum(sc.s) ss
               FROM tok JOIN sc ON sc.b = tok.b WHERE tok.band >= 3
               GROUP BY 1, 2),
        w AS (SELECT dw.doc_id, dw.source, (ss // n_toks) AS w,
                CASE WHEN ('0x' || substring(
                       md5('dsir0|' || dw.doc_id::VARCHAR), 1, 8))::BIGINT
                     % 10000 < least(ss // n_toks, 10000)
                     THEN 1 ELSE 0 END kept,
                t.n_chars
              FROM dw JOIN t ON t.doc_id = dw.doc_id)
        SELECT source, count(*) AS n_docs,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               CAST(sum(w) AS BIGINT) AS w_sum,
               CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars
        FROM w GROUP BY source ORDER BY source"""),
      bench = true),

    // ── corpus report card: the sketch family composed (q122) ──────
    // The nightly monitoring query a 100 TB pipeline schedules: per
    // source, document count, total tokens, token-count p50/p90/p99
    // (HIST sketch, doc grain) and a distinct-token estimate (HLL,
    // token grain) — in exactly TWO constant-state exchanges: one
    // carrying 2 KiB histograms per (mapper, source) over doc rows,
    // one carrying 512 B register arrays per (mapper, source) over the
    // raw token stream (HLL needs no pre-distinct: registers are maxes
    // — THE production shape; q104 is the separately-audited twin that
    // proves estimate accuracy next to exact counts). The two
    // |sources|-row results join broadcast. Like its siblings, every
    // reported piece is integer-exact (register summaries, bucket
    // bounds) or the shared r4 rational — DuckDB rebuilds both
    // sketches in full and the report hash-checks bit-for-bit.
    "q122_corpus_report" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        // doc grain: totals + length histogram in ONE groupBy (the
        // null filter mirrors q120's — the two extractions must have
        // identical null behavior for the q122==q120 spec pin)
        val v = docs.select(col("source"),
          token_count(col("text")).cast("long").as("v"))
          .filter(col("v").isNotNull)
        val hist = toC(graft.plans.HistAgg(toE(col("v")))
          .toAggregateExpression())
        val lengths = histQuantiles(
          v.groupBy(col("source")).agg(
            sum(col("v")).as("total_tokens"), hist.as("_h")),
          Seq("total_tokens"))
        // token grain: HLL registers over the raw token stream
        val hll = toC(graft.plans.HllAgg(toE(col("h")))
          .toAggregateExpression())
        val distinct_ = docs
          .select(col("source"), explode(tokens(col("text"))).as("t"))
          .select(col("source"),
            conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
          .groupBy(col("source")).agg(hll.as("_l"))
          .select(col("source"),
            col("_l.sum_ranks").as("sum_ranks"),
            col("_l.zero_regs").as("zero_regs"),
            StableRound.r4(lit(graft.plans.HllAgg.alphaNum) /
              col("_l.s_scaled").cast("double")).as("distinct_tokens_est"))
        lengths.join(broadcast(distinct_), Seq("source"))
          .orderBy("source")
      },
      oracle = Some {
        // HistAgg.loOf's one shared DuckDB transcription
        val loSql = graft.plans.HistAgg.loDuckSql _
        s"""
        WITH t AS ($duckToks),
        v AS (SELECT source, len(toks) AS v FROM t),
        bk AS (SELECT source,
                 CASE WHEN v < 8 THEN v
                      ELSE ((length(bin(v)) - 2) * 4
                            + ((v >> (length(bin(v)) - 3)) & 3))
                 END AS b
               FROM v),
        c AS (SELECT source, b, count(*) c FROM bk GROUP BY 1, 2),
        cum AS (SELECT source, b, c,
                  sum(c) OVER (PARTITION BY source ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
                  sum(c) OVER (PARTITION BY source) total
                FROM c),
        p AS (SELECT source, max(total) n_docs,
                min(CASE WHEN cum * 100 >= 50 * total THEN b END) b50,
                min(CASE WHEN cum * 100 >= 90 * total THEN b END) b90,
                min(CASE WHEN cum * 100 >= 99 * total THEN b END) b99
              FROM cum GROUP BY source),
        tot AS (SELECT source, CAST(sum(v) AS BIGINT) total_tokens
                FROM v GROUP BY 1),
        tok AS (SELECT source, unnest(toks) tk FROM t),
        h AS (SELECT source,
                ('0x' || substring(md5(tk), 1, 15))::BIGINT h60 FROM tok),
        r AS (SELECT source, h60 >> 51 AS idx,
                h60 & ((1::BIGINT << 51) - 1) AS rem FROM h),
        rk AS (SELECT source, idx,
                 CASE WHEN rem = 0 THEN 52
                      ELSE 52 - length(bin(rem)) END AS rnk
               FROM r),
        regs AS (SELECT source, idx, max(rnk) mr FROM rk GROUP BY 1, 2),
        full_regs AS (SELECT l.source, gr.idx, coalesce(regs.mr, 0) mr
               FROM (SELECT DISTINCT source FROM t) l
               CROSS JOIN (SELECT unnest(generate_series(0, 511)) idx) gr
               LEFT JOIN regs ON regs.source = l.source AND regs.idx = gr.idx),
        agg AS (SELECT source,
                  CAST(sum(mr) AS BIGINT) sum_ranks,
                  CAST(sum(CASE WHEN mr = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    zero_regs,
                  CAST(sum(1::BIGINT << (52 - mr)) AS BIGINT) s_scaled
                FROM full_regs GROUP BY 1)
        SELECT p.source, CAST(p.n_docs AS BIGINT) AS n_docs,
               tot.total_tokens,
               ${loSql("b50")} AS p50_lo,
               ${loSql("b90")} AS p90_lo,
               ${loSql("b99")} AS p99_lo,
               a.sum_ranks, a.zero_regs,
               ${StableRound.sql4(
                 s"${graft.plans.HllAgg.alphaNum} / CAST(a.s_scaled AS DOUBLE)")}
                 AS distinct_tokens_est
        FROM p JOIN tot USING (source) JOIN agg a USING (source)
        ORDER BY source"""
      },
      bench = true),

    // ── histogram-sketch quantiles (the DISTRIBUTION sketch) ────────
    // Per-source token-count percentiles from the native log-histogram
    // aggregate (plans/HistAgg) — the fourth mergeable sketch beside
    // HLL (distinct), CMS (frequency), and Bloom (membership): 256
    // longs = 2 KiB of state per group, partials merge by elementwise
    // ADD, so the ONE exchange carries 2 KiB per (mapper, source) no
    // matter how many billions of documents feed it. An exact
    // percentile at 100 TB needs a per-group sort (q81's shape — fine
    // once, wrong as a monitoring query); the sketch answers the
    // production question ("did the length distribution drift?") at
    // report cost. Buckets are pure bit arithmetic (4 geometric
    // sub-buckets per octave, ≤12.5% relative value error, no
    // logarithms), so DuckDB rebuilds every counter bit-for-bit and
    // extracts the same nearest-rank quantiles — the oracle checks the
    // sketch itself, not just row counts. Quantile extraction explodes
    // the 256-bucket array (|sources|×256 rows — bounded) through one
    // cumulative window; reported values are bucket lower bounds.
    "q120_hist_quantiles" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        val v = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("source"),
            token_count(col("text")).cast("long").as("v"))
          .filter(col("v").isNotNull)
        val hist = toC(graft.plans.HistAgg(toE(col("v")))
          .toAggregateExpression())
        histQuantiles(v.groupBy(col("source")).agg(hist.as("_h")), Nil)
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        v AS (SELECT source, len(toks) AS v FROM t),
        bk AS (SELECT source,
                 CASE WHEN v < 8 THEN v
                      ELSE ((length(bin(v)) - 2) * 4
                            + ((v >> (length(bin(v)) - 3)) & 3))
                 END AS b
               FROM v),
        c AS (SELECT source, b, count(*) c FROM bk GROUP BY 1, 2),
        cum AS (SELECT source, b, c,
                  sum(c) OVER (PARTITION BY source ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
                  sum(c) OVER (PARTITION BY source) total
                FROM c),
        p AS (SELECT source, max(total) n_docs,
                min(CASE WHEN cum * 100 >= 50 * total THEN b END) b50,
                min(CASE WHEN cum * 100 >= 90 * total THEN b END) b90,
                min(CASE WHEN cum * 100 >= 99 * total THEN b END) b99
              FROM cum GROUP BY source)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
          CAST(CASE WHEN b50 < 8 THEN b50
               ELSE (4 + (b50 % 4)) << ((b50 // 4) - 1) END AS BIGINT) AS p50_lo,
          CAST(CASE WHEN b90 < 8 THEN b90
               ELSE (4 + (b90 % 4)) << ((b90 // 4) - 1) END AS BIGINT) AS p90_lo,
          CAST(CASE WHEN b99 < 8 THEN b99
               ELSE (4 + (b99 % 4)) << ((b99 // 4) - 1) END AS BIGINT) AS p99_lo
        FROM p ORDER BY source"""),
      bench = true),

    // ── distribution DRIFT between sources (sketch total variation) ─
    // q120 answers "what does each source's length distribution look
    // like"; this answers the monitoring question behind it: "how FAR
    // has each source drifted from the reference?" Per source, the
    // total-variation distance ½·Σ_b |p_b − q_b| between its
    // token-count histogram and src0's (the q128 known-good-reference
    // convention), over the SAME 256-bucket log-histogram sketch
    // (plans/HistAgg). Integer-exact end to end: per-bucket
    // probabilities quantize to millionths by integer division
    // (c·10⁶ div total — deterministic floor in both engines), the
    // TV sum is an order-free integer sum of |p6 − q6|, reported in
    // e4 (div 200 = the ½ and the e6→e4 step together). A drifting
    // source (scrape change, encoding bug, new boilerplate) moves
    // probability mass between buckets and the number rises; src0
    // reports 0 against itself — the row that proves the identity.
    //
    // Scale shape: ONE constant-state exchange (2 KiB per mapper-
    // source) — the same single pass as q120 — then |sources| rows of
    // array arithmetic against the 1-row reference sketch (bounded
    // broadcast cross join); the per-bucket algebra runs in codegen'd
    // higher-order functions over the dense 256-long arrays, so
    // zero-in-one-side buckets are included by construction. DuckDB
    // rebuilds every counter on a source×256 skeleton and replays the
    // identical integer arithmetic.
    "q143_hist_drift" -> QuerySpec(
      build = (s, d) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column => toC, expression => toE}
        val v = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("source"),
            token_count(col("text")).cast("long").as("v"))
          .filter(col("v").isNotNull)
        val hist = toC(graft.plans.HistAgg(toE(col("v")))
          .toAggregateExpression())
        // MEMORY CONTRACT: |sources| rows × 2 KiB — persisted (scoped
        // — released after the query's action) so the reference
        // branch reuses the one corpus-scale histogram pass
        graft.ScopedCache.withScopedCache(v.groupBy(col("source"))
          .agg(hist.as("_h"), count(lit(1)).as("n_docs"))) { sk =>
        val ref = sk.filter(col("source") === "src0")
          .select(col("_h").as("_r"))
        def total(arr: String) =
          s"aggregate($arr, cast(0 as bigint), (a, x) -> a + x)"
        sk.crossJoin(broadcast(ref)) // deliberate bounded cross: 1-row ref
          .withColumn("_ts", expr(total("_h")))
          .withColumn("_tr", expr(total("_r")))
          .withColumn("_tv", expr(
            s"""aggregate(
                  zip_with(_h, _r,
                    (c, r) -> abs((c * 1000000) div _ts
                               - (r * 1000000) div _tr)),
                  cast(0 as bigint), (a, x) -> a + x)"""))
          .select(col("source"), col("n_docs"),
            expr("_tv div 200").as("tv_vs_ref_e4"))
          .orderBy("source")
        }
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        v AS (SELECT source, len(toks) AS v FROM t),
        bk AS (SELECT source,
                 CASE WHEN v < 8 THEN v
                      ELSE ((length(bin(v)) - 2) * 4
                            + ((v >> (length(bin(v)) - 3)) & 3))
                 END AS b
               FROM v),
        c AS (SELECT source, b, count(*) c FROM bk GROUP BY 1, 2),
        skel AS (SELECT s.source, gr.b, coalesce(c.c, 0) c
                 FROM (SELECT DISTINCT source FROM v) s
                 CROSS JOIN (SELECT unnest(generate_series(0, 255)) b) gr
                 LEFT JOIN c ON c.source = s.source AND c.b = gr.b),
        tot AS (SELECT source, CAST(sum(c) AS BIGINT) ts
                FROM skel GROUP BY 1),
        nd AS (SELECT source, count(*) n_docs FROM v GROUP BY 1),
        tv AS (SELECT a.source,
                 CAST(sum(abs((a.c * 1000000) // ta.ts
                              - (r.c * 1000000) // tr.ts)) AS BIGINT) tvsum
               FROM skel a
               JOIN tot ta ON ta.source = a.source
               JOIN skel r ON r.source = 'src0' AND r.b = a.b
               JOIN tot tr ON tr.source = 'src0'
               GROUP BY 1)
        SELECT tv.source, CAST(nd.n_docs AS BIGINT) AS n_docs,
               CAST(tvsum // 200 AS BIGINT) AS tv_vs_ref_e4
        FROM tv JOIN nd ON nd.source = tv.source
        ORDER BY tv.source"""),
      bench = true),

    // ── collocation mining by lift (phrase-candidate discovery) ────
    // The phrase-mining pass a tokenizer pipeline runs BEFORE BPE
    // (q86/q89): which adjacent token pairs co-occur far above chance?
    // Score = lift n_ab·N / (n_a·n_b) over bigram OCCURRENCES (all
    // positions, not per-doc distinct — collocation strength is a
    // token-stream property): n_ab the pair's count, n_a its count as
    // a HEAD, n_b as a NEXT, N total bigrams — all four from ONE
    // bigram table, so the measure is self-consistent (a PMI without
    // the log: same ranking, no transcendentals). Support floor
    // n_ab ≥ 5 kills the noise tail; top 20 by (lift desc, pair asc).
    // The one FP step is the division of exactly-cast integer
    // products — correctly-rounded IEEE in both engines, then r4.
    //
    // Scale shape: ONE token-scale exchange (the bigram groupBy,
    // map-side combined to observed-bigram cardinality); the head/next
    // marginals RIDE that exchange as windows over the aggregated
    // frame (the q138 denominator trick — bigram-scale keyed windows,
    // never a second token-scale pass), and N arrives as a bounded
    // 1-row broadcast cross computed by the narrow Σ(|toks|−1)
    // identity — so nothing is persisted and a long-lived session
    // retains no bigram cache (it used to hold the vocab²-bounded
    // table until session end). Top-20 plans as TakeOrdered.
    "q146_collocations" -> QuerySpec(
      build = (s, d) => {
        // all-occurrence adjacent pairs from the tokens array — a
        // narrow transform+explode, no positional self-join
        val bg = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(tokens(col("text")).as("_t"))
          .select(explode(expr(
            """transform(slice(_t, 1, greatest(size(_t) - 1, 0)),
               (x, i) -> struct(x AS head,
                                element_at(_t, i + 2) AS next_tok))"""))
            .as("b"))
          .select(col("b.head").as("head"), col("b.next_tok").as("next_tok"))
        val bgc = bg.groupBy(col("head"), col("next_tok"))
          .agg(count(lit(1)).as("n_ab"))
        // N by the identity Σ_docs max(|toks|−1, 0) — the exact total
        // of adjacent pairs, from a NARROW corpus scan (no second
        // explode+groupBy pass; ReuseExchange declines to dedupe the
        // bigram subtree across branches, so an agg over bgc would
        // re-pay it). coalesce(0): an all-single-token corpus must
        // yield the oracle's empty top-20, not a null N
        val tot = Tables.documents(s, d).filter(col("text").isNotNull)
          .agg(coalesce(
            sum(greatest(size(tokens(col("text"))) - 1, lit(0))
              .cast("long")), lit(0L)).as("_N"))
        bgc
          .withColumn("n_a", sum(col("n_ab")).over(
            Window.partitionBy(col("head"))))
          .withColumn("n_b", sum(col("n_ab")).over(
            Window.partitionBy(col("next_tok"))))
          .filter(col("n_ab") >= 5)
          .crossJoin(broadcast(tot)) // deliberate bounded cross: 1 row
          .withColumn("lift", StableRound.r4(
            (col("n_ab").cast("double") * col("_N").cast("double")) /
              (col("n_a").cast("double") * col("n_b").cast("double"))))
          .select(col("head"), col("next_tok"), col("n_ab"),
            col("n_a"), col("n_b"), col("lift"))
          .orderBy(col("lift").desc, col("head").asc, col("next_tok").asc)
          .limit(20)
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        bg AS (SELECT toks[i] head, toks[i+1] next_tok
               FROM t, unnest(generate_series(1, greatest(len(toks)-1, 0)))
                 AS u(i)),
        c AS (SELECT head, next_tok, count(*) n_ab FROM bg GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(n_ab) AS BIGINT) n FROM c),
        ha AS (SELECT head, CAST(sum(n_ab) AS BIGINT) n_a FROM c GROUP BY 1),
        nb AS (SELECT next_tok, CAST(sum(n_ab) AS BIGINT) n_b
               FROM c GROUP BY 1)
        SELECT c.head, c.next_tok, CAST(c.n_ab AS BIGINT) AS n_ab,
               ha.n_a, nb.n_b,
               ${StableRound.sql4(
                 """(CAST(c.n_ab AS DOUBLE) * CAST(tot.n AS DOUBLE))
                    / (CAST(ha.n_a AS DOUBLE) * CAST(nb.n_b AS DOUBLE))""")}
                 AS lift
        FROM c JOIN ha USING (head) JOIN nb USING (next_tok)
        CROSS JOIN tot
        WHERE c.n_ab >= 5
        ORDER BY lift DESC, c.head, c.next_tok LIMIT 20"""),
      bench = true),

    // ── padding-waste audit: epoch order vs length bucketing ───────
    // Training batches pad every sequence to the batch max, so batch
    // COMPOSITION is a real token budget: this prices it. Within each
    // of 8 training shards (the q92 sharding domain — batching happens
    // inside a shard's sequential read), documents form batches of 32
    // two ways: in reproducible md5 epoch order (the q92/TrainOrder
    // discipline — effectively random lengths per batch) and sorted
    // by (length, key) — classic length bucketing. Waste per doc =
    // batch_max_len − len; per shard: n_docs, both wastes, and the
    // saving in e4 — the number that decides whether the training
    // loader should trade shuffle-within-shard randomness for
    // bucketed batches. All integer (token counts, integer-div e4).
    //
    // Scale shape: everything is windowed BY SHARD (shard count scales
    // with the corpus, each window sorts one shard — the TrainOrder
    // spill discipline, never a global sort): two rank windows + two
    // batch-max windows, all on the same shard partitioning, one
    // 8-row rollup.
    "q152_padding_waste" -> QuerySpec(
      build = (s, d) => {
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"),
            token_count(col("text")).cast("long").as("len"))
          .withColumn("shard",
            graft.text.TextQueries.hashBand100Of(col("doc_id")) % 8)
          .withColumn("k",
            md5(concat(lit("q152|"), col("doc_id").cast("string"))))
        def wasteOf(order: Seq[org.apache.spark.sql.Column],
                    out: String): org.apache.spark.sql.DataFrame = {
          val w = Window.partitionBy(col("shard")).orderBy(order: _*)
          base
            .withColumn("_rn", row_number().over(w))
            .withColumn("_b", expr("(_rn - 1) div 32"))
            .withColumn("_mx", max(col("len")).over(
              Window.partitionBy(col("shard"), col("_b"))))
            .groupBy(col("shard"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("_mx") - col("len")).as(out))
        }
        val naive = wasteOf(Seq(col("k")), "naive_waste")
        val sorted_ = wasteOf(Seq(col("len"), col("k")), "sorted_waste")
          .drop("n_docs")
        naive.join(sorted_, "shard")
          .select(col("shard"), col("n_docs"), col("naive_waste"),
            col("sorted_waste"),
            when(col("naive_waste") === 0, lit(0L))
              .otherwise(expr(
                "(naive_waste - sorted_waste) * 10000 div naive_waste"))
              .as("saving_e4"))
          .orderBy("shard")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        b AS (SELECT doc_id, len(toks) AS len,
                ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                  % 100 % 8 AS shard,
                md5('q152|' || doc_id::VARCHAR) AS k
              FROM t),
        n AS (SELECT shard, len,
                (row_number() OVER (PARTITION BY shard ORDER BY k) - 1)
                  // 32 AS bb
              FROM b),
        nw AS (SELECT shard, count(*) n_docs,
                 CAST(sum(mx - len) AS BIGINT) naive_waste
               FROM (SELECT shard, len,
                       max(len) OVER (PARTITION BY shard, bb) mx
                     FROM n)
               GROUP BY 1),
        s2 AS (SELECT shard, len,
                 (row_number() OVER (PARTITION BY shard
                    ORDER BY len, k) - 1) // 32 AS bb
               FROM b),
        sw AS (SELECT shard,
                 CAST(sum(mx - len) AS BIGINT) sorted_waste
               FROM (SELECT shard, len,
                       max(len) OVER (PARTITION BY shard, bb) mx
                     FROM s2)
               GROUP BY 1)
        SELECT nw.shard, CAST(nw.n_docs AS BIGINT) AS n_docs,
               nw.naive_waste, sw.sorted_waste,
               CASE WHEN nw.naive_waste = 0 THEN 0
                    ELSE (nw.naive_waste - sw.sorted_waste) * 10000
                         // nw.naive_waste END AS saving_e4
        FROM nw JOIN sw USING (shard)
        ORDER BY nw.shard"""),
      bench = true),

    // ── sequence packing audit: concat-and-chunk vs one-doc-per-row ─
    // q152 prices BATCH padding (pad every sequence to the batch max
    // — the finetune/inference loader); pretraining packs the other
    // way: CONCATENATE the shard's documents in loader order and cut
    // fixed C-token context windows, padding only the shard's last
    // chunk. The cost moves from padding to FRAGMENTATION — documents
    // straddling a chunk boundary get split (attention-mask resets /
    // truncated context). This audit prices both sides per shard:
    // concat waste (n_chunks·C − total, ≤ C−1 per shard), solo waste
    // (each doc alone, padded to ceil(len/C)·C — the no-packing
    // floor), the saving in e4, and the fragmentation bill (docs
    // crossing ≥1 boundary, total crossings). Loader order is the
    // reproducible md5 key — packing happens in EPOCH order, never
    // length-sorted (sorting is q152's trade, not this one's).
    // All-integer: token counts, integer div, e4.
    //
    // Scale shape (the q152/TrainOrder window discipline): ONE
    // cumulative-sum window partitioned by shard ordered by the md5
    // key — a shard-local spillable sort, never a global one (shard
    // count scales with the corpus) — then an 8-row rollup.
    "q177_sequence_packing" -> QuerySpec(
      build = (s, d) => {
        val C = 2048L
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"),
            token_count(col("text")).cast("long").as("len"))
          .filter(col("len") > 0)
          .withColumn("shard",
            TextQueries.hashBand100Of(col("doc_id")) % 8)
          .withColumn("k",
            md5(concat(lit("q177|"), col("doc_id").cast("string"))))
        val w = Window.partitionBy(col("shard")).orderBy(col("k"))
        base
          .withColumn("pos_end", sum(col("len")).over(w))
          .withColumn("xings",
            expr(s"(pos_end - 1) div $C - (pos_end - len) div $C"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("len")).as("total_tokens"),
            expr(s"(sum(len) + ${C - 1}) div $C").as("n_chunks"),
            expr(s"(sum(len) + ${C - 1}) div $C * $C - sum(len)")
              .as("concat_waste"),
            sum(when(col("xings") > 0, 1L).otherwise(0L))
              .as("frag_docs"),
            sum(col("xings")).as("crossings"),
            sum(expr(s"(len + ${C - 1}) div $C * $C - len"))
              .as("solo_waste"))
          .withColumn("saving_e4",
            when(col("solo_waste") === 0, lit(0L))
              .otherwise(expr(
                "(solo_waste - concat_waste) * 10000 div solo_waste")))
          .orderBy("shard")
      },
      oracle = Some(s"""
        WITH t AS ($duckToks),
        b AS (SELECT doc_id, len(toks) AS len,
                ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                  % 100 % 8 AS shard,
                md5('q177|' || doc_id::VARCHAR) AS k
              FROM t WHERE len(toks) > 0),
        c AS (SELECT shard, len,
                sum(len) OVER (PARTITION BY shard ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS pos_end
              FROM b),
        x AS (SELECT shard, len,
                (pos_end - 1) // 2048 - (pos_end - len) // 2048 AS xings
              FROM c),
        g AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len) AS BIGINT) AS total_tokens,
                CAST(count(*) FILTER (xings > 0) AS BIGINT) AS frag_docs,
                CAST(sum(xings) AS BIGINT) AS crossings,
                CAST(sum((len + 2047) // 2048 * 2048 - len) AS BIGINT)
                  AS solo_waste
              FROM x GROUP BY 1)
        SELECT shard, n_docs, total_tokens,
               (total_tokens + 2047) // 2048 AS n_chunks,
               (total_tokens + 2047) // 2048 * 2048 - total_tokens
                 AS concat_waste,
               frag_docs, crossings, solo_waste,
               CASE WHEN solo_waste = 0 THEN CAST(0 AS BIGINT)
                    ELSE (solo_waste -
                          ((total_tokens + 2047) // 2048 * 2048
                           - total_tokens)) * 10000 // solo_waste
               END AS saving_e4
        FROM g ORDER BY shard"""),
      bench = true)
  )

  /** BM25 query-term set shared by q111 (direct) and q116 (index read
    * path): the first 8 distinct terms (token asc) of each doc with
    * doc_id <= 5 — deterministic and cross-engine-identical. */
  /** Nearest-rank p50/p90/p99 bucket lower bounds from a per-source
    * [[graft.plans.HistAgg]] sketch frame (`source`, `_h`, plus any
    * `extra` columns carried through) — ONE definition shared by q120
    * and q122 so the two extractions can't drift. The 256-bucket array
    * explodes to a bounded \|sources\|×256 frame; one cumulative
    * window; quantile = smallest bucket whose cumulative count reaches
    * p% (exact integer comparison, no division); reported value =
    * bucket lower bound (HistAgg.loOf as SQL — cast before the shift,
    * high buckets would overflow an int shift). */
  private def histQuantiles(sk: org.apache.spark.sql.DataFrame,
                            extra: Seq[String]): org.apache.spark.sql.DataFrame = {
    val ex = sk.select(
        (col("source") +: extra.map(col)) :+
          posexplode(col("_h")).as(Seq("b", "c")): _*)
      .filter(col("c") > 0)
    val wCum = Window.partitionBy(col("source")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = ex
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total",
        sum(col("c")).over(Window.partitionBy(col("source"))))
    def pick(p: Int) =
      min(when(col("cum") * 100 >= lit(p.toLong) * col("total"), col("b")))
    // HistAgg.loOf's one shared SQL transcription (the `c > 0` filter
    // above guarantees total > 0, so the picked bucket is never null
    // here and the helper's empty-sketch NULL branch stays dormant)
    def lo(name: String) = expr(graft.plans.HistAgg.loSparkSql(name))
    cum.groupBy(col("source")).agg(
        max(col("total")).as("n_docs"),
        (extra.map(c => first(col(c)).as(c)) ++ Seq(
          pick(50).as("_b50"), pick(90).as("_b90"), pick(99).as("_b99"))): _*)
      .select(
        (col("source") +: col("n_docs") +: extra.map(col)) ++ Seq(
          lo("_b50").as("p50_lo"), lo("_b90").as("p90_lo"),
          lo("_b99").as("p99_lo")): _*)
  }

  private def bm25QueryTerms(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val dtoks = Tables.documents(s, d)
      .filter(col("text").isNotNull && col("doc_id") <= 5)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    graft.operators.TopK.perKey(
      dtoks.select(col("doc_id").as("qid"), explode(col("toks")).as("t"))
        .distinct(),
      Seq("qid"), Seq(col("t").asc), 8)
  }

  /** The UniMax water-filling allocation over (lang, tc) doc rows:
    * budget = 3/4 of total tokens, one-epoch cap, closed-form level
    * via one window pass (rank r saturates iff prefix_r +
    * size_r·(n−r) ≤ min(budget, total); θ = leftover div unsaturated).
    * Returns (lang, n_docs, n_tokens, allocated, epochs_e4). ONE
    * definition for q130 and the facade's UniMax mixture stage. */
  private[graft] def unimaxAllocation(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val c = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("nt"))
    val b = c.agg(sum(col("nt")).as("total"),
      count(lit(1)).as("n"),
      expr("CAST((sum(nt) * 3) div 4 AS BIGINT)").as("budget"))
    val w = Window.orderBy(col("nt").asc, col("lang").asc)
    val ranked = c.crossJoin(broadcast(b))
      .withColumn("r", row_number().over(w))
      .withColumn("pk", sum(col("nt")).over(w))
      .withColumn("sat", (col("pk") + col("nt") * (col("n") - col("r"))
        <= least(col("budget"), col("total"))).cast("int"))
    val lvl = ranked.agg(
      coalesce(sum(when(col("sat") === 1, col("nt"))), lit(0L))
        .as("psat"),
      sum(col("sat")).as("k"), max(col("n")).as("nn"),
      max(col("budget")).as("bb"))
    ranked.crossJoin(broadcast(lvl))
      .withColumn("allocated", when(col("sat") === 1, col("nt"))
        .otherwise(least(col("nt"),
          expr("CAST((bb - psat) div (nn - k) AS BIGINT)"))))
      .withColumn("epochs_e4",
        expr("CAST((allocated * 10000) div nt AS BIGINT)"))
      .select(col("lang"), col("n_docs"), col("nt").as("n_tokens"),
        col("allocated"), col("epochs_e4"))
  }

  /** (doc_id, source, head, next_tok) bigram rows of the non-null
    * documents — the q128 grain, shared with the facade's perplexity
    * stage. */
  private[graft] def docBigrams(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    // spread before the shingle kernel (guide §2.5; no-op at scale);
    // explode_OUTER + null filter keeps the optimizer from inferring a
    // size filter that re-runs the kernel below the projection (the
    // q24 duplication — shingle arrays are containsNull=false, so the
    // forms are row-identical)
    graft.plans.Spread.byKey(docs.filter(col("text").isNotNull),
        col("doc_id"))
      .select(col("doc_id"), col("source"),
        explode_outer(shingles(col("text"), 2)).as("sh"))
      .filter(col("sh").isNotNull)
      .select(col("doc_id"), col("source"),
        split(col("sh"), " ").getItem(0).as("head"),
        split(col("sh"), " ").getItem(1).as("next_tok"))

  /** The capped reference bigram LM over (head, next_tok) rows —
    * q128's model build (counts → per-head totals → top-[[lmCap]]
    * under the bigramCap ordering rule → e4 probability floors ≥ 1).
    * ONE definition for q128 and the facade's perplexity stage. */
  private[graft] def referenceBigramLm(refBi: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    refBi.groupBy(col("head"), col("next_tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("head_total",
        sum(col("cnt")).over(Window.partitionBy(col("head"))))
      .orderBy(col("cnt").desc, col("head").asc, col("next_tok").asc)
      .limit(lmCap)
      .select(col("head"), col("next_tok"),
        greatest(floor(col("cnt") * lit(10000.0) / col("head_total")
          + lit(0.5)).cast("long"), lit(1L)).as("e"))

  /** Per-doc integer-mean LM score: in-model bigrams contribute their
    * e4 probability, out-of-model the Laplace floor 1. Returns
    * (doc_id, source, score_e4); docs without a bigram drop out.
    *
    * Plan shape: the bigram explode is narrow, the lmCap-bounded model
    * broadcasts into a hash join, and map-side combine collapses the
    * groupBy to DOC grain before its exchange — nothing token-scale
    * shuffles. (An in-closure map-literal variant was measured SLOWER
    * at 100× — Spark's GetMapValue linear-scans the 512 entries per
    * bigram, while the broadcast join probes a real hash table.) */
  private[graft] def scoreAgainstLm(docs: org.apache.spark.sql.DataFrame,
      lm: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docBigrams(docs).join(broadcast(lm), Seq("head", "next_tok"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(coalesce(col("e"), lit(1L))).as("se"),
        count(lit(1)).as("nb"))
      .select(col("doc_id"), col("source"),
        expr("CAST(se div nb AS BIGINT)").as("score_e4"))

  /** The per-posting BM25 contribution in integer e4 — ONE definition
    * of the score math for the direct (q111), index (q116/q191) and
    * chunk-grain (q194) paths, so they cannot drift. Expects tf, df,
    * dl, n_docs, avgdl columns. */
  private def bm25E: org.apache.spark.sql.Column = {
    val idf = (col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5))
    val sat = (col("tf") * lit(2.2)) / (col("tf") + lit(1.2) *
      (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
    floor(idf * sat * lit(10000) + lit(0.5)).cast("long")
  }

  /** BM25 scoring + rerank over a joined (qid, doc_id, tf, df, dl,
    * n_docs, avgdl) frame. */
  private def bm25Rank(j: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val scored = j
      .select(col("qid"), col("doc_id"), bm25E.as("e"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("e")).as("score_e4"))
    graft.operators.TopK.perKeyRanked(scored, Seq("qid"),
        Seq(col("score_e4").desc, col("doc_id").asc), 5, "rank")
      .select(col("qid"), col("rank"), col("doc_id"), col("score_e4"))
      .orderBy("qid", "rank")
  }

  /** The BM25 replay CTE chain, ending in `rk(qid, doc_id, score_e4,
    * rank)` — the full ranking the top-5 select reads. ONE definition
    * shared by the q111/q116 oracle and the q127 hybrid-fusion oracle
    * (graft.similarity), so the text side of the fused ranking is
    * by construction the same ranking q111 hashes against. */
  private[graft] lazy val bm25RankCtes: String = s"""t AS ($duckToks),
        dl AS (SELECT doc_id, len(toks) AS dl FROM t),
        terms AS (SELECT doc_id, t, count(*) tf FROM
                    (SELECT doc_id, unnest(toks) t FROM t) GROUP BY 1, 2),
        df AS (SELECT t, count(*) df FROM terms GROUP BY 1),
        stats AS (SELECT CAST(count(*) AS DOUBLE) n_docs,
                    CAST(sum(dl) AS DOUBLE) / count(*) avgdl FROM dl),
        qt0 AS (SELECT doc_id qid, t, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY t) rn
                FROM terms WHERE doc_id <= 5),
        qt AS (SELECT qid, t FROM qt0 WHERE rn <= 8),
        sc AS (SELECT qt.qid, terms.doc_id,
                 CAST(floor(((s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                   ((terms.tf * 2.2) / (terms.tf + 1.2 *
                     (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)))
                   * 10000 + 0.5) AS BIGINT) e
               FROM terms JOIN qt USING (t) JOIN df USING (t)
               JOIN dl ON dl.doc_id = terms.doc_id CROSS JOIN stats s),
        agg AS (SELECT qid, doc_id, CAST(sum(e) AS BIGINT) score_e4
                FROM sc GROUP BY 1, 2),
        rk AS (SELECT qid, doc_id, score_e4, ROW_NUMBER() OVER (
                 PARTITION BY qid ORDER BY score_e4 DESC, doc_id) rank
               FROM agg)"""

  private lazy val bm25OracleSql: String = s"""
        WITH $bm25RankCtes
        SELECT qid, CAST(rank AS INTEGER) rank, doc_id, score_e4
        FROM rk WHERE rank <= 5 ORDER BY qid, rank"""

  /** Shared by q98 (in-session build) and q99 (disk artifact): both
    * must equal this DuckDB recomputation exactly. */
  private lazy val overlapOracleSql: String = {
    val cat8 = (0 until 8).map(k => s"toks[i+$k]").mkString("||' '||")
    s"""
        WITH t AS ($duckToks),
        g AS (SELECT source, unnest(list_transform(
                generate_series(1, greatest(len(toks)-7, 0)), i -> $cat8)) s
              FROM t),
        ps AS (SELECT DISTINCT ('0x' || substring(md5(s), 1, 15))::BIGINT h,
                      source FROM g),
        n AS (SELECT source, count(*) n_sh FROM ps GROUP BY 1)
        SELECT a.source AS src_a, b.source AS src_b,
               count(*) AS n_shared,
               ${StableRound.sql4(
                 "count(*)::DOUBLE / least(min(na.n_sh), min(nb.n_sh))")}
                 AS containment
        FROM ps a JOIN ps b USING (h)
        JOIN n na ON na.source = a.source
        JOIN n nb ON nb.source = b.source
        WHERE a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2"""
  }
}
