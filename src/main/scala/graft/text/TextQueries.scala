package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.analytics.{QuerySpec, Tables}
import TextFunctions._

/** Text-analysis + dedup query surface over the `documents` table
  * (BASELINE north star: dedup / text analysis for LLM-data pipelines).
  *
  * All sketches hash with md5 so DuckDB replicates them bit-for-bit —
  * the MinHash-LSH dedup is exact-oracle-checked end to end, not just
  * rows-counted.
  */
object TextQueries {

  // DuckDB fragments mirrored from TextFunctions (kept adjacent so the
  // two stay in sync).
  private val duckToks = """string_split_regex(trim(text), '\s+')"""
  private def duckVocabHits(vocab: Seq[String]) =
    s"len(list_filter($duckToks, t -> t IN (${vocab.map("'" + _ + "'").mkString(",")})))"
  private val duckPunct =
    "length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))"

  /** Shared shingle CTE: distinct 3-word shingles per doc. */
  private val duckShingles =
    """t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') toks
      |       FROM documents),
      |sh AS (SELECT doc_id, lang, unnest(dsh) s, len(dsh) n FROM (
      |  SELECT doc_id, lang, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks)-2, 0)),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) dsh
      |  FROM t))""".stripMargin

  /** Spark-side distinct 3-shingles exploded: (doc_id, lang, s, n). */
  private def sparkShingles(s: SparkSession, d: String): DataFrame = {
    val dsh = array_distinct(shingles(col("text"), 3))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), dsh.as("dsh"))
      .select(col("doc_id"), col("lang"), explode(col("dsh")).as("s"),
        size(col("dsh")).as("n"))
  }

  val queries: Map[String, QuerySpec] = Map(

    // ── token statistics (token counting, BPE-ish subwords) ────────
    "q20_token_stats" -> QuerySpec(
      build = (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        token_count(col("text")).as("n_tokens"),
        subword_count(col("text")).as("n_subwords"),
        mean_token_len(col("text")).as("mean_tok_len"),
        punct_count(col("text")).as("n_punct"))
        .orderBy("doc_id"),
      oracle = Some(s"""
        SELECT doc_id,
               len($duckToks) AS n_tokens,
               CAST(list_sum(list_transform($duckToks,
                 w -> CAST(ceil(length(w)/4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
               floor(list_sum(list_transform($duckToks, w -> length(w))) * 1.0
                 / len($duckToks) * 10000 + 0.5) / 10000 AS mean_tok_len,
               $duckPunct AS n_punct
        FROM documents ORDER BY doc_id"""),
      bench = true),

    // ── language ID heuristic + quality scoring ────────────────────
    "q21_lang_quality" -> QuerySpec(
      build = (s, d) => Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        lang_id(col("text")).as("lang_guess"),
        quality_score(col("text")).as("quality"))
        .orderBy("doc_id"),
      oracle = Some {
        val hits = stopwords.map { case (l, v) => l -> duckVocabHits(v) }
        val best = hits.map(_._2).reduce((a, b) => s"greatest($a, $b)")
        val cases = hits.map { case (l, h) =>
          s"WHEN $h = best AND best > 0 THEN '$l'"
        }.mkString(" ")
        val allStops = duckVocabHits(stopwords.flatMap(_._2))
        s"""
        SELECT doc_id, lang,
               CASE $cases ELSE 'und' END AS lang_guess,
               floor((0.3 * least(len($duckToks) / 100.0, 1.0)
                   + 0.4 * (1.0 - ($duckPunct) * 1.0 / greatest(length(text), 1))
                   + 0.3 * least($allStops * 1.0 / greatest(len($duckToks), 1) * 5.0, 1.0))
                 * 10000 + 0.5) / 10000 AS quality
        FROM (SELECT *, $best AS best FROM documents)
        ORDER BY doc_id"""
      },
      bench = true),

    // ── document fingerprinting + exact dedup ──────────────────────
    "q22_fingerprint" -> QuerySpec(
      build = (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        doc_fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id""")),

    "q23_dedup_exact" -> QuerySpec(
      build = (s, d) => {
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), doc_fingerprint(col("text")).as("fp"))
          .withColumn("rn", row_number().over(w))
          .groupBy()
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("rn") === 1, 1).otherwise(0)).as("n_kept"),
            sum(when(col("rn") > 1, 1).otherwise(0)).as("n_dropped"))
      },
      oracle = Some("""
        SELECT count(*) AS n_docs,
               CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM (SELECT ROW_NUMBER() OVER (
                PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                ORDER BY doc_id) rn
              FROM documents)""")),

    // ── n-gram Jaccard near-dup (inverted shingle index join) ──────
    // Correctness path; the scale path is q25 (LSH avoids the f²
    // posting-list blowup of the naive join).
    "q24_jaccard_pairs" -> QuerySpec(
      build = (s, d) => {
        val sh = sparkShingles(s, d)
        val a = sh.select(col("doc_id").as("da"), col("lang"),
          col("s").as("sa"), col("n").as("na"))
        val b = sh.select(col("doc_id").as("db"), col("lang").as("_lb"),
          col("s").as("sb"), col("n").as("nb"))
        a.join(b, col("sa") === col("sb") && col("lang") === col("_lb") &&
            col("da") < col("db"))
          .groupBy(col("da"), col("db"))
          .agg(count(lit(1)).as("shared"),
            first(col("na")).as("_na"), first(col("nb")).as("_nb"))
          .withColumn("jaccard", graft.analytics.StableRound.r4(
            col("shared").cast("double") /
            (col("_na") + col("_nb") - col("shared"))))
          .filter(col("jaccard") >= 0.3)
          .select(col("da"), col("db"), col("shared"), col("jaccard"))
          .orderBy("da", "db")
      },
      oracle = Some(s"""
        WITH $duckShingles,
        p AS (SELECT a.doc_id da, b.doc_id db, count(*) shared,
                     any_value(a.n) na, any_value(b.n) nb
              FROM sh a JOIN sh b
                ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
        SELECT da, db, shared,
               floor(shared * 1.0 / (na + nb - shared) * 10000 + 0.5) / 10000 AS jaccard
        FROM p WHERE floor(shared * 1.0 / (na + nb - shared) * 10000 + 0.5) / 10000 >= 0.3
        ORDER BY da, db""")),

    // ── MinHash + LSH banding near-dup (the 100 TB dedup path) ─────
    // 16 md5-derived min-hashes per doc, 8 bands of 2; candidates =
    // bucket collisions. Linear in corpus size: shingle explode ->
    // per-(doc, seed) min -> band hash -> self-join on tiny buckets.
    "q25_minhash_lsh" -> QuerySpec(
      build = (s, d) => {
        val seeds = (0 until 16)
        val sh = sparkShingles(s, d)
          .select(col("doc_id"), col("s"),
            explode(typedlit(seeds.toArray)).as("seed"))
          .select(col("doc_id"), col("seed"),
            md5(concat(col("seed").cast("string"), lit("|"), col("s"))).as("h"))
        val mh = sh.groupBy(col("doc_id"), col("seed")).agg(min(col("h")).as("mh"))
        val bands = mh
          .withColumn("band", floor(col("seed") / 2).cast("int"))
          .groupBy(col("doc_id"), col("band"))
          // deterministic within-band order: seed asc == mh of even seed
          // first; md5 of 'mh0|mh1'
          .agg(md5(concat_ws("|",
            array_sort(collect_list(struct(col("seed"), col("mh"))))
              .getField("mh"))).as("bh"))
        val x = bands.select(col("doc_id").as("da"), col("band"), col("bh"))
        val y = bands.select(col("doc_id").as("db"), col("band").as("_b2"),
          col("bh").as("_bh2"))
        x.join(y, col("band") === col("_b2") && col("bh") === col("_bh2") &&
            col("da") < col("db"))
          .select("da", "db").distinct()
          .orderBy("da", "db")
      },
      oracle = Some(s"""
        WITH $duckShingles,
        mh AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || '|' || s)) mh
               FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) seed) seeds
               GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 band,
                         md5(string_agg(mh, '|' ORDER BY seed)) bh
                  FROM mh GROUP BY doc_id, seed // 2)
        SELECT DISTINCT a.doc_id da, b.doc_id db
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        ORDER BY da, db"""),
      bench = true),

    // ── SimHash (16-bit, md5-derived) per document ─────────────────
    "q26_simhash" -> QuerySpec(
      build = (s, d) => {
        val bits = (0 until 16)
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(tokens(col("text")))).as("t"))
          .withColumn("h", md5(col("t")))
          .select(col("doc_id"), col("h"), explode(typedlit(bits.toArray)).as("b"))
          // hex nibble at position b/4, bit b%4 within it
          .withColumn("bit", expr(
            """shiftright(instr('0123456789abcdef',
              |  substring(h, cast(b/4 as int) + 1, 1)) - 1,
              |  cast(b % 4 as int)) % 2""".stripMargin))
        tok.groupBy(col("doc_id"), col("b"))
          .agg(sum(col("bit") * 2 - 1).as("v"))
          .groupBy(col("doc_id"))
          .agg(sum(when(col("v") > 0,
            expr("shiftleft(cast(1 as bigint), b)")).otherwise(0L)).as("simhash"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, md5(unnest(list_distinct(
            string_split_regex(trim(text), '\s+')))) h
          FROM documents),
        tb AS (
          SELECT doc_id, b,
            ((strpos('0123456789abcdef', substring(h, b // 4 + 1, 1)) - 1)
              >> (b % 4)) % 2 AS bit
          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) b) bits),
        bitsum AS (
          SELECT doc_id, b, sum(bit * 2 - 1) v FROM tb GROUP BY doc_id, b)
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
        FROM bitsum GROUP BY doc_id ORDER BY doc_id"""))
  )
}
