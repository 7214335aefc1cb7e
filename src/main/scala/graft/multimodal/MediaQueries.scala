package graft.multimodal

import org.apache.spark.sql.functions._
import graft.analytics.QuerySpec

/** Oracle-checked queries over the binary media view (multimodal
  * surface). The bytes are real `binary` columns; DuckDB mirrors the
  * view with `encode(text)` so byte lengths and frame math check
  * exactly. The REAL codec paths are oracle-checked where the math is
  * cross-engine-expressible (q101 hash-checks the WAV decode against
  * DuckDB's byte-length duration arithmetic); the remaining stub paths
  * (video decode, stub resize) are covered by MultimodalSpec instead —
  * a fake codec has no SQL oracle.
  */
object MediaQueries {

  private val duckKind =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  /** Hard per-bucket occupancy cap for the q85 pair expansion (q24's
    * df-cap trick): a degenerate corpus of near-identical assets drops
    * its hottest buckets instead of OOMing an executor. Declared BEFORE
    * [[queries]] — the oracle SQL interpolates it at object init, and
    * a later declaration would read 0 into the WHERE clause. */
  val maxBucketOccupancy = 1024

  /** Deterministic "re-upload twin" planted in the q85/q113 media
    * view: every `mirrorEvery`-th asset also appears under a mirror
    * id. Real media corpora contain re-uploads of the same bytes; the
    * driver's small-SF corpora (sf0.001/sf0.01) contain ZERO natural
    * byte-identical texts, so without the twin the near-dup queries
    * hash-matched on an EMPTY result — vacuously green (r8 verdict).
    * With it the duplicate-pair path is exercised at every SF: 2
    * planted pairs at 500 docs, 20 at 5000, on top of natural dups.
    * Both constants interpolate into the DuckDB oracle at object
    * init. */
  val mirrorEvery = 250
  val mirrorIdOffset = 1000000000L

  /** q113's artifact name encodes the PIPELINE parameters (band width,
    * mirror period) alongside the `Artifacts` dataset-content key: the
    * dataset fingerprint alone can't see a code-level change to the
    * pair derivation, and a stale artifact would silently serve the
    * old pipeline's pairs. */
  val mediaPairArtifactName = s"media_neardup_pairs_b12m$mirrorEvery"

  /** Shared q85/q113 oracle: the full embed → band → cap → cosine
    * pipeline replayed in DuckDB. */
  private lazy val mediaNearDupOracleSql: String = {
    import graft.similarity.SimilarityQueries.planes24
    def sqlPlane(p: Int) =
      "[" + planes24(p).map(v => String.format(java.util.Locale.ROOT,
        "%.3f", Double.box(v))).mkString(", ") + "]::DOUBLE[]"
    def bandExpr(band: Int) = (0 until 12).map(j =>
      s"(CASE WHEN list_cosine_similarity(emb, ${sqlPlane(band * 12 + j)}) >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    val hexCat = (1 to 4).map(k => s"md5(text || chr($k))")
      .mkString(" || ")
    s"""
        WITH m0 AS (
          SELECT doc_id, $duckKind AS kind,
                 octet_length(encode(text)) AS blen, $hexCat AS hx
          FROM documents WHERE text IS NOT NULL),
        m AS (
          SELECT doc_id AS vec_id, kind, blen, hx FROM m0
          UNION ALL
          SELECT doc_id + $mirrorIdOffset, kind, blen, hx FROM m0
          WHERE doc_id % $mirrorEvery = 0),
        e AS (
          SELECT vec_id, kind, blen, list_transform(generate_series(0, 63),
            j -> (CAST('0x' || substring(hx, 2*j + 1, 2) AS INTEGER)
                  - 127.5) / 127.5) AS emb
          FROM m),
        b AS (
          SELECT vec_id, kind, blen, emb, 0 AS band, ${bandExpr(0)} AS bucket
          FROM e
          UNION ALL
          SELECT vec_id, kind, blen, emb, 1 AS band, ${bandExpr(1)} AS bucket
          FROM e),
        occ AS (SELECT kind, blen, band, bucket, count(*) n
                FROM b GROUP BY 1, 2, 3, 4),
        cand AS (
          SELECT DISTINCT x.vec_id ma, y.vec_id mb,
                 floor(list_cosine_similarity(x.emb, y.emb) * 10000 + 0.5)
                   / 10000 AS cos
          FROM b x JOIN b y
            ON x.kind = y.kind AND x.blen = y.blen AND x.band = y.band
               AND x.bucket = y.bucket AND x.vec_id < y.vec_id
          JOIN occ o ON o.kind = x.kind AND o.blen = x.blen
               AND o.band = x.band AND o.bucket = x.bucket
          WHERE o.n <= $maxBucketOccupancy)
        SELECT ma, mb, cos FROM cand WHERE cos > 0.9 ORDER BY ma, mb"""
  }

  val queries: Map[String, QuerySpec] = Map(

    // ── binary columns + typed metadata: per-kind byte statistics ──
    "q45_media_meta" -> QuerySpec(
      build = (s, d) => MediaOps.mediaFromDocuments(s, d)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("bytes"))).as("sum_bytes"),
          max(col("meta.durationMs")).as("max_duration_ms"),
          min(length(col("bytes"))).as("min_bytes"))
        .orderBy("kind"),
      oracle = Some(s"""
        SELECT $duckKind AS kind, count(*) AS n,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
               CAST(max(length(text) * 4) AS BIGINT) AS max_duration_ms,
               CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes
        FROM documents WHERE text IS NOT NULL
        GROUP BY 1 ORDER BY kind""")),

    // ── frame sampling: video -> one row per sampled frame ─────────
    // narrow explode(sequence) — frame math is integral on both sides
    "q46_frame_sample" -> QuerySpec(
      build = (s, d) => MediaOps.mediaFromDocuments(s, d)
        .filter(col("kind") === "video")
        .withColumn("n_frames", expr("meta.durationMs div 1000"))
        .filter(col("n_frames") >= 1)
        .select(col("media_id"),
          explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("media_id")).as("n_videos"),
          sum(col("frame_idx")).as("sum_idx")),
      oracle = Some(s"""
        WITH v AS (
          SELECT doc_id AS media_id, (length(text) * 4) // 1000 AS n
          FROM documents WHERE text IS NOT NULL
            AND ($duckKind) = 'video' AND (length(text) * 4) // 1000 >= 1),
        f AS (SELECT media_id, unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS frame_idx FROM v)
        SELECT count(*) AS n_frames, count(DISTINCT media_id) AS n_videos,
               CAST(sum(frame_idx) AS BIGINT) AS sum_idx
        FROM f""")),

    // ── media near-dup: fingerprint embed → hyperplane LSH → cosine ─
    // The multimodal twin of q67: embed every asset, bucket by
    // random-hyperplane bands (the wider 12-bit family), exact-cosine
    // only the bucket collisions. Identical bytes → identical
    // embedding → cos 1.0, so exact-duplicate assets always pair.
    //
    // The embedding here is [[md5Embed]] — a deterministic byte
    // fingerprint both engines compute bit-for-bit, which makes the
    // whole pipeline (embed → 12-bit banding → occupancy cap → cosine
    // rerank) HASH-CHECKED against DuckDB, the q67 recipe. The
    // codec-based embed (real javax.imageio features for images, stub
    // for av) drives the same mediaNearDupPairs in MultimodalSpec —
    // the near-dup operator is embedding-agnostic.
    "q85_media_neardup" -> QuerySpec(
      // payload byte length as an extra blocking key: lossless for
      // the fingerprint embedding (md5 avalanche — different-length
      // payloads never embed alike), and it keeps bucket occupancy
      // flat as the corpus grows instead of n/buckets-linear. The
      // candidate harvest uses the operator's scoped embedding cache
      // (the round-10 default); the previous raw-bytes re-scan
      // override measured 14.6 vs the cache's 12.9 s warm at 100×.
      build = (s, d) => mediaNearDupPairs(q85Embeddings(s, d),
        blockCols = Seq("blen")),
      oracle = Some(mediaNearDupOracleSql),
      bench = true),

    // ── REAL audio decode, hash-checked cross-engine ────────────────
    // Every document's UTF-8 bytes become the PCM payload of a real
    // 16-bit mono 16 kHz WAV (JdkAudioCodec.wavWrap), which the
    // distributed decode then reads back through javax.sound.sampled.
    // The metadata deliberately LIES (rate 0, duration 0): the only
    // way the output can match the oracle — which recomputes duration
    // from the byte length with integer math — is a true header parse
    // and frame count. The image twin of this trick is
    // MultimodalSpec's "meta lies" PNG test; here it is oracle-grade.
    "q101_audio_decode" -> QuerySpec(
      build = (s, d) => {
        import s.implicits._
        val recs = s.read.parquet(s"$d/documents.parquet")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, t) =>
            MediaOps.MediaRecord(id, "audio",
              MediaOps.JdkAudioCodec.wavWrap(t.getBytes("UTF-8"), 16000),
              MediaOps.MediaMeta("wav", 0, 0, 0, 0L))
          }
        MediaOps.decode(recs, dim = 8)
          .groupBy((col("media_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(col("durationMs")).as("sum_ms"),
            min(col("sampleRate")).as("min_rate"),
            max(col("sampleRate")).as("max_rate"))
          .orderBy("bucket")
      },
      oracle = Some("""
        SELECT doc_id % 10 AS bucket, count(*) AS n,
               CAST(sum((octet_length(encode(text)) // 2) * 1000 // 16000)
                 AS BIGINT) AS sum_ms,
               CAST(16000 AS INTEGER) AS min_rate,
               CAST(16000 AS INTEGER) AS max_rate
        FROM documents WHERE text IS NOT NULL
        GROUP BY 1 ORDER BY 1""")),

    // ── REAL video decode, hash-checked cross-engine ────────────────
    // The q101 recipe applied to video: every document becomes a real
    // MJPEG/AVI container (aviWrap) holding 1 + doc_id % 3 genuine
    // 16×12 JPEG frames at 10 fps, and the metadata deliberately LIES
    // (width 0, height 0, duration 0). The only way the output can
    // match the oracle — which recomputes everything from doc_id with
    // integer math — is a true RIFF parse: dimensions come from an
    // ImageIO decode of the first frame, duration from the REAL frame
    // count × the header's frame timing, and n_frames from
    // frameSample actually walking the movi chunk list (each sampled
    // frame re-verified as a decodable 16-px-wide JPEG via sum_fw).
    // Verification query (bench=false): the JPEG encode of the inputs
    // dominates, not the operator under test.
    "q109_video_decode" -> QuerySpec(
      build = (s, d) => {
        import s.implicits._
        def recs = s.read.parquet(s"$d/documents.parquet")
          .filter(col("text").isNotNull)
          .select(col("doc_id")).as[Long]
          .map { id =>
            val n = (1 + id % 3).toInt
            val frames = (0 until n).map { i =>
              val img = new java.awt.image.BufferedImage(16, 12,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = img.createGraphics()
              try {
                g.setColor(new java.awt.Color(
                  math.floorMod(id * 31 + i * 101, 256).toInt,
                  math.floorMod(id * 17 + i * 13, 256).toInt,
                  math.floorMod(id * 7 + i * 3, 256).toInt))
                g.fillRect(0, 0, 16, 12)
              } finally g.dispose()
              MediaOps.JdkImageCodec.encodeJpg(img)
            }
            MediaOps.MediaRecord(id, "video",
              MediaOps.JdkVideoCodec.aviWrap(frames, 100000L, 16, 12),
              MediaOps.MediaMeta("avi", 0, 0, 0, 0L)) // metadata LIES
          }
        val dec = MediaOps.decode(recs, dim = 8)
          .groupBy((col("media_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(col("durationMs")).as("sum_ms"),
            min(col("width")).as("min_w"), max(col("width")).as("max_w"),
            min(col("height")).as("min_h"), max(col("height")).as("max_h"))
        // 10 fps + everyMs=100 samples every frame exactly once, so
        // the frame count proves the movi walk and sum_fw proves each
        // sampled payload is an actual decodable JPEG
        val fr = MediaOps.frameSample(recs, everyMs = 100L)
          .map(f => (f.media_id,
            MediaOps.JdkImageCodec.decode(f.frame_bytes)
              .map(_.getWidth).getOrElse(-1)))
          .toDF("media_id", "fw")
          .groupBy((col("media_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n_frames"), sum(col("fw")).as("sum_fw"))
        dec.join(fr, "bucket").orderBy("bucket")
      },
      oracle = Some("""
        SELECT doc_id % 10 AS bucket, count(*) AS n,
               CAST(sum((1 + doc_id % 3) * 100) AS BIGINT) AS sum_ms,
               CAST(16 AS INTEGER) AS min_w, CAST(16 AS INTEGER) AS max_w,
               CAST(12 AS INTEGER) AS min_h, CAST(12 AS INTEGER) AS max_h,
               CAST(sum(1 + doc_id % 3) AS BIGINT) AS n_frames,
               CAST(sum((1 + doc_id % 3) * 16) AS BIGINT) AS sum_fw
        FROM documents WHERE text IS NOT NULL
        GROUP BY 1 ORDER BY 1""")),

    // ── media near-dup pairs as a materialized artifact ────────────
    // The q99/q108 treatment applied to the HEAVIEST pipeline (q85 is
    // 27.6 s at 100× — embed + band + cosine over every asset): media
    // duplicate pairs are consulted repeatedly by curation runs (drop
    // lists, asset dedup reports, cluster builds), so the pair set
    // materializes ONCE per dataset (content-keyed via Artifacts, the
    // pair table is orders of magnitude smaller than the corpus) and
    // this query — the read path every later consumer takes — answers
    // from parquet in artifact-scale time. Same oracle as q85: the
    // read path must reproduce the build path bit-for-bit.
    "q113_media_pair_index" -> QuerySpec(
      build = (s, d) => {
        val dir = graft.text.Artifacts.dir(d, mediaPairArtifactName)
        graft.text.Artifacts.materialize(dir) { tmp =>
          queries("q85_media_neardup").build(s, d)
            .write.mode("overwrite").parquet(tmp.resolve("pairs").toString)
        }
        s.read.parquet(dir.resolve("pairs").toString).orderBy("ma", "mb")
      },
      oracle = Some(mediaNearDupOracleSql),
      bench = true)
  )

  /** The q85 input frame: the media view fingerprint-embedded, with
    * planted re-upload twins (see [[mirrorEvery]]) so the duplicate-
    * pair path is non-vacuous at SFs whose corpora have no natural
    * byte-identical texts. Shared by the q85 build and the PlanSpec
    * pipeline pins. */
  private[graft] def q85Embeddings(s: org.apache.spark.sql.SparkSession,
                                   d: String)
      : org.apache.spark.sql.DataFrame =
    // exchange barrier: without it CollapseProject inlines the
    // 4-md5/64-conv embed expression into each of the 24 band
    // cosines above (24× recompute of the embed per row); one
    // narrow shuffle materializes the vector once instead
    graft.plans.Spread.byKey(q85Bytes(s, d), col("vec_id"))
      .select(col("vec_id"), col("kind"), col("blen"),
        md5Embed(col("bytes")).as("embedding"))
      .repartition(col("vec_id"))

  /** The q85 bytes-level frame under [[q85Embeddings]]: the media view
    * with planted re-upload twins, BEFORE the fingerprint embed — the
    * candidate harvest starts here so its broadcast id probe prunes
    * rows ahead of the embed expression. */
  private[graft] def q85Bytes(s: org.apache.spark.sql.SparkSession,
                              d: String)
      : org.apache.spark.sql.DataFrame = {
    val base = MediaOps.mediaFromDocuments(s, d)
      .select(col("media_id").as("vec_id"), col("kind"),
        length(col("bytes")).as("blen"), col("bytes"))
    base.unionByName(
      base.filter(col("vec_id") % mirrorEvery === 0)
        .withColumn("vec_id", col("vec_id") + lit(mirrorIdOffset)))
  }

  /** Deterministic 64-dim byte-fingerprint embedding, computable
    * bit-for-bit in BOTH engines (Spark: md5 over binary + conv;
    * DuckDB: md5 over the same UTF-8 bytes + hex cast): feature j is
    * the j-th byte of md5(bytes ++ 1) … md5(bytes ++ 4) concatenated,
    * centered to [-1, 1] in exact double arithmetic. NOT a perceptual
    * embedding — it is the cross-engine-checkable stand-in that lets
    * the full q85 LSH pipeline be oracle-verified; byte-identical
    * payloads embed identically (cos 1.0), distinct payloads spread
    * pseudo-randomly. Suffix bytes 1..4 (not 0) — chr(0) is not a
    * valid DuckDB VARCHAR char. */
  private[graft] def md5Embed(bytes: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = concat((1 to 4).map(k =>
      md5(concat(bytes, lit(Array(k.toByte))))): _*)
    array((0 until 64).map(j =>
      (conv(substring(hx, 2 * j + 1, 2), 16, 10).cast("int")
        - lit(127.5)) / lit(127.5)): _*)
  }

  /** LSH near-dup pairs over a (vec_id, kind, embedding) frame —
    * factored so MultimodalSpec drives it with planted duplicates.
    * One bucket groupBy + posting-list pair expansion, never a
    * self-join — and unlike q67 (which blocks on `label`), the media
    * corpus has no small natural blocking key, so the pair-expansion
    * quadratic is tamed by (a) blocking on `kind` plus any caller-
    * provided `blockCols` (q85 adds the payload byte length — lossless
    * for a fingerprint embedding, since differing-length payloads
    * never embed alike anyway), (b) 12-bit bands — 4096 buckets each
    * from the wider plane family (8-bit through round 8; the width
    * cuts candidate-pair counts ~16× and costs no recall for the
    * cos > 0.9 pairs a fingerprint embedding can produce, which are
    * byte-identical and band identically at any width) — and (c) the
    * hard per-bucket [[maxBucketOccupancy]] cap.
    *
    * Memory shape: the bucket groupBy and pair explode carry ONLY
    * vec_ids (16 bytes/pair); embeddings are joined back just for the
    * cosine rerank. Carrying vectors through the posting lists — the
    * q67 trick — is right when blocking keeps buckets tiny, but here a
    * full bucket's pair array would hold occupancy²/2 × two vectors
    * (~200 MB per generator row at a few hundred occupants) and OOM
    * the executor before the cap ever binds. */
  def mediaNearDupPairs(emb: org.apache.spark.sql.DataFrame,
                        blockCols: Seq[String] = Nil,
                        candEmbed: Option[org.apache.spark.sql.DataFrame =>
                          org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import graft.similarity.VectorFunctions.cosine
    // a zero-norm embedding (empty payload) has NaN cosine with every
    // plane AND every candidate; NaN compares greater-than in Spark,
    // so it would land in a bucket and pass the cos filter as a
    // spurious pair — drop degenerate vectors before banding.
    // SCOPED cache: the frame feeds the banding pipeline AND the
    // candidate harvest; both are forced eagerly below (localCheckpoint),
    // so the cache lives only for this call — unpersisted before the
    // (pair-scale, checkpoint-backed) result returns. This replaced a
    // second raw-bytes corpus pass for the harvest (min-of-4 warm at
    // 100×: 14.6 → 12.9 s, and one corpus pass fewer either way).
    // cache BELOW the degenerate-vector filter: a filter on the
    // embedding column pushes through the repartition barrier and
    // below the embed projection (alias substitution), re-running the
    // whole fingerprint embed once per conjunct in the scan stage
    // (guide §4.4's duplication, expression flavor). The
    // InMemoryRelation is a pushdown barrier, so caching the raw embed
    // output evaluates the kernel exactly once; the filter then costs
    // an exists() over 64 cached doubles per consumer scan.
    val cleanBase = emb.persist()
    val clean = cleanBase
      .filter(col("embedding").isNotNull &&
        exists(col("embedding"), x => x =!= 0.0f))
    try {
      // Rerank join shape: joining the corpus-scale embedding frame to
      // the pair list twice plans two sort-merge joins — two full sorts
      // + three exchanges of the embedding table (~70% of q85's 100×
      // wall time when measured). The pair set is PAIR-scale (bounded
      // by the occupancy cap) and three consumers need it (the result's
      // left side and both candidate harvests), so pin it once with
      // localCheckpoint (the q82 in-query rebase precedent): the
      // corpus-scale banding pipeline executes exactly once, and AQE
      // never has to rediscover that three identical exchange subtrees
      // are one stage.
      val pairs = graft.Checkpoints.cut(
        candidatePairs(clean, blockCols))
      val ids = pairs
        .select(explode(array(col("ma"), col("mb"))).as("vec_id")).distinct()
      // candidate embeddings: a broadcast hash probe of the pair-scale
      // id set against the CACHED embedding frame the banding pass just
      // materialized, harvested down to pair scale and pinned — the
      // rerank below touches only checkpointed tiny frames through
      // broadcast joins. Callers whose cache would not fit pass
      // `candEmbed` to harvest from their own cheaper source instead.
      val cand = candEmbed.getOrElse((i: org.apache.spark.sql.DataFrame) =>
          clean.select(col("vec_id"), col("embedding"))
            .join(broadcast(i), "vec_id"))
        .andThen(graft.Checkpoints.cut).apply(ids)
      pairs
        .join(broadcast(cand.select(col("vec_id").as("ma"),
          col("embedding").as("ea"))), "ma")
        .join(broadcast(cand.select(col("vec_id").as("mb"),
          col("embedding").as("eb"))), "mb")
        .select(col("ma"), col("mb"),
          graft.analytics.StableRound.r4(cosine(col("ea"), col("eb"))).as("cos"))
        .filter(col("cos") > 0.9)
        .orderBy("ma", "mb")
    } finally cleanBase.unpersist(false)
  }

  /** The declarative candidate-pair pipeline under [[mediaNearDupPairs]]
    * (band → occupancy cap → pair expansion), corpus-scale and
    * checkpoint-free — exposed so PlanSpec can pin its one-exchange
    * shape (TopKPerKey advertising its child partitioning into the
    * bucket groupBy) on the plan that actually runs. */
  private[graft] def candidatePairs(clean: org.apache.spark.sql.DataFrame,
                                    blockCols: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import graft.similarity.SimilarityQueries.hyperplaneBand12
    val block = "kind" +: blockCols
    val banded = clean
      .select(col("vec_id") +: block.map(col) :+
        posexplode(array(hyperplaneBand12(col("embedding"), 0),
          hyperplaneBand12(col("embedding"), 1))).as(Seq("band", "bucket")): _*)
    // pre-cap each bucket with the bounded-heap operator BEFORE the
    // list materializes: a degenerate hot bucket retains exactly
    // cap+1 rows (the marker that it overflowed) instead of building
    // an unbounded collect_list buffer; the size filter below then
    // drops overflowed buckets entirely, which is byte-identical to
    // filtering on the true occupancy
    val grp = block ++ Seq("band", "bucket")
    graft.operators.TopK.perKey(banded,
        grp, Seq(col("vec_id").asc), maxBucketOccupancy + 1)
      .groupBy(grp.map(col): _*)
      .agg(array_sort(collect_list(col("vec_id"))).as("docs"))
      .filter(size(col("docs")) > 1 &&
        size(col("docs")) <= maxBucketOccupancy)
      .select(explode(graft.text.TextQueries.pairExpand(col("docs"))).as("p"))
      .select(col("p.x").as("ma"), col("p.y").as("mb"))
      .distinct() // a pair can collide in both bands — rerank it once
  }
}
