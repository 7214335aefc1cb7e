package graft

import org.apache.spark.sql.SparkSession

/** The SQL-only user path: a session created with GraftExtensions can
  * call every custom expression from pure SQL — no Column API, no
  * manual registry pokes. */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql can call all injected functions") {
    val base = spark // ensure the shared context exists first
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session over the SAME SparkContext, with extensions applied
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base, "expected a fresh SparkSession with extensions")

      val row = s.sql("""
        SELECT rut_is_valid('12345678-5')          AS v_ok,
               rut_is_valid('12345678-0')          AS v_bad,
               rut_format('12.345.678-5')          AS fmt,
               cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos_same,
               ws_tokenize('  a  b\tc ')           AS toks,
               word_shingles(ws_tokenize('a b c d'), 3) AS sh,
               vocab_hits(ws_tokenize('the cat the'), array('the')) AS hits
      """).head()

      assert(row.getBoolean(0) === true)
      assert(row.getBoolean(1) === false)
      assert(row.getString(2) === "12345678-5")
      assert(math.abs(row.getDouble(3) - 1.0) < 1e-12)
      assert(row.getSeq[String](4) === Seq("a", "b", "c"))
      assert(row.getSeq[String](5) === Seq("a b c", "b c d"))
      assert(row.getInt(6) === 2)

      // the sketch kernels: values must agree with the Column API
      // mixed case + whitespace runs: the SQL winnow must apply the
      // SAME text normalization as the Column API (a raw-text variant
      // would only agree on already-normalized inputs)
      val row2 = s.sql("""
        SELECT simhash16(ws_tokenize('a b c'))                AS sh16,
               shingle_hashes(ws_tokenize('a b c d'), 3)      AS shh,
               minhash_signature(ws_tokenize('a b c d e'), 3) AS mh,
               winnow(' AbC  deFGhij ', 5, 4)                 AS wf
      """).head()
      import org.apache.spark.sql.functions.{col, lit}
      val viaCols = s.createDataFrame(Seq(Tuple1("x"))).toDF("t").select(
        graft.text.TextFunctions.simhash(lit("a b c")).as("sh16"),
        graft.text.TextFunctions.shingle_hashes(lit("a b c d"), 3).as("shh"),
        graft.text.TextFunctions.minhash_signature(lit("a b c d e"), 3).as("mh"),
        graft.text.TextFunctions.winnow_fingerprints(lit(" AbC  deFGhij "), 5, 4).as("wf"))
        .head()
      assert(row2.getLong(0) === viaCols.getLong(0))
      assert(row2.getSeq[Long](1) === viaCols.getSeq[Long](1))
      assert(row2.getSeq[Long](2) === viaCols.getSeq[Long](2))
      assert(row2.getSeq[Long](3) === viaCols.getSeq[Long](3))

      // the sketch AGGREGATE family from pure SQL: the registry
      // builder returns the bare TypedImperativeAggregate and the
      // analyzer wraps it — verify against driver-side replays of the
      // same three hashes
      val hs = Seq("a", "b", "c").map { t =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16)
      }
      val row3 = s.sql(s"""
        SELECT hll_registers(h) AS hll, cms_counters(h) AS cms,
               bloom_bits(h) AS bloom, hist_counts(h) AS hist,
               hll_reg_array(h) AS hra, count_sketch(h) AS csk
        FROM (VALUES (${hs(0)}L), (${hs(1)}L), (${hs(2)}L)) AS v(h)
      """).head()
      val regs = new Array[Int](512)
      val cnt = new Array[Long](1024)
      val bits = new Array[Long](128)
      val hbk = new Array[Long](256)
      hs.foreach { h =>
        val idx = (h >>> 51).toInt
        val rem = h & ((1L << 51) - 1)
        val rank = if (rem == 0L) 52
          else 52 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
        if (rank > regs(idx)) regs(idx) = rank
        for (j <- 0 until 4) cnt(j * 256 + ((h >>> (8 * j)) & 255L).toInt) += 1L
        for (f <- 0 until 4) {
          val b = ((h >>> (13 * f)) & 8191L).toInt
          bits(b >>> 6) |= 1L << (b & 63)
        }
        // independent re-derivation of the log-histogram bucket
        val hb = if (h < 8L) h.toInt else {
          val bl = 64 - java.lang.Long.numberOfLeadingZeros(h)
          ((bl - 2) << 2) | ((h >>> (bl - 3)) & 3L).toInt
        }
        hbk(hb) += 1L
      }
      val hll = row3.getStruct(0)
      assert(hll.getLong(0) === regs.map(_.toLong).sum)
      assert(hll.getLong(1) === regs.count(_ == 0).toLong)
      assert(hll.getLong(2) === regs.map(x => 1L << (52 - x)).sum)
      assert(row3.getSeq[Long](1) === cnt.toSeq)
      assert(row3.getSeq[Long](2) === bits.toSeq)
      assert(row3.getSeq[Long](3) === hbk.toSeq)
      // the register-ARRAY variant must carry the same registers the
      // scalar summaries were computed from
      assert(row3.getSeq[Long](4) === regs.map(_.toLong).toSeq)
      // the SIGNED sketch: same cells as CMS but ±1 by hash bit 32+j
      val sgn = new Array[Long](1024)
      hs.foreach { h =>
        for (j <- 0 until 4)
          sgn(j * 256 + ((h >>> (8 * j)) & 255L).toInt) +=
            (if (((h >>> (32 + j)) & 1L) == 1L) 1L else -1L)
      }
      assert(row3.getSeq[Long](5) === sgn.toSeq)

      // the generator (UDTF) path: LATERAL VIEW over the injected fn
      val gen = s.sql("""
        SELECT pos, shingle
        FROM (SELECT 'a b c d' AS t)
        LATERAL VIEW explode_shingles(ws_tokenize(t), 2) g AS pos, shingle
      """).collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(gen === Seq((0, "a b"), (1, "b c"), (2, "c d")))
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }
}
