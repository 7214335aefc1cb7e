package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native text kernels must be drop-in replacements for the
  * built-in compositions they replaced — these properties pin that
  * equivalence on adversarial generated inputs (whitespace runs,
  * unicode, empties), plus an independent re-derivation of the
  * minhash pieces. Each property evaluates every sample in ONE Spark
  * job: both formulations as adjacent columns, compared row by row.
  */
class TextKernelsSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val weird = Gen.oneOf(" ", "\t", "\n", "a", "bb", "ü", "日本", ".",
    "word", "  ", "x y")
  private val texts: Gen[String] = Gen.listOf(weird).map(_.mkString)

  test("ws_tokenize == split(trim(text), '\\\\s+') on arbitrary strings") {
    val df = samples(texts, 300).toDF("text")
    val bad = df.select(col("text"),
        graft.text.TextFunctions.tokens(col("text")).as("native"),
        split(trim(col("text")), "\\s+").as("builtin"))
      .filter(not(col("native") <=> col("builtin")))
    assert(bad.count() === 0, bad.collect().take(3).mkString("; "))
  }

  test("word_shingles == transform/slice/array_join composition") {
    for (k <- 1 to 4) {
      val df = samples(texts, 150).toDF("text")
      val toks = split(trim(col("text")), "\\s+")
      val builtin = when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - lit(k - 1)),
          i => array_join(slice(toks, i, lit(k)), " ")))
        .otherwise(typedlit(Array.empty[String]))
      val bad = df.select(col("text"),
          graft.text.TextFunctions.shingles(col("text"), k).as("native"),
          builtin.as("builtin"))
        .filter(not(col("native") <=> col("builtin")))
      assert(bad.count() === 0, s"k=$k: " + bad.collect().take(3).mkString("; "))
    }
  }

  test("vocab_hits == size(filter(isin))") {
    val vocab = Seq("the", "a", "ü")
    val df = samples(texts, 300).toDF("text")
    val toks = graft.text.TextFunctions.tokens(col("text"))
    val bad = df.select(col("text"),
        graft.text.TextFunctions.vocab_hits_t(toks, vocab).as("native"),
        size(filter(toks, x => x.isin(vocab.map(lit(_)): _*))).as("builtin"))
      .filter(not(col("native") <=> col("builtin")))
    assert(bad.count() === 0, bad.collect().take(3).mkString("; "))
  }

  test("minhash_pieces matches independent hex-substring arithmetic") {
    // the oracle's route: md5 hex string -> substring(8b+1, 8) -> parse
    def expected(s: String): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 4).flatMap { seed =>
        val hex = md.digest(s"$seed|$s".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (0 until 4).map(p =>
          java.lang.Long.parseLong(hex.substring(p * 8, p * 8 + 8), 16))
      }
    }
    val inputs = samples(Gen.alphaNumStr, 200).distinct
    val got = inputs.toDF("s")
      .select(col("s"), graft.text.TextFunctions.minhash_pieces(col("s")))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    inputs.foreach(s => assert(got(s) === expected(s), s"input='$s'"))
  }

  test("explode_shingles generator == posexplode(word_shingles) on arbitrary text") {
    graft.functions.GraftFunctions.register(spark)
    for (k <- 1 to 3) {
      val df = samples(texts, 100).toDF("text")
        .withColumn("doc_id", monotonically_increasing_id())
      df.createOrReplaceTempView("gen_prop_v")
      val viaGen = spark.sql(
        s"""SELECT doc_id, s.pos, s.shingle FROM gen_prop_v
            LATERAL VIEW explode_shingles(ws_tokenize(text), $k) s
              AS pos, shingle""")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val viaArr = df.select(col("doc_id"),
          posexplode(graft.text.TextFunctions.shingles(col("text"), k))
            .as(Seq("pos", "shingle")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(viaGen === viaArr, s"k=$k")
    }
  }

  test("simhash16 kernel == explode + two-groupBy formulation") {
    val df = samples(texts, 200).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val viaKernel = df.select(col("doc_id"),
        graft.text.TextFunctions.simhash(col("text")).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // the formulation q26 used before the kernel existed
    val tok = df.select(col("doc_id"),
        explode(array_distinct(graft.text.TextFunctions.tokens(col("text"))))
          .as("t"))
      .withColumn("h", md5(col("t")))
      .select(col("doc_id"), col("h"),
        explode(typedlit((0 until 16).toArray)).as("b"))
      .withColumn("bit", expr(
        """shiftright(instr('0123456789abcdef',
          |  substring(h, cast(b/4 as int) + 1, 1)) - 1,
          |  cast(b % 4 as int)) % 2""".stripMargin))
    val viaExplode = tok.groupBy(col("doc_id"), col("b"))
      .agg(sum(col("bit") * 2 - 1).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0,
        expr("shiftleft(cast(1 as bigint), b)")).otherwise(0L)).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(viaKernel === viaExplode)
  }

  test("repetition_mass kernel == explode + groupBy formulation") {
    val df = samples(texts, 150).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    for (n <- Seq(2, 3, 5)) {
      val viaKernel = df.select(col("doc_id"),
          graft.text.TextFunctions.repetition_mass_t(
            graft.text.TextFunctions.tokens(col("text")), n).as("m"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
      val viaExplode = df.select(col("doc_id"),
          explode_outer(graft.text.TextFunctions.shingles(col("text"), n))
            .as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(
          coalesce(max(when(col("g").isNotNull,
            col("cnt") * length(col("g")))), lit(0L)).as("top"),
          coalesce(sum(when(col("cnt") >= 2,
            col("cnt") * length(col("g")))), lit(0L)).as("dup"))
        .collect().map(r => (r.getLong(0), List(r.getLong(1), r.getLong(2))))
        .toMap
      assert(viaKernel === viaExplode, s"n=$n")
    }
  }

  test("cosine widens int/long arrays via implicit cast (col inputs too)") {
    import graft.similarity.VectorFunctions
    val df = Seq((Array(1, 2, 2), Array(2L, 4L, 4L))).toDF("ia", "la")
    val got = df.select(VectorFunctions.cosine(col("ia"), col("la")))
      .head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("cosine expression == HOF formulation to the last ulp") {
    import graft.similarity.VectorFunctions
    val vec = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
      .suchThat(_.exists(_ != 0f)).map(_.toArray)
    val pairs = samples(Gen.zip(vec, vec), 200)
    val df = pairs.toDF("a", "b")
    val ad = transform(col("a"), _.cast("double"))
    val bd = transform(col("b"), _.cast("double"))
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      (dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}
