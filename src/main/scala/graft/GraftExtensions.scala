package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{RutFormat, RutIsValid}
import graft.similarity.CosineSimilarity
import graft.text.{MinhashSignature, ShingleHashes, SimHash16, VocabHitsExpr,
  Winnow, WordShingles, WsTokenize}

/** Spark-native registration of the engine's custom expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * makes `rut_is_valid`, `rut_format`, `cosine`, `ws_tokenize`,
  * `word_shingles`, `vocab_hits` available to pure-SQL users on any
  * session of the application — the idiomatic extension-point route
  * (SURVEY §2 J), complementing the Column API in GraftFunctions /
  * VectorFunctions / TextFunctions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def oneArg(name: String, usage: String, f: Expression => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (es: Seq[Expression]) => {
        require(es.length == 1, s"$name expects 1 argument")
        f(es.head)
      })

  // literal-argument extraction shared with the session-registry
  // registration route — see graft.functions.ExprLits
  private def constStrings(e: Expression, fn: String): Seq[String] =
    graft.functions.ExprLits.constStrings(e, fn)
  private def constInt(e: Expression, fn: String): Int =
    graft.functions.ExprLits.constInt(e, fn)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom physical operator: sessions created with these extensions
    // plan graft.plans.TopKPerKey without touching experimental config
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)

    ext.injectFunction(oneArg("rut_is_valid",
      "rut_is_valid(str) - true iff str is a valid Chilean RUT", RutIsValid))
    ext.injectFunction(oneArg("rut_format",
      "rut_format(str) - canonical NNNNNNNN-D or null", RutFormat))
    ext.injectFunction(oneArg("ws_tokenize",
      "ws_tokenize(str) - whitespace tokens after trim", WsTokenize))

    ext.injectFunction((FunctionIdentifier("cosine"),
      info("cosine", "cosine(arr, arr) - cosine similarity in double"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "cosine expects 2 arguments")
        // int/long/decimal arrays widen via the expression's
        // ImplicitCastInputTypes during resolution
        CosineSimilarity(es.head, es(1))
      }))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(toks, k) - space-joined k-grams"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "word_shingles expects (tokens, k)")
        val k = constInt(es(1), "word_shingles")
        require(k >= 1, s"word_shingles: k must be >= 1, got $k")
        WordShingles(es.head, k)
      }))

    ext.injectFunction((FunctionIdentifier("vocab_hits"),
      info("vocab_hits", "vocab_hits(toks, array('w',...)) - count of tokens in vocab"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "vocab_hits expects (tokens, vocab array)")
        VocabHitsExpr(es.head, constStrings(es(1), "vocab_hits"))
      }))

    ext.injectFunction(oneArg("simhash16",
      "simhash16(toks) - 16-bit md5 SimHash of the distinct tokens", SimHash16))

    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(toks, k) - distinct 60-bit k-shingle hashes"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "shingle_hashes expects (tokens, k)")
        val k = constInt(es(1), "shingle_hashes")
        require(k >= 1, s"shingle_hashes: k must be >= 1, got $k")
        ShingleHashes(es.head, k)
      }))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(toks, k) - 16 minhash minima over k-shingles"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "minhash_signature expects (tokens, k)")
        val k = constInt(es(1), "minhash_signature")
        require(k >= 1, s"minhash_signature: k must be >= 1, got $k")
        MinhashSignature(es.head, k)
      }))

    ext.injectFunction((FunctionIdentifier("explode_shingles"),
      info("explode_shingles",
        "explode_shingles(toks, k) - generator: one (pos, shingle) row per k-gram"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "explode_shingles expects (tokens, k)")
        val k = constInt(es(1), "explode_shingles")
        require(k >= 1, s"explode_shingles: k must be >= 1, got $k")
        graft.text.ExplodeShingles(es.head, k)
      }))

    // the sketch aggregate family (SURVEY: q104/q110/q112) for pure-SQL
    // users — the registry builder returns the bare AggregateFunction;
    // the analyzer wraps it in an AggregateExpression during resolution
    ext.injectFunction(oneArg("hll_registers",
      "hll_registers(h60) - HLL register summaries (sum_ranks, zero_regs, s_scaled) over 60-bit hashes",
      graft.plans.HllAgg(_)))
    ext.injectFunction(oneArg("hll_reg_array",
      "hll_reg_array(h60) - raw 512-entry HLL register array (merge sketches with zip_with greatest)",
      graft.plans.HllRegsAgg(_)))
    ext.injectFunction(oneArg("cms_counters",
      "cms_counters(h60) - Count-Min 4x256 counter array over 60-bit hashes",
      graft.plans.CmsAgg(_)))
    ext.injectFunction(oneArg("count_sketch",
      "count_sketch(h60) - signed AGMS 4x256 counter array (unbiased join-size inner products)",
      graft.plans.CountSketchAgg(_)))
    ext.injectFunction(oneArg("bloom_bits",
      "bloom_bits(h60) - 8192-bit Bloom filter (128 longs) over 60-bit hashes",
      graft.plans.BloomAgg(_)))
    ext.injectFunction(oneArg("hist_counts",
      "hist_counts(v) - 256-bucket log-histogram counters over a nonnegative Long measure",
      graft.plans.HistAgg(_)))

    ext.injectFunction((FunctionIdentifier("winnow"),
      info("winnow", "winnow(str, k, w) - winnowing fingerprints (k-gram rolling hash, window w)"),
      (es: Seq[Expression]) => {
        require(es.length == 3, "winnow expects (text, k, w)")
        val k = constInt(es(1), "winnow")
        val w = constInt(es(2), "winnow")
        require(k >= 1 && w >= 1, s"winnow: k and w must be >= 1, got ($k, $w)")
        // SAME normalization as the Column API (winnow_fingerprints)
        // and the q51 oracle — a raw-text Winnow would silently produce
        // different fingerprints for the same document. Built from raw
        // catalyst nodes: ColumnBridge.expression() yields a LAZY
        // ColumnNodeExpression that never resolves inside a
        // registry-built tree (Unevaluable at codegen)
        import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}
        Winnow(Lower(RegExpReplace(StringTrim(es.head, None),
          Literal("\\s+"), Literal(" "))), k, w)
      }))
  }
}
