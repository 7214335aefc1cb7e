package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{RutFormat, RutIsValid}
import graft.similarity.CosineSimilarity
import graft.text.{VocabHitsExpr, WordShingles, WsTokenize}

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

  /** Evaluate a foldable string-array argument (e.g. `array('a','b')`). */
  private def constStrings(e: Expression, fn: String): Seq[String] = {
    require(e.foldable, s"$fn expects a literal array of strings")
    e.eval(null).asInstanceOf[ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
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
        CosineSimilarity(es.head, es(1))
      }))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(toks, k) - space-joined k-grams"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "word_shingles expects (tokens, k)")
        val k = es(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Int]
        }
        WordShingles(es.head, k)
      }))

    ext.injectFunction((FunctionIdentifier("vocab_hits"),
      info("vocab_hits", "vocab_hits(toks, array('w',...)) - count of tokens in vocab"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "vocab_hits expects (tokens, vocab array)")
        VocabHitsExpr(es.head, constStrings(es(1), "vocab_hits"))
      }))
  }
}
