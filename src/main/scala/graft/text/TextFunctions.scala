package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for large-scale training-data pipelines:
  * tokenization, counting, quality scoring, language ID, fingerprinting,
  * shingling. Everything is a composition of codegen'd built-ins and is
  * expressed identically in DuckDB SQL for the oracle — hashes are md5
  * (both engines agree bit-for-bit), so even the sketch-based operators
  * get exact cross-engine checks.
  *
  * Scale: all functions are per-row narrow transforms — no shuffle, no
  * UDF, fully whole-stage-codegen'd; they stream over 100 TB as fast as
  * the scan goes.
  */
object TextFunctions {

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Whitespace tokenizer (training-pipeline convention: pre-split on
    * runs of whitespace after trim). Native kernel [[WsTokenize]] with
    * the exact semantics of `split(trim(text), "\\s+")`. */
  def tokens(text: Column): Column =
    toCol(WsTokenize(toExpr(text)))

  def token_count(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words are split greedily into <=4-char
    * pieces (a cheap stand-in for byte-pair merges): sum of
    * ceil(len(w)/4) over words. */
  def subword_count(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))

  /** Count of tokens that appear in `vocab` (used for stopword ratios
    * and language scoring). */
  def vocab_hits(text: Column, vocab: Seq[String]): Column =
    vocab_hits_t(tokens(text), vocab)

  /** [[vocab_hits]] over a pre-tokenized column — callers scoring
    * several vocabularies split once and reuse (regex split is the
    * dominant per-row cost, and CollapseProject would otherwise inline
    * one `split` per use). */
  def vocab_hits_t(toks: Column, vocab: Seq[String]): Column =
    toCol(VocabHitsExpr(toExpr(toks), vocab))

  /** Punctuation character count. */
  def punct_count(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Mean token length, 4 decimals. */
  def mean_token_len(text: Column): Column =
    graft.analytics.StableRound.r4(
      aggregate(tokens(text), lit(0L), (acc, w) => acc + length(w))
        .cast("double") / token_count(text))

  /** Stopword lists for the language-ID heuristic. Deterministic,
    * shared verbatim with the oracle SQL. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est", "dans", "pour", "sur", "avec"))

  /** N-gram language ID heuristic: score = stopword hits per language;
    * argmax with first-listed language winning ties (en > es > de > fr).
    */
  def lang_id(text: Column): Column = lang_id_t(tokens(text))

  /** [[lang_id]] over a pre-tokenized column. */
  def lang_id_t(toks: Column): Column = {
    val scores = stopwords.map { case (lang, words) =>
      lang -> vocab_hits_t(toks, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: length saturation (30%), low
    * punctuation density (40%), stopword presence (30%). 4 decimals. */
  def quality_score(text: Column): Column =
    quality_score_t(text, tokens(text))

  /** [[quality_score]] with a pre-tokenized column (text still needed
    * for the punctuation-density term). */
  def quality_score_t(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val punctRatio = punct_count(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val stopRatio = least(
      vocab_hits_t(toks, stopwords.flatMap(_._2)).cast("double") /
        greatest(nTok, lit(1.0)) * lit(5.0), lit(1.0))
    graft.analytics.StableRound.r4(
      lit(0.3) * lenScore + lit(0.4) * (lit(1.0) - punctRatio) +
      lit(0.3) * stopRatio)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Identical in DuckDB: `md5(lower(regexp_replace(trim(text),
    * '\s+', ' ', 'g')))`. */
  def doc_fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Word k-shingles as space-joined strings: the canonical input to
    * MinHash/Jaccard dedup. Empty when the document has < k tokens. */
  def shingles(text: Column, k: Int): Column =
    toCol(WordShingles(toExpr(tokens(text)), k))

  /** 16 md5-derived uint32 minhash values per shingle ([[MinhashPieces]]);
    * numeric so the per-doc min-aggregation runs on longs. */
  def minhash_pieces(shingle: Column): Column =
    toCol(MinhashPieces(toExpr(shingle)))

  /** Distinct 60-bit k-shingle hashes per document ([[ShingleHashes]]);
    * the narrow front half of the n-gram Jaccard inverted index. */
  def shingle_hashes(text: Column, k: Int = 3): Column =
    toCol(ShingleHashes(toExpr(tokens(text)), k))

  /** Per-document minhash signature ([[MinhashSignature]]): 16 minima
    * over k-shingle hashes in one narrow pass — no explode, no shuffle. */
  def minhash_signature(text: Column, k: Int = 3): Column =
    toCol(MinhashSignature(toExpr(tokens(text)), k))

  /** Gopher repetition masses over word n-grams ([[RepetitionMass]]):
    * [0] = count×chars of the heaviest single n-gram, [1] = total
    * count×chars of n-grams repeated ≥2 times. One narrow per-row
    * hash-count pass — the numerators of Rae et al. 2021 §A1.1's
    * "fraction of characters in the most frequent / in duplicated
    * n-grams" filters. */
  def repetition_mass_t(toks: Column, n: Int): Column =
    toCol(RepetitionMass(toExpr(toks), n))

  /** 16-bit SimHash of the distinct tokens ([[SimHash16]]): one narrow
    * per-row pass — no 16× bit explode, no shuffle. */
  def simhash(text: Column): Column =
    toCol(SimHash16(toExpr(tokens(text))))

  /** Winnowing fingerprints over normalized text ([[Winnow]]): rolling
    * k-gram hash, distinct window minima — the near-dup sketch robust
    * to local edits (vs [[doc_fingerprint]]'s whole-document hash). */
  def winnow_fingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    toCol(Winnow(toExpr(lower(regexp_replace(trim(text), "\\s+", " "))), k, w))
}
