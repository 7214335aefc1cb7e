package graft.text

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the text hot path. The higher-order-
  * function compositions they replace (`filter(isin)`, `transform`+
  * `slice`+`array_join`) are evaluated interpreted — per-element lambda
  * dispatch plus intermediate array allocation dominated the text
  * queries' runtime. Semantics are bit-identical to the compositions
  * (validated by the DuckDB oracle + unit tests), only the execution
  * strategy changes.
  */
object TextKernels {
  /** Same contract as Spark's `split(trim(text), "\\s+")`: trim ASCII
    * spaces only, then regex-split keeping leading empties (Spark's
    * StringSplit uses limit -1). Pattern precompiled once per JVM
    * instead of per row. */
  private val WS: Pattern = Pattern.compile("\\s+")

  def tokenize(text: UTF8String): ArrayData = {
    val parts = WS.split(text.trim.toString, -1)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = UTF8String.fromString(parts(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Count of array elements present in `set`; null elements don't
    * count (mirrors `filter(toks, _.isin(vocab))`: isin(null) -> null
    * -> dropped). */
  def vocabHits(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The ONE definition of "the k-gram starting at i": tokens joined
    * with single spaces, null tokens as empty strings. Every shingle
    * consumer ([[shingles]], [[shingleHashes]], [[minhashSignature]],
    * the [[ExplodeShingles]] generator) goes through here so they stay
    * bit-identical by construction. */
  def shingleAt(toks: ArrayData, i: Int, k: Int): UTF8String = {
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < k) {
      if (j > 0) sb.append(' ')
      val t = toks.getUTF8String(i + j)
      sb.append(if (t == null) "" else t.toString)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** 16 minhash pieces for one shingle: md5 over "0|s".."3|s", each
    * 128-bit digest split into four big-endian uint32s (as Longs) —
    * piece 4a+b == hex chars [8b+1, 8b+8] of digest a, so DuckDB
    * mirrors it with `('0x' || substring(md5(a||'|'||s), 8b+1, 8))::BIGINT`.
    * One expression evaluation replaces 4 md5 + 16 substring calls and
    * lets the min-aggregation run on longs instead of strings. */
  def minhashPieces(s: UTF8String): ArrayData = {
    val md = md5Local.get()
    val sBytes = s.getBytes
    val out = new Array[Any](16)
    var seed = 0
    while (seed < 4) {
      md.reset()
      md.update(('0' + seed).toByte)
      md.update('|'.toByte)
      md.update(sBytes)
      val dig = md.digest()
      var p = 0
      while (p < 4) {
        out(seed * 4 + p) =
          ((dig(p * 4) & 0xffL) << 24) | ((dig(p * 4 + 1) & 0xffL) << 16) |
          ((dig(p * 4 + 2) & 0xffL) << 8) | (dig(p * 4 + 3) & 0xffL)
        p += 1
      }
      seed += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct k-shingle hash values of a token array, one per-row pass:
    * each shingle's hash is the first 15 hex chars (60 bits) of its
    * md5, i.e. bytes 0-6 and the high nibble of byte 7 — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` and to DuckDB's
    * `('0x' || substring(md5(s), 1, 15))::BIGINT`. Replaces
    * string-shingle explode + per-row md5/conv with one kernel call;
    * the inverted index then shuffles 8-byte keys. */
  def shingleHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val md = md5Local.get()
    var i = 0
    while (i <= n - k) {
      md.reset()
      val dig = md.digest(shingleAt(toks, i, k).getBytes)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      v = (v << 4) | ((dig(7) >> 4) & 0xfL)
      seen.add(v)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Full minhash signature of a token array in ONE per-row pass: the
    * distinct k-shingles are enumerated locally and each updates the 16
    * running minima ([[minhashPieces]] math, so the DuckDB mirror is
    * unchanged). Turns the sketch from explode → 750k-row shuffle →
    * 16-column min-agg into a narrow projection: per-row work, zero
    * shuffle — the shape that streams over 100 TB at scan speed.
    * Returns null when the document has fewer than k tokens. */
  def minhashSignature(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return null
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(16)(Long.MaxValue)
    val md = md5Local.get()
    var i = 0
    while (i <= n - k) {
      val s = shingleAt(toks, i, k).toString
      if (seen.add(s)) {
        val sBytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var seed = 0
        while (seed < 4) {
          md.reset()
          md.update(('0' + seed).toByte)
          md.update('|'.toByte)
          md.update(sBytes)
          val dig = md.digest()
          var p = 0
          while (p < 4) {
            val v =
              ((dig(p * 4) & 0xffL) << 24) | ((dig(p * 4 + 1) & 0xffL) << 16) |
              ((dig(p * 4 + 2) & 0xffL) << 8) | (dig(p * 4 + 3) & 0xffL)
            val idx = seed * 4 + p
            if (v < mins(idx)) mins(idx) = v
            p += 1
          }
          seed += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** 16-bit SimHash over the DISTINCT tokens of a token array in one
    * per-row pass. Bit b of the result derives from hex char b/4 of
    * each distinct token's md5: nibble bit b%4 votes ±1 into a counter,
    * bit set in the output when the final count is positive — the exact
    * arithmetic of the explode(doc×token×16) + two-groupBy formulation
    * it replaces (q26), which pushed 16× the corpus rows through two
    * shuffles; this is per-row work and zero shuffles. */
  def simhash16(toks: ArrayData): Long = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](16)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null && seen.add(t)) {
        md.reset()
        val dig = md.digest(t.getBytes)
        var b = 0
        while (b < 16) {
          val p = b / 4 // hex char index; char 2j = high nibble of byte j
          val nib =
            if ((p & 1) == 0) (dig(p / 2) >> 4) & 0xf else dig(p / 2) & 0xf
          counts(b) += (((nib >> (b % 4)) & 1) * 2) - 1
          b += 1
        }
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 16) { if (counts(b) > 0) res |= 1L << b; b += 1 }
    res
  }

  /** Winnowing fingerprints (Schleimer et al.): polynomial rolling hash
    * over character k-grams (base 31, mod 1e9+7, Unicode code points),
    * then the distinct minima of every w-hash window. Arithmetic chosen
    * to be expressible verbatim in SQL so the DuckDB oracle recomputes
    * it independently. Returns the distinct fingerprints in first-seen
    * order; empty when the text has fewer than k+w-1 code points. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nH = n - k + 1
    val h = new Array[Long](nH)
    var i = 0
    while (i < nH) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = acc * 31 + cps(i + j); j += 1 }
      h(i) = acc % 1000000007L
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nH - w) {
      var m = h(i)
      var j = 1
      while (j < w) { if (h(i + j) < m) m = h(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Space-joined word k-grams from a token array; n-k+1 shingles,
    * empty array when n < k (mirrors TextFunctions.shingles). */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = shingleAt(toks, i, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Gopher-style repetition masses over the document's word n-grams
    * (Rae et al. 2021, "Scaling Language Models", §A1.1 adapted).
    * Element 0: the largest repeated-character mass of any single
    * n-gram — count × character length of the space-joined gram, the
    * numerator of "fraction of characters in the most frequent
    * n-gram" (max taken over the product itself, so no tie-break on
    * gram strings is needed and the value is engine-order-free).
    * Element 1: total mass of grams occurring at least twice — the
    * "characters in duplicated n-grams" numerator. One hash-count
    * pass per row; char counts are code points (= DuckDB length()). */
  def repetitionMass(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    val grams = total - n + 1
    if (grams <= 0) return new GenericArrayData(Array[Any](0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer](grams * 2)
    var i = 0
    while (i < grams) {
      val g = shingleAt(toks, i, n)
      val c = counts.get(g)
      counts.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue.intValue()
      val mass = cnt.toLong * e.getKey.numChars()
      if (mass > top) top = mass
      if (cnt >= 2) dup += mass
    }
    new GenericArrayData(Array[Any](top, dup))
  }
}

/** `ws_tokenize(text)` — whitespace tokenization after space-trim. */
case class WsTokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ws_tokenize"

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenize =
    copy(child = newChild)
}

/** `vocab_hits(toks)` against a fixed vocabulary — hash-set membership
  * instead of a per-token linear scan over `isin` literals. */
case class VocabHitsExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "vocab_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.vocabHits(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("vocabSet", set, "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.vocabHits($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabHitsExpr =
    copy(child = newChild)
}

/** `minhash_pieces(shingle)` — 16 md5-derived uint32 hash values. */
case class MinhashPieces(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_pieces"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashPieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.minhashPieces($c)")

  override protected def withNewChildInternal(newChild: Expression): MinhashPieces =
    copy(child = newChild)
}

/** `shingle_hashes(toks, k)` — distinct 60-bit md5-prefix hashes of the
  * k-shingles. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `repetition_mass(toks, n)` — [top-gram mass, duplicated-gram mass]
  * for the Gopher repetition filters ([[TextKernels.repetitionMass]]).
  * [0, 0] for docs with < n tokens. */
case class RepetitionMass(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "repetition_mass"

  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionMass(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.repetitionMass($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionMass =
    copy(child = newChild)
}

/** `minhash_signature(toks, k)` — 16 minima over the document's
  * k-shingle hash values, computed per row. Null for docs with < k
  * tokens. */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $tmp =
          graft.text.TextKernels.minhashSignature($c, $k);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** `simhash16(toks)` — 16-bit md5-derived SimHash of the distinct
  * tokens. */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash16(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.simhash16($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** `winnow(text, k, w)` — winnowing fingerprint set (rolling hash). */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow"

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** `explode_shingles(toks, k)` — the UDTF leg of the custom-function
  * surface: a native Catalyst [[Generator]] emitting one (pos, shingle)
  * row per contiguous k-gram, usable from SQL as a generator
  * (`SELECT ... FROM t LATERAL VIEW explode_shingles(toks, 3) s AS pos,
  * shingle`) exactly like `explode`/`posexplode`. Planned through
  * `GenerateExec` — rows stream out per input row with no intermediate
  * array allocation in the plan (vs `posexplode(word_shingles(...))`,
  * which materializes the full shingle array per row first). */
case class ExplodeShingles(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def prettyName: String = "explode_shingles"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val toks = child.eval(input)
    if (toks == null) Nil
    else {
      val n = toks.asInstanceOf[ArrayData].numElements()
      if (n < k) Nil
      else new Iterator[InternalRow] {
        private val arr = toks.asInstanceOf[ArrayData]
        private var i = 0
        override def hasNext: Boolean = i <= n - k
        override def next(): InternalRow = {
          val row = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(
              Array[Any](i, TextKernels.shingleAt(arr, i, k)))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeShingles =
    copy(child = newChild)
}

/** `word_shingles(toks, k)` — contiguous k-grams joined with spaces. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
