package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's scalar-function library — the Spark re-expression of the
  * reference's expression surface (SURVEY.md §2.F). Everything here is a
  * composition of codegen'd built-ins except the RUT pair, which is a
  * native Catalyst expression ([[RutIsValid]], [[RutFormat]]).
  *
  * Reference semantics cited per function; all are null-tolerant the way
  * the reference's JS is (falsy -> null / false, garbage -> null).
  */
object GraftFunctions {

  /** F1 `normalizeSpaces` (`utils/string.ts:8-9`): collapse whitespace
    * runs to a single space and trim. Null passes through. */
  def normalize_spaces(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Silver variant of F1: additionally maps empty-after-trim to null —
    * the reference collapses falsy to null via `|| null`
    * (`services/conductor.ts:137-140`, SURVEY §7 risk 6). */
  def clean_text(c: Column): Column = {
    val n = normalize_spaces(c)
    when(length(n) === 0, lit(null).cast(StringType)).otherwise(n)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** JSON-field variant of the `|| null` pattern
    * (`services/conductor.ts:156-163`): no whitespace normalization,
    * just empty-string -> null (JS falsy collapse). */
  def clean_json_text(c: Column): Column =
    when(length(c) === 0, lit(null).cast(StringType)).otherwise(c)

  /** F2 `rut_is_valid` — see [[RutIsValid]]. */
  def rut_is_valid(c: Column): Column = toCol(RutIsValid(toExpr(c)))

  /** F2 `rut_format` — canonical RUT or null. See [[RutFormat]]. */
  def rut_format(c: Column): Column = toCol(RutFormat(toExpr(c)))

  /** F3 `safeParseDate` (`utils/date.ts:5-34`): keep text before the
    * first ',' (drops a `, HH:MM` time suffix), accept `/` or `-`
    * separators; a 4-char first token means year-first `YYYY-MM-DD`,
    * anything else is day-first `DD-MM-YYYY`. Unparseable -> null.
    *
    * Day-first must NOT fall through to year-first or `03-04-2025`
    * (April 3) would mis-hit (SURVEY §7 risk 4) — hence the explicit
    * branch on first-token length instead of a coalesce chain.
    */
  def safe_to_date(c: Column): Column = {
    val pre  = trim(split(c, ",").getItem(0))
    val norm = regexp_replace(pre, "/", "-")
    when(length(split(norm, "-").getItem(0)) === 4,
      try_to_date(norm, "y-M-d"))
      .otherwise(try_to_date(norm, "d-M-y"))
  }

  /** F4 `statusToBoolean` (`utils/parser.ts:7-11`): case/space-insensitive
    * equality with "aprobada" -> true; everything else, including null,
    * -> false (never null). */
  def status_to_bool(c: Column): Column =
    coalesce(lower(normalize_spaces(c)) === "aprobada", lit(false))

  /** F5 `stringToBoolean` (`utils/parser.ts:16-19`): lowercase in
    * {true, verdadero, si} -> true else false (never null). */
  def string_to_bool(c: Column): Column =
    coalesce(lower(normalize_spaces(c)).isin("true", "verdadero", "si"),
      lit(false))

  /** F6 guarded int coercion (`services/vehiculo.ts:215,222,229`):
    * garbage -> null. Stricter than JS prefix-parse and keeps 0 —
    * the saner default; [[js_int]]/[[js_float]] provide exact
    * reference parity when replaying reference data byte-for-byte. */
  def try_int(c: Column): Column = c.try_cast(IntegerType)

  /** F6 guarded float coercion (`services/vehiculo.ts:224-227`). */
  def try_double(c: Column): Column = c.try_cast(DoubleType)

  def try_long(c: Column): Column = c.try_cast(LongType)

  /** F6 exact-parity `parseInt(x)` (`services/vehiculo.ts:215,222,229`):
    * skip leading whitespace, optional sign, then parse the longest
    * decimal-digit prefix ("12abc" -> 12, "-7.9" -> -7); a `0x`/`0X`
    * prefix switches to hex, matching JS's radix inference with no
    * radix argument. No parseable prefix -> null (JS NaN). */
  def js_parse_int(c: Column): Column = {
    val s = regexp_replace(c.cast(StringType), "^\\s+", "")
    val isHex = s.rlike("^[+-]?0[xX]")
    val hexBody = regexp_extract(s, "^[+-]?0[xX]([0-9a-fA-F]+)", 1)
    val hexSign = when(s.startsWith("-"), lit(-1L)).otherwise(lit(1L))
    val dec = regexp_extract(s, "^[+-]?\\d+", 0)
    // a 0x/0X prefix commits to hex: "0x" with no hex digits is NaN in
    // JS, NOT the decimal prefix-parse of its leading "0"
    when(isHex,
        when(hexBody =!= "", hexSign * conv(hexBody, 16, 10).cast(LongType)))
      .when(dec =!= "", dec.cast(LongType))
      .otherwise(lit(null).cast(LongType))
  }

  /** F6 exact-parity `parseFloat(x)` (`services/vehiculo.ts:224-227`):
    * longest float-literal prefix incl. exponent and `Infinity`
    * ("3.5kg" -> 3.5, "1e3m" -> 1000.0, "1e+" -> 1.0). No parseable
    * prefix -> null (JS NaN). */
  def js_parse_float(c: Column): Column = {
    val s = regexp_replace(c.cast(StringType), "^\\s+", "")
    val num = regexp_extract(s,
      "^[+-]?(Infinity|\\d+\\.?\\d*(?:[eE][+-]?\\d+)?|\\.\\d+(?:[eE][+-]?\\d+)?)", 0)
    when(num =!= "", num.cast(DoubleType))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** JS `x || null` falsiness on numbers: 0, -0, and NaN -> null
    * (`vehiculo.ts:215-229` applies it to every parsed numeric). */
  def js_or_null(c: Column): Column =
    when(c === 0 || isnan(c.cast(DoubleType)), lit(null)).otherwise(c)

  /** `parseInt(x) || null` — the reference's full int coercion. */
  def js_int(c: Column): Column = js_or_null(js_parse_int(c))

  /** `parseFloat(x) || null` — the reference's full float coercion. */
  def js_float(c: Column): Column = js_or_null(js_parse_float(c))

  /** F9 filename classifier (`etl-gcs-cloudsql/src/index.ts:24-42`):
    * lowercase substring match + `.csv` suffix. */
  def filename_matches(fileCol: Column, token: String): Column = {
    val lower_ = lower(fileCol)
    lower_.contains(token) && lower_.endsWith(".csv")
  }

  /** Register the SQL-callable subset so `spark.sql("rut_format(...)")`
    * works alongside the DataFrame API. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering logs a WARN per call, and configure()
    // runs once per query build
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("rut_is_valid"))) {
      reg.createOrReplaceTempFunction(
        "rut_is_valid", es => RutIsValid(es.head), "scala_udf")
      reg.createOrReplaceTempFunction(
        "rut_format", es => RutFormat(es.head), "scala_udf")
      reg.createOrReplaceTempFunction(
        "ws_tokenize", es => graft.text.WsTokenize(es.head), "scala_udf")
      reg.createOrReplaceTempFunction(
        "explode_shingles", es => {
          require(es.length == 2, "explode_shingles expects (tokens, k)")
          val k = ExprLits.constInt(es(1), "explode_shingles")
          require(k >= 1, s"explode_shingles: k must be >= 1, got $k")
          graft.text.ExplodeShingles(es.head, k)
        }, "scala_udf")
    }
  }
}
