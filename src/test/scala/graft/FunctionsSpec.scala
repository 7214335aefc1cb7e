package graft

import graft.functions.{GraftFunctions => F, RutUtil}
import org.apache.spark.sql.functions._
import java.sql.Date

/** Unit + property tests for the scalar-function library (SURVEY §2.F).
  * The RUT vectors mirror the reference's JSDoc examples
  * (`utils/validations.ts:24-52`) and FIXTURES.md. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  // Independent mod-11 implementation for cross-checking RutUtil.
  private def refCheckDigit(body: String): Char = {
    val sum = body.reverse.zipWithIndex.map { case (ch, i) =>
      (ch - '0') * (2 + i % 6)
    }.sum
    (11 - sum % 11) match {
      case 11 => '0'; case 10 => 'K'; case d => ('0' + d).toChar
    }
  }

  test("RutUtil vectors") {
    assert(RutUtil.isValid("12345678-5"))
    assert(RutUtil.isValid("11111111-1"))
    assert(RutUtil.isValid("22222222-2"))
    assert(!RutUtil.isValid("22222222-9"))        // wrong check digit
    assert(RutUtil.isValid("12.345.678-5"))        // dotted ok
    assert(!RutUtil.isValid("12.345.678-0"))       // dotted, wrong digit
    assert(!RutUtil.isValid("123456785"))          // missing hyphen
    assert(!RutUtil.isValid(""))
    assert(!RutUtil.isValid(null))
    assert(RutUtil.formatOrNull("12.345.678-5") == "12345678-5")
    // lowercase k accepted, canonicalized uppercase
    val kBody = (1 to 99999999).view.map(_.toString)
      .find(b => refCheckDigit(b) == 'K').get
    assert(RutUtil.formatOrNull(s"$kBody-k") == s"$kBody-K")
  }

  test("RUT property: generated bodies round-trip; corruption rejected") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = 1000000 + rnd.nextInt(99000000)
      val body = n.toString
      val dv = refCheckDigit(body)
      assert(RutUtil.isValid(s"$body-$dv"), s"$body-$dv should be valid")
      val wrongDv = if (dv == '0') '1' else if (dv == 'K') '0' else (dv + 1).toChar
      assert(!RutUtil.isValid(s"$body-$wrongDv"), s"$body-$wrongDv should be invalid")
      // single-digit body corruption must flip validity
      val pos = rnd.nextInt(body.length)
      val newDigit = ((body.charAt(pos) - '0' + 1 + rnd.nextInt(8)) % 10 + '0').toChar
      val corrupted = body.updated(pos, newDigit)
      if (corrupted != body && refCheckDigit(corrupted) != dv)
        assert(!RutUtil.isValid(s"$corrupted-$dv"))
    }
  }

  test("rut expressions on DataFrame (codegen path)") {
    val df = Seq("12345678-5", "12.345.678-5", "22222222-9", "nope", null)
      .toDF("rut")
      .select(F.rut_is_valid($"rut").as("ok"), F.rut_format($"rut").as("fmt"))
    assert(df.collect().map(r => (r.getBoolean(0), r.get(1))).toSeq == Seq(
      (true, "12345678-5"), (true, "12345678-5"),
      (false, null), (false, null), (false, null)))
  }

  test("safe_to_date: year-first, day-first, slash, time suffix, garbage") {
    val df = Seq(
      "2025-06-24", "24-06-2025", "24/06/2025", "24-06-2025, 09:21",
      "03-04-2025",       // April 3rd — day-first, must NOT parse as year
      "2025-6-4", "garbage", "", null)
      .toDF("s").select(F.safe_to_date($"s").as("d"))
    assert(df.collect().map(_.get(0)).toSeq == Seq(
      Date.valueOf("2025-06-24"), Date.valueOf("2025-06-24"),
      Date.valueOf("2025-06-24"), Date.valueOf("2025-06-24"),
      Date.valueOf("2025-04-03"), Date.valueOf("2025-06-04"),
      null, null, null))
  }

  test("status_to_bool / string_to_bool never null") {
    val df = Seq("Aprobada", " APROBADA ", "Rechazada", "No Aplica", "", null)
      .toDF("s").select(F.status_to_bool($"s").as("b"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, true, false, false, false, false))
    val df2 = Seq("true", "VERDADERO", "si", "Si", "no", "false", "", null)
      .toDF("s").select(F.string_to_bool($"s").as("b"))
    assert(df2.collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, true, true, true, false, false, false, false))
  }

  test("clean_text: collapse + empty->null") {
    val df = Seq("EMPRESA  UNO   SPA", "  x ", "   ", "", null).toDF("s")
      .select(F.clean_text($"s").as("t"))
    assert(df.collect().map(_.get(0)).toSeq ==
      Seq("EMPRESA UNO SPA", "x", null, null, null))
  }

  test("try_int / try_double: garbage -> null") {
    val df = Seq("12", "12abc", "3.5", "", null).toDF("s")
      .select(F.try_int($"s").as("i"), F.try_double($"s").as("d"))
    assert(df.collect().map(r => (r.get(0), r.get(1))).toSeq == Seq(
      (12, 12.0), (null, null), (null, 3.5), (null, null), (null, null)))
  }

  test("js_parse_int: JS parseInt prefix-parse incl. 0x radix inference") {
    val cases = Seq(
      "12" -> 12L, "12abc" -> 12L, " \t42" -> 42L, "-7.9" -> -7L,
      "+8" -> 8L, "0" -> 0L, "0x1A" -> 26L, "-0x10" -> -16L,
      "0x" -> null, // hex prefix with no digits is NaN, not 0
      "abc" -> null, "" -> null, "." -> null, (null: String) -> null)
    val df = cases.map(_._1).toDF("s").select(F.js_parse_int($"s").as("i"))
    assert(df.collect().map(_.get(0)).toSeq === cases.map(_._2))
  }

  test("js_parse_float: JS parseFloat prefix-parse incl. exponent/Infinity") {
    val cases = Seq(
      "3.5kg" -> 3.5, ".5" -> 0.5, "1e3m" -> 1000.0, "1e+" -> 1.0,
      "-2.5e-1x" -> -0.25, "1.2.3" -> 1.2, "Infinity!" -> Double.PositiveInfinity,
      "e5" -> null, "" -> null, (null: String) -> null)
    val df = cases.map(_._1).toDF("s").select(F.js_parse_float($"s").as("d"))
    assert(df.collect().map(_.get(0)).toSeq === cases.map(_._2))
  }

  test("js_int / js_float: the `|| null` quirk folds 0 to null") {
    val df = Seq("0", "0.0", "12abc", "garbage").toDF("s")
      .select(F.js_int($"s").as("i"), F.js_float($"s").as("d"))
    assert(df.collect().map(r => (r.get(0), r.get(1))).toSeq === Seq(
      (null, null), (null, null), (12L, 12.0), (null, null)))
  }

  test("SQL registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT rut_format('12.345.678-5') f, rut_is_valid('x') v")
      .collect()(0)
    assert(r.getString(0) == "12345678-5" && !r.getBoolean(1))
  }
}
