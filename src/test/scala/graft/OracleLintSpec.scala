package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over [[SparkEntry.oracleSql]]: the driver's correctness hash is
  * TYPE-sensitive, and DuckDB types `sum()` over any integer as HUGEINT
  * — a type Spark cannot produce — so an uncast integer `sum` in an
  * oracle's FINAL select list hash-mismatches even when every value is
  * equal (this shipped three reds in round 15: q188/q189/q190). This
  * spec scans only the final top-level SELECT list of each oracle —
  * intermediate CTE sums are legal when downstream arithmetic or casts
  * consume the HUGEINT (24 green oracles do exactly that, verified by
  * typing all 194 through DuckDB `LIMIT 0`) — and requires every `sum(`
  * there to sit under a `cast(`/`round(`/`floor(` wrapper.
  *
  * The perfect-fidelity twin of this check lives in the dev loop:
  * `tools/lint_oracles.py` / `tools/compare.py` type the actual final
  * schema through DuckDB and fail on any HUGEINT/INT128 column or any
  * Spark-vs-oracle column-type mismatch. This spec is the in-JVM guard
  * that runs on every `sbt test`.
  */
class OracleLintSpec extends AnyFunSuite {

  private val SumCall = "(?i)(?<![a-z_])sum\\s*\\(".r
  private val Tok = "(?i)[()]|\\bselect\\b|\\bfrom\\b".r

  /** Text of EVERY top-level SELECT list — one entry per depth-0
    * SELECT (a top-level UNION ALL contributes every branch, since
    * every branch's types flow into the result; linting only the last
    * would let an uncast sum() in an earlier branch through), each
    * running to its matching depth-0 FROM / next depth-0 SELECT / end
    * of string. CTE bodies sit inside parens (depth > 0) and are
    * intentionally excluded — downstream arithmetic or casts consume
    * their HUGEINTs. */
  private[graft] def topLevelSelectItems(sql: String): Seq[String] = {
    var depth = 0
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (m <- Tok.findAllMatchIn(sql)) m.matched match {
      case "(" => depth += 1
      case ")" => depth -= 1
      case t if t.equalsIgnoreCase("select") && depth == 0 =>
        starts += m.end
      case _ => ()
    }
    starts.toSeq.map { s =>
      val tail = sql.substring(s)
      var d = 0
      var end = tail.length
      val it = Tok.findAllMatchIn(tail).iterator
      var done = false
      while (it.hasNext && !done) {
        val m = it.next()
        m.matched match {
          case "(" => d += 1
          case ")" => d -= 1
          case t if d == 0 && (t.equalsIgnoreCase("from") ||
              t.equalsIgnoreCase("select")) =>
            end = m.start; done = true
          case _ => ()
        }
      }
      tail.substring(0, end)
    }
  }

  /** Is the call starting at `i` (transitively) inside a cast/round/
    * floor call within this select list? Backward paren walk: each
    * unmatched '(' to the left is an enclosing call — read its name. */
  private[graft] def wrapped(sel: String, i: Int): Boolean = {
    var pos = i - 1
    var pendingClose = 0
    while (pos >= 0) {
      sel.charAt(pos) match {
        case ')' => pendingClose += 1
        case '(' if pendingClose > 0 => pendingClose -= 1
        case '(' =>
          var j = pos - 1
          while (j >= 0 && sel.charAt(j).isWhitespace) j -= 1
          var k = j
          while (k >= 0 && (sel.charAt(k).isLetterOrDigit ||
            sel.charAt(k) == '_')) k -= 1
          sel.substring(k + 1, j + 1).toLowerCase match {
            case "cast" | "round" | "floor" => return true
            case _ => ()
          }
        case _ => ()
      }
      pos -= 1
    }
    false
  }

  private def uncastFinalSums(sql: String): Seq[String] =
    topLevelSelectItems(sql).flatMap { sel =>
      SumCall.findAllMatchIn(sel).toSeq.collect {
        case m if !wrapped(sel, m.start) =>
          sel.substring(m.start, math.min(sel.length, m.start + 45))
            .replace('\n', ' ')
      }
    }

  test("no oracle has an uncast sum() in its final select list") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val bad = uncastFinalSums(sql)
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(" | ")}") else None
    }
    assert(offenders.isEmpty,
      s"\nuncast sum() in final SELECT (DuckDB types it HUGEINT and the " +
        s"driver hash goes red — wrap in CAST(... AS BIGINT)):\n" +
        offenders.mkString("\n"))
  }

  test("lint catches the r15 regression fixtures") {
    val old189 = "SELECT ch, (sum(days) * 100) // count(*) AS x, " +
      "sum(days) AS td FROM t GROUP BY 1"
    val old190 = "WITH n AS (SELECT 1 a) SELECT rep, sum(n_parts) " +
      "AS n_parts FROM n GROUP BY 1"
    assert(uncastFinalSums(old189).size == 2)
    assert(uncastFinalSums(old190).size == 1)
    // and the fixed spellings pass
    val fixed = "SELECT ch, (CAST(sum(days) AS BIGINT) * 100) // count(*) " +
      "AS x, CAST(sum(days) AS BIGINT) AS td FROM t GROUP BY 1"
    assert(uncastFinalSums(fixed).isEmpty)
    // intermediate-CTE sums are NOT flagged (downstream math consumes them)
    val cte = "WITH c AS (SELECT g, sum(n) tot FROM t GROUP BY 1) " +
      "SELECT g, CAST(tot * 100 // 7 AS BIGINT) AS r FROM c"
    assert(uncastFinalSums(cte).isEmpty)
    // a top-level UNION ALL is linted in EVERY branch: an uncast sum
    // in the FIRST branch types the whole union's column HUGEINT even
    // when the last branch casts
    val union = "SELECT g, sum(n) AS tot FROM a GROUP BY 1 " +
      "UNION ALL SELECT g, CAST(sum(n) AS BIGINT) AS tot FROM b GROUP BY 1"
    assert(uncastFinalSums(union).size == 1)
    // and a FROM-less trailing branch does not swallow the scan
    val fromless = "SELECT sum(n) AS tot FROM a UNION ALL SELECT 0"
    assert(uncastFinalSums(fromless).size == 1)
  }
}
