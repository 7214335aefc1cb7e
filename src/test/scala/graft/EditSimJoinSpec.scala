package graft

import org.apache.spark.sql.functions._
import graft.operators.EditSimJoin

/** The edit-similarity join's one contract: the blocked result is
  * ROW-IDENTICAL to the naive quadratic join — the blocking may only
  * save work, never change the answer (q180's oracle states the same
  * thing cross-engine against DuckDB's levenshtein). The generated
  * corpus forces every path: a tiny alphabet (so grams collide hard),
  * lengths straddling the short/long block boundary (so short×short,
  * short×long and long×long pairs all occur), duplicates, empties. */
class EditSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(strs: Seq[(Long, String)], t: Int): Set[(Long, Long, Int)] = {
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib
      e = ed(sa, sb) if e <= t
    } yield (ia, ib, e)).toSet
  }

  private def run(strs: Seq[(Long, String)], t: Int, q: Int = 2) =
    EditSimJoin.join(strs.toDF("id", "s"), "id", "s", t, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("blocked join == naive quadratic join across the block boundary") {
    val rnd = new scala.util.Random(42)
    // lengths 0..10 over {a,b,c}: shorts (<=5 at q=2,t=2), longs, and
    // cross-boundary pairs; heavy collisions by construction
    val strs = (0L until 120L).map { i =>
      val len = rnd.nextInt(11)
      i -> (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    for (t <- Seq(1, 2)) {
      val got = run(strs, t)
      val exp = brute(strs, t)
      assert(got === exp, s"t=$t drifted from the naive join")
      assert(exp.nonEmpty, s"t=$t fixture must produce matches")
      // the fixture must exercise both blocks AND a cross-block pair
      val len = strs.toMap.view.mapValues(_.length).toMap
      val shortMax = 2 * t + 1
      assert(exp.exists { case (a, b, _) =>
        len(a) <= shortMax && len(b) <= shortMax })
      assert(exp.exists { case (a, b, _) =>
        math.max(len(a), len(b)) > shortMax })
    }
  }

  test("q = 3 grams agree with the naive join too") {
    val rnd = new scala.util.Random(7)
    val strs = (0L until 80L).map { i =>
      val len = rnd.nextInt(14)
      i -> (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
    }
    assert(run(strs, 2, q = 3) === brute(strs, 2))
  }

  test("customer-name shape: hot shared prefix, rare tails — matches and no Cartesian") {
    // the q180 fixture shape: identical boilerplate head, digit tails
    val strs = (1L to 200L).map(i => i -> f"Customer#$i%09d")
    val got = EditSimJoin.join(strs.toDF("id", "s"), "id", "s", 2)
    // plan never degenerates to an all-pairs product: both blocks are
    // equi-joins; the quadratic join this replaces would show a
    // CartesianProduct / BroadcastNestedLoopJoin here
    val phys = got.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"),
      s"blocking must plan as equi-joins only:\n$phys")
    val res = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(res === brute(strs, 2))
    assert(res.contains((1L, 2L, 1)), "…001 vs …002 is one substitution")
  }

  test("null strings never match; empty strings pair with short ones") {
    val strs = Seq(1L -> "", 2L -> "ab", 3L -> null, 4L -> "b")
    val got = run(strs.map { case (i, s) => (i, s) }, 2)
    assert(got === Set((1L, 2L, 2), (1L, 4L, 1), (2L, 4L, 1)))
  }

  test("chooseQ: width follows the measured posting length (r15)") {
    // a few hundred digit-key strings: q=2's ~10^2 vocabulary gives
    // short postings — the cheap width wins
    val small = (1L to 300L).map(i => i -> f"K$i%09d").toDF("id", "s")
    assert(EditSimJoin.chooseQ(small, "s", t = 2) === 2)
    // 6000 strings over the same closed digit alphabet: q=2 postings
    // blow past the cap (6000·5/~110 > 256), q=3's ~10^3 grams do not
    val big = spark.range(1, 6001)
      .select(col("id"), format_string("K%09d", col("id") * 7).as("s"))
    assert(EditSimJoin.chooseQ(big, "s", t = 2) === 3)
    // joinAuto is join at the chosen width — same rows
    val strs = (0L until 80L).map { i =>
      val rnd = new scala.util.Random(i)
      i -> (0 until rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
    }
    val auto = EditSimJoin.joinAuto(strs.toDF("id", "s"), "id", "s", t = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(auto === brute(strs, 2))
  }
}
