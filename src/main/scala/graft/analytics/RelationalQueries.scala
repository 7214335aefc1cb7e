package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational query surface (SURVEY §2 B/C/D/E + §2.4's "free in
  * Catalyst" operators), exercised over the harness star schema with
  * DuckDB oracles.
  *
  * Conventions:
  *  - every aggregate/computed column is aliased identically in Spark
  *    and oracle SQL (driver hashes by column name);
  *  - double-typed aggregates are rounded to 2 decimals on both sides
  *    (sum order across engines differs in the last float ulps);
  *  - results carry a total ORDER BY with a unique tiebreak so row
  *    order is deterministic on both sides;
  *  - join build sides that are small get an explicit `broadcast()`
  *    hint — at 100 TB the fact side never shuffles for dim joins.
  */
object RelationalQueries {
  import Tables._

  val queries: Map[String, QuerySpec] = Map(

    // ── B: projection / filter / predicate pushdown ────────────────
    "q02_filter_project" -> QuerySpec(
      build = (s, d) => orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("o_date"))
        .orderBy("o_orderkey").limit(500),
      oracle = Some("""
        SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
        FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000
        ORDER BY o_orderkey LIMIT 500"""),
      bench = true),

    // ── D: hash aggregation (TPC-H Q1 shape: partial+final agg) ────
    "q01_pricing_summary" -> QuerySpec(
      build = (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // ── C: multi-way join + agg (broadcast dims, shuffled fact join) ─
    "q03_revenue_by_nation" -> QuerySpec(
      // lineitem pre-aggregates per orderkey BELOW the join (partial
      // aggregation pushdown): the orders join then matches ~15M
      // pre-agg rows instead of ~60M raw lineitems, and the shuffle
      // carries (key, sum, count) instead of every item row. Safe under
      // the 2-decimal round: addition order already varies with
      // partitioning, which the round absorbs (bit-identical across
      // thread counts is pinned by the harness).
      build = (s, d) => lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("_rev_o"), count(lit(1)).as("_n_o"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("_rev_o")), 2).as("revenue"),
          sum(col("_n_o")).as("n_items"))
        .orderBy("n_name"),
      oracle = Some("""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""),
      bench = true),

    // ── C4-style dim snapshot join (broadcast both, tiny) ──────────
    "q04_dim_join" -> QuerySpec(
      build = (s, d) => nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_nations"))
        .orderBy("r_name"),
      oracle = Some("""
        SELECT r_name, count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // ── C1/B5: left-join + null-check split (lookup-miss rejects) ──
    "q05_lookup_miss_split" -> QuerySpec(
      build = (s, d) => {
        val bigParts = part(s, d).filter(col("p_size") > 25)
          .select(col("p_partkey"), col("p_brand"))
        lineitem(s, d)
          .join(broadcast(bigParts), col("l_partkey") === col("p_partkey"), "left")
          .withColumn("matched", col("p_partkey").isNotNull)
          .groupBy(col("matched"))
          .agg(count(lit(1)).as("n_rows"),
            round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy("matched")
      },
      oracle = Some("""
        SELECT p_partkey IS NOT NULL AS matched, count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem LEFT JOIN (
          SELECT p_partkey, p_brand FROM part WHERE p_size > 25) big
          ON l_partkey = p_partkey
        GROUP BY 1 ORDER BY matched""")),

    // ── semi / anti joins ──────────────────────────────────────────
    "q06_semi_join" -> QuerySpec(
      build = (s, d) => customer(s, d)
        .join(orders(s, d).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment"),
      oracle = Some("""
        SELECT c_mktsegment, count(*) AS n_cust FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    "q07_anti_join" -> QuerySpec(
      build = (s, d) => part(s, d)
        .join(lineitem(s, d).filter(col("l_quantity") >= 40).select("l_partkey"),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy("p_partkey"),
      oracle = Some("""
        SELECT p_partkey, p_brand FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey AND l_quantity >= 40)
        ORDER BY p_partkey""")),

    // ── D1: get-or-create dimension (distinct → anti-join → ids) ───
    // "existing dim" = brands of small parts with surrogate ids in
    // brand order; new brands (from big parts) get maxId + row_number.
    // This is the reference's `utils/sql.ts:6-27` re-expressed
    // set-oriented (SURVEY §2 D1).
    "q08_get_or_create_dim" -> QuerySpec(
      build = (s, d) => {
        val w = Window.orderBy(col("brand"))
        val existing = part(s, d).filter(col("p_size") <= 25)
          .select(col("p_brand").as("brand")).distinct()
          .withColumn("id", row_number().over(w))
        val maxId = coalesce(max(col("id")), lit(0))
        val newVals = part(s, d).filter(col("p_size") > 25)
          .select(col("p_brand").as("brand")).distinct()
          .join(existing.select("brand"), Seq("brand"), "left_anti")
          .withColumn("id", row_number().over(w) +
            lit(existing.agg(maxId).collect()(0).getInt(0)))
        existing.unionByName(newVals).orderBy("id")
      },
      oracle = Some("""
        WITH existing AS (
          SELECT brand, CAST(ROW_NUMBER() OVER (ORDER BY brand) AS INT) AS id
          FROM (SELECT DISTINCT p_brand AS brand FROM part WHERE p_size <= 25)),
        newvals AS (
          SELECT brand,
                 CAST(ROW_NUMBER() OVER (ORDER BY brand)
                   + (SELECT COALESCE(MAX(id), 0) FROM existing) AS INT) AS id
          FROM (SELECT DISTINCT p_brand AS brand FROM part WHERE p_size > 25
                EXCEPT SELECT DISTINCT p_brand FROM part WHERE p_size <= 25))
        SELECT brand, id FROM existing UNION ALL SELECT brand, id FROM newvals
        ORDER BY id""")),

    // ── D4: last-wins dedup by natural key ─────────────────────────
    "q09_last_wins_dedup" -> QuerySpec(
      build = (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        orders(s, d).withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
            col("o_totalprice").as("latest_price"))
          .orderBy("o_custkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey AS latest_orderkey,
               o_totalprice AS latest_price
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        WHERE rn = 1 ORDER BY o_custkey""")),

    // ── E: window functions (running sum, explicit ROWS frame) ─────
    "q11_window_running" -> QuerySpec(
      // Running sum filtered to rn <= 5: the prefix sums at positions
      // 1..5 depend ONLY on each key's first 5 rows, so the bounded-
      // heap TopKPerKey selects those rows FIRST (map-side partial
      // heaps — no full sort of the fact table, the round-9 fix for
      // the 6.8× scale curve: the old plan sorted every row through
      // the window and discarded all but 5/key) and the window then
      // runs over ≤5 rows per key, riding TopKPerKey's preserved
      // hash partitioning — no second exchange.
      build = (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        val top5 = graft.operators.TopK.perKeyRanked(
          lineitem(s, d).select(col("l_suppkey"), col("l_quantity"),
            col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          Seq("l_suppkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          5, "rn")
        top5
          .withColumn("running_qty",
            sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("l_suppkey"), col("rn"),
            round(col("running_qty"), 2).as("running_qty"))
          .orderBy("l_suppkey", "rn")
      },
      oracle = Some("""
        SELECT l_suppkey, rn, round(running_qty, 2) AS running_qty
        FROM (SELECT l_suppkey,
                sum(l_quantity) OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
                ROW_NUMBER() OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
              FROM lineitem)
        WHERE rn <= 5 ORDER BY l_suppkey, rn"""),
      bench = true),

    // ── E: top-k ───────────────────────────────────────────────────
    "q12_topk" -> QuerySpec(
      build = (s, d) => orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      oracle = Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ── E: set operations ──────────────────────────────────────────
    "q13_set_ops" -> QuerySpec(
      build = (s, d) => {
        val c = customer(s, d)
        val building = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        val withOrders = orders(s, d).select(col("o_custkey").as("c_custkey"))
          .distinct()
        building.union(rich).distinct()
          .intersect(withOrders)
          .except(c.filter(col("c_acctbal") < 0).select(col("c_custkey")))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          UNION
          SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        INTERSECT SELECT DISTINCT o_custkey AS c_custkey FROM orders
        EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal < 0
        ORDER BY c_custkey""")),

    // ── D: rollup (multi-level aggregate) ──────────────────────────
    "q14_rollup" -> QuerySpec(
      build = (s, d) => lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ── E: GROUPING SETS (the general form rollup/cube specialize) ──
    // Spark 4's Dataset.groupingSets — one shuffle, Expand below the
    // partial aggregate, exactly like q14/q35's rollup/cube plans.
    "q68_grouping_sets" -> QuerySpec(
      build = (s, d) => orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum(col("o_totalprice")), 2).as("total"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST""")),

    // ── D: distinct aggregation ────────────────────────────────────
    "q15_distinct_agg" -> QuerySpec(
      build = (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── F7/G: JSON extraction (events.props) ───────────────────────
    "q16_json_extract" -> QuerySpec(
      build = (s, d) => events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          round(avg(col("value")), 4).as("avg_value"))
        .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS BIGINT) AS sum_k,
               count(*) AS n, round(avg(value), 4) AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── G: explode / flatten (documents → tokens) ──────────────────
    "q17_explode_tokens" -> QuerySpec(
      build = (s, d) => documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20),
      oracle = Some("""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE length(token) > 0
        GROUP BY token ORDER BY n DESC, token LIMIT 20"""),
      bench = true),

    // ── F8/date functions: monthly aggregate ───────────────────────
    "q18_monthly_orders" -> QuerySpec(
      build = (s, d) => orders(s, d)
        .withColumn("month", date_trunc("month", col("o_orderdate")).cast("date"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy("month"),
      oracle = Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY 1 ORDER BY month""")),

    // ── G2-style unionByName of two shaped branches ────────────────
    "q19_union_branches" -> QuerySpec(
      build = (s, d) => {
        val a = lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("k"), col("l_extendedprice").as("v"))
          .withColumn("src", lit("returns"))
        val b = orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
          .withColumn("src", lit("open"))
        a.unionByName(b).groupBy(col("src"))
          .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("sum_v"))
          .orderBy("src")
      },
      oracle = Some("""
        SELECT src, count(*) AS n, round(sum(v), 2) AS sum_v FROM (
          SELECT l_orderkey AS k, l_extendedprice AS v, 'returns' AS src
          FROM lineitem WHERE l_returnflag = 'R'
          UNION ALL
          SELECT o_orderkey AS k, o_totalprice AS v, 'open' AS src
          FROM orders WHERE o_orderstatus = 'O')
        GROUP BY src ORDER BY src"""))
  )
}
