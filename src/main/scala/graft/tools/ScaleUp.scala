package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-experiment data generator: replicates the harness tables N
  * times with shifted keys so per-key cardinalities stay realistic
  * (10x the data should mean 10x the keys, not 10x-hotter keys).
  * Document texts get a per-replica salt token so near-dup candidates
  * don't explode quadratically across replicas. Usage:
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  *
  * Output feeds Bench via SPARK_GRAFT_SF_DIR to answer "does the plan
  * survive a 10x scale-up" with measurements instead of claims.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    // the c_name digit-rotation pair (rEven, rOdd) = (i/10%10, i%10)
    // is only injective for i < 100: replica 100 would get (0, 0) and
    // clone the base names verbatim, silently reintroducing the
    // distance-0 twin explosion the rotation exists to prevent (the
    // EditSimScale m <= 10 guard, same reason)
    require(factor >= 1 && factor <= 100,
      s"ScaleUp factor must be in [1, 100], got $factor — the c_name" +
        " replica-disambiguation scheme has 100 distinct offset pairs")
    val spark = graft.GraftSession.create()

    def replicate(name: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val replicas = (0 until factor).map(i => f(base, i))
      replicas.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x$factor")
    }

    /** Key-less dimensions are copied ONCE — replicating them would
      * duplicate every dim row `factor`-fold and inflate every
      * nation/region join `factor`-fold (a semantic corruption, not a
      * scale-up: fact rows keep their original nationkeys). */
    def copyOnce(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x1 (dimension)")
    }

    // key shift constants comfortably above the sf0.1 key ranges
    val K = 100000000L
    copyOnce("region")
    copyOnce("nation")
    // c_name is key-derived ("Customer#000000042"): cloning it verbatim
    // would hand every name factor-1 distance-0 twins and blow the
    // edit-sim join's TRUE-match set up O(factor²) — the documents
    // salt-token rule, applied to names. Digits instead rotate by a
    // per-replica (even-position, odd-position) offset pair: each track
    // is a character bijection, so within-replica distances stay
    // realistic, while any two replicas i != j < 100 disagree on at
    // least one track and differ in every digit of that track (≥4 of
    // the 9 id digits) — cross-replica name distance stays above any
    // sane join threshold.
    replicate("customer", (df, i) => {
      val (rEven, rOdd) = ((i / 10) % 10, i % 10)
      df.withColumn("c_custkey", col("c_custkey") + lit(i * K))
        .withColumn("c_name", expr(
          s"""concat_ws('', transform(split(c_name, ''), (ch, p) ->
                IF(ch BETWEEN '0' AND '9',
                   CAST((CAST(ch AS INT) +
                         IF(p % 2 = 0, $rEven, $rOdd)) % 10 AS STRING),
                   ch)))"""))
    })
    replicate("supplier", (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * K)))
    replicate("part", (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * K)))
    replicate("orders", (df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * K))
      .withColumn("o_custkey", col("o_custkey") + lit(i * K)))
    replicate("lineitem", (df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * K))
      .withColumn("l_partkey", col("l_partkey") + lit(i * K))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * K)))
    replicate("events", (df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * K))
      .withColumn("user_id", col("user_id") + lit(i * K)))
    // every TOKEN gets a replica prefix, so clones share NO word
    // shingles across replicas — a trailing salt token would leave
    // near-identical clones and blow candidate pairs up O(factor²)
    replicate("documents", (df, i) => df
      .withColumn("doc_id", col("doc_id") + lit(i * K))
      .withColumn("text",
        concat(lit(s"r$i"), regexp_replace(col("text"), " ", s" r$i"))))
    replicate("embeddings", (df, i) => df
      .withColumn("vec_id", col("vec_id") + lit(i * K))
      .withColumn("label", col("label") + lit(i * 1000)))
    spark.stop()
  }
}
