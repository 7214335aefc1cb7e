package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness tables (TESTDATA.md). Reads are plain parquet
  * scans so Catalyst's column pruning / predicate pushdown reach the
  * file source — verified via `.explain` (PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), read as Long ns-since-epoch
    * (see GraftSession nanosAsLong); convert to a microsecond timestamp
    * the same way DuckDB truncates ns -> µs. Integer `div` — `/` would
    * go through Double and lose sub-µs exactness (ns epoch >> 2^53). */
  def eventTs: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros(expr("ts div 1000"))
  }

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String)    = table(s, d, "events")
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")
}

/** One harness query: the Spark build and (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same tables. Column names in
  * both MUST match — the driver sorts columns by name before hashing. */
final case class QuerySpec(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** true = headline query timed by Bench at sf0.1 */
    bench: Boolean = false)
