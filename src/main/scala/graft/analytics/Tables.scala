package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness tables (TESTDATA.md). Reads are plain parquet
  * scans so Catalyst's column pruning / predicate pushdown reach the
  * file source — verified via `.explain` (PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Epoch-MICROS Long from an `events` frame's `ts` column, robust to
    * how the harness happened to write it. The generator has shipped
    * both parquet TIMESTAMP(NANOS) (read as Long ns-since-epoch under
    * GraftSession's nanosAsLong) and TIMESTAMP(MICROS, isAdjustedToUTC
    * =false) (read as TIMESTAMP_NTZ); the oracle's `epoch_us(ts)` is
    * µs either way (DuckDB truncates ns on read), so µs is the one
    * cross-engine clock. Integer `div` for the ns case — `/` would go
    * through Double and lose sub-µs exactness (ns epoch >> 2^53); the
    * NTZ case routes through TIMESTAMP_LTZ under the session's pinned
    * UTC zone, where wall-time µs == epoch µs. */
  def tsUs(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType           => expr("ts div 1000")
      case TimestampNTZType   => expr("unix_micros(cast(ts as timestamp_ltz))")
      case TimestampType      => expr("unix_micros(ts)")
      case dt => throw new IllegalStateException(
        s"events.ts: unsupported type $dt")
    }
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
