package graft.etl

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Relational (JDBC) Silver sink — A7 parity with the reference's only
  * sink, Cloud SQL Postgres (`etl-gcs-cloudsql/src/db.ts:24-46`: pooled
  * connections, per-schema search_path, per-row
  * `INSERT ... ON CONFLICT DO UPDATE`).
  *
  * Spark-first shape: the reference upserts ROW BY ROW over the pool —
  * hundreds of rows/s. Here each batch bulk-loads into a staging table
  * through Spark's JDBC writer (executor-parallel via `numPartitions`,
  * batched inserts via `batchsize`), then ONE set-based
  * `MERGE INTO target USING staging` statement applies the upsert —
  * the standard bulk pattern that keeps the database doing one big
  * join instead of 10⁴ round-trips.
  *
  * Works against any MERGE-capable JDBC database; exercised in tests
  * with embedded Derby (the only JDBC engine in this sandbox). The
  * MERGE statement itself is ANSI and Postgres 15+ speaks it verbatim;
  * the first-use DDL sticks to spellings both engines accept (e.g.
  * DOUBLE PRECISION), except sequence access — ANSI/Derby
  * `NEXT VALUE FOR` vs Postgres `nextval()` — which a Postgres
  * deployment would swap in the insert branch.
  * Surrogate ids come from a `GENERATED ... AS IDENTITY` column, the
  * JDBC twin of the reference's SERIAL.
  */
final class JdbcSink(spark: SparkSession, url: String,
                     numPartitions: Int = 4, batchSize: Int = 1000) {

  private def withConn[A](f: Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def q(ident: String): String = "\"" + ident + "\""

  private def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(1024)"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    // DOUBLE PRECISION is the spelling both Derby and Postgres accept
    // (bare DOUBLE is Derby-only)
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(s"no JDBC mapping for $other")
  }

  private def tableExists(c: Connection, table: String): Boolean =
    // unquoted identifiers case-fold differently per engine (Derby
    // upper-cases, Postgres lower-cases) — probe all foldings
    Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
      val rs = c.getMetaData.getTables(null, null, t, null)
      try rs.next() finally rs.close()
    }

  /** Upsert `df` into `table` on `keys`. Creates the target on first
    * use with a sequence-assigned `idCol` (an ANSI SEQUENCE rather
    * than GENERATED ALWAYS AS IDENTITY: Derby's MERGE implementation
    * NPEs on identity-column targets once the insert set exceeds a
    * handful of rows — a Derby bug the sequence route sidesteps with
    * identical semantics; Postgres speaks both). Matched rows update
    * every non-key data column; unmatched insert with the next
    * sequence value. */
  def upsert(table: String, df0: DataFrame, keys: Seq[String],
             idCol: String): Unit = {
    require(keys.forall(df0.columns.contains),
      s"keys $keys not all in ${df0.columns.toSeq}")
    // A set-based MERGE requires a source unique on the join keys
    // (duplicates either raise a cardinality violation or insert
    // duplicate natural keys, depending on the engine). The reference's
    // row-by-row ON CONFLICT resolves intra-batch duplicates last-wins
    // in file order — replicate that with `_row_id` (BronzeReader file
    // order) when the batch carries it. Without one there IS no file
    // order, so the winner is the row with the greatest hashed value —
    // arbitrary but DETERMINISTIC across reruns and partition layouts
    // (a partition-dependent ordinal like monotonically_increasing_id
    // would pick a different winner per replay and break idempotence).
    // `_row_id` is dedup metadata either way, never a target column.
    val df = {
      val ordered =
        if (df0.columns.contains("_row_id")) df0
        else {
          import org.apache.spark.sql.functions.{col, xxhash64}
          val nonKey = df0.columns.filterNot(keys.contains)
          df0.withColumn("_row_id",
            xxhash64((keys ++ nonKey).map(col).toIndexedSeq: _*))
        }
      MergeOps.lastWins(ordered, keys).drop("_row_id")
    }
    val dataCols = df.columns.toSeq
    val staging = s"stg_$table"

    // Spark's Derby dialect maps StringType to CLOB, which Derby cannot
    // compare in a MERGE join — force VARCHAR for the staging strings.
    val stringCols = df.schema.fields.filter(_.dataType == StringType)
    val colTypes = stringCols.map(f => s"${f.name} VARCHAR(1024)").mkString(", ")
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", staging)
      .option("numPartitions", numPartitions)
      .option("batchsize", batchSize)
      .mode("overwrite")
    (if (colTypes.nonEmpty) w.option("createTableColumnTypes", colTypes) else w)
      .save()

    withConn { c =>
      if (!tableExists(c, table)) {
        val cols = df.schema.fields
          .map(f => s"${q(f.name)} ${sqlType(f.dataType)}").mkString(", ")
        c.createStatement().execute(
          s"""CREATE TABLE $table (
              ${q(idCol)} INTEGER NOT NULL PRIMARY KEY, $cols)""")
        c.createStatement().execute(
          s"CREATE SEQUENCE seq_$table AS INTEGER START WITH 1")
      }
      val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val setCols = dataCols.filterNot(keys.contains)
      val set = setCols.map(cn => s"t.${q(cn)} = s.${q(cn)}").mkString(", ")
      val insCols = (idCol +: dataCols).map(q).mkString(", ")
      val insVals = (s"NEXT VALUE FOR seq_$table" +:
        dataCols.map(cn => s"s.${q(cn)}")).mkString(", ")
      val matched =
        if (setCols.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $set" else ""
      c.createStatement().execute(
        s"""MERGE INTO $table t USING $staging s ON $on
            $matched
            WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)""")
    }
  }

  /** Read a sink table back as a DataFrame (partitionable via the
    * standard JDBC read options by callers that need parallelism). */
  def read(table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
}
