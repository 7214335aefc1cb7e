package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.QuerySpec

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-area registries; every entry with
  * an oracle is hash-checked against DuckDB by the driver at sf0.01.
  */
object SparkEntry {

  /** All registered query specs (name -> spec). */
  def specs: Map[String, QuerySpec] =
    graft.analytics.RelationalQueries.queries ++
    graft.analytics.ExtendedQueries.queries ++
    graft.analytics.TypedQueries.queries ++
    graft.analytics.EventQueries.queries ++
    graft.text.TextQueries.queries ++
    graft.text.CurationQueries.queries ++
    graft.similarity.SimilarityQueries.queries ++
    graft.multimodal.MediaQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    specs("q03_revenue_by_nation").build(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map { case (name, spec) =>
      name -> ((s: SparkSession, dir: String) => {
        GraftSession.configure(s)
        spec.build(s, dir)
      })
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.collect { case (name, QuerySpec(_, Some(sql), _)) =>
      name -> sql.trim.replaceAll("\\s+", " ")
    }
}
