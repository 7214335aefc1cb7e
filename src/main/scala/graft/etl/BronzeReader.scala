package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bronze CSV scan (SURVEY §2 A4/A5/A8).
  *
  * Mirrors the reference's csv-parse options
  * (`services/empresa.ts:42-49`): `;` delimiter, header row, UTF-8 BOM
  * tolerated, blank lines skipped, cell padding trimmed, ragged rows
  * tolerated. Ragged/garbage rows land in `_corrupt` (PERMISSIVE mode)
  * instead of killing the file — the Spark equivalent of the
  * reference's per-row try/catch (H6/H7).
  *
  * Each row additionally carries:
  *  - `_source_file`  — `nombre_archivo_origen` metadata
  *    (`ingesta-drive-gcs/src/index.ts:101-107`)
  *  - `_load_date`    — `fecha_carga` (supplied batch date, or today)
  *  - `_row_id`       — monotonically increasing, file-order within
  *    each file split; splits of one file are offset-ordered, so ids
  *    order rows the way the reference's `for await` loop saw them
  *    (needed for last-wins dedup, SURVEY §2 D4 / §7 risk 2).
  */
object BronzeReader {

  def read(spark: SparkSession, path: String, schema: StructType,
           loadDate: Option[String] = None): DataFrame = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt", StringType, nullable = true))
    val fecha = loadDate.map(d => to_date(lit(d))).getOrElse(current_date())
    spark.read
      .schema(withCorrupt)
      .option("delimiter", ";")
      .option("header", "true")
      // RFC4180 doubled-quote escaping, matching csv-parse defaults
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("enforceSchema", "false")
      .csv(path)
      .withColumn("_source_file",
        element_at(split(input_file_name(), "/"), -1))
      .withColumn("_load_date", fecha)
      .withColumn("_row_id", monotonically_increasing_id())
  }

  /** A8/F9 filename router (`etl-gcs-cloudsql/src/index.ts:24-49`):
    * lowercase substring + `.csv` suffix; unknown -> None (log-and-skip). */
  sealed trait FileKind
  case object EmpresaFile extends FileKind
  case object ConductorFile extends FileKind
  case object VehiculoFile extends FileKind

  def classify(fileName: String): Option[FileKind] = {
    val lower = fileName.toLowerCase
    if (!lower.endsWith(".csv")) None
    else if (lower.contains("empresa")) Some(EmpresaFile)
    else if (lower.contains("conductor")) Some(ConductorFile)
    else if (lower.contains("vehiculo")) Some(VehiculoFile)
    else None
  }
}
