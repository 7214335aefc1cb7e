package graft.plans

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan-parallelism floor for CPU-dense kernels (guide
  * §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read", §6 input split sizing).
  *
  * Spark sizes scan splits by BYTES (`maxPartitionBytes` /
  * `openCostInBytes`), but a parquet split only yields rows at
  * row-group granularity — a small single-row-group file is read by
  * exactly ONE task no matter how many cores the session has. For a
  * plain aggregate that is fine (the scan is the cost); for a
  * CPU-dense kernel fused into the scan stage (per-shingle md5,
  * tokenize + explode, fingerprint embeddings) it serializes the
  * whole kernel onto one core: measured 1.5–2 s single-task walls at
  * sf0.1 while 31 cores idled (q24's shingle kernel, q111's
  * tokenize).
  *
  * [[byKey]] hash-repartitions the frame to the session's default
  * parallelism ONLY when the scan's achievable parallelism (files,
  * and — when the file count alone is too low — their total parquet
  * row-group count, read from footers) is below half the session's
  * cores. At production scale the inputs are many files × many row
  * groups, the condition never fires and NOTHING is shuffled — the
  * spread is a local-input correction, not a tuning constant (the
  * explicit partition count pins the exchange against AQE's
  * byte-based coalescing, which would otherwise re-serialize a
  * CPU-dense-but-byte-light kernel input right back to one task).
  */
object Spread {

  /** Parquet row groups per file, from the footer (no data read). */
  private def rowGroups(path: String): Int = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(path), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRowGroups.size
    finally r.close()
  }

  /** The scan parallelism `df`'s file sources can actually deliver:
    * the file count when that alone reaches `atLeast`, else the total
    * row-group count (footers are only opened for handfuls of local
    * files — at scale the file count short-circuits). Non-file frames
    * report `atLeast` (nothing to correct). */
  private def scanParallelism(df: DataFrame, atLeast: Int): Int = {
    val files =
      try df.inputFiles
      catch { case _: Throwable => return atLeast }
    if (files.isEmpty || files.length >= atLeast) return atLeast
    try files.map(rowGroups).sum
    catch { case _: Throwable => atLeast } // unreadable footer: leave as-is
  }

  /** `df` hash-repartitioned by `key` to the session's default
    * parallelism when its scan cannot reach half of it; unchanged
    * otherwise. `key` must spread well (a unique id). Results are
    * unchanged — this only moves rows. */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (scanParallelism(df, cores) * 2 < cores)
      df.repartition(cores, key)
    else df
  }
}
