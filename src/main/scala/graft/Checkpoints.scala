package graft

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative-closure results — the one device behind
  * every eager `localCheckpoint(true)` in the query tree (q82/q190's
  * cluster summaries), with a RELIABLE escape hatch for real clusters.
  *
  * `localCheckpoint(true)` materializes to executor-local blocks and
  * TRUNCATES lineage: cheap (no DFS write) and exactly right in a
  * single-JVM run, but on a multi-executor cluster a lost executor
  * makes the blocks unrecoverable — the job fails instead of
  * recomputing. Production runs set `spark.graft.checkpoint.dir` (or
  * pre-set `SparkContext.setCheckpointDir`) and the same call sites
  * become reliable checkpoints (blocks on the cluster's fault-tolerant
  * store, recompute-free recovery); nothing else in the plan changes.
  * Default stays local: the cheap mode is the correct one for tests,
  * the bench, and the driver's local[32] runs. */
object Checkpoints {

  val ConfKey = "spark.graft.checkpoint.dir"

  /** Eagerly materialize `df` and cut its lineage — reliably when a
    * checkpoint dir is configured, locally otherwise. */
  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val sc = s.sparkContext
    val configured = s.conf.getOption(ConfKey).filter(_.nonEmpty)
    (configured, sc.getCheckpointDir) match {
      case (Some(dir), existing) =>
        if (!existing.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case (None, Some(_)) => df.checkpoint(eager = true)
      case (None, None)    => df.localCheckpoint(eager = true)
    }
  }
}
