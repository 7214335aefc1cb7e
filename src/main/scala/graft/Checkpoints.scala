package graft

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative-closure results — the one device behind
  * every eager `localCheckpoint(true)` in the query tree (q82/q190's
  * cluster summaries, q85's pair pins), with a RELIABLE escape hatch
  * for real clusters.
  *
  * `localCheckpoint(true)` materializes to executor-local blocks and
  * TRUNCATES lineage: cheap (no DFS write) and exactly right in a
  * single-JVM run, but on a multi-executor cluster a lost executor
  * makes the blocks unrecoverable — the job fails instead of
  * recomputing. Production runs set `spark.graft.checkpoint.dir` (or
  * pre-set `SparkContext.setCheckpointDir` themselves) and the same
  * call sites become reliable checkpoints (blocks on the cluster's
  * fault-tolerant store, recompute-free recovery); nothing else in the
  * plan changes. Default stays local: the cheap mode is the correct
  * one for tests, the bench, and the driver's local[32] runs.
  *
  * Mode resolution tracks what THIS object configured, because
  * `SparkContext.checkpointDir` can never be unset and
  * `getCheckpointDir` returns the per-application UUID SUBDIR that
  * `setCheckpointDir` creates (never equal to the raw configured
  * path): unsetting the conf reverts to local mode even though the
  * leftover context dir persists, and a conf value is applied to the
  * context exactly once — not re-`setCheckpointDir`-ed (a fresh UUID
  * subdir) on every cut. A context checkpoint dir the CALLER set
  * before any cut is still honored as reliable intent. */
object Checkpoints {

  val ConfKey = "spark.graft.checkpoint.dir"

  /** The conf value this object last applied via setCheckpointDir —
    * the "we set it" marker that keeps conf-unset reverting to local. */
  private var applied: Option[String] = None

  /** Eagerly materialize `df` and cut its lineage — reliably when a
    * checkpoint dir is configured, locally otherwise. */
  def cut(df: DataFrame): DataFrame = synchronized {
    val s = df.sparkSession
    val sc = s.sparkContext
    s.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (!applied.contains(dir)) {
          sc.setCheckpointDir(dir)
          applied = Some(dir)
        }
        df.checkpoint(eager = true)
      case None =>
        if (sc.getCheckpointDir.isDefined && applied.isEmpty)
          df.checkpoint(eager = true) // caller's own pre-set dir
        else
          df.localCheckpoint(eager = true)
    }
  }
}
