package graft

import org.apache.spark.SparkContext
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
  * Mode resolution tracks what this object configured ON WHICH
  * SparkContext, because `SparkContext.checkpointDir` can never be
  * unset and `getCheckpointDir` returns the per-application UUID
  * SUBDIR that `setCheckpointDir` creates (never equal to the raw
  * configured path): unsetting the conf reverts to local mode even
  * though the leftover context dir persists; a conf value is applied
  * to a given context exactly once (not re-`setCheckpointDir`-ed into
  * a fresh UUID subdir per cut); a RESTARTED context with the same
  * conf is configured afresh instead of crashing on a skipped set;
  * and a context checkpoint dir the CALLER set (this object never
  * touched that context) is honored as reliable intent. Only the
  * bookkeeping is locked — the checkpoint job itself runs outside the
  * lock, so concurrent cuts never serialize on each other. */
object Checkpoints {

  val ConfKey = "spark.graft.checkpoint.dir"

  /** (context, conf dir) this object last applied via
    * setCheckpointDir — identity-keyed so a restarted context is
    * never mistaken for the configured one. */
  private var applied: Option[(SparkContext, String)] = None

  /** Eagerly materialize `df` and cut its lineage — reliably when a
    * checkpoint dir is configured, locally otherwise. */
  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val sc = s.sparkContext
    val reliable = synchronized {
      s.conf.getOption(ConfKey).filter(_.nonEmpty) match {
        case Some(dir) =>
          if (!applied.contains((sc, dir))) {
            sc.setCheckpointDir(dir)
            applied = Some((sc, dir))
          }
          true
        case None =>
          // a pre-set context dir is reliable intent UNLESS this
          // object set it (then a conf unset means: back to local)
          sc.getCheckpointDir.isDefined && !applied.exists(_._1 eq sc)
      }
    }
    if (reliable) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }
}
