package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet publications — THE shared idiom for small frames
  * that batch jobs publish and long-running readers re-read (anomaly
  * thresholds, the DP privacy ledger): each publish lands as a new
  * `v<N>` subdir of the root via unique-tmp + atomic rename (the
  * [[graft.text.Artifacts]] discipline), so a reader never sees a
  * half-written set; versions only grow, and readers take the highest.
  * A concurrent publisher losing the rename race just takes the next
  * number. Scale contract: publications are driver-bounded frames
  * (threshold sets, ledgers) — the pattern is for METADATA, not data. */
object VersionedDir {

  /** Publish `df` as the next `v<N>` under `dir`; returns the claimed
    * version number. */
  def publish(df: DataFrame, dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(root)
    val tmp = root.resolve("._tmp-" + java.util.UUID.randomUUID)
    df.write.mode("overwrite").parquet(tmp.toString)
    claim(root, tmp)
  }

  /** Atomically claim the next `v<N>` for a fully-staged payload dir —
    * THE one implementation of the claim-race loop (LabelStore
    * re-publish and VectorStore.retrain stage their own payloads and
    * claim here): losers of a concurrent rename race just take the
    * next number. Returns the claimed version. */
  def claim(root: java.nio.file.Path,
            staged: java.nio.file.Path): Long = {
    var claimed = -1L
    while (claimed < 0) {
      val v = latestVersion(root) + 1
      try {
        java.nio.file.Files.move(staged, root.resolve("v" + v),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        claimed = v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: java.nio.file.DirectoryNotEmptyException => ()
      }
    }
    claimed
  }

  /** Delete orphaned staging dirs by name prefix (a crash between a
    * staged write and its claim/swap leaks one; nothing else cleans
    * them). Shared by the streaming state stores (`_tmp-`) and the
    * re-publish stagers (`._stage-`). */
  def sweep(root: java.nio.file.Path, prefix: String): Unit = {
    if (!java.nio.file.Files.isDirectory(root)) return
    val st = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix))
        .foreach(graft.text.Artifacts.deleteRecursively)
    } finally st.close()
  }

  /** Every published version number under `root` (unsorted). ONE
    * implementation of the `v<N>` listing protocol — the streaming
    * state stores (RollupStream / Scd2Stream / AttributionStream)
    * share it rather than re-implementing the regex walk. */
  def versions(root: java.nio.file.Path): Seq[Long] = {
    if (!java.nio.file.Files.isDirectory(root)) return Nil
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("v\\d+")).map(_.drop(1).toLong).toSeq
    } finally s.close()
  }

  /** Highest published version under `root`; 0 when none. */
  def latestVersion(root: java.nio.file.Path): Long =
    versions(root).foldLeft(0L)(math.max)

  /** Highest version strictly below `id` — the replay-idempotent
    * foldBatch read rule (batch `id` folds from state produced by
    * earlier batches only, so a replay sees exactly its original
    * input). */
  def latestBefore(root: java.nio.file.Path, id: Long): Option[Long] =
    versions(root).filter(_ < id).maxOption

  /** Drop superseded versions, keeping the newest `keep`. */
  def prune(dir: String, keep: Int): Unit = {
    val root = java.nio.file.Paths.get(dir)
    versions(root).sorted(Ordering[Long].reverse).drop(keep)
      .foreach(v => graft.text.Artifacts.deleteRecursively(
        root.resolve("v" + v)))
  }

  /** Read the highest-version publication. */
  def loadLatest(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(dir)
    val v = latestVersion(root)
    require(v > 0, s"no publication under $dir")
    spark.read.parquet(root.resolve("v" + v).toString)
  }
}
