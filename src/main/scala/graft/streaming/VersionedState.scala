package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Durable versioned-snapshot state shared by the streaming jobs
  * ([[StreamResolveJob]], [[StreamDedupJob]]): state versions live at
  * `root/v=<batchId>`, committed by creating `v=<id>/_COMMITTED` LAST (a
  * single atomic create — no rename-overwrite semantics to depend on; a
  * crash mid-write leaves an uncommitted dir that the replay
  * overwrites). Structured Streaming replays a failed batch with the
  * SAME batchId, so skipping any batch at-or-below the max committed
  * version gives exactly-once state on at-least-once foreachBatch.
  */
private[streaming] object VersionedState {

  def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending. A version counts only once its
    * `_COMMITTED` marker exists — partial writes are invisible.
    */
  def committedVersions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Nil
    fs.listStatus(rootPath).map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        fs.exists(new Path(p, "_COMMITTED")))
      .map(_.getName.drop(2).toLong).sorted.toSeq
  }

  def latestVersion(spark: SparkSession, root: String): Long =
    committedVersions(spark, root).lastOption.getOrElse(-1L)

  /** Commit `v` and prune: keep the last two COMMITTED versions (the
    * previous one stays for readers mid-swap); delete every other v= dir
    * — older committed snapshots AND uncommitted leftovers from failed
    * attempts, which must never count toward the keep-2 window.
    */
  def commitVersion(spark: SparkSession, root: String, v: Long): Unit = {
    val fs = fsOf(spark, root)
    fs.create(new Path(s"$root/v=$v/_COMMITTED"), true).close()
    val keep = committedVersions(spark, root).takeRight(2)
      .map(id => s"v=$id").toSet
    fs.listStatus(new Path(root)).map(_.getPath)
      .filter(p => p.getName.startsWith("v=") && !keep(p.getName))
      .foreach(p => fs.delete(p, true))
  }

  /** The state root and the streaming checkpoint form ONE lineage:
    * batchIds only mean anything relative to the checkpoint that issued
    * them. Fail fast on EITHER divergence: a fresh checkpoint over
    * committed state (restarted batchIds would be skip-dropped up to the
    * old high-water mark — silent data loss), and a progressed
    * checkpoint over an empty state root (the source would skip every
    * recorded file and the rebuilt state would silently miss them all).
    */
  def lineageGuard(spark: SparkSession, ckpt: String, stateRoot: String): Unit = {
    val ckptOffsets = new Path(s"$ckpt/offsets")
    val ckptFresh = !fsOf(spark, ckpt).exists(ckptOffsets)
    val stateEmpty = latestVersion(spark, stateRoot) < 0
    if (ckptFresh && !stateEmpty)
      throw new IllegalStateException(
        s"state root $stateRoot has committed versions but checkpoint $ckpt is fresh; " +
          "state and checkpoint form one lineage — restore the original checkpoint " +
          "or start a new state root")
    if (!ckptFresh && stateEmpty)
      throw new IllegalStateException(
        s"checkpoint $ckpt has recorded progress but state root $stateRoot has no " +
          "committed versions; resuming would skip every previously ingested file — " +
          "restore the state root or start a fresh checkpoint AND state together")
  }
}
