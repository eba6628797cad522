package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.blocking.BlockingKeys
import graft.functions.Er
import graft.norm.Normalizer
import graft.pipeline.IncrementalResolve
import graft.sim.SimilarityWeights
import graft.util.Args

/** Production streaming entry: maintain an entity clustering over an
  * UNBOUNDED arriving span-doc table. Each micro-batch runs the
  * contracted-graph increment ([[IncrementalResolve.resolveNames]] — the
  * body proven hash-exact vs full recompute by q65) against durable
  * state. Per-batch COMPUTE is O(increment): the state's exploded
  * blocking-key table is persisted with each version and read back (the
  * state names are never re-keyed), so the batch pays |new keys| ⋈
  * |state keys| plus CC over one vertex per TOUCHED cluster. Per-batch
  * state I/O writes a full snapshot copy per version — the simple
  * filesystem layout's cost; swap the state store for a merge-on-read
  * table format (Iceberg/Delta) to make the I/O O(increment) too.
  *
  * {{{
  * spark-submit --class graft.streaming.StreamResolveJob graft.jar \
  *   --input s3://bucket/incoming --state s3://bucket/er-state \
  *   --checkpoint s3://bucket/er-ckpt [--trigger "30 seconds"]
  * }}}
  *
  * Each state version holds `clusters`, `names`, `keys` and a
  * cumulative `rejects` table (docs whose name was invalid or
  * normalized to nothing — recorded like the batch pipeline's rejects
  * output, so ingested-vs-clustered doc counts always reconcile).
  *
  * State durability/idempotence: state versions live at
  * `state/v=<batchId>`, committed by creating `v=<id>/_COMMITTED` LAST
  * (a single atomic create — no rename-overwrite semantics to depend
  * on; a crash mid-write leaves an uncommitted dir that the replay
  * overwrites). Structured Streaming replays a failed batch with the
  * SAME batchId, and [[attachBatch]] skips any batch at-or-below the
  * max committed version — exactly-once state even though foreachBatch
  * is at-least-once. Committed versions beyond the last two are pruned.
  *
  * The state root and the streaming checkpoint form ONE lineage:
  * batchIds only mean anything relative to the checkpoint that issued
  * them. [[start]] fails fast on EITHER divergence: a fresh checkpoint
  * over committed state (restarted batchIds would be skip-dropped up to
  * the old high-water mark) and a progressed checkpoint over an empty
  * state root (the source would skip every recorded file and the
  * rebuilt clustering would silently miss them all).
  */
object StreamResolveJob {

  private val Usage =
    """graft.streaming.StreamResolveJob
      |  --input DIR               landing dir of span-doc parquet files
      |  --state DIR               durable state root (versioned snapshots)
      |  --checkpoint DIR          Structured Streaming checkpoint
      |  [--trigger "30 seconds"|availableNow]   default availableNow
      |  [--weights L,JW,JAC]      default 0.33,0.34,0.33
      |  [--threshold T]           merge threshold, default 0.92
      |  [--max-block-size N]      default 1000
      |  [--max-files-per-trigger N]
      |""".stripMargin

  private[streaming] def parseArgs(args: Array[String]): Map[String, String] =
    Args.parse(args,
      known = Set("input", "state", "checkpoint", "trigger", "weights",
        "threshold", "max-block-size", "max-files-per-trigger"),
      required = Set("input", "state", "checkpoint"),
      usage = Usage)

  import VersionedState.{fsOf, latestVersion, commitVersion}

  private def stateKeys(names: DataFrame): DataFrame =
    BlockingKeys.explodeKeys(names, "doc_id",
      BlockingKeys.defaultKeys(col("normalized")))

  /** One micro-batch: derive + normalize names from the arriving span
    * docs, run the contracted-graph increment against the committed
    * state (whose persisted key table is read back, not re-derived),
    * commit the new state version. Idempotent on `batchId`.
    */
  def attachBatch(spark: SparkSession, stateRoot: String,
                  batch: DataFrame, batchId: Long,
                  weights: SimilarityWeights = SimilarityWeights.default,
                  threshold: Double = 0.92,
                  maxBlockSize: Int = 1000): Unit = {
    val committed = latestVersion(spark, stateRoot)
    if (committed >= batchId) return // replayed batch — state already has it
    Er.register(spark)

    // persist (not localCheckpoint): the batch tables are read several
    // times within this micro-batch and must release their storage at
    // the end — a long-running stream would otherwise accumulate one
    // pinned block set per batch
    // same validity gate as the batch pipeline (N8, ResolvePipeline's
    // rejects split): an invalid name (blank/too_long/control_chars) or
    // one that normalizes to nothing never enters the clustering —
    // without the rejectReason conjunct the stream would happily cluster
    // a doc the batch entry rejects
    val named = batch
      .withColumn("name", Er.docName(col("spans")))
      .withColumn("reject_reason",
        coalesce(Er.rejectReason(col("name")),
          when(Normalizer.normalizeColumn(col("name")) === "",
            lit("EMPTY_NORMALIZED"))))
    val newNames = named
      .where(col("reject_reason").isNull)
      .select(col("doc_id"),
        Normalizer.normalizeColumn(col("name")).as("normalized"))
      .persist()
    // the dropped docs are RECORDED, like the batch pipeline's rejects
    // table, instead of vanishing from the maintained state with no
    // trace (state doc counts must reconcile with ingested counts).
    // Consumed once (written below); no persist needed.
    val newRejects = named
      .where(col("reject_reason").isNotNull)
      .select(col("doc_id"), col("name"), col("reject_reason"),
        lit(batchId).as("batch_id"))
    val newKeys = stateKeys(newNames).persist()
    try {
      val (existing, existingNames, existingKeys) =
        if (committed < 0)
          (batch.select(col("doc_id"), col("doc_id").as("cluster_id")).limit(0),
            newNames.limit(0), None)
        else {
          // keys fallback: state committed by an engine version that wrote
          // only clusters/names migrates transparently — resolveNames
          // derives the old keys from the names once, and THIS version
          // persists them for every batch after
          val keysPath = new Path(s"$stateRoot/v=$committed/keys")
          (spark.read.parquet(s"$stateRoot/v=$committed/clusters"),
            spark.read.parquet(s"$stateRoot/v=$committed/names"),
            if (fsOf(spark, stateRoot).exists(keysPath))
              Some(spark.read.parquet(keysPath.toString))
            else None)
        }

      val clusters = IncrementalResolve.resolveNames(spark, existing, existingNames,
        newNames, existingKeys = existingKeys, newKeysOpt = Some(newKeys),
        weights = weights, threshold = threshold, maxBlockSize = maxBlockSize)

      val out = s"$stateRoot/v=$batchId"
      clusters.write.mode(SaveMode.Overwrite).parquet(s"$out/clusters")
      existingNames.unionByName(newNames).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/names")
      // keys: copy the state's table (deriving from names when migrating
      // old state) and key ONLY the increment
      val allKeys =
        if (committed < 0) newKeys
        else existingKeys
          .getOrElse(stateKeys(spark.read.parquet(s"$stateRoot/v=$committed/names")))
          .unionByName(newKeys)
      allKeys.write.mode(SaveMode.Overwrite).parquet(s"$out/keys")
      // rejects are cumulative like names (versions get pruned, so a
      // per-version increment would be lost with its version); old state
      // without a rejects table migrates as empty
      val rejectsPath = new Path(s"$stateRoot/v=$committed/rejects")
      val allRejects =
        if (committed < 0 || !fsOf(spark, stateRoot).exists(rejectsPath)) newRejects
        else spark.read.parquet(rejectsPath.toString).unionByName(newRejects)
      allRejects.write.mode(SaveMode.Overwrite).parquet(s"$out/rejects")
      commitVersion(spark, stateRoot, batchId)
    } finally {
      newKeys.unpersist(false)
      newNames.unpersist(false)
    }
  }

  /** Wire the file-source stream; returns the started query. */
  def start(spark: SparkSession, opts: Map[String, String]): StreamingQuery = {
    val input = opts("input")
    val stateRoot = opts("state")
    val ckpt = opts("checkpoint")
    VersionedState.lineageGuard(spark, ckpt, stateRoot)
    val weights = opts.get("weights").map { s =>
      val (l, j, t) = Args.triple(s, "--weights"); SimilarityWeights(l, j, t)
    }.getOrElse(SimilarityWeights.default)
    val threshold = opts.get("threshold").map(_.toDouble).getOrElse(0.92)
    val maxBlockSize = opts.get("max-block-size").map(_.toInt).getOrElse(1000)
    // file sources need a schema before the stream starts: read it from
    // the existing files (the landing dir must hold at least one file)
    val schema = spark.read.parquet(input).schema
    val reader = spark.readStream.schema(schema)
    opts.get("max-files-per-trigger").foreach(n =>
      reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(input)
    val writer = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        attachBatch(spark, stateRoot, batch, batchId, weights, threshold, maxBlockSize)
      }
    opts.get("trigger") match {
      case None | Some("availableNow") => writer.trigger(Trigger.AvailableNow()).start()
      case Some(interval) => writer.trigger(Trigger.ProcessingTime(interval)).start()
    }
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val spark = SparkSession.builder().appName("graft-stream-resolve").getOrCreate()
    val q = start(spark, opts)
    q.awaitTermination()
  }
}
