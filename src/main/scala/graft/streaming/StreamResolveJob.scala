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
  * contracted-graph increment ([[IncrementalResolve.resolveNamesWithDelta]]
  * — the body proven hash-exact vs full recompute by q65) against
  * durable state. Per-batch COMPUTE is O(increment): the state's
  * exploded blocking-key table is persisted and read back (the state
  * names are never re-keyed), so the batch pays |new keys| ⋈ |state
  * keys| plus CC over one vertex per TOUCHED cluster. Per-batch state
  * I/O is O(increment) too — the MERGE-ON-READ delta layout below —
  * not a full snapshot copy.
  *
  * {{{
  * spark-submit --class graft.streaming.StreamResolveJob graft.jar \
  *   --input s3://bucket/incoming --state s3://bucket/er-state \
  *   --checkpoint s3://bucket/er-ckpt [--trigger "30 seconds"]
  * }}}
  *
  * State layout ([[VersionedState]] delta contract): each batch commits
  * `d=<batchId>/` holding its own `names`/`keys`/`rejects` (append-only
  * tables — readers union them) plus `clusters` holding ONLY the
  * CHANGED assignments: the batch's new docs and every member of a
  * cluster the increment relabeled (merged clusters take the global-min
  * label, so only the non-surviving side's members change). The current
  * assignment table is reconstructed merge-on-read: union the live
  * units, latest writer wins per doc_id ([[currentClusters]]) — exactly
  * the read path of a merge-on-read table format (Iceberg/Delta
  * position-upsert), built on plain parquet + commit markers.
  * `--compact-every K` folds the view into a `base=` snapshot
  * (amortized O(corpus/K) write per batch), which also bounds the
  * number of units the merge reads. Crash-safe like the dedup job: a
  * base is invisible until its marker lands, covered deltas are ignored
  * by rule, GC is cleanup.
  *
  * A state root written by the pre-delta engine version (`v=<batchId>`
  * full snapshots) migrates on first contact: the latest snapshot is
  * copied once into `base=<version>` (deriving `keys` from the names
  * when the snapshot predates persisted keys) and the v= dirs are
  * removed; from then on the state is pure delta.
  *
  * Rejected docs (invalid name / normalizes to nothing — the batch
  * pipeline's N8 gate) land in each delta's `rejects` table with their
  * batch id, so ingested-vs-clustered doc counts always reconcile.
  *
  * Durability/idempotence/lineage are [[VersionedState]]'s contract:
  * `_COMMITTED`-marked units, replayed batchIds skipped (exactly-once
  * state on at-least-once foreachBatch), and the fail-fast
  * checkpoint/state lineage guard.
  */
object StreamResolveJob {

  private val Usage =
    """graft.streaming.StreamResolveJob
      |  --input DIR               landing dir of span-doc parquet files
      |  --state DIR               durable state root (append-delta layout)
      |  --checkpoint DIR          Structured Streaming checkpoint
      |  [--trigger "30 seconds"|availableNow]   default availableNow
      |  [--weights L,JW,JAC]      default 0.33,0.34,0.33
      |  [--threshold T]           merge threshold, default 0.92
      |  [--max-block-size N]      default 1000
      |  [--compact-every N]       fold deltas into a base every N batches,
      |                            default 64 (0 = never)
      |  [--max-files-per-trigger N]
      |""".stripMargin

  private[streaming] def parseArgs(args: Array[String]): Map[String, String] =
    Args.parse(args,
      known = Set("input", "state", "checkpoint", "trigger", "weights",
        "threshold", "max-block-size", "compact-every", "max-files-per-trigger"),
      required = Set("input", "state", "checkpoint"),
      usage = Usage)

  import VersionedState.fsOf

  private def stateKeys(names: DataFrame): DataFrame =
    BlockingKeys.explodeKeys(names, "doc_id",
      BlockingKeys.defaultKeys(col("normalized")))

  /** The current (doc_id, cluster_id) assignment table, reconstructed
    * merge-on-read: union the live units' `clusters` tables, keep each
    * doc's row from the HIGHEST unit id (a delta only carries changed
    * rows, so the latest row for a doc is its current assignment). None
    * when nothing is committed.
    */
  def currentClusters(spark: SparkSession, stateRoot: String): Option[DataFrame] = {
    val units = VersionedState.liveUnits(spark, stateRoot)
    if (units.isEmpty) return None
    val all = units.map { case (id, dir) =>
      spark.read.parquet(s"$dir/clusters")
        .select(col("doc_id"), col("cluster_id"), lit(id).as("__b"))
    }.reduce(_.unionByName(_))
    Some(all.groupBy("doc_id")
      .agg(max_by(col("cluster_id"), col("__b")).as("cluster_id")))
  }

  /** An append-only state table (names / keys / rejects) unioned across
    * the committed view; None when nothing is committed.
    */
  def stateTable(spark: SparkSession, stateRoot: String,
                 table: String): Option[DataFrame] =
    VersionedState.readTable(spark, stateRoot, table)

  /** One-time layout migration: a legacy `v=<id>` full snapshot becomes
    * `base=<id>` (keys derived from names when the snapshot predates
    * persisted keys; rejects empty when absent), then the v= dirs are
    * deleted. Idempotent: skipped once any delta-layout unit exists; a
    * crash after the base commit leaves only harmless v= leftovers,
    * swept on the next successful batch.
    */
  private def migrateLegacy(spark: SparkSession, stateRoot: String): Unit = {
    val legacy = VersionedState.latestVersion(spark, stateRoot)
    if (legacy < 0 || VersionedState.highWater(spark, stateRoot) >= 0) return
    val in = s"$stateRoot/v=$legacy"
    val out = s"$stateRoot/base=$legacy"
    val names = spark.read.parquet(s"$in/names")
    spark.read.parquet(s"$in/clusters")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/clusters")
    names.write.mode(SaveMode.Overwrite).parquet(s"$out/names")
    val fs = fsOf(spark, stateRoot)
    val keys =
      if (fs.exists(new Path(s"$in/keys"))) spark.read.parquet(s"$in/keys")
      else stateKeys(names)
    keys.write.mode(SaveMode.Overwrite).parquet(s"$out/keys")
    val rejects =
      if (fs.exists(new Path(s"$in/rejects"))) spark.read.parquet(s"$in/rejects")
      else names.limit(0).select(col("doc_id"), lit("").as("name"),
        lit("").as("reject_reason"), lit(0L).as("batch_id"))
    rejects.write.mode(SaveMode.Overwrite).parquet(s"$out/rejects")
    VersionedState.commitBase(spark, stateRoot, legacy)
    sweepLegacy(spark, stateRoot)
  }

  /** Delete v= leftovers (post-migration, or a migration that crashed
    * between base commit and cleanup). Readers never consult v= once a
    * delta-layout unit exists, so this is pure housekeeping.
    */
  private def sweepLegacy(spark: SparkSession, stateRoot: String): Unit = {
    val fs = fsOf(spark, stateRoot)
    val rootPath = new Path(stateRoot)
    if (!fs.exists(rootPath)) return
    fs.listStatus(rootPath).map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .foreach(p => fs.delete(p, true))
  }

  /** One micro-batch: derive + normalize names from the arriving span
    * docs, run the contracted-graph increment against the committed
    * state (whose persisted key table is read back, not re-derived),
    * commit the batch's delta — changed assignments + the batch's own
    * names/keys/rejects, O(increment) write I/O. Idempotent on `batchId`.
    */
  def attachBatch(spark: SparkSession, stateRoot: String,
                  batch: DataFrame, batchId: Long,
                  weights: SimilarityWeights = SimilarityWeights.default,
                  threshold: Double = 0.92,
                  maxBlockSize: Int = 1000,
                  compactEvery: Int = 64): Unit = {
    if (math.max(VersionedState.highWater(spark, stateRoot),
        VersionedState.latestVersion(spark, stateRoot)) >= batchId)
      return // replayed batch — state already has it
    Er.register(spark)
    migrateLegacy(spark, stateRoot)

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
    // the reconstructed assignment view is consumed 3x inside the
    // increment (contracted edges, cluster reps, changed-rows join) —
    // merge once, persist for the batch
    val existingOpt = currentClusters(spark, stateRoot).map(_.persist())
    try {
      val (existing, existingNames, existingKeys) = existingOpt match {
        case None =>
          (batch.select(col("doc_id"), col("doc_id").as("cluster_id")).limit(0),
            newNames.limit(0), None)
        case Some(cl) =>
          (cl, stateTable(spark, stateRoot, "names").get,
            Some(stateTable(spark, stateRoot, "keys").get))
      }

      val inc = IncrementalResolve.resolveNamesWithDelta(spark, existing,
        existingNames, newNames, existingKeys = existingKeys,
        newKeysOpt = Some(newKeys), weights = weights, threshold = threshold,
        maxBlockSize = maxBlockSize)

      val out = s"$stateRoot/d=$batchId"
      // changed rows ONLY: the batch's new docs + members of relabeled
      // clusters — merge-on-read recovers the full table
      inc.changed.write.mode(SaveMode.Overwrite).parquet(s"$out/clusters")
      newNames.write.mode(SaveMode.Overwrite).parquet(s"$out/names")
      newKeys.write.mode(SaveMode.Overwrite).parquet(s"$out/keys")
      newRejects.write.mode(SaveMode.Overwrite).parquet(s"$out/rejects")
      VersionedState.commitDelta(spark, stateRoot, batchId)
      sweepLegacy(spark, stateRoot)
      maybeCompact(spark, stateRoot, batchId, compactEvery)
    } finally {
      existingOpt.foreach(_.unpersist(false))
      newKeys.unpersist(false)
      newNames.unpersist(false)
    }
  }

  /** Fold the committed view into `base=<upto>` when the live delta
    * count reaches the threshold: the merged assignment view plus the
    * unioned append-only tables, one O(corpus) rewrite every
    * `compactEvery` batches. This bounds both the unit count the
    * merge-on-read union touches and the per-doc row multiplicity the
    * argmax collapses.
    */
  private def maybeCompact(spark: SparkSession, stateRoot: String, upto: Long,
                           compactEvery: Int): Unit = {
    if (compactEvery <= 0) return
    val base = VersionedState.latestBase(spark, stateRoot)
    val live = VersionedState.committedDeltas(spark, stateRoot).count(_ > base)
    if (live < compactEvery) return
    val out = s"$stateRoot/base=$upto"
    currentClusters(spark, stateRoot).get
      .write.mode(SaveMode.Overwrite).parquet(s"$out/clusters")
    Seq("names", "keys", "rejects").foreach { t =>
      stateTable(spark, stateRoot, t).get
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t")
    }
    VersionedState.commitBase(spark, stateRoot, upto)
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
    val compactEvery = opts.get("compact-every").map(_.toInt).getOrElse(64)
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
        attachBatch(spark, stateRoot, batch, batchId, weights, threshold,
          maxBlockSize, compactEvery)
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
