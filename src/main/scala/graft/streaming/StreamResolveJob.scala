package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Er
import graft.norm.Normalizer
import graft.pipeline.IncrementalResolve
import graft.sim.SimilarityWeights

/** Production streaming entry: maintain an entity clustering over an
  * UNBOUNDED arriving span-doc table. Each micro-batch runs the
  * contracted-graph increment ([[IncrementalResolve.resolveNames]] — the
  * body proven hash-exact vs full recompute by q65) against durable
  * state, so the clustering is continuously maintained rather than
  * recomputed: per-batch work is |new keys| ⋈ |state keys| plus CC over
  * one vertex per TOUCHED cluster.
  *
  * {{{
  * spark-submit --class graft.streaming.StreamResolveJob graft.jar \
  *   --input s3://bucket/incoming --state s3://bucket/er-state \
  *   --checkpoint s3://bucket/er-ckpt [--trigger "30 seconds"]
  * }}}
  *
  * State durability/idempotence: state versions live at
  * `state/v=<batchId>`, committed by creating `v=<id>/_COMMITTED` LAST
  * (a single atomic create — no rename-overwrite semantics to depend
  * on; a crash mid-write leaves an uncommitted dir that the replay
  * overwrites). Structured Streaming replays a failed batch with the
  * SAME batchId, and [[attachBatch]] skips any batch at-or-below the
  * max committed version — exactly-once state even though foreachBatch
  * is at-least-once. Committed versions beyond the last two are pruned
  * best-effort.
  */
object StreamResolveJob {

  private def fsOf(spark: SparkSession, stateRoot: String) =
    new Path(stateRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Max committed version (-1 when none). A version counts only once
    * its `_COMMITTED` marker exists — partial writes are invisible.
    */
  private def latestVersion(spark: SparkSession, stateRoot: String): Long = {
    val fs = fsOf(spark, stateRoot)
    val root = new Path(stateRoot)
    if (!fs.exists(root)) return -1L
    val committed = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        fs.exists(new Path(p, "_COMMITTED")))
      .map(_.getName.drop(2).toLong)
    if (committed.isEmpty) -1L else committed.max
  }

  private def commitVersion(spark: SparkSession, stateRoot: String, v: Long): Unit = {
    val fs = fsOf(spark, stateRoot)
    fs.create(new Path(s"$stateRoot/v=$v/_COMMITTED"), true).close()
    // prune committed versions beyond the previous one (kept for readers
    // mid-swap); uncommitted leftovers below v are failed attempts
    val stale = fs.listStatus(new Path(stateRoot)).map(_.getPath)
      .filter(p => p.getName.startsWith("v="))
      .sortBy(p => p.getName.drop(2).toLong)
      .dropRight(2)
    stale.foreach(p => fs.delete(p, true))
  }

  /** One micro-batch: derive + normalize names from the arriving span
    * docs, run the contracted-graph increment against the committed
    * state, commit the new state version. Idempotent on `batchId`.
    */
  def attachBatch(spark: SparkSession, stateRoot: String,
                  batch: DataFrame, batchId: Long,
                  weights: SimilarityWeights = SimilarityWeights.default,
                  threshold: Double = 0.92,
                  maxBlockSize: Int = 1000): Unit = {
    val committed = latestVersion(spark, stateRoot)
    if (committed >= batchId) return // replayed batch — state already has it
    Er.register(spark)

    val newNames = batch
      .withColumn("name", Er.docName(col("spans")))
      .withColumn("normalized", Normalizer.normalizeColumn(col("name")))
      .where(col("normalized").isNotNull && col("normalized") =!= "")
      .select("doc_id", "normalized")
      .localCheckpoint(true)

    val (existing, existingNames) =
      if (committed < 0)
        (batch.select(col("doc_id"), col("doc_id").as("cluster_id")).limit(0),
          newNames.limit(0))
      else
        (spark.read.parquet(s"$stateRoot/v=$committed/clusters"),
          spark.read.parquet(s"$stateRoot/v=$committed/names"))

    val clusters = IncrementalResolve.resolveNames(spark, existing, existingNames,
      newNames, weights = weights, threshold = threshold,
      maxBlockSize = maxBlockSize)

    val out = s"$stateRoot/v=$batchId"
    clusters.write.mode(SaveMode.Overwrite).parquet(s"$out/clusters")
    existingNames.unionByName(newNames).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/names")
    commitVersion(spark, stateRoot, batchId)
  }

  /** Wire the file-source stream; returns the started query. */
  def start(spark: SparkSession, opts: Map[String, String]): StreamingQuery = {
    val input = opts("input")
    val stateRoot = opts("state")
    val weights = opts.get("weights").map { s =>
      val Array(l, j, t) = s.split(",").map(_.trim.toDouble)
      SimilarityWeights(l, j, t)
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
      .option("checkpointLocation", opts("checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        attachBatch(spark, stateRoot, batch, batchId, weights, threshold, maxBlockSize)
      }
    opts.get("trigger") match {
      case None | Some("availableNow") => writer.trigger(Trigger.AvailableNow()).start()
      case Some(interval) => writer.trigger(Trigger.ProcessingTime(interval)).start()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length % 2 == 0 && args.length >= 6,
      "usage: --input DIR --state DIR --checkpoint DIR [--trigger \"30 seconds\"|availableNow] " +
        "[--weights L,JW,JAC] [--threshold T] [--max-block-size N] [--max-files-per-trigger N]")
    val opts = args.grouped(2).map { case Array(k, v) => k.drop(2) -> v }.toMap
    val spark = SparkSession.builder().appName("graft-stream-resolve").getOrCreate()
    val q = start(spark, opts)
    q.awaitTermination()
  }
}
