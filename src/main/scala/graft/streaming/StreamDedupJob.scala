package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup
import graft.util.Args

/** Production streaming entry for near-dup dedup: maintain the near-dup
  * pair set of an UNBOUNDED arriving document table. Each micro-batch
  * runs [[Dedup.incrementFromState]] — the increment proven exact vs a
  * full-batch recompute by q70 and DedupIncrementSpec — against durable
  * versioned state, so a crawl batch pays O(batch) + one key join
  * against the persisted corpus key table; the corpus TEXT is read once,
  * on the batch that ingested it, never again.
  *
  * {{{
  * spark-submit --class graft.streaming.StreamDedupJob graft.jar \
  *   --input s3://bucket/crawl --state s3://bucket/dedup-state \
  *   --checkpoint s3://bucket/dedup-ckpt [--threshold 0.7]
  * }}}
  *
  * Each state version holds `keys` (LSH band keys), `shingles` (60-bit
  * shingle-hash sets) — the [[Dedup.NearDupState]] the NEXT batch joins
  * against — and the cumulative `pairs` table. Pairs are cumulative for
  * the same reason the resolve job's rejects are: versions get pruned,
  * so a per-version increment would be lost with its version. By the
  * chained-increments property (DedupIncrementSpec), the cumulative
  * pairs table always equals the full-batch [[Dedup.minhashNearDups]]
  * over everything ingested so far.
  *
  * `--algo simhash` swaps the increment body for
  * [[Dedup.incrementFromSimhashKeys]]: state is just the fingerprint
  * key table (no shingle sets — cheaper per doc, hamming-bound instead
  * of Jaccard-threshold semantics). A state root is bound to its algo;
  * resuming with the other one fails fast instead of corrupting the
  * maintained pair set.
  *
  * Durability/idempotence/lineage are [[VersionedState]]'s contract:
  * `_COMMITTED`-marked snapshots, replayed batchIds skipped
  * (exactly-once state on at-least-once foreachBatch), keep-2 pruning,
  * and the fail-fast checkpoint/state lineage guard.
  *
  * Ingest contract (per [[Dedup.minhashNearDupsIncrement]]): doc ids are
  * globally unique across batches. Docs with null/empty text carry no
  * band key and no shingle set — they can never pair and are not added
  * to the state (same semantics as the batch operator).
  */
object StreamDedupJob {

  private val Usage =
    """graft.streaming.StreamDedupJob
      |  --input DIR               landing dir of document parquet files
      |  --state DIR               durable state root (versioned snapshots)
      |  --checkpoint DIR          Structured Streaming checkpoint
      |  [--algo minhash|simhash]  default minhash
      |  [--id-col NAME]           default doc_id
      |  [--text-col NAME]         default text
      |  [--threshold T]           minhash verify Jaccard threshold, default 0.7
      |  [--max-hamming N]         simhash hamming bound, default 3
      |  [--max-block-size N]      default 10000
      |  [--trigger "30 seconds"|availableNow]   default availableNow
      |  [--max-files-per-trigger N]
      |""".stripMargin

  private[streaming] def parseArgs(args: Array[String]): Map[String, String] = {
    val opts = Args.parse(args,
      known = Set("input", "state", "checkpoint", "algo", "id-col", "text-col",
        "threshold", "max-hamming", "max-block-size", "trigger",
        "max-files-per-trigger"),
      required = Set("input", "state", "checkpoint"),
      usage = Usage)
    opts.get("algo").foreach(a => require(a == "minhash" || a == "simhash",
      s"--algo must be minhash or simhash, got $a\n$Usage"))
    opts
  }

  /** A state root written by one algo must not be resumed with the
    * other (the key/pair schemas differ; a silent mix would corrupt the
    * maintained pair set). Minhash versions carry a `shingles` table,
    * simhash ones don't — that structural difference IS the marker.
    */
  private def algoGuard(spark: SparkSession, stateRoot: String,
                        committed: Long, algo: String): Unit = {
    if (committed < 0) return
    val hasShingles = VersionedState.fsOf(spark, stateRoot)
      .exists(new org.apache.hadoop.fs.Path(s"$stateRoot/v=$committed/shingles"))
    val stateAlgo = if (hasShingles) "minhash" else "simhash"
    if (stateAlgo != algo)
      throw new IllegalStateException(
        s"state root $stateRoot was written by --algo $stateAlgo; refusing to " +
          s"resume it with --algo $algo — start a new state root")
  }

  /** One micro-batch: derive the batch's keys (+ shingle sets for
    * minhash), run the increment against the committed state, commit the
    * new version with the appended state and the cumulative pairs.
    * Idempotent on `batchId`.
    */
  def attachBatch(spark: SparkSession, stateRoot: String,
                  batch: DataFrame, batchId: Long,
                  idCol: String = "doc_id", textCol: String = "text",
                  threshold: Double = 0.7, maxBlockSize: Int = 10000,
                  algo: String = "minhash", maxHamming: Int = 3): Unit = {
    val committed = VersionedState.latestVersion(spark, stateRoot)
    if (committed >= batchId) return // replayed batch — state already has it
    algoGuard(spark, stateRoot, committed, algo)
    val out = s"$stateRoot/v=$batchId"

    // persist (not localCheckpoint): the batch tables are read 2-3 times
    // within this micro-batch and must release their storage at the end
    // — a long-running stream would otherwise accumulate pinned blocks
    if (algo == "simhash") {
      val keys = Dedup.simhashState(batch, idCol, textCol).persist()
      try {
        val corpusKeys =
          if (committed < 0) keys.limit(0)
          else spark.read.parquet(s"$stateRoot/v=$committed/keys")
        val inc = Dedup.incrementFromSimhashKeys(keys, corpusKeys,
          maxHamming, maxBlockSize)
        corpusKeys.unionByName(keys)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/keys")
        writeCumulativePairs(spark, stateRoot, committed, inc.pairs, out)
        VersionedState.commitVersion(spark, stateRoot, batchId)
      } finally keys.unpersist(false)
    } else {
      val raw = Dedup.minhashState(batch, idCol, textCol)
      val st = Dedup.NearDupState(raw.keys.persist(), raw.shingles.persist())
      try {
        val corpus =
          if (committed < 0)
            Dedup.NearDupState(st.keys.limit(0), st.shingles.limit(0))
          else Dedup.NearDupState(
            spark.read.parquet(s"$stateRoot/v=$committed/keys"),
            spark.read.parquet(s"$stateRoot/v=$committed/shingles"))
        val inc = Dedup.incrementFromState(st, corpus, threshold, maxBlockSize)
        corpus.keys.unionByName(st.keys)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/keys")
        corpus.shingles.unionByName(st.shingles)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/shingles")
        writeCumulativePairs(spark, stateRoot, committed, inc.pairs, out)
        VersionedState.commitVersion(spark, stateRoot, batchId)
      } finally {
        st.keys.unpersist(false)
        st.shingles.unpersist(false)
      }
    }
  }

  // pairs are cumulative like the resolve job's rejects: versions get
  // pruned, so a per-version increment would be lost with its version
  private def writeCumulativePairs(spark: SparkSession, stateRoot: String,
                                   committed: Long, incPairs: DataFrame,
                                   out: String): Unit = {
    val allPairs =
      if (committed < 0) incPairs
      else spark.read.parquet(s"$stateRoot/v=$committed/pairs")
        .unionByName(incPairs)
    allPairs.write.mode(SaveMode.Overwrite).parquet(s"$out/pairs")
  }

  /** Wire the file-source stream; returns the started query. */
  def start(spark: SparkSession, opts: Map[String, String]): StreamingQuery = {
    val input = opts("input")
    val stateRoot = opts("state")
    val ckpt = opts("checkpoint")
    VersionedState.lineageGuard(spark, ckpt, stateRoot)
    val idCol = opts.getOrElse("id-col", "doc_id")
    val textCol = opts.getOrElse("text-col", "text")
    val threshold = opts.get("threshold").map(_.toDouble).getOrElse(0.7)
    val maxBlockSize = opts.get("max-block-size").map(_.toInt).getOrElse(10000)
    val algo = opts.getOrElse("algo", "minhash")
    val maxHamming = opts.get("max-hamming").map(_.toInt).getOrElse(3)
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
        attachBatch(spark, stateRoot, batch, batchId, idCol, textCol,
          threshold, maxBlockSize, algo, maxHamming)
      }
    opts.get("trigger") match {
      case None | Some("availableNow") => writer.trigger(Trigger.AvailableNow()).start()
      case Some(interval) => writer.trigger(Trigger.ProcessingTime(interval)).start()
    }
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val spark = SparkSession.builder().appName("graft-stream-dedup").getOrCreate()
    val q = start(spark, opts)
    q.awaitTermination()
  }
}
