package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup
import graft.util.Args

/** Production streaming entry for near-dup dedup: maintain the near-dup
  * pair set of an UNBOUNDED arriving document table. Each micro-batch
  * runs [[Dedup.incrementFromState]] — the increment proven exact vs a
  * full-batch recompute by q70 and DedupIncrementSpec — against durable
  * append-delta state, so a crawl batch pays O(batch) WRITE I/O (its own
  * delta) plus one key join against the persisted corpus key table; the
  * corpus TEXT is read once, on the batch that ingested it, never again.
  *
  * {{{
  * spark-submit --class graft.streaming.StreamDedupJob graft.jar \
  *   --input s3://bucket/crawl --state s3://bucket/dedup-state \
  *   --checkpoint s3://bucket/dedup-ckpt [--threshold 0.7]
  * }}}
  *
  * State layout ([[VersionedState]] delta contract): each batch commits
  * `d=<batchId>/{keys,shingles,pairs}` holding ONLY that batch's band
  * keys, 60-bit shingle-hash sets, and the increment's new pairs. The
  * corpus view is the union of the latest base + committed deltas above
  * it; `--compact-every K` folds them into a new `base=` every K deltas
  * (amortized O(corpus/K) write cost per batch, and it bounds the
  * small-file count the read side unions). A v=-snapshot layout here
  * would rewrite the ENTIRE corpus state every trigger — per-batch cost
  * growing linearly with corpus size; append-delta is what makes the
  * documented O(batch) claim true of the I/O, not just the join.
  * By the chained-increments property (DedupIncrementSpec), the union of
  * all delta `pairs` tables ([[pairsSoFar]]) always equals the
  * full-batch [[Dedup.minhashNearDups]] over everything ingested so far.
  *
  * `--algo simhash` swaps the increment body for
  * [[Dedup.incrementFromSimhashKeys]]: state is just the fingerprint
  * key table (no shingle sets — cheaper per doc, hamming-bound instead
  * of Jaccard-threshold semantics). A state root is bound to its algo;
  * resuming with the other one fails fast instead of corrupting the
  * maintained pair set.
  *
  * Durability/idempotence/lineage are [[VersionedState]]'s contract:
  * `_COMMITTED`-marked units, replayed batchIds skipped (exactly-once
  * state on at-least-once foreachBatch), crash-safe compaction GC, and
  * the fail-fast checkpoint/state lineage guard.
  *
  * Ingest contract (per [[Dedup.minhashNearDupsIncrement]]): doc ids
  * are globally unique — a duplicated id would fan the verify join
  * through two shingle rows and silently corrupt the maintained pair
  * set. `--on-duplicate` ENFORCES it per batch ([[IngestContract]]: a
  * batch-sized groupBy for ids repeated WITHIN the batch, plus one
  * semi-join against the corpus key table — same order of work as the
  * increment join itself): `fail` (default) aborts the batch, `drop`
  * keeps the FIRST ingested version (corpus re-deliveries skipped;
  * within-batch repeats excluded entirely; counts logged), `allow`
  * skips the check for inputs with an upstream uniqueness guarantee.
  * Docs with null/empty text carry no band key and no shingle set —
  * they can never pair and are not added to the state (same semantics
  * as the batch operator).
  */
object StreamDedupJob {

  private val Usage =
    """graft.streaming.StreamDedupJob
      |  --input DIR               landing dir of document parquet files
      |  --state DIR               durable state root (append-delta layout)
      |  --checkpoint DIR          Structured Streaming checkpoint
      |  [--algo minhash|simhash]  default minhash
      |  [--id-col NAME]           default doc_id
      |  [--text-col NAME]         default text
      |  [--threshold T]           minhash verify Jaccard threshold, default 0.7
      |  [--max-hamming N]         simhash hamming bound, default 3
      |  [--max-block-size N]      default 10000
      |  [--on-duplicate fail|drop|allow]  re-delivered doc_id policy, default fail
      |  [--compact-every N]       fold deltas into a base every N batches,
      |                            default 64 (0 = never)
      |  [--trigger "30 seconds"|availableNow]   default availableNow
      |  [--max-files-per-trigger N]
      |""".stripMargin

  private[streaming] def parseArgs(args: Array[String]): Map[String, String] = {
    val opts = Args.parse(args,
      known = Set("input", "state", "checkpoint", "algo", "id-col", "text-col",
        "threshold", "max-hamming", "max-block-size", "on-duplicate",
        "compact-every", "trigger", "max-files-per-trigger"),
      required = Set("input", "state", "checkpoint"),
      usage = Usage)
    opts.get("algo").foreach(a => require(a == "minhash" || a == "simhash",
      s"--algo must be minhash or simhash, got $a\n$Usage"))
    opts.get("on-duplicate").foreach(d =>
      require(Set("fail", "drop", "allow")(d),
        s"--on-duplicate must be fail, drop or allow, got $d\n$Usage"))
    opts
  }

  /** One state table unioned across the committed view (latest base +
    * deltas above it), or None when nothing is committed yet.
    */
  def readStateTable(spark: SparkSession, stateRoot: String,
                     table: String): Option[DataFrame] =
    VersionedState.readTable(spark, stateRoot, table)

  /** The maintained near-dup pair set over everything ingested so far —
    * equals the full-batch recompute (chained-increments property).
    */
  def pairsSoFar(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    readStateTable(spark, stateRoot, "pairs")

  /** A state root written by one algo must not be resumed with the
    * other (the key/pair schemas differ; a silent mix would corrupt the
    * maintained pair set). Minhash units carry a `shingles` table,
    * simhash ones don't — that structural difference IS the marker.
    */
  private def algoGuard(spark: SparkSession, stateRoot: String,
                        units: Seq[(Long, String)], algo: String): Unit = {
    units.lastOption.foreach { case (_, dir) =>
      val hasShingles = VersionedState.fsOf(spark, stateRoot)
        .exists(new org.apache.hadoop.fs.Path(s"$dir/shingles"))
      val stateAlgo = if (hasShingles) "minhash" else "simhash"
      if (stateAlgo != algo)
        throw new IllegalStateException(
          s"state root $stateRoot was written by --algo $stateAlgo; refusing to " +
            s"resume it with --algo $algo — start a new state root")
    }
  }

  /** Every id ever DELIVERED to this state (one row per id per ingesting
    * batch) — the duplicate-id guard's corpus side. Unlike the key
    * table, it covers docs whose text yields no band key (null/empty):
    * the uniqueness contract is on the ingest, not on what survives
    * keying. Units written before the ids ledger existed fall back to
    * their keys' doc_ids — the keyless-doc gap in those units is not
    * recoverable (it was never recorded) and closes at their next
    * compaction.
    */
  private def corpusIngestedIds(spark: SparkSession, stateRoot: String,
                                units: Seq[(Long, String)]): Option[DataFrame] = {
    if (units.isEmpty) return None
    val fs = VersionedState.fsOf(spark, stateRoot)
    val (withIds, legacy) = units.partition { case (_, d) =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$d/ids"))
    }
    val parts = VersionedState.readTableFrom(spark, withIds, "ids").toSeq ++
      VersionedState.readTableFrom(spark, legacy, "keys")
        .map(_.select("doc_id").distinct())
    parts.reduceOption(_.unionByName(_))
  }

  /** The shared per-batch commit skeleton: replay skip, algo guard,
    * duplicate-id enforcement ([[IngestContract]]), increment, delta
    * write (batch-sized tables ONLY), commit marker, compaction. The
    * per-algo difference is reduced to data: which tables a delta
    * carries and how the increment pairs are computed. The committed
    * view is listed ONCE ([[VersionedState.stateView]]) and threaded
    * through — O(1) metadata requests per trigger.
    */
  def attachBatch(spark: SparkSession, stateRoot: String,
                  batch: DataFrame, batchId: Long,
                  idCol: String = "doc_id", textCol: String = "text",
                  threshold: Double = 0.7, maxBlockSize: Int = 10000,
                  algo: String = "minhash", maxHamming: Int = 3,
                  onDuplicate: String = "fail", compactEvery: Int = 64): Unit = {
    val view = VersionedState.stateView(spark, stateRoot)
    if (view.highWater >= batchId)
      return // replayed batch — state already has it
    val units = view.units(stateRoot)
    algoGuard(spark, stateRoot, units, algo)
    def readT(t: String) = VersionedState.readTableFrom(spark, units, t)

    // the guard checks EVERY ingested id (the raw batch, one row per
    // doc — the key table has many rows per doc and would miscount
    // intra-batch repeats), including null-text docs that never get a
    // band key: the uniqueness contract is on the ingest, not on what
    // survives keying. Its corpus side is the persisted ingested-ids
    // table (below) — checking the KEY table alone would let a
    // cross-batch re-delivery of a keyless doc through undetected.
    // Dropped ids are logged, not stored as rejects — unlike the
    // resolve job there is no rejects table here; the dedup state
    // carries content state plus this minimal id ledger.
    val drop = IngestContract
      .duplicateIdGuard(batch.select(col(idCol).as("doc_id")),
        corpusIngestedIds(spark, stateRoot, units), onDuplicate, batchId,
        "stream-dedup")
    def minus(df: DataFrame) =
      drop.map(d => df.join(d, Seq("doc_id"), "left_anti")).getOrElse(df)
    // the delta's id ledger records every id the batch DELIVERED —
    // including ids the guard excluded (within-batch repeats have no
    // "first" copy and enter no content state, but a LATER re-delivery
    // of such an id must still be flagged, matching the resolve job's
    // DUPLICATE_ID rejects semantics)
    val deliveredIds = batch.select(col(idCol).as("doc_id")).distinct()

    // persist (not localCheckpoint): the batch tables are read 2-4 times
    // within this micro-batch and must release their storage at the end
    // — a long-running stream would otherwise accumulate pinned blocks
    val (tables, pairs) =
      if (algo == "simhash") {
        val corpusKeys = readT("keys")
        val keys = minus(Dedup.simhashState(batch, idCol, textCol)).persist()
        val inc = Dedup.incrementFromSimhashKeys(keys,
          corpusKeys.getOrElse(keys.limit(0)), maxHamming, maxBlockSize)
        (Seq("keys" -> keys, "ids" -> deliveredIds), inc.pairs)
      } else {
        val raw = Dedup.minhashState(batch, idCol, textCol)
        val corpusKeys = readT("keys")
        val corpus = Dedup.NearDupState(
          corpusKeys.getOrElse(raw.keys.limit(0)),
          readT("shingles").getOrElse(raw.shingles.limit(0)))
        val st = Dedup.NearDupState(
          minus(raw.keys).persist(), minus(raw.shingles).persist())
        val inc = Dedup.incrementFromState(st, corpus, threshold, maxBlockSize)
        (Seq("keys" -> st.keys, "shingles" -> st.shingles,
          "ids" -> deliveredIds), inc.pairs)
      }
    try {
      val out = s"$stateRoot/d=$batchId"
      tables.foreach { case (name, df) =>
        df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name")
      }
      pairs.write.mode(SaveMode.Overwrite).parquet(s"$out/pairs")
      VersionedState.commitDelta(spark, stateRoot, batchId)
      maybeCompact(spark, stateRoot, view, batchId,
        tables.map(_._1) :+ "pairs", compactEvery)
    } finally tables.foreach(_._2.unpersist(false))
  }

  /** Fold the committed view into `base=<upto>` when the live delta
    * count (the pre-batch view's plus this batch's) reaches the
    * threshold: one O(corpus) rewrite every `compactEvery` batches
    * (amortized O(corpus/K) per batch), which also caps how many files
    * [[readStateTable]] unions. Crash-safe: the base is invisible until
    * its marker lands, covered deltas are ignored by readers the moment
    * it does, and GC keeps the previous base + its uncovered deltas one
    * extra cycle for concurrent readers ([[VersionedState.commitBase]]).
    */
  private def maybeCompact(spark: SparkSession, stateRoot: String,
                           preView: VersionedState.StateView, upto: Long,
                           tables: Seq[String], compactEvery: Int): Unit = {
    if (compactEvery <= 0) return
    if (preView.liveDeltaIds.size + 1 < compactEvery) return
    val units = preView.units(stateRoot) :+ (upto -> s"$stateRoot/d=$upto")
    tables.foreach { t =>
      // the ids ledger needs the legacy-unit fallback (pre-ids units
      // lack the table); compacting through it is what CLOSES the
      // legacy keys-only gap for all future batches
      val df =
        if (t == "ids") corpusIngestedIds(spark, stateRoot, units).get
        else VersionedState.readTableFrom(spark, units, t).get
      df.write.mode(SaveMode.Overwrite).parquet(s"$stateRoot/base=$upto/$t")
    }
    VersionedState.commitBase(spark, stateRoot, upto)
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
    val onDuplicate = opts.getOrElse("on-duplicate", "fail")
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
        attachBatch(spark, stateRoot, batch, batchId, idCol, textCol,
          threshold, maxBlockSize, algo, maxHamming, onDuplicate, compactEvery)
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
