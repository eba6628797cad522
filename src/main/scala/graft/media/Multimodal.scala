package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[MediaCodec.decodeStub]] is a clearly-marked deterministic
  * fake keyed on the bytes' content hash. Everything Spark-side — schema,
  * partition-friendly batched iteration, output shapes — is real and
  * tested, so swapping in a real codec is a one-function change.
  *
  * Batched per-partition iteration (`mapPartitions`) is the Scala analog
  * of a Pandas-UDF `mapInPandas` pipeline: one codec context per
  * partition, streaming batches, no per-row setup cost.
  */
final case class MediaRow(doc_id: String, media_ref: String, kind: String, bytes: Array[Byte])
final case class MediaMeta(
    doc_id: String, media_ref: String, kind: String,
    size_bytes: Long, width: Int, height: Int, duration_ms: Long, content_hash: Long)
final case class MediaFeatures(doc_id: String, media_ref: String, features: Array[Float])
final case class FrameSample(doc_id: String, media_ref: String, frame_index: Int, ts_ms: Long)

object MediaCodec {

  val P: Long = graft.blocking.BlockingKeys.P

  /** Deterministic content hash — stands in for the real decoder's
    * stream identity. A P-modular rolling hash (base 31, the library's
    * standard family) rather than a 64-bit FNV: every stub quantity
    * derived from it must be reproducible in the DuckDB oracle, and
    * wrapping 64-bit multiplication is not portable SQL.
    */
  def contentHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xffL)) % P; i += 1 }
    h
  }

  /** STUB decode: a real implementation would parse the container /
    * codec headers. The fake derives plausible, deterministic metadata
    * from the content hash so downstream plumbing is fully exercisable
    * (contentHash is in [0, P), so the modulo is already non-negative).
    */
  def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Long) =
    decodeFromHash(kind, contentHash(bytes))

  /** Hash-threaded form: callers that already hashed the blob (the fused
    * decode+features pass) must not pay another full byte scan.
    */
  def decodeFromHash(kind: String, hash: Long): (Int, Int, Long) = {
    val h = (hash % 1000L).toInt
    kind match {
      case "image" => (320 + h % 8 * 160, 240 + h % 6 * 120, 0L)
      case "audio" => (0, 0, 1000L + h * 37L)
      case "video" => (640 + h % 4 * 320, 360 + h % 4 * 180, 5000L + h * 111L)
      case _ => (0, 0, 0L)
    }
  }

  /** STUB feature extraction: a real implementation would run a vision /
    * audio encoder per batch. The fake emits a deterministic 8-dim vector
    * seeded by a 64-bit mix of the content hash — same shape,
    * partitioning and encoder contract as the real thing. (JVM-side only:
    * the oracle checks the vector's shape, not its values, so the
    * wrapping multiply is fine here.)
    */
  def featuresStub(bytes: Array[Byte], dim: Int = 8): Array[Float] =
    featuresFromHash(contentHash(bytes), dim)

  def featuresFromHash(hash: Long, dim: Int = 8): Array[Float] = {
    val h = hash * 0x9E3779B97F4A7C15L
    Array.tabulate(dim)(i => (((h >>> (i * 7)) & 0xff).toFloat - 128f) / 128f)
  }
}

object Multimodal {

  /** Decode metadata for a media table, batched per partition. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one codec context per partition would be initialized here
      rows.map { r =>
        // hash once; decodeStub would otherwise scan the blob a 2nd time
        val h = MediaCodec.contentHash(r.bytes)
        val (w, hgt, dur) = MediaCodec.decodeFromHash(r.kind, h)
        MediaMeta(r.doc_id, r.media_ref, r.kind, r.bytes.length.toLong, w, hgt, dur, h)
      }
    }
  }

  /** Feature extraction, batched per partition. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaFeatures(r.doc_id, r.media_ref, MediaCodec.featuresStub(r.bytes, dim)))
    }
  }

  /** Decode + feature extraction FUSED into one per-partition pass — a
    * real media pipeline decodes each blob once and feeds both the
    * metadata and the encoder from the decoded buffer; running
    * [[decode]] and [[extractFeatures]] as separate operators re-reads
    * (and with a real codec, re-decodes) every blob and pays a join to
    * reunite the halves.
    */
  def decodeWithFeatures(media: Dataset[MediaRow], dim: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // ONE pass over the blob: hash once, thread it through decode and
        // features — the previous body hashed every blob three times,
        // defeating the fusion this operator exists for (and with a real
        // codec would have meant three decodes)
        val h = MediaCodec.contentHash(r.bytes)
        val (w, hgt, dur) = MediaCodec.decodeFromHash(r.kind, h)
        (MediaMeta(r.doc_id, r.media_ref, r.kind, r.bytes.length.toLong, w, hgt, dur, h),
          MediaCodec.featuresFromHash(h, dim))
      }
    }.toDF("meta", "features").select(col("meta.*"), col("features"))
  }

  /** Deterministic frame sampling: every `everyMs` milliseconds of the
    * decoded duration, as a generator (explode), not a driver loop.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyMs: Long = 1000L): DataFrame = {
    meta.toDF()
      .where(col("kind") === "video" && col("duration_ms") > 0)
      .withColumn("ts_ms", explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_index", (col("ts_ms") / everyMs).cast("int"))
      .select("doc_id", "media_ref", "frame_index", "ts_ms")
  }

  /** Synthesize a deterministic media-bytes table from a docs table's
    * media spans (test/bench input: the container has no real media, so
    * bytes are a seeded function of the media_ref). The byte recipe is
    * deliberately SQL-mirrorable arithmetic (seed = rolling hash of the
    * ref, byte i = (seed + (i+1)*K) mod 256) so the DuckDB oracle can
    * reproduce the whole decode chain value-exactly — a java.util.Random
    * stream would make the stub unverifiable cross-engine.
    */
  val ByteStep: Long = 2654435761L // Knuth multiplicative constant

  def synthesizeMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // NOTE (r06): a conditional parallelism floor (repartition when the
    // scan has fewer splits than cores) was measured here and REVERTED:
    // warm, the decode chain clears the sf0.1 corpus in tens of ms even
    // single-task, so the extra exchange only cost (q59 1.06 s vs
    // 0.89 s); at corpus scale the scan is naturally parallel. The
    // single-task cold numbers that motivated it were JIT warm-up.
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.kind") =!= "text")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"), col("s.kind").as("kind"))
      .as[(String, String, String)]
      .map { case (docId, ref, kind) =>
        val seed = ref.foldLeft(0L)((a, c) => (a * 31L + c) % MediaCodec.P)
        val n = 64 + (seed % 192L).toInt
        val bytes = Array.tabulate(n)(i => ((seed + (i + 1) * ByteStep) % 256L).toByte)
        MediaRow(docId, ref, kind, bytes)
      }
  }
}
