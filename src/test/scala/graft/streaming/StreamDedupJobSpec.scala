package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dedup.Dedup

/** The streaming dedup entry: durable versioned near-dup state,
  * replayed-batch idempotence, and the maintained-corpus property — the
  * cumulative pairs table equals the full-batch recompute over
  * everything ingested.
  */
class StreamDedupJobSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def mkDocs(ids: Range): DataFrame = ids.map { i =>
    val base = (i % 3) match {
      case 0 => "the quick brown fox jumps over the lazy dog near the river bank today"
      case 1 => "entity resolution at web scale needs blocking scoring and clustering stages"
      case _ => "training data pipelines deduplicate documents with minhash band signatures"
    }
    val toks = base.split(" ")
    (i.toLong, toks.updated(i % toks.length, s"tok$i").mkString(" "))
  }.toDF("doc_id", "text")

  private def statePairs(stateRoot: String): Set[(Long, Long)] = {
    val versions = new java.io.File(stateRoot).listFiles()
      .filter(f => f.getName.startsWith("v=") &&
        new java.io.File(f, "_COMMITTED").exists())
      .map(_.getName.drop(2).toLong)
    spark.read.parquet(s"$stateRoot/v=${versions.max}/pairs")
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
  }

  test("two streamed batches: cumulative pairs == full-batch recompute over the union") {
    val in = tmp("sdj-in"); val state = tmp("sdj-state"); val ckpt = tmp("sdj-ckpt")
    mkDocs(0 until 25).coalesce(1).write.mode("append").parquet(in)
    mkDocs(25 until 40).coalesce(1).write.mode("append").parquet(in)

    val q = StreamDedupJob.start(spark, Map(
      "input" -> in, "state" -> state, "checkpoint" -> ckpt,
      "threshold" -> "0.4", "max-files-per-trigger" -> "1"))
    q.awaitTermination()

    // maxFilesPerTrigger=1 must actually split the corpus into multiple
    // batches, or the incremental path never executed
    val versions = new java.io.File(state).listFiles()
      .count(f => f.getName.startsWith("v=") &&
        new java.io.File(f, "_COMMITTED").exists())
    assert(versions >= 2, s"expected >=2 committed versions, got $versions")

    val full = Dedup.minhashNearDups(mkDocs(0 until 40), "doc_id", "text",
      threshold = 0.4)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val streamed = statePairs(state)
    assert(streamed == full && streamed.nonEmpty)
    // cross-batch pairs must be present (proves the increment join
    // against the persisted corpus state did the work)
    assert(streamed.exists { case (a, b) => a < 25 && b >= 25 })
  }

  test("replayed batchId is a no-op; state survives byte-identical") {
    val state = tmp("sdj-replay")
    StreamDedupJob.attachBatch(spark, state, mkDocs(0 until 10), batchId = 0L,
      threshold = 0.4)
    StreamDedupJob.attachBatch(spark, state, mkDocs(10 until 20), batchId = 1L,
      threshold = 0.4)
    val before = statePairs(state)
    // replay batch 1 with DIFFERENT content — must be skipped entirely
    StreamDedupJob.attachBatch(spark, state, mkDocs(30 until 35), batchId = 1L,
      threshold = 0.4)
    assert(statePairs(state) == before)
    assert(VersionedState.latestVersion(spark, state) == 1L)
  }

  test("simhash mode: streamed batches == full-batch simhash recompute; algo mismatch refuses") {
    val in = tmp("sdj-sh-in"); val state = tmp("sdj-sh-state"); val ckpt = tmp("sdj-sh-ckpt")
    mkDocs(0 until 25).coalesce(1).write.mode("append").parquet(in)
    mkDocs(25 until 40).coalesce(1).write.mode("append").parquet(in)

    val q = StreamDedupJob.start(spark, Map(
      "input" -> in, "state" -> state, "checkpoint" -> ckpt,
      "algo" -> "simhash", "max-hamming" -> "12", "max-files-per-trigger" -> "1"))
    q.awaitTermination()

    val full = Dedup.simhashNearDups(mkDocs(0 until 40), "doc_id", "text",
      maxHamming = 12)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val streamed = statePairs(state)
    assert(streamed == full && streamed.nonEmpty)
    assert(streamed.exists { case (a, b) => a < 25 && b >= 25 },
      "cross-batch simhash pairs must be present")

    // a simhash state root must refuse a minhash resume
    val e = intercept[IllegalStateException] {
      StreamDedupJob.attachBatch(spark, state, mkDocs(40 until 45), batchId = 99L,
        algo = "minhash")
    }
    assert(e.getMessage.contains("--algo simhash"))
  }

  test("lineage guard: fresh checkpoint over committed state refuses") {
    val in = tmp("sdj-lg-in"); val state = tmp("sdj-lg-state")
    mkDocs(0 until 5).coalesce(1).write.mode("append").parquet(in)
    StreamDedupJob.attachBatch(spark, state, mkDocs(0 until 5), batchId = 0L)
    val freshCkpt = tmp("sdj-lg-ckpt")
    val e = intercept[IllegalStateException] {
      StreamDedupJob.start(spark, Map(
        "input" -> in, "state" -> state, "checkpoint" -> freshCkpt))
    }
    assert(e.getMessage.contains("one lineage"))
  }
}
