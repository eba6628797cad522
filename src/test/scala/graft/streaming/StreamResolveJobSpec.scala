package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Er
import graft.gen.DocGen
import graft.norm.Normalizer
import graft.pipeline.IncrementalResolve

/** The streaming production entry: durable versioned state, replayed-batch
  * idempotence, and multi-batch equivalence with a single-shot increment
  * over the same corpus.
  */
class StreamResolveJobSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** DocGen ids are seed-independent ("doc-%09d") — prefix per batch so
    * two batches never collide on doc_id.
    */
  private def corpus(n: Int, seed: Long): DataFrame =
    DocGen.corpusDF(spark, entities = n, docsPerEntity = 2, seed = seed,
      partitions = 2)
      .select(concat(lit(s"s$seed-"), col("doc_id")).as("doc_id"), col("spans"))

  private def stateClusters(stateRoot: String): Array[(String, String)] = {
    val versions = new java.io.File(stateRoot).listFiles()
      .filter(f => f.getName.startsWith("v=") &&
        new java.io.File(f, "_COMMITTED").exists())
      .map(_.getName.drop(2).toLong)
    spark.read.parquet(s"$stateRoot/v=${versions.max}/clusters")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
  }

  test("two streamed batches == one-shot increment over the union (exact state)") {
    val in = tmp("sjob-in")
    val state = tmp("sjob-state")
    val ckpt = tmp("sjob-ckpt")
    val b1 = corpus(40, seed = 1L)
    val b2 = corpus(40, seed = 2L)
    b1.coalesce(1).write.mode("append").parquet(in)
    b2.coalesce(1).write.mode("append").parquet(in)

    val q = StreamResolveJob.start(spark, Map(
      "input" -> in, "state" -> state, "checkpoint" -> ckpt,
      "max-files-per-trigger" -> "1"))
    q.awaitTermination()

    // maxFilesPerTrigger=1 must actually split the corpus into multiple
    // batches: the prune keeps the last TWO committed versions, so seeing
    // fewer would mean the whole corpus ran as one batch and the
    // incremental path this test exists to cover never executed
    val versions = new java.io.File(state).listFiles()
      .filter(f => f.getName.startsWith("v=") &&
        new java.io.File(f, "_COMMITTED").exists()).map(_.getName)
    assert(versions.length == 2, s"expected 2 committed versions, got ${versions.mkString(",")}")

    // expected: the SAME increment body applied to the whole corpus in one
    // shot (empty existing state) — multi-batch maintenance must land on
    // the identical clustering
    Er.register(spark)
    val all = b1.unionByName(b2)
    val names = all
      .withColumn("name", Er.docName(col("spans")))
      .where(Er.rejectReason(col("name")).isNull)
      .withColumn("normalized", Normalizer.normalizeColumn(col("name")))
      .where(col("normalized") =!= "").select("doc_id", "normalized")
    val empty = all.select(col("doc_id"), col("doc_id").as("cluster_id")).limit(0)
    val expected = IncrementalResolve.resolveNames(spark, empty, names.limit(0), names)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted

    assert(stateClusters(state).sameElements(expected))

    // symmetric lineage guard: this checkpoint has recorded progress, so
    // pairing it with an empty state root must refuse (the source would
    // skip every recorded file)
    assertThrows[IllegalStateException](StreamResolveJob.start(spark, Map(
      "input" -> in, "state" -> tmp("sjob-state-lost"), "checkpoint" -> ckpt)))
  }

  test("state without a keys table (pre-keys engine version) migrates transparently") {
    val state = tmp("sjob-state5")
    StreamResolveJob.attachBatch(spark, state, corpus(15, seed = 31L), batchId = 0L)
    // simulate old-version state: no persisted keys
    val keysDir = new java.io.File(state, "v=0/keys")
    assert(keysDir.exists())
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(keysDir)
    val before = stateClusters(state)
    StreamResolveJob.attachBatch(spark, state, corpus(15, seed = 32L), batchId = 1L)
    assert(stateClusters(state).length > before.length)
    // the new version persists keys again
    assert(new java.io.File(state, "v=1/keys").exists())
  }

  test("replayed batchId is a no-op; state survives byte-identical") {
    val state = tmp("sjob-state2")
    val b1 = corpus(20, seed = 7L)
    StreamResolveJob.attachBatch(spark, state, b1, batchId = 0L)
    val after1 = stateClusters(state)
    // foreachBatch replays with the same id after a failure — must skip
    StreamResolveJob.attachBatch(spark, state, corpus(20, seed = 99L), batchId = 0L)
    assert(stateClusters(state).sameElements(after1))
    // a NEW batch advances state
    StreamResolveJob.attachBatch(spark, state, corpus(20, seed = 8L), batchId = 1L)
    assert(stateClusters(state).length > after1.length)
    // prune keeps at most the last two committed versions
    StreamResolveJob.attachBatch(spark, state, corpus(10, seed = 9L), batchId = 2L)
    val committed = new java.io.File(state).listFiles()
      .filter(f => f.getName.startsWith("v=") &&
        new java.io.File(f, "_COMMITTED").exists())
    assert(committed.length <= 2)
  }

  test("strict args + lineage guard: typo'd options fail fast; fresh checkpoint over non-empty state refuses") {
    assertThrows[IllegalArgumentException](StreamResolveJob.parseArgs(
      Array("--input", "a", "--state", "b"))) // missing --checkpoint
    assertThrows[IllegalArgumentException](StreamResolveJob.parseArgs(
      Array("--input", "a", "--state", "b", "--checkpoint", "c",
        "--max-file-per-trigger", "1"))) // typo'd option must not silently default
    // a reset checkpoint restarts batchIds at 0; pairing it with existing
    // state would silently skip-drop every batch up to the old high-water
    // mark — the job must refuse instead
    val state = tmp("sjob-state4")
    StreamResolveJob.attachBatch(spark, state, corpus(10, seed = 21L), batchId = 0L)
    val in = tmp("sjob-in4")
    corpus(5, seed = 22L).coalesce(1).write.mode("append").parquet(in)
    assertThrows[IllegalStateException](StreamResolveJob.start(spark, Map(
      "input" -> in, "state" -> state, "checkpoint" -> tmp("sjob-ckpt4"))))
  }

  test("docs that normalize to nothing land in the state's rejects table, not nowhere") {
    val state = tmp("sjob-state5")
    val good = corpus(10, seed = 31L)
    // a doc with no text spans: docName = "" -> normalized "" -> it can
    // never enter the clustering; it must be RECORDED, not vanish
    val nameless = good.limit(1)
      .select(lit("s31-nameless").as("doc_id"),
        filter(col("spans"), s => s.getField("kind") =!= "text").as("spans"))
    StreamResolveJob.attachBatch(spark, state, good.unionByName(nameless), batchId = 0L)
    val rejects = spark.read.parquet(s"$state/v=0/rejects").collect()
    assert(rejects.map(_.getAs[String]("doc_id")).toSet == Set("s31-nameless"))
    assert(rejects(0).getAs[String]("reject_reason") == "blank")
    assert(!stateClusters(state).exists(_._1 == "s31-nameless"))
    // rejects are cumulative across versions (old versions get pruned)
    StreamResolveJob.attachBatch(spark, state, corpus(5, seed = 32L), batchId = 1L)
    assert(spark.read.parquet(s"$state/v=1/rejects").count() == 1)
  }

  test("crash mid-write: an uncommitted version dir is invisible and the replay overwrites it") {
    val state = tmp("sjob-state3")
    val b1 = corpus(20, seed = 11L)
    StreamResolveJob.attachBatch(spark, state, b1, batchId = 0L)
    // simulate a batch-1 crash AFTER partial parquet writes but BEFORE the
    // _COMMITTED marker: junk data in v=1, no marker
    val partial = new java.io.File(state, "v=1/clusters")
    partial.mkdirs()
    Files.write(partial.toPath.resolve("part-garbage.parquet"), Array[Byte](1, 2, 3))
    val before = stateClusters(state) // must still read v=0
    // the streaming engine replays batch 1; the overwrite must supersede
    // the partial dir and commit
    val b2 = corpus(20, seed = 12L)
    StreamResolveJob.attachBatch(spark, state, b2, batchId = 1L)
    val after = stateClusters(state)
    assert(after.length > before.length)
    assert(new java.io.File(state, "v=1/_COMMITTED").exists())
  }
}
