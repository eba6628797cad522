package graft.checkpoint

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.gen.DocGen
import graft.pipeline.{PipelineConfig, ResolvePipeline}

/** Checkpoint/resume semantics (FIXTURES.md §6): committed stages are
  * skipped on rerun; a killed run resumes mid-pipeline and produces
  * byte-identical output.
  */
class StageStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("committed stage with same fingerprint is not recomputed") {
    import spark.implicits._
    val store = new StageStore(tmpDir("graft-store"), spark)
    var computes = 0
    def compute = { computes += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val fp = store.fingerprint("stage-params", "v1")
    val first = store.materialize("s1", fp)(compute).collect().sortBy(_.getInt(0))
    val second = store.materialize("s1", fp)(compute).collect().sortBy(_.getInt(0))
    assert(computes == 1, "second materialize must be a resume, not a recompute")
    assert(first.map(_.toString).toSeq == second.map(_.toString).toSeq)
  }

  test("fingerprint change invalidates the snapshot") {
    import spark.implicits._
    val store = new StageStore(tmpDir("graft-store"), spark)
    var computes = 0
    def compute = { computes += 1; Seq(1).toDF("id") }
    store.materialize("s1", store.fingerprint("v1"))(compute)
    store.materialize("s1", store.fingerprint("v2"))(compute)
    assert(computes == 2)
  }

  test("manifest records rows and per-partition lineage") {
    import spark.implicits._
    val root = tmpDir("graft-store")
    val store = new StageStore(root, spark)
    store.materialize("s1", "fp00")(Seq(1, 2, 3).toDF("id"))
    val manifest = new String(Files.readAllBytes(Paths.get(root, "s1", "MANIFEST.json")))
    assert(manifest.contains("\"rows\":3"))
    assert(manifest.contains("\"partitions\":["))
    assert(store.committedFingerprint("s1").contains("fp00"))
  }

  // ---- chaos tier: injected mid-stage faults (the batch analog of the
  // reference's chaos/ChaosTest.java connection-failure injection). The
  // invariant under every fault: an uncommitted stage is recomputed, a
  // committed stage is trusted, and the final output is byte-identical
  // to an uninterrupted run.

  test("chaos: kill between snapshot move and manifest commit -> recompute") {
    import spark.implicits._
    val root = tmpDir("graft-chaos")
    val store = new StageStore(root, spark)
    var computes = 0
    def compute = { computes += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val fp = store.fingerprint("v1")
    val clean = store.materialize("s1", fp)(compute).collect().map(_.toString).sorted
    // simulate the crash window: data dir swapped into place, manifest
    // (the commit point) never written
    Files.delete(Paths.get(root, "s1", "MANIFEST.json"))
    val after = store.materialize("s1", fp)(compute).collect().map(_.toString).sorted
    assert(computes == 2, "data-without-manifest must NOT count as committed")
    assert(after.toSeq == clean.toSeq)
    assert(store.committedFingerprint("s1").contains(fp), "recommit must complete")
  }

  test("chaos: stale tmp dir from a killed writer is cleaned and overwritten") {
    import spark.implicits._
    val root = tmpDir("graft-chaos")
    val store = new StageStore(root, spark)
    val fp = store.fingerprint("v1")
    // a previous run died mid-write leaving a garbage .tmp-<fp> dir
    val tmp = Paths.get(root, "s1", s".tmp-$fp")
    Files.createDirectories(tmp)
    Files.write(tmp.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    val out = store.materialize("s1", fp)(Seq((7, "x")).toDF("id", "v"))
      .collect().map(_.toString).toSeq
    assert(out == Seq("[7,x]"))
    assert(store.committedFingerprint("s1").contains(fp))
  }

  test("chaos: compute failure leaves store uncommitted; retry succeeds") {
    import spark.implicits._
    val root = tmpDir("graft-chaos")
    val store = new StageStore(root, spark)
    val fp = store.fingerprint("v1")
    // first attempt dies mid-stage (the analog of a fatal task failure)
    intercept[RuntimeException] {
      store.materialize("s1", fp) {
        throw new RuntimeException("injected stage failure")
      }
    }
    assert(store.committedFingerprint("s1").isEmpty,
      "failed stage must not commit")
    val out = store.materialize("s1", fp)(Seq((1, "a")).toDF("id", "v"))
      .collect().map(_.toString).toSeq
    assert(out == Seq("[1,a]"))
  }

  test("chaos: truncated manifest is treated as uncommitted") {
    import spark.implicits._
    val root = tmpDir("graft-chaos")
    val store = new StageStore(root, spark)
    var computes = 0
    def compute = { computes += 1; Seq(1).toDF("id") }
    val fp = store.fingerprint("v1")
    store.materialize("s1", fp)(compute)
    // corrupt the commit record: cut it off before the fingerprint field
    val mp = Paths.get(root, "s1", "MANIFEST.json")
    val text = new String(Files.readAllBytes(mp))
    Files.write(mp, text.take(text.indexOf("fingerprint") - 2).getBytes)
    store.materialize("s1", fp)(compute)
    assert(computes == 2, "corrupt manifest must force a recompute")
    assert(store.committedFingerprint("s1").contains(fp))
  }

  test("chaos: mid-pipeline manifest loss -> stage recomputed, output byte-identical") {
    val docs = DocGen.corpusDF(spark, entities = 10, docsPerEntity = 3)
      .select("doc_id", "spans")
    val root = tmpDir("graft-chaos-pipe")
    val cfg = PipelineConfig(checkpointRoot = Some(root))
    val full = ResolvePipeline.run(spark, docs, cfg)
      .clusters.select("doc_id", "cluster_id").collect().map(_.toString).sorted
    // the crash window hit candidate_pairs: snapshot present, commit lost
    Files.delete(Paths.get(root, "candidate_pairs", "MANIFEST.json"))
    val resumed = ResolvePipeline.run(spark, docs, cfg)
      .clusters.select("doc_id", "cluster_id").collect().map(_.toString).sorted
    assert(resumed.toSeq == full.toSeq)
    assert(Files.exists(Paths.get(root, "candidate_pairs", "MANIFEST.json")),
      "interrupted stage must recommit on resume")
  }

  test("killed run resumes mid-pipeline with byte-identical output") {
    val docs = DocGen.corpusDF(spark, entities = 10, docsPerEntity = 3)
      .select("doc_id", "spans")
    val root = tmpDir("graft-resume")
    val cfg = PipelineConfig(checkpointRoot = Some(root))

    val full = ResolvePipeline.run(spark, docs, cfg)
      .clusters.select("doc_id", "cluster_id").collect()
      .map(_.toString).sorted

    // simulate a kill AFTER pair_scores committed but BEFORE clusters:
    // delete the clusters stage only, rerun — earlier stages must be
    // resumed from their snapshots, and the output must be identical
    def rmr(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(Files.delete(_))
    rmr(Paths.get(root, "clusters"))

    val scoresManifestBefore =
      Files.getLastModifiedTime(Paths.get(root, "pair_scores", "MANIFEST.json"))
    val resumed = ResolvePipeline.run(spark, docs, cfg)
      .clusters.select("doc_id", "cluster_id").collect()
      .map(_.toString).sorted
    val scoresManifestAfter =
      Files.getLastModifiedTime(Paths.get(root, "pair_scores", "MANIFEST.json"))

    assert(resumed.toSeq == full.toSeq, "resumed output differs from uninterrupted run")
    assert(scoresManifestBefore == scoresManifestAfter,
      "pair_scores was recomputed despite a committed snapshot")
  }
}
