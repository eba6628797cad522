package graft.retention

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RetentionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("purgeExpired drops only old MERGED rows") {
    import spark.implicits._
    val df = Seq(
      ("e1", "MERGED", Timestamp.valueOf("2020-01-01 00:00:00")),
      ("e2", "ACTIVE", Timestamp.valueOf("2020-01-01 00:00:00")),
      ("e3", "MERGED", Timestamp.valueOf("2026-01-01 00:00:00"))
    ).toDF("id", "status", "updated_at")
    val (kept, purged) = Retention.purgeExpired(
      df, "updated_at", Timestamp.valueOf("2025-01-01 00:00:00"), Some("status"))
    assert(kept.collect().map(_.getString(0)).toSet == Set("e2", "e3"))
    assert(purged.collect().map(_.getString(0)).toSet == Set("e1"))
  }

  test("purgeByIds anti-joins tombstones") {
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("id")
    val tomb = Seq("b").toDF("dead_id")
    assert(Retention.purgeByIds(df, "id", tomb, "dead_id")
      .collect().map(_.getString(0)).toSet == Set("a", "c"))
  }

  test("multimodal plumbing: decode + features + frame sampling") {
    import spark.implicits._
    val docs = graft.gen.DocGen.corpusDF(spark, 5, 2)
    val media = graft.media.Multimodal.synthesizeMedia(spark, docs.select("doc_id", "spans"))
    if (media.count() > 0) {
      val meta = graft.media.Multimodal.decode(media)
      assert(meta.count() == media.count())
      assert(meta.collect().forall(m => m.size_bytes > 0 && m.content_hash != 0))
      val feats = graft.media.Multimodal.extractFeatures(media)
      assert(feats.collect().forall(_.features.length == 8))
      // determinism: same bytes -> same features
      val f2 = graft.media.Multimodal.extractFeatures(media).collect()
        .map(f => f.media_ref -> f.features.toSeq).toMap
      graft.media.Multimodal.extractFeatures(media).collect()
        .foreach(f => assert(f2(f.media_ref) == f.features.toSeq))
      val frames = graft.media.Multimodal.sampleFrames(meta)
      val videos = meta.toDF().where($"kind" === "video").count()
      if (videos > 0) assert(frames.count() >= videos)
    }
  }
}
