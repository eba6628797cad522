package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** B4, bounded (api/EntityResolutionService.java:512-524): docs whose
  * blocking keys match nothing get a capped comparison round against a
  * deterministic sample instead of the reference's O(n^2) full scan.
  */
class OrphanFallbackSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docs = {
    import spark.implicits._
    Seq(
      ("d1", "alpha industries group"),
      ("d2", "alpha industries groupe"), // distinct normalized, shared pfx/bg keys
      ("o1", "qqqxyzzy")) // shares no blocking key with the others
      .toDF("doc_id", "name")
      .select(col("doc_id"), array(struct(
        lit("text").as("kind"), col("name").as("text"),
        lit("").as("media_ref"), lit(0).as("offset"))).as("spans"))
  }

  test("orphans are invisible without the fallback, scored with it") {
    val off = ResolvePipeline.run(spark, docs)
    assert(off.pairScores
      .where(col("doc_id_a") === "o1" || col("doc_id_b") === "o1").count() == 0)

    val on = ResolvePipeline.run(spark, docs,
      PipelineConfig(orphanFallback = true, orphanFallbackCap = 10))
    val orphanRows = on.pairScores
      .where(col("doc_id_a") === "o1" || col("doc_id_b") === "o1")
    assert(orphanRows.count() == 2) // o1 x {d1, d2}
    assert(orphanRows.where(col("decision") =!= "NO_MATCH").count() == 0)
    // fallback must not perturb the blocked pairs or the clustering
    assert(on.pairScores.count() == off.pairScores.count() + 2)
    assert(on.clusters.where(col("doc_id") === "o1").select("cluster_id")
      .collect()(0).getString(0) == "o1")
  }

  test("fallback respects tenant isolation: orphans only sample their own tenant") {
    import spark.implicits._
    val tdocs = Seq(
      ("a1", "alpha industries group", "A"),
      ("ao", "qqqxyzzy", "A"),  // orphan in tenant A
      ("bo", "qqqxyzzy", "B"))  // same orphan name, tenant B
      .toDF("doc_id", "name", "tenant")
      .select(col("doc_id"), array(struct(
        lit("text").as("kind"), col("name").as("text"),
        lit("").as("media_ref"), lit(0).as("offset"))).as("spans"),
        col("tenant"))
    val r = ResolvePipeline.run(spark, tdocs,
      PipelineConfig(orphanFallback = true, orphanFallbackCap = 10,
        tenantColumn = Some("tenant")))
    // ao pairs only within tenant A; bo (alone in B) pairs with nobody —
    // and crucially ao-bo (identical names, different tenants) never pair
    val pairs = r.pairScores.select("doc_id_a", "doc_id_b")
      .as[(String, String)].collect().toSet
    assert(pairs.contains(("a1", "ao")))
    assert(!pairs.exists { case (x, y) => Set(x, y) == Set("ao", "bo") })
    assert(!pairs.exists { case (x, y) => x == "bo" || y == "bo" })
  }

  test("cap bounds the fallback work") {
    val on = ResolvePipeline.run(spark, docs,
      PipelineConfig(orphanFallback = true, orphanFallbackCap = 1))
    // sample = first rep by doc_id only
    val orphanRows = on.pairScores
      .where(col("doc_id_a") === "o1" || col("doc_id_b") === "o1").count()
    assert(orphanRows == 1)
  }
}
