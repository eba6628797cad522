package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.gen.DocGen

/** Multi-tenancy scoping (tenant/TenantAwareEntityRepository.java:50-70):
  * the same corpus duplicated under two tenants must resolve into
  * per-tenant clusters — no cluster may span tenants — while identical
  * docs within a tenant still merge exactly as in the unscoped run.
  */
class TenantScopeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val base = DocGen.corpusDF(spark, entities = 15, docsPerEntity = 3)
    .select("doc_id", "spans")

  private def tenanted(t: String) =
    base.select(concat(lit(t + ":"), col("doc_id")).as("doc_id"), col("spans"))
      .withColumn("tenant", lit(t))

  test("no cluster spans tenants; per-tenant clustering matches the unscoped run") {
    val both = tenanted("A").union(tenanted("B"))
    val scoped = ResolvePipeline.run(spark, both,
      PipelineConfig(tenantColumn = Some("tenant")))
    val withTenant = scoped.clusters
      .join(both.select("doc_id", "tenant"), Seq("doc_id"))

    val spanning = withTenant.groupBy("cluster_id")
      .agg(countDistinct(col("tenant")).as("nt"))
      .where(col("nt") > 1).count()
    assert(spanning == 0, s"$spanning clusters span tenants")

    // each tenant's partition of the scoped result == the unscoped run on
    // its own docs (same groupings, modulo the id prefix)
    val solo = ResolvePipeline.run(spark, tenanted("A").drop("tenant")).clusters
    def groups(df: org.apache.spark.sql.DataFrame): Set[Set[String]] =
      df.select("doc_id", "cluster_id").collect()
        .groupBy(_.getString(1)).values.map(_.map(_.getString(0)).toSet).toSet
    val scopedA = withTenant.where(col("tenant") === "A").select("doc_id", "cluster_id")
    assert(groups(scopedA) == groups(solo))
  }

  test("null tenants coalesce to a reserved tenant: isolated from real tenants, merged together") {
    // two identical docs with NULL tenant + the same doc under tenant A:
    // the null pair must merge with each other and NOT with A's doc
    val nulls = tenanted("N").withColumn("tenant", lit(null).cast("string"))
    val both = tenanted("A").union(nulls)
    val scoped = ResolvePipeline.run(spark, both,
      PipelineConfig(tenantColumn = Some("tenant")))
    val withSrc = scoped.clusters
      .withColumn("src", substring(col("doc_id"), 1, 1))
    val spanning = withSrc.groupBy("cluster_id")
      .agg(countDistinct(col("src")).as("ns"))
      .where(col("ns") > 1).count()
    assert(spanning == 0, "null-tenant docs must not merge into a real tenant")
    // null-tenant docs still cluster among themselves exactly like a
    // normal tenant (not silently dropped into singletons)
    def groups(df: org.apache.spark.sql.DataFrame): Set[Set[String]] =
      df.select("doc_id", "cluster_id").collect()
        .groupBy(_.getString(1)).values.map(_.map(_.getString(0)).toSet).toSet
    val solo = ResolvePipeline.run(spark, tenanted("N").drop("tenant")).clusters
    val nullPart = withSrc.where(col("src") === "N").select("doc_id", "cluster_id")
    assert(groups(nullPart) == groups(solo),
      "null-tenant partition must cluster exactly like an unscoped run on its docs")
  }

  test("unscoped run merges the cross-tenant duplicates the scoped run keeps apart") {
    val both = tenanted("A").union(tenanted("B"))
    val unscoped = ResolvePipeline.run(spark, both.drop("tenant"))
    val scoped = ResolvePipeline.run(spark, both,
      PipelineConfig(tenantColumn = Some("tenant")))
    val nUnscoped = unscoped.clusters.select("cluster_id").distinct().count()
    val nScoped = scoped.clusters.select("cluster_id").distinct().count()
    assert(nScoped > nUnscoped,
      s"tenant scoping had no effect ($nScoped vs $nUnscoped clusters)")
  }
}
