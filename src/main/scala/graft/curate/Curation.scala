package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Corpus curation for LLM training data — the composition an ingest
  * pipeline actually runs over a raw crawl: language allowlist, quality
  * floor, then TRANSITIVE near-dup removal (MinHash pairs → connected
  * components → keep the min-id doc of each group; A~B~C collapses to
  * one survivor even when A and C themselves don't pair). Each stage
  * composes operators that are individually oracle-gated (q22 langId,
  * q21 quality, q18 near-dup pairs, q08 CC), and the composition itself
  * is value-exact against a DuckDB mirror (q72).
  *
  * Output is an auditable DISPOSITION table, one row per input doc —
  * (doc_id, lang, quality, keep, drop_reason) with drop_reason ∈
  * {lang, quality, near_dup} (null for kept docs) — not just the
  * survivors: at 100 TB "what did we drop and why" is a first-class
  * product of curation, and `keep` joins back to the corpus for the
  * survivor set.
  *
  * Scale shape: signals are one codegen'd projection over the scan;
  * only lang+quality survivors enter blocking (the filter runs BEFORE
  * any shuffle); near-dup grouping is the capped/salted band join plus
  * CC over near-dup edges — components are tiny (dup groups), so CC
  * converges in a few rounds over a sparse edge set.
  *
  * A NULL-text doc identifies as "und" and a null quality score fails
  * the floor (coalesce(quality, -1)) — nothing is silently kept.
  */
object Curation {

  def curate(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
             langAllow: Set[String], minQuality: Double,
             nearDupThreshold: Double = 0.7, maxBlockSize: Int = 10000): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // one pass for the per-doc signals; materialized because the table
    // feeds both the eligibility filter and the final disposition join.
    // (r06: a conditional repartition-to-cores before this projection was
    // measured and reverted — the single-task signal stage is cold-JIT
    // cost only; warm it clears sf0.1 in tens of ms, and the extra
    // exchange cost more than it saved.)
    val sig = base.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .localCheckpoint(true)
    val eligible = sig
      .where(col("lang").isin(langAllow.toSeq: _*) &&
        coalesce(col("quality"), lit(-1.0)) >= minQuality)
      .select("doc_id")
    val candDocs = base.join(eligible, Seq("doc_id"))
    val pairs = Dedup.minhashNearDups(candDocs, "doc_id", "text",
      nearDupThreshold, maxBlockSize)
    val cc = ConnectedComponents.run(spark,
      pairs.select(col("doc_id_a").as("src"), col("doc_id_b").as("dst")),
      eligible)
    sig
      .join(cc.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("drop_reason",
        when(!coalesce(col("lang").isin(langAllow.toSeq: _*), lit(false)), lit("lang"))
          .when(coalesce(col("quality"), lit(-1.0)) < minQuality, lit("quality"))
          .when(col("cluster_id") =!= col("doc_id"), lit("near_dup")))
      .withColumn("keep", col("drop_reason").isNull)
      .select("doc_id", "lang", "quality", "keep", "drop_reason")
  }
}
