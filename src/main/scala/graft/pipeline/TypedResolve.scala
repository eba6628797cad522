package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{ClusterAssignment, Doc, PairScore}

/** Typed `Dataset[T]` facade over [[ResolvePipeline]] — the compile-time-
  * checked entry point for callers with case-class rows (the DataFrame
  * core stays schema-dynamic for config-driven pipelines; both run the
  * same plan, encoders add no extra pass).
  */
final case class TypedResult(
    clusters: Dataset[ClusterAssignment],
    pairScores: Dataset[PairScore])

object TypedResolve {

  /** Cluster a typed doc table: Dataset[Doc] in, Dataset[ClusterAssignment]
    * + Dataset[PairScore] out (spans re-attachment is a DataFrame concern;
    * take `.clusters` from the untyped result when the spans are needed).
    */
  def resolve(spark: SparkSession, docs: Dataset[Doc],
              cfg: PipelineConfig = PipelineConfig(),
              overrideEdges: Option[Dataset[(String, String)]] = None): TypedResult = {
    import spark.implicits._
    val r = ResolvePipeline.run(spark, docs.toDF(), cfg,
      overrideEdges.map(_.toDF("src", "dst")))
    TypedResult(
      clusters = r.clusters.select("doc_id", "cluster_id").as[ClusterAssignment],
      pairScores = r.pairScores.as[PairScore])
  }
}
