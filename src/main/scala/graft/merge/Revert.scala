package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents

/** M11: merge revert / compensation (merge/MergeEngine.java:104-215,
  * merge/MergeTransaction.java). The reference wraps each merge in a
  * compensating transaction whose rollback steps are: delete the created
  * synonym, delete the duplicate record, reverse-migrate relationships,
  * and `revertMerge` the MERGED_INTO edge + status flip
  * (graph/CypherExecutor.java:402-441).
  *
  * Batch analog: merges ARE edges (PipelineResult.mergeEdges), so
  * reverting a set of merges = removing those edges and re-deriving the
  * affected clusters. The scale-critical part is doing that WITHOUT
  * re-clustering the world: only components containing a reverted edge
  * are recomputed (component-local CC over the surviving edges); every
  * other cluster row passes through untouched. Downstream tables re-derive
  * from the new cluster map exactly as they were first derived —
  * relationships via [[graft.relations.Relationships.migrate]], synonym /
  * duplicate compensation via
  * [[graft.retention.Retention.purgeByIds]] with the reverted pairs as
  * tombstones — mirroring rollback steps 1-3.
  */
object Revert {

  /** Re-derive cluster assignments after removing `reverted` merge edges.
    *
    * @param clusters current assignments (doc_id, cluster_id)
    * @param edges    all merge edges that produced `clusters` (src, dst)
    * @param reverted subset of edges to undo (src, dst)
    * @return new (doc_id, cluster_id): untouched clusters pass through;
    *         touched components are re-clustered on surviving edges, so a
    *         component severed by the revert splits into its true parts
    *         (docs still connected via other edges stay merged — reverting
    *         one of several witnesses does not split them, matching the
    *         reference where only the reverted MERGED_INTO link dies).
    */
  def revertMerges(spark: SparkSession, clusters: DataFrame,
                   edges: DataFrame, reverted: DataFrame): DataFrame = {
    val rev = reverted.select(col("src"), col("dst"))
    // components containing a reverted endpoint
    val endpoints = rev.select(col("src").as("doc_id"))
      .union(rev.select(col("dst").as("doc_id"))).distinct()
    // both frames are consumed twice (touched: member expansion + the
    // final anti-join; touchedDocs: subgraph semi-join + CC vertices) and
    // are O(touched components) small by construction — materialize so
    // the clusters/edges semi-join subtrees run once, not per consumer
    val touched = clusters.join(endpoints, Seq("doc_id"), "left_semi")
      .select("cluster_id").distinct().localCheckpoint(true)
    val touchedDocs = clusters.join(touched, Seq("cluster_id"), "left_semi")
      .select("doc_id").localCheckpoint(true)
    val kept = edges.select(col("src"), col("dst"))
      .join(rev, Seq("src", "dst"), "left_anti")
    // an edge of a touched component has BOTH endpoints inside it
    // (components are closed), so one semi-join selects the subgraph
    val subEdges = kept.join(touchedDocs.select(col("doc_id").as("src")),
      Seq("src"), "left_semi")
    val recomputed = ConnectedComponents.run(spark, subEdges, touchedDocs)
    clusters.join(touched, Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id")
      .unionByName(recomputed.select("doc_id", "cluster_id"))
  }
}
