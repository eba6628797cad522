package graft.relations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L8/L12/M6: the library-managed relationship surface.
  *
  * The reference stores LIBRARY_REL edges with (id, type, createdAt,
  * createdBy) and serves find-by-source / by-target / by-either /
  * between plus per-entity counts (graph/CypherExecutor.java:624-717,
  * 489-566). Batch closure over a relationships table
  *
  *   (rel_id, src, dst, rel_type, created_seq, created_by)
  *
  * Point lookups are key filters (partition-prunable when the table is
  * written partitioned/bucketed by src); the per-entity forms are
  * aggregations computed for EVERY entity in one pass.
  */
object Relationships {

  def bySource(rels: DataFrame, entityId: Column): DataFrame =
    rels.where(col("src") === entityId)

  def byTarget(rels: DataFrame, entityId: Column): DataFrame =
    rels.where(col("dst") === entityId)

  def byEither(rels: DataFrame, entityId: Column): DataFrame =
    rels.where(col("src") === entityId || col("dst") === entityId)

  def between(rels: DataFrame, srcId: Column, dstId: Column): DataFrame =
    rels.where(col("src") === srcId && col("dst") === dstId)

  /** L12 for every entity at once: outgoing/incoming/total counts per
    * entity and type. Two partial-agg passes unioned then re-aggregated —
    * each entity's row is built without materializing its edge list.
    */
  def countsPerEntity(rels: DataFrame): DataFrame = {
    val out = rels.groupBy(col("src").as("entity_id"), col("rel_type"))
      .agg(count(lit(1)).as("outgoing"), lit(0L).as("incoming"))
    val in = rels.groupBy(col("dst").as("entity_id"), col("rel_type"))
      .agg(lit(0L).as("outgoing"), count(lit(1)).as("incoming"))
    out.unionByName(in)
      .groupBy("entity_id", "rel_type")
      .agg(sum("outgoing").as("outgoing"), sum("incoming").as("incoming"))
      .withColumn("total", col("outgoing") + col("incoming"))
  }

  /** M6: migrate relationships across a merge — remap endpoints through
    * the cluster map (doc_id -> cluster_id), dropping self-loops the
    * merge created (graph/CypherExecutor.java:167-210 migrateRelationships).
    * LEFT joins: the reference rewrites only the MERGED endpoint and
    * leaves the other node untouched whatever it is (`MATCH (source)-[r]->
    * (target)` with no constraint on the far end), so an endpoint absent
    * from the cluster map passes through unmapped — an inner join would
    * silently DELETE every relationship touching an unmapped node. One
    * equi-join per endpoint; the cluster map is broadcastable when small.
    */
  def migrate(rels: DataFrame, clusterMap: DataFrame): DataFrame = {
    val cm = clusterMap.select(col("doc_id"), col("cluster_id"))
    rels
      .join(cm.select(col("doc_id").as("src"), col("cluster_id").as("__sc")), Seq("src"), "left")
      .join(cm.select(col("doc_id").as("dst"), col("cluster_id").as("__dc")), Seq("dst"), "left")
      .withColumn("__s", coalesce(col("__sc"), col("src")))
      .withColumn("__d", coalesce(col("__dc"), col("dst")))
      .where(col("__s") =!= col("__d"))
      .select(col("rel_id"), col("__s").as("src"), col("__d").as("dst"),
        col("rel_type"), col("created_seq"), col("created_by"))
  }
}
