package graft.context

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Context & Subgraph API (api/EntityResolver.java:454-530,
  * shapes in api/EntityContext.java:22-35 and api/EntitySubgraph.java:26-41):
  * a single-call bundle of an entity with its synonyms, relationships,
  * match decisions and merge history — the headline RAG export
  * ("LLM-Centric Use Cases", docs/usecases.md).
  *
  * Batch analog: instead of one `getEntityContext(id)` per request, build
  * the context for EVERY entity in one multi-join pass. Each side input is
  * reduced to per-entity aggregates first (partial-agg shuffles on
  * entity_id), then assembled by left joins from the entity table — no
  * row-explosion joins, and each component table is touched exactly once.
  * At 10^9 entities every stage is a hash-partitioned agg/join on the same
  * key, so co-partitioning (bucketing by entity_id) removes all but the
  * first shuffle.
  */
object EntityContext {

  /** Per-entity nested context bundle. Arrays are sorted so output is
    * deterministic (collect_list order is not).
    *
    * @param entities  (entity_id, value) canonical entities
    * @param synonyms  (entity_id, normalized, support_count, confidence, ...)
    * @param rels      (rel_id, src, dst, rel_type, ...)
    * @param decisions (doc_id_a, doc_id_b, score, decision) — an entity's
    *                  decisions are those naming it on either side
    * @param merges    (entity_id, merged_from, confidence, merged_seq)
    */
  def contextStructs(entities: DataFrame, synonyms: DataFrame, rels: DataFrame,
                     decisions: DataFrame, merges: DataFrame): DataFrame = {
    val syn = synonyms.groupBy("entity_id")
      .agg(sort_array(collect_list(struct(col("normalized"), col("support_count"),
        col("confidence")))).as("synonyms"))
    val rel = relsByEither(rels).groupBy("entity_id")
      .agg(sort_array(collect_list(struct(col("rel_id"), col("src"), col("dst"),
        col("rel_type")))).as("relationships"))
    val dec = decisionsByEither(decisions).groupBy("entity_id")
      .agg(sort_array(collect_list(struct(col("doc_id_a"), col("doc_id_b"),
        col("score"), col("decision")))).as("decisions"))
    val mh = merges.groupBy("entity_id")
      .agg(sort_array(collect_list(struct(col("merged_from"), col("confidence"),
        col("merged_seq")))).as("merge_history"))
    entities
      .join(syn, Seq("entity_id"), "left")
      .join(rel, Seq("entity_id"), "left")
      .join(dec, Seq("entity_id"), "left")
      .join(mh, Seq("entity_id"), "left")
  }

  /** Flat per-entity context summary — the same bundle as
    * [[contextStructs]] reduced to scalar aggregates per component
    * (counts, supports, extrema). The oracle-checked surface: nested
    * arrays hash differently across engines; scalars do not.
    */
  def contextSummary(entities: DataFrame, synonyms: DataFrame, rels: DataFrame,
                     decisions: DataFrame, merges: DataFrame): DataFrame = {
    val syn = synonyms.groupBy("entity_id").agg(
      count(lit(1)).as("n_synonyms"),
      sum(col("support_count")).as("synonym_support"),
      min(col("normalized")).as("first_synonym"))
    val rel = relsByEither(rels).groupBy("entity_id").agg(
      count(lit(1)).as("n_rels"),
      countDistinct(col("rel_type")).as("n_rel_types"))
    val dec = decisionsByEither(decisions).groupBy("entity_id").agg(
      count(lit(1)).as("n_decisions"),
      max(col("score")).as("max_decision_score"))
    val mh = merges.groupBy("entity_id").agg(
      count(lit(1)).as("n_merged_from"),
      max(col("merged_seq")).as("last_merge_seq"))
    entities
      .join(syn, Seq("entity_id"), "left")
      .join(rel, Seq("entity_id"), "left")
      .join(dec, Seq("entity_id"), "left")
      .join(mh, Seq("entity_id"), "left")
      .na.fill(0L, Seq("n_synonyms", "synonym_support", "n_rels", "n_rel_types",
        "n_decisions", "n_merged_from"))
  }

  /** Each relationship contributes one row per endpoint (the reference's
    * by-either lookup, graph/CypherExecutor.java by-either form). A
    * self-loop still yields its two endpoint rows (both the same entity).
    */
  private def relsByEither(rels: DataFrame): DataFrame =
    rels.select(col("src").as("entity_id"), col("rel_id"), col("src"), col("dst"),
        col("rel_type"))
      .unionByName(rels.select(col("dst").as("entity_id"), col("rel_id"), col("src"),
        col("dst"), col("rel_type")))

  private def decisionsByEither(decisions: DataFrame): DataFrame =
    decisions.select(col("doc_id_a").as("entity_id"), col("doc_id_a"), col("doc_id_b"),
        col("score"), col("decision"))
      .unionByName(decisions.select(col("doc_id_b").as("entity_id"), col("doc_id_a"),
        col("doc_id_b"), col("score"), col("decision")))

  /** Subgraph node set: BFS over the (undirected) relationship graph from
    * the seed entities, labelling every reached entity with its minimum
    * hop distance (the reference's visitedIds layer loop,
    * api/EntityResolver.java:493-512; depth clamped 1-3 like the
    * reference). Each hop is one equi-join of the current frontier
    * against the edge list plus an anti-join against the visited set —
    * depth is a small constant, so this is `depth` shuffles, not an
    * iterate-to-convergence.
    */
  def subgraphNodes(rels: DataFrame, seeds: DataFrame, depth: Int): DataFrame = {
    val d = math.max(1, math.min(depth, 3))
    val und = rels.select(col("src").as("from"), col("dst").as("to"))
      .union(rels.select(col("dst").as("from"), col("src").as("to")))
    var visited = seeds.select(col("entity_id")).distinct()
      .withColumn("depth", lit(0))
    var frontier = visited.select("entity_id")
    for (hop <- 1 to d) {
      val next = und.join(frontier.withColumnRenamed("entity_id", "from"), Seq("from"))
        .select(col("to").as("entity_id")).distinct()
        .join(visited.select("entity_id"), Seq("entity_id"), "left_anti")
        .withColumn("depth", lit(hop))
      visited = visited.union(next).localCheckpoint(true)
      frontier = next.select("entity_id")
    }
    visited
  }

  /** Subgraph edge set: all relationships touched while expanding layers
    * 0..depth-1 (the reference collects getRelationships for every node of
    * each layer before the final one, then dedups), i.e. relationships
    * with at least one endpoint at depth < `depth`.
    */
  def subgraphEdges(rels: DataFrame, nodes: DataFrame, depth: Int): DataFrame = {
    val d = math.max(1, math.min(depth, 3))
    val inner = nodes.where(col("depth") < d).select(col("entity_id"))
    rels
      .join(inner.withColumnRenamed("entity_id", "src"), Seq("src"), "left_semi")
      .unionByName(rels.join(inner.withColumnRenamed("entity_id", "dst"),
        Seq("dst"), "left_semi").select(rels.columns.map(col): _*))
      .dropDuplicates("rel_id")
  }
}
