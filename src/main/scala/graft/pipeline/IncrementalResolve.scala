package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocking.BlockingKeys
import graft.cluster.ConnectedComponents
import graft.decide.Thresholds
import graft.functions.Er
import graft.pairs.CandidateGenerator
import graft.sim.SimilarityWeights

/** Incremental resolution — the batch analog of the reference's PRIMARY
  * entry point, per-record `resolver.resolve(name, type)` against the
  * existing graph (api/EntityResolutionService.java:502-615, SURVEY §3.1):
  * a batch of NEW docs is blocked against the EXISTING entity table plus
  * itself, scored, and attached to the existing clustering — without
  * re-clustering the world.
  *
  * Exactness (why this equals a full recompute): the full merge graph is
  * old-edges ∪ new-edges, and old-edges already collapsed into components
  * labelled by their min member. Contracting each old component to its
  * label and running CC over (new-new edges) ∪ (new-doc, old-label) edges
  * yields the same components as CC over the full graph, and the same
  * labels — a merged component's min over {old labels, new ids} equals
  * its min over all members, because each old label IS its component's
  * min. So incremental attach is not an approximation; q65's oracle
  * hash-checks it against a from-scratch recursive-CTE recompute.
  *
  * Scale shape: the expensive inputs (existing blocking-key table B2 and
  * cluster map) are persisted tables read back bucketed by block_key /
  * doc_id; per increment the work is |new-keys| join |existing-keys| plus
  * a CC over the CONTRACTED graph (one vertex per touched cluster, not
  * per doc). A day's increment touches a vanishing fraction of a 100 TB
  * corpus — this is the operator that makes the engine a system rather
  * than a one-shot job. Caveat: block-size caps apply per increment (the
  * full-recompute cap sees bigger blocks); identical results whenever no
  * cap trips, the production recall trade otherwise.
  */
object IncrementalResolve {

  /** [[attachWithDelta]]'s two views of one increment: `assignments` is
    * the full (doc_id, cluster_id) table (existing ∪ new), `changed` is
    * ONLY the rows that differ from `existing` — the new docs plus every
    * member of a relabeled (merged) cluster. `changed` is what a
    * merge-on-read state store writes per batch: O(increment + touched
    * docs), not O(corpus).
    */
  final case class AttachResult(assignments: DataFrame, changed: DataFrame)

  /** Attach new docs to an existing clustering.
    *
    * @param existing    (doc_id, cluster_id) current assignments, labels =
    *                    min member (the pipeline's invariant)
    * @param newIds      (doc_id) the increment's doc ids
    * @param newNewEdges (src, dst) merge edges within the increment
    * @param newOldEdges (src, dst) merge edges from a new doc (src) to an
    *                    existing doc (dst)
    * @return (doc_id, cluster_id) for existing ∪ new docs; labels of
    *         untouched clusters are unchanged, merged clusters take the
    *         global min
    */
  def attach(spark: SparkSession, existing: DataFrame, newIds: DataFrame,
             newNewEdges: DataFrame, newOldEdges: DataFrame): DataFrame =
    attachWithDelta(spark, existing, newIds, newNewEdges, newOldEdges).assignments

  /** [[attach]] plus the changed-rows delta (see [[AttachResult]]). */
  def attachWithDelta(spark: SparkSession, existing: DataFrame, newIds: DataFrame,
                      newNewEdges: DataFrame, newOldEdges: DataFrame): AttachResult = {
    // contract: route new->old edges to the old doc's cluster label
    val contracted = newOldEdges
      .join(existing.select(col("doc_id").as("dst"), col("cluster_id")), Seq("dst"))
      .select(col("src"), col("cluster_id").as("dst"))
      .unionByName(newNewEdges.select("src", "dst"))
    val clusterReps = existing.select(col("cluster_id").as("doc_id")).distinct()
    val vertices = newIds.select("doc_id").unionByName(clusterReps).distinct()
    // Materialize the contracted component labels: they feed THREE
    // downstream subtrees (new-doc assignments, the old-label remap and
    // the relabel delta), and CC.run returns a LAZY labels plan — without
    // the barrier each consumer re-evaluates the labels aggregation plus
    // the whole vertex universe (newIds ∪ existing-reps distinct, i.e. a
    // scan of the existing assignment table) from scratch (measured: 3
    // identical ~2.7 cpu-s stages per q65 run at sf0.1). The table is
    // O(touched clusters + increment) rows by construction — the whole
    // point of contracted-graph attach — so the eager materialization is
    // small at any corpus scale, and localCheckpoint blocks are released
    // by the context cleaner when the increment's frames go out of scope
    // (unlike persist(), safe for per-micro-batch streaming callers).
    val cc = ConnectedComponents.run(spark, contracted, vertices).localCheckpoint(true)
    // new docs take their component label directly; existing docs remap
    // through their old label's new component label (identity when the
    // cluster was untouched)
    val newAssignRows = cc.join(newIds.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "cluster_id")
    val oldRemap = existing
      .join(cc.select(col("doc_id").as("cluster_id"), col("cluster_id").as("__new")),
        Seq("cluster_id"))
      .select(col("doc_id"), col("__new").as("cluster_id"))
    // the relabel map: old labels whose component took a new (smaller)
    // label. cc rows for NEW docs can land here too (a new doc whose
    // label isn't itself), but no existing row joins them — ids are
    // globally unique, so a new doc id is never an existing cluster label
    val relabeled = cc.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("cluster_id"), col("cluster_id").as("__new"))
    val changedOld = existing.join(relabeled, Seq("cluster_id"))
      .select(col("doc_id"), col("__new").as("cluster_id"))
    AttachResult(
      oldRemap.unionByName(newAssignRows),
      changedOld.unionByName(newAssignRows))
  }

  /** Whole increment from normalized names: block the new batch against
    * the existing names and itself (default-key strategy), score, keep
    * edges >= threshold, [[attach]]. `existingKeys` accepts the persisted
    * B2 key table (ideally bucketed by block_key — then the increment's
    * key join leaves the big side exchange-free); pass None to derive keys
    * from `existingNames` on the fly.
    *
    * This is the micro-batch body for a streaming `foreachBatch`
    * increment loop (see StreamingResolveSpec): stream resolves, the
    * clustering stays exact vs a full batch recompute.
    */
  def resolveNames(spark: SparkSession,
                   existing: DataFrame,       // doc_id, cluster_id
                   existingNames: DataFrame,  // doc_id, normalized
                   newNames: DataFrame,       // doc_id, normalized
                   existingKeys: Option[DataFrame] = None,
                   newKeysOpt: Option[DataFrame] = None,
                   weights: SimilarityWeights = SimilarityWeights.default,
                   threshold: Double = Thresholds().autoMerge,
                   maxBlockSize: Int = 1000): DataFrame =
    resolveNamesWithDelta(spark, existing, existingNames, newNames,
      existingKeys, newKeysOpt, weights, threshold, maxBlockSize).assignments

  /** [[resolveNames]] plus the changed-rows delta (see [[AttachResult]]) —
    * the micro-batch body for a merge-on-read state store, which writes
    * only `changed` per batch.
    */
  def resolveNamesWithDelta(spark: SparkSession,
                            existing: DataFrame,
                            existingNames: DataFrame,
                            newNames: DataFrame,
                            existingKeys: Option[DataFrame] = None,
                            newKeysOpt: Option[DataFrame] = None,
                            weights: SimilarityWeights = SimilarityWeights.default,
                            threshold: Double = Thresholds().autoMerge,
                            maxBlockSize: Int = 1000): AttachResult = {
    Er.register(spark)
    val oldKeys = existingKeys.getOrElse(
      BlockingKeys.explodeKeys(existingNames, "doc_id",
        BlockingKeys.defaultKeys(col("normalized"))))
    // a caller that already derived (and persisted) the increment's keys
    // passes them in — e.g. StreamResolveJob, which also writes them to
    // the state version; deriving twice per micro-batch is wasted work.
    // Caller-provided keys are used as-is (caching is the caller's call).
    val newKeys = newKeysOpt.getOrElse(
      BlockingKeys.explodeKeys(newNames, "doc_id",
        BlockingKeys.defaultKeys(col("normalized"))).localCheckpoint(true))
    def scoreEdges(pairs: DataFrame): DataFrame = {
      val a = existingNames.unionByName(newNames)
        .select(col("doc_id").as("doc_id_a"), col("normalized").as("name_a"))
      val b = existingNames.unionByName(newNames)
        .select(col("doc_id").as("doc_id_b"), col("normalized").as("name_b"))
      // EvalOnce fence: the threshold filter would otherwise be pushed
      // into the name joins as a residual predicate with the composite
      // kernels alias-substituted into it — scored once per joined row
      // in the join, then AGAIN in the projection (the
      // Dedup.verifyFromSets pathology). One evaluation, same edges.
      pairs.join(a, Seq("doc_id_a")).join(b, Seq("doc_id_b"))
        .withColumn("score", graft.util.EvalOnce(
          Er.compositeScore(col("name_a"), col("name_b"), weights)))
        .where(col("score") >= threshold)
        .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
    }
    val newNew = scoreEdges(CandidateGenerator.candidatePairs(newKeys, maxBlockSize))
    // old blocks beyond the cap are dropped exactly as in batch blocking
    val okOld = CandidateGenerator.underCapBlocks(oldKeys, maxBlockSize)
    val newOldPairs = newKeys.select(col("block_key"), col("doc_id").as("doc_id_a"))
      .join(oldKeys.join(okOld, Seq("block_key"))
        .select(col("block_key"), col("doc_id").as("doc_id_b")), Seq("block_key"))
      .select("doc_id_a", "doc_id_b").distinct()
    attachWithDelta(spark, existing, newNames.select("doc_id"), newNew,
      scoreEdges(newOldPairs))
  }
}
