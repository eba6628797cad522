package graft.model

/** Core data model for the Spark-native record-linkage engine.
  *
  * Input shape is mandated by BASELINE.json `input_hint`: a table of
  * interleaved text + media documents. The reference system resolves one
  * entity name at a time (api/EntityResolutionService.java:237-244); we
  * resolve a whole table per job, deriving the "entity name" of a document
  * from its text spans in offset order.
  */

/** One span of an interleaved document. `kind` is "text" | "image" |
  * "audio" | "video"; `text` is non-empty iff kind == "text"; `media_ref`
  * is non-empty iff kind != "text". `offset` is the 0-based interleaving
  * position, strictly increasing within a doc.
  *
  * Per-row invariant (north rule): every stage must carry the span
  * sequence byte-identical and order-identical (kind, text, media_ref,
  * order) — mirrors the reference's guarantee that canonicalName survives
  * merges unchanged (merge/MergeEngine.java:256-284).
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An interleaved document (one row of the input table). */
case class Doc(doc_id: String, spans: Seq[Span])

/** A document with generator-side ground truth (tests/bench only). */
case class TruthDoc(doc_id: String, entity_id: Long, spans: Seq[Span])

/** Ground-truth labeled pair (doc_id_a < doc_id_b). Positives are
  * intra-entity pairs; negatives are cross-entity pairs that share at
  * least one blocking key (F1 is measured "at shared blocking key" per
  * the north rule).
  */
case class LabeledPair(doc_id_a: String, doc_id_b: String, is_match: Boolean)

/** Per-candidate-pair score breakdown — the batch analog of the
  * reference's MatchDecisionRecord (decision/MatchDecisionRecord.java:17-62):
  * one row per comparison, including NO_MATCH, persisted before any action.
  */
case class PairScore(
    doc_id_a: String,
    doc_id_b: String,
    lev_score: Double,
    jw_score: Double,
    jaccard_score: Double,
    score: Double,
    decision: String)

/** An accepted match edge (score >= auto-merge threshold) — the batch
  * analog of a MERGED_INTO edge (graph/CypherExecutor.java:235-254).
  */
case class MatchEdge(src: String, dst: String, score: Double)

/** Final cluster assignment: the batch closure of the reference's
  * transitive MERGED_INTO chains (graph/CypherExecutor.java:329-338).
  * cluster_id = min(doc_id) of the connected component (deterministic
  * KEEP_TARGET-style canonical pick, merge/MergeStrategy.java).
  */
case class ClusterAssignment(doc_id: String, cluster_id: String)
