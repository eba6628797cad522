package graft.synonyms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M2/M3/M4/L9: the synonym table lifecycle as batch set operations.
  *
  * The reference attaches Synonym nodes to entities one at a time
  * (core/model/Synonym.java:11-29: value, normalizedValue, source,
  * confidence, createdAt, lastConfirmedAt, supportCount;
  * graph/CypherExecutor.java:79-131: createSynonym / reinforceSynonym /
  * updateSynonymConfidence). The batch closure of that per-node lifecycle
  * is three whole-table operators over a `synonyms` DataFrame with schema
  *
  *   (normalized string, value string, entity_id, source string,
  *    confidence double, support_count long, created_seq long,
  *    last_confirmed_seq long)
  *
  * `*_seq` columns are event-time sequence numbers (the batch analog of
  * the reference's `datetime()` stamps — a distributed job cannot call
  * now() per row and stay deterministic; the ingest layer supplies the
  * time).
  *
  * Scale notes: every operator is a single groupBy or a single equi-join
  * on `normalized` (the natural partitioning key for synonym tables —
  * lookups, reinforcement and confidence updates are all keyed by it);
  * nothing is collected to the driver. Reinforcement uses map-side
  * partial aggregation of the mention batch before the join, so a hot
  * alias ("acme inc") arrives as ONE row, not a million.
  */
object Synonyms {

  /** M2 (batch): build a synonym table from an entity-resolved mention
    * table `(entity_id, value, normalized, seq)` — one synonym row per
    * distinct (entity_id, normalized), value = the lexicographically
    * first raw form, supportCount = mention count (the reference creates
    * with supportCount=0 then reinforces per confirmation; batch ingest
    * collapses create + k reinforcements into one row with count k).
    */
  def fromMentions(mentions: DataFrame, source: String,
                   initialConfidence: Double = 0.8): DataFrame =
    mentions
      .groupBy(col("entity_id"), col("normalized"))
      .agg(
        min(col("value")).as("value"),
        count(lit(1)).as("support_count"),
        min(col("seq")).as("created_seq"),
        max(col("seq")).as("last_confirmed_seq"))
      .select(col("normalized"), col("value"), col("entity_id"),
        lit(source).as("source"), lit(initialConfidence).as("confidence"),
        col("support_count"), col("created_seq"), col("last_confirmed_seq"))

  /** M3 (batch): reinforce synonyms with a new mention batch
    * `(entity_id, normalized, seq)`: supportCount += batch count,
    * lastConfirmedAt = max(seq) — the whole-table closure of
    * `SET s.supportCount = s.supportCount + 1, s.lastConfirmedAt =
    * datetime()` (graph/CypherExecutor.java:110-118). Unmatched synonyms
    * pass through unchanged; unmatched mentions are dropped (the
    * reference reinforces only existing synonyms).
    */
  def reinforce(synonyms: DataFrame, batch: DataFrame): DataFrame = {
    val delta = batch.groupBy(col("entity_id"), col("normalized"))
      .agg(count(lit(1)).as("__n"), max(col("seq")).as("__seq"))
    synonyms.join(delta, Seq("entity_id", "normalized"), "left")
      .withColumn("support_count",
        col("support_count") + coalesce(col("__n"), lit(0L)))
      // guarded on __seq, not a MinValue sentinel through greatest: an
      // UNMATCHED row with NULL last_confirmed_seq must stay NULL
      // ("unchanged"), and greatest() skips nulls, which would have
      // leaked Long.MinValue into the data
      .withColumn("last_confirmed_seq",
        when(col("__seq").isNull, col("last_confirmed_seq"))
          .otherwise(greatest(col("last_confirmed_seq"), col("__seq"))))
      .drop("__n", "__seq")
      .select("normalized", "value", "entity_id", "source", "confidence",
        "support_count", "created_seq", "last_confirmed_seq")
  }

  /** M4 (batch): join-update of confidence — the closure of
    * `SET s.confidence = $confidence` (graph/CypherExecutor.java:123-131)
    * over an updates table `(entity_id, normalized, new_confidence)`.
    * Synonyms without an update row keep their confidence.
    */
  def updateConfidence(synonyms: DataFrame, updates: DataFrame): DataFrame =
    synonyms.join(
        // pre-aggregate: duplicate update rows for one (entity, name) key
        // would otherwise fan the left join out and break the synonym
        // table's one-row-per-key invariant. The batch carries no order,
        // so ties resolve to max(new_confidence) — deterministic and
        // idempotent; callers with an ordering should pre-reduce
        // themselves.
        updates.groupBy(col("entity_id"), col("normalized"))
          .agg(max(col("new_confidence")).as("__nc")),
        Seq("entity_id", "normalized"), "left")
      .withColumn("confidence", coalesce(col("__nc"), col("confidence")))
      .drop("__nc")
      .select("normalized", "value", "entity_id", "source", "confidence",
        "support_count", "created_seq", "last_confirmed_seq")

  /** L9: all synonyms for an entity set — a semi-join-shaped lookup,
    * broadcast when the entity set is small
    * (graph/CypherExecutor.java:140-152 findSynonymsByEntity).
    */
  def forEntities(synonyms: DataFrame, entityIds: DataFrame): DataFrame =
    // no distinct() on the id set: a semi join never duplicates left rows
    // whatever the right side holds, and the dedup was a full extra
    // aggregate+exchange of the id table for no semantic effect
    synonyms.join(entityIds.select("entity_id"), Seq("entity_id"), "left_semi")
}
