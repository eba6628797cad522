package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The globally-unique-doc_id ingest contract, shared by the streaming
  * jobs: a duplicated id would corrupt maintained state (two shingle
  * rows fanning out the dedup verify join; two same-recency assignment
  * rows making the resolve merge-on-read nondeterministic), so it is
  * ENFORCED per batch rather than assumed — both across batches (an id
  * already in the corpus) and WITHIN the batch (the same id delivered
  * twice in one trigger, which a corpus check alone can never see:
  * under the default availableNow trigger the whole backlog is one
  * batch).
  */
private[streaming] object IngestContract {

  /** Detect duplicated ids: one batch-sized groupBy for intra-batch
    * repeats, plus one semi-join of the corpus id column against the
    * batch ids — broadcast when the batch is small (the corpus side is
    * then scanned once, map-side, no shuffle; same order of work as the
    * jobs' increment joins), shuffle join otherwise.
    *
    * The broadcast is SIZE-GATED, not mandatory: under the default
    * availableNow trigger the whole backlog arrives as ONE batch, so an
    * initial bulk load's "batch" is corpus-sized — an unconditional
    * broadcast hint would ship a corpus-sized hash relation into every
    * task (driver/executor OOM, and Spark hard-caps broadcasts at 8 GB).
    * The id count is measured first (one batch-sized count job); above
    * `broadcastMaxIds` no hint is given and the optimizer plans the
    * sort-merge join a bulk load actually wants.
    *
    * `batchIds` must be ONE ROW PER INGESTED DOC (the raw batch ids,
    * not an exploded key table). Returns the ids to EXCLUDE from the
    * batch: Some(dupIds) in `drop` mode — first-write-wins for corpus
    * re-deliveries; ids repeated WITHIN the batch are excluded entirely
    * (no copy is "first" inside one unordered batch), count logged —
    * None when clean or mode == `allow`; throws in `fail` mode (the
    * default policy). An unknown mode throws rather than silently
    * dropping data.
    */
  def duplicateIdGuard(batchIds: DataFrame, corpusIds: Option[DataFrame],
                       mode: String, batchId: Long,
                       job: String,
                       broadcastMaxIds: Long = 4000000L): Option[DataFrame] = {
    require(Set("fail", "drop", "allow")(mode),
      s"on-duplicate mode must be fail, drop or allow, got $mode")
    if (mode == "allow") return None
    val intra = batchIds.groupBy("doc_id").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).select("doc_id")
    val dupIds = corpusIds match {
      case None => intra
      case Some(c) =>
        val distinctBatch = batchIds.select("doc_id").distinct()
        val probe =
          if (distinctBatch.count() <= broadcastMaxIds) broadcast(distinctBatch)
          else distinctBatch
        c.select("doc_id")
          .join(probe, Seq("doc_id"), "left_semi")
          .unionByName(intra).distinct()
    }
    val n = dupIds.count()
    if (n == 0) None
    else if (mode == "fail")
      throw new IllegalStateException(
        s"batch $batchId re-delivers $n doc_id(s) already in the corpus state " +
          "or repeated within the batch; ids must be globally unique " +
          "(--on-duplicate drop keeps the first ingested version, " +
          "--on-duplicate allow skips this check)")
    else { // drop
      System.err.println(
        s"[$job] batch $batchId: dropping $n duplicated doc_id(s) " +
          "(first-write-wins across batches; within-batch repeats excluded)")
      Some(dupIds)
    }
  }
}
