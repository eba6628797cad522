package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The globally-unique-doc_id ingest contract, shared by the streaming
  * jobs: a re-delivered id would corrupt maintained state (two shingle
  * rows fanning out the dedup verify join; two same-recency assignment
  * rows making the resolve merge-on-read nondeterministic), so it is
  * ENFORCED per batch rather than assumed.
  */
private[streaming] object IngestContract {

  /** One semi-join of the corpus id column against the BROADCAST batch
    * ids (batch-sized by definition — the corpus side is scanned once,
    * map-side, no shuffle; same order of work as the jobs' increment
    * joins). Returns the ids to EXCLUDE from the batch: Some(dupIds)
    * in `drop` mode (first-write-wins, count logged), None when clean
    * or mode == `allow`; throws in `fail` mode (the default policy).
    */
  def duplicateIdGuard(batchIds: DataFrame, corpusIds: Option[DataFrame],
                       mode: String, batchId: Long,
                       job: String): Option[DataFrame] = {
    if (mode == "allow" || corpusIds.isEmpty) return None
    val dupIds = corpusIds.get.select("doc_id")
      .join(broadcast(batchIds.select("doc_id").distinct()), Seq("doc_id"), "left_semi")
      .distinct()
    val n = dupIds.count()
    if (n == 0) None
    else if (mode == "fail")
      throw new IllegalStateException(
        s"batch $batchId re-delivers $n doc_id(s) already in the corpus state; " +
          "ids must be globally unique (--on-duplicate drop keeps the first " +
          "ingested version, --on-duplicate allow skips this check)")
    else { // drop: first-write-wins
      System.err.println(
        s"[$job] batch $batchId: dropping $n re-delivered doc_id(s) (first-write-wins)")
      Some(dupIds)
    }
  }
}
