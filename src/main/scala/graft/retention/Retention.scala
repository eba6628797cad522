package graft.retention

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M12: retention cleanup — the reference's batched soft/hard delete of
  * MERGED entities, expired audit entries and completed reviews past a
  * cutoff (retention/RetentionService.java:47-80). In batch Spark the
  * "delete" is an anti-join/filter rewrite of the checkpoint table —
  * no row-at-a-time batching needed (partitions bound memory).
  */
object Retention {

  /** Drop rows whose `tsCol` is strictly before the cutoff AND whose
    * `statusCol` marks them deletable (e.g. MERGED). Returns
    * (retained, purged) so purge metrics stay observable.
    */
  def purgeExpired(df: DataFrame, tsCol: String, cutoff: java.sql.Timestamp,
                   statusCol: Option[String] = None,
                   deletableStatus: String = "MERGED"): (DataFrame, DataFrame) = {
    val expired = statusCol match {
      case Some(s) => col(tsCol) < lit(cutoff) && col(s) === deletableStatus
      case None => col(tsCol) < lit(cutoff)
    }
    (df.where(!expired || expired.isNull), df.where(expired))
  }

  /** Anti-join purge: drop rows whose id appears in `tombstones`
    * (the compensating-delete analog, graph/CypherExecutor.java:402-441).
    */
  def purgeByIds(df: DataFrame, idCol: String, tombstones: DataFrame,
                 tombstoneIdCol: String): DataFrame =
    // no distinct() on the tombstone set: an anti join never duplicates
    // left rows whatever the right side holds — the dedup was an extra
    // aggregate+exchange of the tombstone table for no semantic effect
    df.join(tombstones.select(col(tombstoneIdCol).as(idCol)),
      Seq(idCol), "left_anti")
}
