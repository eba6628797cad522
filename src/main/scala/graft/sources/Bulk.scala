package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Er

/** I1-I3: bulk import/export — the Spark analog of the reference's
  * bulk/CsvBulkImporter.java:46-129 and bulk/JsonBulkImporter.java:56-131
  * (line-at-a-time loops become declarative reads; error rows become a
  * `rejects` side output instead of collected exceptions) and
  * bulk/CsvBulkExporter.java:54-179 (paginated streaming export becomes a
  * partitioned write).
  */
object Bulk {

  final case class ImportResult(rows: DataFrame, rejects: DataFrame)

  /** I1: CSV import with header, quoted fields, and per-row validation.
    * Expected schema: name[,type] columns. Invalid rows land in rejects
    * with a reason (mirrors the importer's error-row collection).
    */
  def importCsv(spark: SparkSession, path: String, nameCol: String = "name"): ImportResult = {
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .csv(path)
    split(raw, nameCol)
  }

  /** I2: JSONL import — one JSON object per line with a "name" field
    * (the reference regex-extracts it; spark.read.json parses properly).
    */
  def importJsonl(spark: SparkSession, path: String, nameCol: String = "name"): ImportResult = {
    val raw = spark.read.json(path)
    split(raw, nameCol)
  }

  private def split(raw: DataFrame, nameCol: String): ImportResult = {
    val flagged = raw.withColumn("__reject", Er.rejectReason(col(nameCol)))
    ImportResult(
      rows = flagged.where(col("__reject").isNull).drop("__reject"),
      rejects = flagged.where(col("__reject").isNotNull)
        .withColumn("reject_reason", col("__reject")).drop("__reject"))
  }

  /** I4: intra-batch dedup — case-insensitive (name, type) key
    * (api/BatchContext.java:84-107); free in batch mode.
    */
  def dedupBatch(df: DataFrame, nameCol: String, typeCol: Option[String] = None,
                 orderCol: Option[String] = None): DataFrame = {
    // NULL names pass through untouched: a null key is UNKNOWN content,
    // not shared content — grouping nulls (what dropDuplicates and
    // window partitioning both do) would silently discard all but one
    // null-named record as "duplicates" of nothing. Same policy as
    // Dedup.exact; the import path never feeds nulls (rejectReason
    // filters them), but this is public API.
    val nulls = df.where(col(nameCol).isNull)
    val keyed = df.where(col(nameCol).isNotNull)
      .withColumn("__k", lower(trim(col(nameCol))))
    val cols = "__k" +: typeCol.toSeq
    val deduped = orderCol match {
      case None =>
        // reference semantics: keep ONE row per key. dropDuplicates keeps
        // whichever row the hash-agg sees first — fine when any
        // representative serves, but NOT deterministic across runs/plans.
        keyed.dropDuplicates(cols).drop("__k")
      case Some(o) =>
        // deterministic keeper (the reference's in-order "first occurrence"
        // batch semantics): first row by orderCol per key — reproducible
        // run to run and oracle-mirrorable PROVIDED orderCol is unique
        // within each key group (e.g. a row id); with ties, row_number's
        // pick is plan-dependent again.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(cols.map(col): _*).orderBy(col(o))
        keyed.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn", "__k")
    }
    deduped.unionByName(nulls)
  }

  /** I3: CSV export (one directory per section, quoted/escaped like the
    * reference's csvEscape).
    */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  /** Columnar import/export (beyond the reference — the formats a
    * cluster-scale pipeline actually ingests). Parquet preserves nested
    * spans exactly; ORC likewise. Partitioning columns land as
    * directory-level partition pruning keys for downstream scans.
    */
  def importParquet(spark: SparkSession, path: String, nameCol: String = "name"): ImportResult =
    split(spark.read.parquet(path), nameCol)

  def exportParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def importOrc(spark: SparkSession, path: String, nameCol: String = "name"): ImportResult =
    split(spark.read.orc(path), nameCol)

  def exportOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
