package graft.pairs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence of the blocking-key table — the co-located-join
  * layout the north star mandates ("materialized as salted, repartitioned
  * Iceberg tables"): write once bucketed + sorted by `block_key`, then
  * every candidate self-join (and any number of re-runs over the same
  * keys) reads both sides pre-partitioned and pre-sorted — NO exchange,
  * NO sort, just a zipped merge per bucket.
  *
  * At 10^12 docs this is the difference between re-shuffling a
  * multi-terabyte key table per pipeline run and shuffling it exactly
  * once at ingest. The bucket count is the knob that must scale with the
  * table (buckets ~ table_bytes / target_partition_bytes); bucket
  * pruning + AQE skew handling still apply on top.
  *
  * (StageStore remains the resume/lineage layer; bucketing is the join
  * layout layer. The two compose: a bucketed stage table is both.)
  */
object BucketedKeys {

  /** Persist (block_key, doc_id) bucketed and sorted by block_key. */
  def write(keys: DataFrame, table: String, buckets: Int): Unit =
    keys.write
      .mode("overwrite")
      .bucketBy(buckets, "block_key")
      .sortBy("block_key", "doc_id")
      .format("parquet") // managed table under spark.sql.warehouse.dir
      .saveAsTable(table)

  /** Read the bucketed key table (bucket metadata attaches from the
    * catalog, so downstream equi-joins on block_key skip the exchange).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Candidate pairs from a bucketed key table: same semantics as
    * [[CandidateGenerator.candidatePairs]], but the self-join runs
    * exchange-free on the bucket layout.
    */
  def candidatePairs(spark: SparkSession, table: String,
                     maxBlockSize: Int = 1000,
                     saltedMaxBlockSize: Int = -1,
                     saltBuckets: Int = 16): DataFrame =
    CandidateGenerator.candidatePairs(read(spark, table), maxBlockSize,
      saltedMaxBlockSize, saltBuckets)
}
