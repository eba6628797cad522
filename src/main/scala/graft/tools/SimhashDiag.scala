package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.blocking.BlockingKeys

/** Dev tool: simhash band-bucket distribution + pair-stream volume for a
  * documents table — the inputs to sizing q31's band join.
  */
object SimhashDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), BlockingKeys.simhash60(col("text")).as("simhash"))
      .localCheckpoint(true)
    println(s"[simdiag] docs=${base.count()} distinctFp=${base.select("simhash").distinct().count()}")
    val keys = base.select(
      explode(BlockingKeys.simhashBandKeys(col("simhash"))).as("block_key"),
      col("doc_id"))
    val sizes = keys.groupBy("block_key").agg(count(lit(1)).as("n"))
    sizes.agg(
      count(lit(1)).as("buckets"),
      max("n").as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("within_bucket_pairs"))
      .show(truncate = false)
    sizes.orderBy(desc("n")).show(10, truncate = false)
    // the pre-round-4 scheme for comparison: 30-bit fingerprint (low
    // half), 2 bands of 15 bits — the pair-stream volume that explains
    // the r03-recorded q31 cost
    val old30 = base.select(col("doc_id"), (col("simhash") % (1L << 30)).as("sh30"))
    val oldKeys = old30.select(concat(lit("hi:"), shiftright(col("sh30"), 15)).as("block_key"), col("doc_id"))
      .union(old30.select(concat(lit("lo:"), col("sh30") % (1L << 15)).as("block_key"), col("doc_id")))
    oldKeys.groupBy("block_key").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("old_buckets"), max("n").as("old_max_bucket"),
        sum(col("n") * (col("n") - 1) / 2).as("old_within_bucket_pairs"))
      .show(truncate = false)
    spark.stop()
  }
}
