package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: blocking-key degeneracy diagnostic for the generated corpus. */
object KeyDiag {
  def main(args: Array[String]): Unit = {
    val entities = if (args.nonEmpty) args(0).toInt else 20000
    val filler = sys.env.getOrElse("SPARK_GRAFT_FILLER", "28").toInt
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Er.register(spark)

    val docs = graft.gen.DocGen.corpusDF(spark, entities, 4, partitions = 16, fillerTokens = filler)
    val named = docs
      .withColumn("name", graft.functions.Er.docName(col("spans")))
      .withColumn("normalized", graft.norm.Normalizer.normalizeColumn(col("name")))
      .select("doc_id", "normalized").localCheckpoint(true)
    val defK = graft.blocking.BlockingKeys.explodeKeys(named, "doc_id",
      graft.blocking.BlockingKeys.defaultKeys(col("normalized")))
    val snK = named.select(graft.blocking.BlockingKeys.sortedNeighborhoodKey(col("normalized")).as("block_key"), col("doc_id"))
      .where(col("block_key").isNotNull)
    val lshK = graft.blocking.BlockingKeys.minhashKeyTable(named, "doc_id", col("normalized"))
    val keys = defK.union(snK).union(lshK)
    val sized = keys.groupBy("block_key").agg(count(lit(1)).as("n"))
      .where(col("n") <= 1000)  // survivors of the cap
      .withColumn("typ", substring_index(col("block_key"), ":", 1))
    sized.groupBy("typ").agg(
      count(lit(1)).as("keys"),
      sum(col("n")).as("rows"),
      max("n").as("max_n"),
      sum(col("n") * (col("n") - 1) / 2).as("pairs_upper"))
      .orderBy(desc("pairs_upper"))
      .show(20, truncate = false)
    spark.stop()
  }
}
