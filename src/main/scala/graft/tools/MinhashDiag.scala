package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.blocking.BlockingKeys

/** Dev tool: stage-by-stage timing of the minhash near-dup path (q18). */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def lap[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mdiag] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 500)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    // warm pass then measured pass
    (1 to 2).foreach { round =>
      println(s"[mdiag] ---- round $round")
      val keys = BlockingKeys.minhashKeyTable(base, "doc_id", col("text"))
        .localCheckpoint(true)
      lap("keys")(keys.count())
      val pairs = graft.pairs.CandidateGenerator.candidatePairs(keys, 10000)
        .localCheckpoint(true)
      lap("pairs")(pairs.count())
      // mirror of Dedup.minhashNearDups' shipped verify join (60-bit
      // hashed shingle sets, no text columns through the join)
      val sh = base.withColumn("__s", BlockingKeys.shingleHashes60(col("text")))
        .localCheckpoint(true)
      lap("shingles")(sh.count())
      val a = sh.select(col("doc_id").as("doc_id_a"), col("__s").as("s_a"))
      val b = sh.select(col("doc_id").as("doc_id_b"), col("__s").as("s_b"))
      val inter = size(array_intersect(col("s_a"), col("s_b"))).cast("double")
      val out = pairs.join(a, Seq("doc_id_a")).join(b, Seq("doc_id_b"))
        .withColumn("jaccard",
          inter / ((size(col("s_a")) + size(col("s_b"))).cast("double") - inter))
        .where(col("jaccard") >= 0.5)
        .select("doc_id_a", "doc_id_b", "jaccard")
      lap("verify-join")(out.count())
      lap("whole-op")(graft.dedup.Dedup.minhashNearDups(
        spark.read.parquet(s"$sfDir/documents.parquet").where(col("doc_id") < 500),
        "doc_id", "text", threshold = 0.5).count())
    }
    spark.stop()
  }
}
