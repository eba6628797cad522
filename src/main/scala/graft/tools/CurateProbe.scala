package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the q72 composition (guide §1.4): isolates the
  * minhash-near-dup verify subtree of Curation with a noop sink and
  * prints the EXECUTED plan, so duplicated-subtree hypotheses can be
  * checked against what actually ran instead of stage-scope guesses.
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet").where(col("doc_id") < 500)
    val base = docs.select(col("doc_id"), col("text"))
    val sig = base.select(col("doc_id"),
      graft.text.TextAnalysis.langId(col("text")).as("lang"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("quality"))
      .localCheckpoint(true)
    val eligible = sig.where(col("lang").isin("en") &&
      coalesce(col("quality"), lit(-1.0)) >= 0.5).select("doc_id")
    val candDocs = base.join(eligible, Seq("doc_id"))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val pairs = graft.dedup.Dedup.minhashNearDups(candDocs, "doc_id", "text", 0.5, 10000)
      pairs.write.format("noop").mode("overwrite").save()
      System.err.println(f"[curateprobe] verify pairs noop rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (i == 1)
        System.err.println("[curateprobe] executed plan:\n" +
          pairs.queryExecution.executedPlan.toString.linesIterator.take(120).mkString("\n"))
    }
    spark.stop()
  }
}
