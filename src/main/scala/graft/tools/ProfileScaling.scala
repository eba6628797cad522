package graft.tools

import org.apache.spark.sql.SparkSession

import graft.gen.DocGen
import graft.pipeline.{PipelineConfig, ResolvePipeline}

/** Dev profiler for the north-rule scaling run: executes the Bench
  * scaling workload ONCE at a given core count with GRAFT_PROFILE laps,
  * so the serial fraction can be attributed per stage.
  *
  * Usage: runMain graft.tools.ProfileScaling <cores> <entities> [filler]
  */
object ProfileScaling {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 4
    val entities = if (args.length > 1) args(1).toInt else 20000
    val filler = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = DocGen.corpusDF(spark, entities, 4,
      partitions = spark.sparkContext.defaultParallelism,
      fillerTokens = filler)
      .select("doc_id", "spans")
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val result = ResolvePipeline.run(spark, docs,
      PipelineConfig(numShufflePartitions = Some(cores)))
    val pairs = result.pairScores.count()
    val nClusters = result.clusters.select("cluster_id").distinct().count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[scaling-profile] cores=$cores entities=$entities filler=$filler " +
      f"total=$dt%.2f s pairs=$pairs clusters=$nClusters " +
      f"pairs_per_sec=${pairs / dt}%.0f")
    spark.stop()
  }
}
