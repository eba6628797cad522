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
    val parts = if (args.length > 3) args(3).toInt else cores
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.rdd.compress", sys.env.getOrElse("GRAFT_RDD_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_STAGE_METRICS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val tm = si.taskMetrics
            val wall = (for (e <- si.completionTime; s <- si.submissionTime)
              yield (e - s) / 1000.0).getOrElse(-1.0)
            System.err.println(
              f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%6.1f s " +
              f"run=${tm.executorRunTime / 1000.0}%7.1f cpu=${tm.executorCpuTime / 1e9}%7.1f " +
              f"gc=${tm.jvmGCTime / 1000.0}%5.1f " +
              f"shufW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%6.0fMB " +
              f"shufR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%6.0fMB " +
              f"spillM=${tm.memoryBytesSpilled / 1e6}%6.0fMB " +
              f"spillD=${tm.diskBytesSpilled / 1e6}%6.0fMB " +
              si.name.takeWhile(_ != '\n').take(60))
          }
        })

    // mirror the Bench leg's input path: read the pre-generated corpus
    // when GRAFT_SCALE_CORPUS is set, else generate in-process
    val docs = (sys.env.get("GRAFT_SCALE_CORPUS") match {
      case Some(d) => spark.read.parquet(d)
        .repartition(spark.sparkContext.defaultParallelism)
      case None => DocGen.corpusDF(spark, entities, 4,
        partitions = spark.sparkContext.defaultParallelism,
        fillerTokens = filler)
    }).select("doc_id", "spans")
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val result = ResolvePipeline.run(spark, docs,
      PipelineConfig(numShufflePartitions = Some(parts)))
    val pairs = result.pairScores.count()
    // NARROW checksum, same as the Bench leg (assignments, not the
    // span-reattached clusters — profiling the wide join here showed a
    // 48 MB exchange the measured leg never runs)
    val nClusters = result.assignments.select("cluster_id").distinct().count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[scaling-profile] cores=$cores entities=$entities filler=$filler " +
      f"total=$dt%.2f s pairs=$pairs clusters=$nClusters " +
      f"pairs_per_sec=${pairs / dt}%.0f")
    spark.stop()
  }
}
