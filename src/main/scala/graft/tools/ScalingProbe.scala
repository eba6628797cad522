package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run just the scaling workload at one parallelism level with
  * phase timing (args: cpus entities).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 8
    val entities = if (args.length > 1) args(1).toInt else 12500
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.5)
          System.err.println(f"[stage] ${si.stageId}%4d ${si.numTasks}%5d tasks ${dur}%7.2f s  ${si.name.take(60)}")
      }
    })
    val filler = sys.env.getOrElse("SPARK_GRAFT_FILLER", "28").toInt
    val t0 = System.nanoTime()
    val docs = graft.gen.DocGen.corpusDF(spark, entities, 4, partitions = cpus,
      fillerTokens = filler)
      .select("doc_id", "spans")
      .localCheckpoint(true)
    val n = docs.count()
    System.err.println(f"[scaling] gen+materialize($n docs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val result = graft.pipeline.ResolvePipeline.run(spark, docs.select("doc_id", "spans"),
      graft.pipeline.PipelineConfig(numShufflePartitions = Some(cpus)))
    System.err.println(f"[scaling] run eager: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val t2 = System.nanoTime()
    val pairs = result.pairScores.count()
    System.err.println(f"[scaling] pairs=$pairs: ${(System.nanoTime() - t2) / 1e9}%.2f s")
    val t3 = System.nanoTime()
    val c = result.clusters.select("cluster_id").distinct().count()
    System.err.println(f"[scaling] clusters=$c: ${(System.nanoTime() - t3) / 1e9}%.2f s")
    System.err.println(f"[scaling] TOTAL cpus=$cpus: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
