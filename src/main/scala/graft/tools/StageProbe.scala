package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query with a stage-metrics listener —
  * prints every completed stage's task count, summed executor run time,
  * wall duration and shuffle bytes, so a slow query can be attributed to
  * a concrete stage (skew vs scheduling vs compute) without the UI
  * (guide §7.1; spark.ui is disabled in this sandbox).
  * Args: queryName [reps] [sfDir] [cpus]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = for {
          s <- si.submissionTime; e <- si.completionTime
        } yield (e - s) / 1000.0
        val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct.take(6).mkString(">")
        System.err.println(
          f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d wall=${wall.getOrElse(-1.0)}%7.2fs cpu=${m.executorRunTime / 1000.0}%7.2fs shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB  $scopes")
      }
    })
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sf).count()
      System.err.println(f"[probe] ======== $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
