package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-probe for the scaling gate's two non-scaling suspects,
  * isolated from the pipeline on synthetic data of the same shape:
  *
  *  - DISTINCT: hash-dedup of ~9.8M long-pair rows down to ~7.5M, plus
  *    the columnar cache build (the pipeline's candidate distinct was
  *    measured FLAT 1t -> 4t: 22.7 s vs 22.5 s);
  *  - PROBE JOIN: the two broadcast dim probes over a 160k x ~450B name
  *    relation, pruned (skeleton) and with the strings forced (the
  *    skeleton was measured ANTI-scaling: 5.6 s at 1t, 15.0 s at 4t).
  *
  * Usage: DedupProbe <cores>
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-dedup-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-stage wall + summed task metrics, to locate serial time
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
        stageLines.add(
          f"    stage ${i.stageId}%3d tasks=${i.numTasks}%3d wall=$wall%6.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%6.2fs run=${m.executorRunTime / 1e3}%6.2fs " +
          f"gc=${m.jvmGCTime / 1e3}%4.1fs shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.1fMB " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%6.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB [${i.name.takeWhile(_ != '\n')}]")
      }
    })
    def time(label: String)(f: => Unit): Unit = {
      stageLines.clear()
      val t0 = System.nanoTime()
      f
      println(f"[dedup-probe] cores=$cores $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(400) // let the listener bus drain
      stageLines.forEach(l => println(l))
    }

    val nRaw = 9800000L
    val nDistinct = 7500000L
    val nDocs = 160000L
    val raw = spark.range(0, nRaw, 1, cores)
      .select(pmod(col("id"), lit(nDistinct)).as("k"))
      .select(pmod(xxhash64(col("k")), lit(nDocs)).as("a"),
        pmod(xxhash64(col("k") + 1), lit(nDocs)).as("b"))
      .localCheckpoint(true)

    // JIT warm on a slice
    raw.where(col("a") % 10 === 0).distinct().count()

    (1 to 3).foreach(i => time(s"distinct.count#$i") { raw.distinct().count() })
    val cached = raw.distinct().persist()
    time("distinct+cache") { cached.count() }

    // dim with a ~450B payload, frozen
    val dim = spark.range(0, nDocs, 1, cores)
      .select(col("id").as("did"),
        concat_ws(" ", (0 until 64).map(i =>
          md5(concat(col("id"), lit(i))).substr(1, 6)): _*).as("name"))
      .localCheckpoint(true)
    dim.count()

    val a = dim.select(col("did").as("a"), col("name").as("name_a"))
    val b = dim.select(col("did").as("b"), col("name").as("name_b"))
    def joined = cached.sortWithinPartitions("a", "b")
      .join(a, Seq("a")).join(b, Seq("b"))
    // warm
    joined.where(col("a") % 10 === 0).agg(count(lit(1))).collect()

    time("probe.skeleton(pruned)") {
      joined.select("a", "b").agg(count(lit(1))).collect()
    }
    time("probe.strings(forced)") {
      joined.agg(sum(length(col("name_a")) + length(col("name_b")))).collect()
    }
    time("probe.unsorted.skeleton") {
      cached.join(a, Seq("a")).join(b, Seq("b"))
        .select("a", "b").agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
