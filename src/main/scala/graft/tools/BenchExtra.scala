package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness for the optimization rounds (guide §1):
  * reproduces Bench's per-query sweep methodology (same session config,
  * same prewarm, same `fn(spark, sfDir).count()` action, same ListMap
  * order) WITHOUT touching the frozen Bench.scala, and adds what §1 asks
  * for — repeats with per-query median/min (host noise on this box swings
  * single draws ±40%), job labels, and `.explain("formatted")` dumps for
  * plan-diff evidence.
  *
  * Usage (sbt "runMain graft.tools.BenchExtra [reps] [filter...]"):
  *   reps     number of interleaved sweeps (default 3)
  *   filter   optional query-name substrings; only matching queries run
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     core count (default 32)
  *   GRAFT_EXPLAIN_DIR    when set, writes <dir>/<query>.txt explain
  *                        ("formatted") for each query that runs
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val filters = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tPre0 = System.nanoTime()
    graft.SparkEntry.prewarm(spark, sfDir)
    System.err.println(f"[benchextra] prewarm: ${(System.nanoTime() - tPre0) / 1e9}%.2f s")

    val selected = graft.SparkEntry.queries.toSeq.filter { case (name, _) =>
      filters.isEmpty || filters.exists(name.contains)
    }
    val explainDir = sys.env.get("GRAFT_EXPLAIN_DIR")
    explainDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { rep =>
      selected.foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = times.getOrElse(name, Nil) :+ dt
        System.err.println(f"[benchextra] $name rep$rep: $dt%.3f s (rows=$n)")
      }
    }
    spark.sparkContext.setJobDescription(null)
    explainDir.foreach { d =>
      selected.foreach { case (name, fn) =>
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2)
    }
    val report = selected.map { case (name, _) =>
      val xs = times(name)
      f""""$name":{"median":${median(xs)}%.3f,"min":${xs.min}%.3f,"samples":[${xs.map(x => f"$x%.3f").mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val totalMedian = selected.map { case (name, _) => median(times(name)) }.sum
    println(f"""{"metric":"benchextra_total_median","value":$totalMedian%.3f,"unit":"sec","reps":$reps,"sf":"$sfDir","queries":$report}""")
    spark.stop()
  }
}
