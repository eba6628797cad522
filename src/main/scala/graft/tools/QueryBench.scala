package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one SparkEntry query N times in a warm session
  * (args: queryName [reps] [sfDir] [cpus]) — separates a real per-query
  * regression from the sweep's single-draw host noise.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
        sys.env.getOrElse("GRAFT_BLOOM", "true"))
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sf).count()
      println(f"[qbench] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
