package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (verdict r05 item 3): what does ONE dominant exact-duplicate
  * name group do to the pregroup's member->rep computation?
  *
  * Compares the production shape (min over a window partitioned by the
  * group key — all rows of a group land in one task) against the
  * skew-safe two-phase shape (partial-agg groupBy + join back, AQE
  * skew-splittable) on a corpus where one name owns `hot` of the `n`
  * rows. Prints wall + max task time per shape.
  */
object PregroupSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val hotShare = if (args.length > 1) args(1).toDouble else 0.5
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hot = (n * hotShare).toLong
    // doc_id 0..hot-1 share one name; the rest are near-unique
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < hot, lit("the dominant company inc"))
        .otherwise(concat(lit("name"), (col("id") % (n / 4)).cast("string")))
        .as("normalized"))
      .localCheckpoint(true)

    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null)
          maxTask.updateAndGet(m => math.max(m, te.taskInfo.duration))
    })

    def time(name: String)(f: => Long): Unit = {
      maxTask.set(0)
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[skewprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f" (rows=$r, maxTask=${maxTask.get() / 1000.0}%.2f s)")
    }

    (1 to 2).foreach { rep =>
      time(s"window rep$rep") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("normalized"))
        docs.withColumn("rep", min("doc_id").over(w))
          .agg(count(lit(1)), sum("rep")).collect()(0).getLong(0)
      }
      time(s"twophase rep$rep") {
        val reps = docs.groupBy("normalized").agg(min("doc_id").as("rep"))
        docs.join(reps, Seq("normalized"))
          .agg(count(lit(1)), sum("rep")).collect()(0).getLong(0)
      }
    }
    spark.stop()
  }
}
