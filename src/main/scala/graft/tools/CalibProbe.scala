package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: raw Spark throughput calibration on this box — range scan,
  * long distinct, and a synthetic block self-join shaped like the
  * candidate generator — so operator costs can be judged against what the
  * machine actually sustains (guide §1.3 napkin math).
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[calib] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { i =>
      time(s"range(100M).sum rep$i")(spark.range(100000000L).agg(sum("id")).collect())
      val m = spark.range(1600000L).select((col("id") % 550000).as("pk")).localCheckpoint(true)
      time(s"1.6M.distinct rep$i")(m.distinct().count())
      // synthetic block join: 38k keys over 5k blocks incl. hot blocks
      val k = spark.range(38000L).select(
        (col("id") % 40).as("block_key"), col("id").as("doc_id")).localCheckpoint(true)
      val l = k.select(col("block_key"), col("doc_id").as("a"))
      val r = k.select(col("block_key"), col("doc_id").as("b"))
      time(s"blockjoin(~18M pairs).count rep$i")(
        l.join(r, Seq("block_key")).where(col("a") < col("b")).count())
      // string-keyed variant with realistic Zipfish block sizes:
      // ~600 hot keys of ~950 rows under a 1000 cap + many small blocks
      val ks = spark.range(38000L).select(
        concat(lit("bg:"), (col("id") % 40).cast("string")).as("block_key"),
        col("id").as("doc_id")).localCheckpoint(true)
      val ls = ks.select(col("block_key"), col("doc_id").as("a"))
      val rs = ks.select(col("block_key"), col("doc_id").as("b"))
      time(s"blockjoin.str(~18M).count rep$i")(
        ls.join(rs, Seq("block_key")).where(col("a") < col("b")).count())
      time(s"blockjoin.str.distinct rep$i")(
        ls.join(rs, Seq("block_key")).where(col("a") < col("b"))
          .select(shiftleft(col("a"), 31).bitwiseOR(col("b")).as("pk"))
          .distinct().count())
      // bisect the REAL candidate-generator chain on synthetic data:
      // under-cap semi-join (groupBy + join) + double BHJ + packed distinct
      val sized = ks.groupBy("block_key").agg(count(lit(1)).as("block_n"))
      val okk = sized.where(col("block_n") <= 1000000).select("block_key")
      val small = ks.join(okk, Seq("block_key"))
      val l2 = small.select(col("block_key"), col("doc_id").as("a"))
      val r2 = small.select(col("block_key"), col("doc_id").as("b"))
      val joined2 = l2.join(r2, Seq("block_key")).where(col("a") < col("b"))
      time(s"fullchain.count rep$i")(joined2.count())
      time(s"fullchain.distinct rep$i")(
        joined2.select(shiftleft(col("a"), 31).bitwiseOR(col("b")).as("pk"))
          .distinct().count())
    }
    spark.stop()
  }
}
