package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: time selected SparkEntry queries at a given SF. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q24_embedding_neardup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qtime] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    spark.stop()
  }
}
