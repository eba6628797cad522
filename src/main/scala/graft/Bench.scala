package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.DocGen
import graft.pipeline.{PipelineConfig, ResolvePipeline}

/** Benchmark entry: times every SparkEntry query at the given SF, then
  * runs the north-rule scaling evidence — the identical generated-corpus
  * clustering job at two parallelism levels (local[8] vs local[32], the
  * sandbox stand-in for N vs 4N executors) reporting docs/sec,
  * candidate-pairs-scored/sec and scaling efficiency = (T_8 / T_32) / 4.
  *
  * Prints ONE JSON line:
  * {"metric":"total","value":...,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{...}}
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def freshSession(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    session(cpus)
  }

  /** The scaling workload: cluster a generated interleaved-span corpus
    * end-to-end. Returns (seconds, docs, pairsScored).
    */
  private def scalingRun(spark: SparkSession, entities: Int, docsPerEntity: Int): (Double, Long, Long) = {
    val docs = DocGen.corpusDF(spark, entities, docsPerEntity,
      partitions = spark.sparkContext.defaultParallelism)
    val t0 = System.nanoTime()
    val result = ResolvePipeline.run(spark, docs.select("doc_id", "spans"),
      PipelineConfig(numShufflePartitions =
        Some(spark.sparkContext.defaultParallelism * 2)))
    val pairs = result.pairScores.count()
    val nClusters = result.clusters.select("cluster_id").distinct().count()
    val dt = (System.nanoTime() - t0) / 1e9
    require(nClusters > 0)
    (dt, entities.toLong * docsPerEntity, pairs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // ---- per-query timings at the requested SF
    var spark = freshSession(cpus)
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      (name, dt, n)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // ---- scaling evidence: same job, same input, local[8] vs local[32]
    val scaleEntities = sys.env.getOrElse("SPARK_GRAFT_SCALE_ENTITIES", "12500").toInt
    val docsPer = 4
    spark = freshSession(8)
    val (t8, docs8, pairs8) = scalingRun(spark, scaleEntities, docsPer)
    spark = freshSession(32)
    val (t32, _, pairs32) = scalingRun(spark, scaleEntities, docsPer)
    val efficiency = (t8 / t32) / 4.0
    val scaling =
      f"""{"docs":$docs8,"pairs_scored":$pairs32,
         |"t_local8_sec":$t8%.2f,"t_local32_sec":$t32%.2f,
         |"docs_per_sec_8":${docs8 / t8}%.0f,"docs_per_sec_32":${docs8 / t32}%.0f,
         |"pairs_scored_per_sec_8":${pairs8 / t8}%.0f,"pairs_scored_per_sec_32":${pairs32 / t32}%.0f,
         |"speedup_8_to_32":${t8 / t32}%.2f,"scaling_efficiency":$efficiency%.3f}"""
        .stripMargin.replace("\n", "")
    spark.stop()

    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
