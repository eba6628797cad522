package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Er
import graft.blocking.BlockingKeys
import graft.pairs.CandidateGenerator
import graft.gen.DocGen

/** Dev attribution probe for the scaling gate: times the SCORING stage's
  * two halves separately at a given core count —
  *   (A) join + kernels with an aggregate sink (count, no rows stored)
  *   (B) the same plan materialized via localCheckpoint (the pipeline's
  *       stage barrier: adds row serialization + lz4 + block store)
  * so the 4-thread CPU inflation seen in the full leg can be attributed
  * to the compute (kernels/probes thrashing shared cache) or to the
  * checkpoint write path.
  *
  * Usage: ScoreScaling <cores> [entities] [partMult]
  * Env: GRAFT_SCALE_CORPUS (parquet dir) else generates in-process.
  */
object ScoreScaling {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 4
    val entities = if (args.length > 1) args(1).toInt else 40000
    val mult = if (args.length > 2) args(2).toInt else 4
    val parts = cores * mult
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-score-scaling-$cores")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Er.register(spark)
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def cpuNow(): Double = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum / 1000.0

    val docs = (sys.env.get("GRAFT_SCALE_CORPUS") match {
      case Some(d) => spark.read.parquet(d).repartition(parts)
      case None => DocGen.corpusDF(spark, entities, 4,
        partitions = parts, fillerTokens = 64)
    }).select("doc_id", "spans").localCheckpoint(true)

    val names = docs
      .withColumn("name", Er.docName(col("spans")))
      .where(Er.rejectReason(col("name")).isNull)
      .withColumn("normalized",
        graft.norm.Normalizer.normalizeColumn(col("name")))
      .where(col("normalized") =!= "")
      .select("doc_id", "normalized")
      .localCheckpoint(true)

    val keys = BlockingKeys
      .explodeKeys(names, "doc_id", BlockingKeys.defaultKeys(col("normalized")))
      .localCheckpoint(true)
    val pairs = CandidateGenerator.candidatePairs(keys).localCheckpoint(true)
    val nPairs = pairs.count()

    val a = names.select(col("doc_id").as("doc_id_a"), col("normalized").as("name_a"))
    val b = names.select(col("doc_id").as("doc_id_b"), col("normalized").as("name_b"))
    def scored = pairs.sortWithinPartitions("doc_id_a", "doc_id_b")
      .join(a, Seq("doc_id_a")).join(b, Seq("doc_id_b"))
      .withColumn("lev_score", Er.levSim(col("name_a"), col("name_b")))
      .withColumn("jw_score", Er.jaroWinkler(col("name_a"), col("name_b")))
      .withColumn("jaccard_score", Er.tokenJaccard(col("name_a"), col("name_b")))
      .withColumn("score",
        lit(0.33) * col("lev_score") + lit(0.34) * col("jw_score")
          + lit(0.33) * col("jaccard_score"))

    // warm both paths (JIT) on a 1/10 sample, then drop its blocks
    scored.where(pmod(xxhash64(col("doc_id_a")), lit(10)) === 0)
      .agg(sum("score")).collect()
    System.gc()

    def time(label: String)(f: => Unit): Unit = {
      val g0 = cpuNow(); val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[score-scaling] cores=$cores pairs=$nPairs $label: $dt%.2f s " +
        f"(${nPairs / dt}%.0f pairs/s, gc ${cpuNow() - g0}%.1f s)")
    }
    time("A_count_no_store") {
      scored.agg(sum("score"), count(lit(1))).collect()
    }
    time("B_localCheckpoint") {
      val cp = scored.localCheckpoint(true)
      cp.agg(sum("score")).collect()
    }
    time("C_columnar_persist") {
      val p = scored.persist()
      p.agg(sum("score"), count(lit(1))).collect() // materialize
      p.agg(sum("score")).collect()                // read back
      p.unpersist(true)
    }
    spark.stop()
  }
}
