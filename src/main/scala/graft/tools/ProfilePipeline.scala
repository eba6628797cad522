package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocking.BlockingKeys
import graft.cluster.ConnectedComponents
import graft.decide.Decisions
import graft.functions.Er
import graft.norm.Normalizer
import graft.pairs.CandidateGenerator
import graft.sim.SimilarityWeights

/** Dev profiler: times each pipeline stage independently on the
  * documents-derived span docs (the q29 workload).
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Er.register(spark)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // mirror SparkEntry.spanDocs EXACTLY (12-token truncation included):
    // profiling the full-length text is a ~40x heavier scoring job than
    // the contract workload and once mis-diagnosed a "regression" that
    // did not exist (182 s here vs 4.8 s for the real q29 at sf0.1).
    // Pass "fulltext" as a second arg to profile long-name scoring.
    val fullText = args.length > 1 && args(1) == "fulltext"
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
    val docsRaw =
      if (fullText) docsAll
      else docsAll.withColumn("text",
        array_join(slice(split(col("text"), "\\s+"), 1, 12), " "))
    val len = length(col("text"))
    val a = ceil(len / lit(3.0)).cast("int")
    val b = ceil(len * 2 / lit(3.0)).cast("int")
    val docs = docsRaw.select(col("doc_id"),
      array(
        struct(lit("text").as("kind"), col("text").substr(lit(1), a).as("text"), lit("").as("media_ref"), lit(0).as("offset")),
        struct(lit("image").as("kind"), lit("").as("text"), concat(lit("media://img/"), col("doc_id")).as("media_ref"), lit(1).as("offset")),
        struct(lit("text").as("kind"), col("text").substr(a + 1, b - a).as("text"), lit("").as("media_ref"), lit(2).as("offset")),
        struct(lit("text").as("kind"), col("text").substr(b + 1, len - b).as("text"), lit("").as("media_ref"), lit(3).as("offset"))
      ).as("spans")).cache()
    println(s"[profile] docs: ${docs.count()}")

    val named = time("normalize") {
      val d = docs.withColumn("name", Er.docName(col("spans")))
        .withColumn("normalized", Normalizer.normalizeColumn(col("name")))
        .select("doc_id", "normalized").cache()
      d.count(); d
    }
    val defK = time("keys:default") {
      val k = BlockingKeys.explodeKeys(named, "doc_id", BlockingKeys.defaultKeys(col("normalized"))).cache()
      k.count(); k
    }
    val snK = time("keys:sn") {
      val k = named.select(BlockingKeys.sortedNeighborhoodKey(col("normalized")).as("block_key"), col("doc_id"))
        .where(col("block_key").isNotNull).cache()
      k.count(); k
    }
    val lshK = time("keys:lsh") {
      val k = BlockingKeys.minhashKeyTable(named, "doc_id", col("normalized")).cache()
      k.count(); k
    }
    val keys = defK.union(snK).union(lshK)
    val stats = time("stats") { CandidateGenerator.stats(keys, 1000) }
    println(s"[profile] $stats")
    val pairs = time("pairs") {
      val p = CandidateGenerator.candidatePairs(keys, 1000).cache()
      println(s"[profile] pairs: ${p.count()}"); p
    }
    val aN = named.select(col("doc_id").as("doc_id_a"), col("normalized").as("name_a"))
    val bN = named.select(col("doc_id").as("doc_id_b"), col("normalized").as("name_b"))
    val scored = time("score") {
      val s = pairs.join(aN, Seq("doc_id_a")).join(bN, Seq("doc_id_b"))
        .withColumn("score", Er.compositeScore(col("name_a"), col("name_b"), SimilarityWeights.default))
        .withColumn("decision", Decisions.decide(col("score")))
        .select("doc_id_a", "doc_id_b", "score", "decision").cache()
      s.count(); s
    }
    println("[profile] decisions: " + scored.groupBy("decision").count().collect().mkString(", "))
    val edges = scored.where(col("decision") === "AUTO_MERGE")
      .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
    val cc = time("cc") {
      val c = ConnectedComponents.run(spark, edges, docs.select("doc_id"))
      c.count(); c
    }
    println(s"[profile] clusters: ${cc.select("cluster_id").distinct().count()}")

    // bisect the real pipeline: uncached chain, one action per stage
    val namedU = docs.withColumn("name", Er.docName(col("spans")))
      .withColumn("normalized", Normalizer.normalizeColumn(col("name")))
      .select("doc_id", "normalized")
    val keysU = BlockingKeys.explodeKeys(namedU, "doc_id", BlockingKeys.defaultKeys(col("normalized")))
      .union(namedU.select(BlockingKeys.sortedNeighborhoodKey(col("normalized")).as("block_key"), col("doc_id")).where(col("block_key").isNotNull))
      .union(BlockingKeys.minhashKeyTable(namedU, "doc_id", col("normalized")))
    time("uncached keys.count")(println("[profile] keys: " + keysU.count()))
    val pairsU = CandidateGenerator.candidatePairs(keysU, 2000)
    time("uncached pairs.count")(println("[profile] pairsU: " + pairsU.count()))
    val aU = namedU.select(col("doc_id").as("doc_id_a"), col("normalized").as("name_a"))
    val bU = namedU.select(col("doc_id").as("doc_id_b"), col("normalized").as("name_b"))
    val scoredU = pairsU.join(aU, Seq("doc_id_a")).join(bU, Seq("doc_id_b"))
      .withColumn("lev_score", Er.levSim(col("name_a"), col("name_b")))
      .withColumn("jw_score", Er.jaroWinkler(col("name_a"), col("name_b")))
      .withColumn("jaccard_score", Er.tokenJaccard(col("name_a"), col("name_b")))
      .withColumn("score", Er.compositeScore(col("name_a"), col("name_b"), SimilarityWeights.default))
      .withColumn("decision", Decisions.decide(col("score")))
    time("uncached scored.count")(println("[profile] scoredU: " + scoredU.count()))

    // the real thing, end to end (the q29 workload)
    time("ResolvePipeline.run + clusters.count") {
      val r = graft.pipeline.ResolvePipeline.run(spark, docs,
        graft.pipeline.PipelineConfig(maxBlockSize = 2000))
      println(s"[profile] pipeline clusters rows: ${r.clusters.count()}")
    }
    spark.stop()
  }
}
