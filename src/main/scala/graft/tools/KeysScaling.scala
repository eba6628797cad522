package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.blocking.BlockingKeys
import graft.functions.Er

/** Dev attribution probe for the scaling gate's KEYS stage (the worst
  * relative scaler in the round-5 leg profile: 39.9 s at 1 thread ->
  * 18.3 s at 4, efficiency 0.55 vs 0.79 for the scoring stage). Mirrors
  * the production path — rep dim frozen by localCheckpoint, then the
  * three key tables unioned and columnar-persisted — and times each
  * component under its own count() sink plus the full persist path, so
  * the non-scaling seconds can be attributed to a specific kernel, the
  * union, or the cache build.
  *
  * Usage: KeysScaling <cores> [entities]
  * Env: GRAFT_SCALE_CORPUS (parquet dir) else generates in-process.
  */
object KeysScaling {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 4
    val entities = if (args.length > 1) args(1).toInt else 40000
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-keys-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Er.register(spark)

    val par = spark.sparkContext.defaultParallelism
    val docs = (sys.env.get("GRAFT_SCALE_CORPUS") match {
      case Some(d) => spark.read.parquet(d).repartition(par)
      case None => graft.gen.DocGen.corpusDF(spark, entities, 4,
        partitions = par, fillerTokens = 64)
    }).select("doc_id", "spans")

    // production shape: normalize -> pregroup rep dim frozen in doc_id order
    val allNames = docs
      .withColumn("name", Er.docName(col("spans")))
      .where(Er.rejectReason(col("name")).isNull)
      .withColumn("normalized", graft.norm.Normalizer.normalizeColumn(col("name")))
      .select("doc_id", "normalized")
    val byGroup = org.apache.spark.sql.expressions.Window.partitionBy("normalized")
    val withRep = allNames.withColumn("rep", min("doc_id").over(byGroup)).persist()
    withRep.count()
    val names = withRep.where(col("doc_id") === col("rep")).drop("rep")
      .orderBy("doc_id").localCheckpoint(true)
    val keySource = names.withColumn("__did", monotonically_increasing_id())
      .select(col("__did").as("doc_id"), col("normalized"))

    def defK = BlockingKeys.explodeKeys(keySource, "doc_id",
      BlockingKeys.defaultKeys(col("normalized")))
    def snK = keySource
      .select(BlockingKeys.sortedNeighborhoodKey(col("normalized")).as("block_key"),
        col("doc_id"))
      .where(col("block_key").isNotNull)
    def lshK = BlockingKeys.minhashKeyTable(keySource, "doc_id", col("normalized"))
    def union = defK.union(snK).union(lshK)

    // JIT warm both paths on a hash-sampled tenth, then settle the heap
    union.where(pmod(xxhash64(col("doc_id")), lit(10)) === 0)
      .agg(count(lit(1))).collect()
    val warm = union.where(pmod(xxhash64(col("doc_id")), lit(10)) === 0).persist()
    warm.count(); warm.unpersist(true)
    System.gc()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[keys-scaling] cores=$cores $label: $dt%.2f s (rows=$n)")
    }
    time("A_default_keys")(defK.agg(count(lit(1))).collect()(0).getLong(0))
    time("B_sorted_neighborhood")(snK.agg(count(lit(1))).collect()(0).getLong(0))
    time("C_minhash_bands")(lshK.agg(count(lit(1))).collect()(0).getLong(0))
    time("D_union_count")(union.agg(count(lit(1))).collect()(0).getLong(0))
    time("E_union_persist") {
      val p = union.persist()
      val n = p.count()
      p.unpersist(true)
      n
    }
    spark.stop()
  }
}
