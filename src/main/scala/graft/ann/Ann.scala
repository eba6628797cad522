package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
  * variant as the scale path (bucket join instead of full cross join).
  * Dot products use higher-order array functions (zip_with + aggregate) in
  * double precision — codegen'd, no UDFs.
  */
object Ann {

  /** Cosine similarity between two array<float|double> columns, computed
    * in double precision with a deterministic left-fold accumulation
    * order. Zero-norm vectors -> 0.0.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(dot(ad, ad))
    val nb = sqrt(dot(bd, bd))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(ad, bd) / (na * nb))
  }

  /** Brute-force cosine top-k: every query joined against every item.
    * Exact, O(|q|*|n|) — the correctness baseline and the small-dim path
    * (broadcast the query side when it fits).
    */
  def bruteForceTopK(items: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val it = items.select(col(idCol).as("item_id"), col(embCol).as("item_emb"))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("query_emb"))
    val scored = q.join(broadcast(it), col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine(col("query_emb"), col("item_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** Sign-LSH bucket key: the sign pattern of the first `bits` dimensions
    * (axis-aligned hyperplanes — deterministic, no PRNG, reproducible in
    * SQL). Vectors in the same orthant-prefix share the bucket.
    */
  def signBucket(emb: Column, bits: Int = 8): Column = {
    val signs = transform(slice(emb.cast("array<double>"), 1, bits),
      x => when(x >= 0, lit("1")).otherwise(lit("0")))
    array_join(signs, "")
  }

  /** LSH-bucketed ANN: join within sign buckets only. Misses cross-bucket
    * neighbors (that is the approximation); at scale this replaces the
    * broadcast cross join with a bucket-partitioned equi-join. An IVF
    * refinement (k-means coarse quantizer) would slot in the same shape:
    * assign -> join within cell.
    */
  def lshTopK(items: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val it = items.select(col(idCol).as("item_id"), col(embCol).as("item_emb"))
      .withColumn("bucket", signBucket(col("item_emb"), bits))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("query_emb"))
      .withColumn("bucket", signBucket(col("query_emb"), bits))
    val scored = q.join(it, Seq("bucket"))
      .where(col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine(col("query_emb"), col("item_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (threshold variant):
    * bucket-join + cosine >= threshold; pairs canonicalized a < b.
    */
  def cosineNearDups(items: DataFrame, threshold: Double, bits: Int = 4,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val it = items.select(col(idCol).as("vid"), col(embCol).as("emb"))
      .withColumn("bucket", signBucket(col("emb"), bits))
    val l = it.select(col("vid").as("id_a"), col("emb").as("emb_a"), col("bucket"))
    val r = it.select(col("vid").as("id_b"), col("emb").as("emb_b"), col("bucket"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }
}
