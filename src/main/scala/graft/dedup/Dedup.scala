package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.blocking.BlockingKeys

/** Deduplication operators for training-data pipelines, each built on the
  * same blocking/scoring machinery as the entity-resolution spine:
  *
  *  - exact: hash-groupBy (one shuffle, map-side partial agg)
  *  - MinHash+LSH: shingle -> minhash -> band keys -> bucket self-join ->
  *    verify with true shingle Jaccard
  *  - SimHash: 30-bit fingerprints + hamming distance
  *  - n-gram Jaccard: exact character-shingle overlap on candidate pairs
  *  - embedding-cosine near-dup: see [[graft.ann.Ann]]
  *
  * All keep the "keeper" deterministic: min(doc_id) per duplicate group.
  */
object Dedup {

  /** Exact dedup by content hash. Returns (doc_id, content_hash, keeper,
    * is_dup). One shuffle on the hash; at 100 TB this is the cheapest
    * possible dedup (hash computed in the scan stage, partial-aggregated).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("content_hash"))
    val keeper = Window.partitionBy(col("content_hash"))
    hashed
      .withColumn("keeper", min(col("doc_id")).over(keeper))
      .withColumn("is_dup", col("doc_id") =!= col("keeper"))
      .select("doc_id", "content_hash", "keeper", "is_dup")
  }

  /** True character-shingle Jaccard between two string columns (the
    * verify step after LSH candidate generation).
    */
  def shingleJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = BlockingKeys.shingles(a, n)
    val sb = BlockingKeys.shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = (size(sa) + size(sb)).cast("double") - inter
    when(a.isNull || b.isNull, lit(0.0))
      .when(a === b, lit(1.0))
      .when(size(sa) === 0 || size(sb) === 0, lit(0.0))
      .otherwise(inter / union)
  }

  /** MinHash+LSH near-dup candidates: docs sharing any LSH band key,
    * verified with true shingle Jaccard >= threshold. Returns
    * (doc_id_a, doc_id_b, jaccard). The band join is the scale path:
    * candidates per doc are O(collisions), not O(n).
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, maxBlockSize: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val keys = BlockingKeys.minhashKeyTable(base, "doc_id", col("text"))
    val pairs = graft.pairs.CandidateGenerator.candidatePairs(keys, maxBlockSize)
    // shingle sets staged ONCE per doc (their own projection), so the
    // verify join does a single array_intersect per pair — not a
    // re-shingling of both texts per candidate
    val sh = base.withColumn("__s", BlockingKeys.shingles(col("text")))
    val a = sh.select(col("doc_id").as("doc_id_a"), col("text").as("text_a"), col("__s").as("s_a"))
    val b = sh.select(col("doc_id").as("doc_id_b"), col("text").as("text_b"), col("__s").as("s_b"))
    val inter = size(array_intersect(col("s_a"), col("s_b"))).cast("double")
    pairs.join(a, Seq("doc_id_a")).join(b, Seq("doc_id_b"))
      .withColumn("jaccard",
        when(col("text_a") === col("text_b"), lit(1.0))
          .otherwise(inter / ((size(col("s_a")) + size(col("s_b"))).cast("double") - inter)))
      .where(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }

  /** SimHash near-dups: fingerprint each doc, self-join on a band of the
    * fingerprint (high bits) and verify hamming distance <= maxHamming.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    // materialize the fingerprints once: they are consumed by BOTH sides
    // of BOTH band joins (4x otherwise — 30 bit-vote aggregates per eval)
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("__th", BlockingKeys.tokenHashes(toks))
      .withColumn("simhash", BlockingKeys.simhashFromHashes(col("__th")))
      // band on the top 15 bits: near-dups collide in at least one half
      .withColumn("band_hi", shiftright(col("simhash"), 15))
      .withColumn("band_lo", col("simhash") % (1L << 15))
      .select("doc_id", "simhash", "band_hi", "band_lo")
      .localCheckpoint(true)
    val l = base.select(col("doc_id").as("doc_id_a"), col("simhash").as("sh_a"),
      col("band_hi").as("bh"), col("band_lo").as("bl"))
    val r = base.select(col("doc_id").as("doc_id_b"), col("simhash").as("sh_b"),
      col("band_hi").as("bh"), col("band_lo").as("bl"))
    val byHi = l.join(r, Seq("bh")).where(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "sh_a", "sh_b")
    val byLo = l.join(r, Seq("bl")).where(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "sh_a", "sh_b")
    byHi.union(byLo).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_id_a", "doc_id_b", "hamming")
  }

  /** Exact n-gram Jaccard over blocking-key candidate pairs (the
    * non-approximate cousin of [[minhashNearDups]], for smaller corpora
    * or verification).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, maxBlockSize: Int = 10000): DataFrame =
    minhashNearDups(df, idCol, textCol, threshold, maxBlockSize)
}
