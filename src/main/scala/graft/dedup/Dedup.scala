package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.blocking.BlockingKeys

/** Deduplication operators for training-data pipelines, each built on the
  * same blocking/scoring machinery as the entity-resolution spine:
  *
  *  - exact: hash-groupBy (one shuffle, map-side partial agg)
  *  - MinHash+LSH: shingle -> minhash -> band keys -> bucket self-join ->
  *    verify with true shingle Jaccard over 60-bit shingle hashes
  *  - SimHash: 60-bit fingerprints (4 disjoint 15-bit bands) + hamming
  *  - n-gram Jaccard: exact character-shingle overlap on candidate pairs
  *  - embedding-cosine near-dup: see [[graft.ann.Ann]]
  *
  * All keep the "keeper" deterministic: min(doc_id) per duplicate group.
  */
object Dedup {

  /** Exact dedup by content hash. Returns (doc_id, content_hash, keeper,
    * is_dup). One shuffle on the hash; at 100 TB this is the cheapest
    * possible dedup (hash computed in the scan stage, partial-aggregated).
    * NULL text is unknown content, not identical content: such rows are
    * their own keeper and never is_dup (the window would otherwise group
    * every null hash together and mark all but one null-text doc a dup).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("content_hash"))
    val keeper = Window.partitionBy(col("content_hash"))
    hashed
      .withColumn("keeper",
        when(col("content_hash").isNull, col("doc_id"))
          .otherwise(min(col("doc_id")).over(keeper)))
      .withColumn("is_dup", col("doc_id") =!= col("keeper"))
      .select("doc_id", "content_hash", "keeper", "is_dup")
  }

  /** Shared near-dup verify: stage each doc's 60-bit shingle-hash set
    * ONCE (eager materialization — the set is consumed by both join
    * sides, and without the barrier the whole per-character shingling
    * subtree re-evaluates per side), join it onto the candidate pairs,
    * keep pairs with hash-set Jaccard >= threshold.
    */
  private def verifyShingleJaccard(pairs: DataFrame, base: DataFrame,
                                   threshold: Double): DataFrame = {
    val sh = base.withColumn("__s", BlockingKeys.shingleHashes60(col("text")))
      .select("doc_id", "__s")
      .localCheckpoint(true)
    val a = sh.select(col("doc_id").as("doc_id_a"), col("__s").as("s_a"))
    val b = sh.select(col("doc_id").as("doc_id_b"), col("__s").as("s_b"))
    val inter = size(array_intersect(col("s_a"), col("s_b"))).cast("double")
    pairs.join(a, Seq("doc_id_a")).join(b, Seq("doc_id_b"))
      .withColumn("jaccard",
        inter / ((size(col("s_a")) + size(col("s_b"))).cast("double") - inter))
      .where(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }

  /** MinHash+LSH near-dup candidates: docs sharing any LSH band key,
    * verified with shingle Jaccard >= threshold over 60-bit shingle
    * hashes ([[BlockingKeys.shingleHashes60]] — long sets intersect ~10x
    * faster than string sets and the verify join ships 8-byte elements
    * instead of 3-char UTF8 strings; collision odds ~1e-13/pair, and the
    * oracle hashes identically). Returns (doc_id_a, doc_id_b, jaccard).
    * The band join is the scale path: candidates per doc are
    * O(collisions), not O(n). No text columns ride the join: equal texts
    * have equal hash sets and score exactly 1.0 arithmetically.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, maxBlockSize: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val keys = BlockingKeys.minhashKeyTable(base, "doc_id", col("text"))
    val pairs = graft.pairs.CandidateGenerator.candidatePairs(keys, maxBlockSize)
    verifyShingleJaccard(pairs, base, threshold)
  }

  /** SimHash near-dups: 60-bit fingerprint per doc (two independent
    * 30-bit hash-family halves), candidates from the 4 disjoint 15-bit
    * bands, verify hamming distance <= maxHamming. By pigeonhole the
    * 4-band split GUARANTEES recall for hamming <= 3 (any such pair
    * agrees on a whole band — property-tested in DedupSpec); maxHamming
    * beyond 3 is best-effort, as is anything a block cap drops.
    *
    * The band joins route through [[graft.pairs.CandidateGenerator]] so a
    * hot band bucket (near-identical boilerplate — the normal case in
    * web-scale dedup) is size-capped/salted instead of going quadratic in
    * one task. Dropped oversized buckets are a recall trade the cap makes
    * explicit (raise maxBlockSize / saltedMaxBlockSize to keep them).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, maxBlockSize: Int = 10000,
                      saltedMaxBlockSize: Int = -1): DataFrame = {
    // materialize the fingerprints once (native one-pass kernel): they
    // are consumed by the key table and both sides of the verify join.
    // TOKENLESS text is excluded BEFORE keying: every zero-token doc
    // fingerprints to 0, so without the filter they would all share
    // every band key and report each other as hamming-0 "near-dups" of
    // unknown content. The guard must match the KERNEL's token notion —
    // "contains a char outside Java \s" — because a whitespace-only doc
    // passes a length()>0 check yet still fingerprints to 0 (the exact
    // collapse the filter exists to prevent). The class is written out
    // explicitly so the DuckDB mirror (RE2 \s lacks \x0B) is identical
    // by construction.
    val base = df
      .where(col(textCol).isNotNull &&
        col(textCol).rlike("[^ \\t\\n\\x0B\\f\\r]"))
      .select(col(idCol).as("doc_id"),
        BlockingKeys.simhash60(col(textCol)).as("simhash"))
      .localCheckpoint(true)
    val keys = base.select(
      explode(BlockingKeys.simhashBandKeys(col("simhash"))).as("block_key"),
      col("doc_id"), col("simhash"))
    if (saltedMaxBlockSize <= maxBlockSize) {
      // Fused path: the fingerprint rides the key table, so the hamming
      // filter runs INSIDE the band join's generated code and only the
      // survivors reach the distinct. The generic path (distinct over the
      // full pair multiset, then two joins to re-attach fingerprints)
      // pays two extra shuffles plus a distinct over every within-bucket
      // pair; output is identical (filter-then-distinct ==
      // distinct-then-filter). Cap semantics unchanged: per-band-key row
      // count <= maxBlockSize. The dominant cost at scale is the
      // within-bucket pair stream itself, which the 4x15-bit banding
      // keeps selective (hot buckets = genuinely identical fingerprints).
      val ok = keys.groupBy("block_key").agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBlockSize).select("block_key")
      val l = keys.join(ok, Seq("block_key"))
        .select(col("block_key"), col("doc_id").as("doc_id_a"), col("simhash").as("sh_a"))
      val r = keys.join(ok, Seq("block_key"))
        .select(col("block_key"), col("doc_id").as("doc_id_b"), col("simhash").as("sh_b"))
      l.join(r, Seq("block_key"))
        .where(col("doc_id_a") < col("doc_id_b"))
        .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
        .where(col("hamming") <= maxHamming)
        .select("doc_id_a", "doc_id_b", "hamming")
        .distinct()
    } else {
      // Salted path for hot buckets beyond the cap: route through the
      // generic capped/salted generator, then re-attach fingerprints.
      val pairs = graft.pairs.CandidateGenerator
        .candidatePairs(keys.select("block_key", "doc_id"), maxBlockSize, saltedMaxBlockSize)
      val a = base.select(col("doc_id").as("doc_id_a"), col("simhash").as("sh_a"))
      val b = base.select(col("doc_id").as("doc_id_b"), col("simhash").as("sh_b"))
      pairs.join(a, Seq("doc_id_a")).join(b, Seq("doc_id_b"))
        .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
        .where(col("hamming") <= maxHamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    }
  }

  /** Exact n-gram Jaccard near-dups: candidates come from EXACT shingle
    * keys (every pair sharing at least one character shingle), verified
    * with true shingle Jaccard — full recall for any threshold > 0,
    * unlike [[minhashNearDups]] whose LSH bands can miss qualifying
    * pairs. The block-size cap bounds the quadratic shingle blocks
    * (stop-shingle dropping — "the", "ing" — is what makes this runnable
    * at all beyond toy scale; dropped keys are the explicit trade).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, maxBlockSize: Int = 10000): DataFrame = {
    require(threshold > 0.0,
      "ngramJaccardPairs is exact only for threshold > 0 (pairs sharing no shingle score 0)")
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // block AND verify on the 60-bit shingle hashes: every pair sharing a
    // shingle shares its hash key (full recall preserved), and both the
    // key shuffle and the verify intersect move 8-byte longs
    val keys = base
      .select(col("doc_id"), explode(BlockingKeys.shingleHashes60(col("text"))).as("block_key"))
      .select("block_key", "doc_id")
    val pairs = graft.pairs.CandidateGenerator.candidatePairs(keys, maxBlockSize)
    verifyShingleJaccard(pairs, base, threshold)
  }
}
