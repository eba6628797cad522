package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.Bridge

import graft.sim.{JaroWinklerSimExpr, LevSimExpr, SimilarityWeights, TokenJaccardExpr}

/** Column-level entity-resolution functions. Everything here is built
  * from `org.apache.spark.sql.functions._` (codegen'd) plus one native
  * Catalyst expression ([[graft.sim.JaroWinklerExpr]]); no Scala UDFs in
  * the hot path.
  */
object Er {

  /** Register the native similarity expressions for SQL use (the Column
    * API below does not require registration).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("jaro_winkler",
      exprs => JaroWinklerSimExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lev_sim",
      exprs => LevSimExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("token_jaccard",
      exprs => TokenJaccardExpr(exprs(0), exprs(1)), "scala_udf")
  }

  /** S2/S3: Jaro-Winkler similarity — native codegen'd byte-level kernel. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSimExpr(Bridge.expression(a), Bridge.expression(b)))

  /** S1: Levenshtein similarity = 1 - dist/max(len); null -> 0, equal -> 1,
    * one-empty -> 0 (similarity/LevenshteinSimilarity.java:10-31). Native
    * byte-level kernel (same IEEE arithmetic as the built-in formulation).
    */
  def levSim(a: Column, b: Column): Column =
    Bridge.column(LevSimExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Lowercased whitespace tokens with empties dropped (the reference's
    * tokenize, similarity/JaccardSimilarity.java:66-77). Split on \s+
    * leaves no inner whitespace; a leading separator yields one empty
    * token which the filter drops.
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** S4: token-set Jaccard |A∩B| / |A∪B|; equal strings -> 1, both-empty
    * token sets -> 1, one-empty -> 0 (similarity/JaccardSimilarity.java:24-64).
    * Native single-pass byte-level kernel (no regex/array churn).
    */
  def tokenJaccard(a: Column, b: Column): Column =
    Bridge.column(TokenJaccardExpr(Bridge.expression(a), Bridge.expression(b)))

  /** S5: composite score with the equal-string short-circuit to 1.0 BEFORE
    * weighting and null -> 0 (similarity/CompositeSimilarityScorer.java:29-50).
    * Zero-weight components are elided from the plan.
    */
  def compositeScore(a: Column, b: Column, w: SimilarityWeights = SimilarityWeights.default): Column = {
    val terms = Seq(
      w.levenshteinWeight -> (() => levSim(a, b)),
      w.jaroWinklerWeight -> (() => jaroWinkler(a, b)),
      w.jaccardWeight -> (() => tokenJaccard(a, b)),
    ).collect { case (wt, mk) if wt != 0.0 => lit(wt) * mk() }
    val weighted = terms.reduce(_ + _)
    when(a.isNull || b.isNull, lit(0.0)).when(a === b, lit(1.0)).otherwise(weighted)
  }

  /** D4: confidence decay
    * effective = clamp01(base * exp(-lambda*days) + min(log1p(support)*0.05, cap)),
    * lambda = 0.001, cap = 0.15; support <= 0 -> no boost
    * (decision/ConfidenceDecayEngine.java:78-121).
    */
  def effectiveConfidence(
      base: Column, days: Column, support: Column,
      lambda: Double = 0.001, cap: Double = 0.15): Column = {
    val decayed = base * exp(lit(-lambda) * greatest(days, lit(0.0)))
    val boost = when(support <= 0, lit(0.0))
      .otherwise(least(log1p(support) * lit(0.05), lit(cap)))
    least(lit(1.0), greatest(lit(0.0), decayed + boost))
  }

  /** D6: negative reinforcement conf' = max(0, conf - |penalty|)
    * (decision/ConfidenceDecayEngine.java:167-172).
    */
  def negativeReinforce(conf: Column, penalty: Column): Column =
    greatest(lit(0.0), conf - abs(penalty))

  /** Derive the document "name" from its span sequence: text-kind spans
    * concatenated in offset order, space-joined (FIXTURES.md §1; the unit
    * the reference resolves, api/EntityResolutionService.java:237-244).
    * Pure array expressions — spans themselves are never modified.
    */
  def docName(spans: Column): Column = {
    val ordered = array_sort(spans, (l, r) =>
      when(l.getField("offset") < r.getField("offset"), -1)
        .when(l.getField("offset") > r.getField("offset"), 1)
        .otherwise(0))
    val texts = transform(
      filter(ordered, s => s.getField("kind") === "text"),
      s => s.getField("text"))
    array_join(texts, " ")
  }

  /** S7 (north-star "embedding-cosine comparator"): a deterministic
    * feature-hashed token embedding — no external models in a zero-egress
    * build. Each token's rolling hash votes +-1 into bucket
    * (hash mod dim); the sign comes from the next hash bit. Cosine between
    * these vectors is a token-distribution comparator that, unlike
    * Jaccard, weights repeated tokens.
    */
  def featureHashVector(tokensCol: Column, dimBits: Int = 4): Column = {
    val dim = 1 << dimBits // power of two: bucket/sign via integer bit ops
    val th = graft.blocking.BlockingKeys.tokenHashes(tokensCol)
    val buckets = (0 until dim).map { i =>
      aggregate(th, lit(0.0), (acc, h) =>
        acc + when((h % dim.toLong) === i.toLong,
          when((shiftright(h, dimBits) % 2L) === 0L, lit(1.0)).otherwise(lit(-1.0)))
          .otherwise(lit(0.0)))
    }
    array(buckets: _*)
  }

  /** N8: input validation — reject null/blank, >1000 chars, control chars
    * 0x00-0x1F (except \t\n\r) or 0x7F (graph/InputSanitizer.java:27-39,78-89).
    * Returns a reject-reason column (null = valid) so bad rows become a
    * `rejects` side output instead of exceptions.
    */
  def rejectReason(name: Column, maxLen: Int = 1000): Column =
    when(name.isNull || trim(name) === "", lit("blank"))
      .when(length(name) > maxLen, lit("too_long"))
      .when(name.rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"), lit("control_chars"))
      .otherwise(lit(null).cast("string"))
}
