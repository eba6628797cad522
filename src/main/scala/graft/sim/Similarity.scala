package graft.sim

/** Plain-Scala similarity kernels: exact re-expressions of the reference's
  * scalar semantics (the reference's similarity package), used by the deterministic
  * generator, golden tests, and the codegen'd Catalyst expression for
  * Jaro-Winkler. The distributed scoring path combines these via Column
  * expressions in [[graft.functions.Er]].
  */

/** S1: Levenshtein similarity = 1 - dist/max(len); null/empty -> 0,
  * equal -> 1 (similarity/LevenshteinSimilarity.java:10-72). The
  * distributed path uses Spark's built-in `levenshtein` (same
  * Wagner-Fischer distance); this port exists for driver-side generation
  * and parity tests.
  */
object Levenshtein {
  def distance(s1: String, s2: String): Int = {
    val (a, b) = if (s1.length > s2.length) (s2, s1) else (s1, s2)
    val m = a.length
    val n = b.length
    var prev = Array.tabulate(m + 1)(identity)
    var curr = new Array[Int](m + 1)
    var j = 1
    while (j <= n) {
      curr(0) = j
      var i = 1
      while (i <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(i) = math.min(math.min(curr(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        i += 1
      }
      val t = prev; prev = curr; curr = t
      j += 1
    }
    prev(m)
  }

  def similarity(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    if (s1 == s2) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    1.0 - distance(s1, s2).toDouble / math.max(s1.length, s2.length)
  }
}

/** S2+S3: Jaro similarity with match window max(0, max(m,n)/2 - 1) and
  * half-transposition count, plus the Winkler common-prefix boost
  * jw = jaro + prefixLen(<=4) * 0.1 * (1 - jaro); equal -> 1, empty -> 0
  * (similarity/JaroWinklerSimilarity.java:9-110).
  */
object JaroWinkler {
  val DefaultScalingFactor = 0.1
  val MaxPrefixLength = 4

  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    val matchWindow = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val start = math.max(0, i - matchWindow)
      val end = math.min(i + matchWindow + 1, l2)
      var j = start
      var done = false
      while (j < end && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val t = transpositions / 2.0
    ((m / l1) + (m / l2) + ((m - t) / m)) / 3.0
  }

  def similarity(s1: String, s2: String, scalingFactor: Double = DefaultScalingFactor): Double = {
    require(scalingFactor >= 0 && scalingFactor <= 0.25, "Scaling factor must be between 0 and 0.25")
    if (s1 == null || s2 == null) return 0.0
    if (s1 == s2) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val j = jaro(s1, s2)
    var prefix = 0
    val maxPrefix = math.min(MaxPrefixLength, math.min(s1.length, s2.length))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * scalingFactor * (1.0 - j)
  }

  /** Codegen entry point: called from generated Java in the
    * [[JaroWinklerExpr]] whole-stage-codegen path.
    */
  def similarityUtf8(
      a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    similarity(a.toString, b.toString)
}

/** S4: token-set Jaccard on lowercase \s+ tokens; both-empty -> 1,
  * one-empty -> 0, equal strings -> 1 (similarity/JaccardSimilarity.java:24-77).
  */
object Jaccard {
  private val Whitespace = "\\s+".r

  def tokenize(s: String): Set[String] =
    Whitespace.split(s.toLowerCase).iterator.map(_.trim).filter(_.nonEmpty).toSet

  def similarity(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    if (s1 == s2) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val t1 = tokenize(s1)
    val t2 = tokenize(s2)
    if (t1.isEmpty && t2.isEmpty) return 1.0
    if (t1.isEmpty || t2.isEmpty) return 0.0
    val inter = t1.count(t2.contains)
    val union = t1.size + t2.size - inter
    inter.toDouble / union
  }
}

/** S6: weight configuration — non-negative, sum to 1 +- 0.001; default
  * (0.33, 0.34, 0.33) — the CODE default; PRD line 166 says 0.4/0.35/0.25
  * but code wins (similarity/SimilarityWeights.java:6-47).
  */
final case class SimilarityWeights(
    levenshteinWeight: Double,
    jaroWinklerWeight: Double,
    jaccardWeight: Double) {
  require(
    levenshteinWeight >= 0 && jaroWinklerWeight >= 0 && jaccardWeight >= 0,
    "Weights must be non-negative")
  private val sum = levenshteinWeight + jaroWinklerWeight + jaccardWeight
  require(math.abs(sum - 1.0) <= 0.001, s"Weights must sum to 1.0, got $sum")
}

object SimilarityWeights {
  val default: SimilarityWeights = SimilarityWeights(0.33, 0.34, 0.33)
  val jaroWinklerFocused: SimilarityWeights = SimilarityWeights(0.2, 0.5, 0.3)
  val tokenFocused: SimilarityWeights = SimilarityWeights(0.2, 0.3, 0.5)
  val editDistanceFocused: SimilarityWeights = SimilarityWeights(0.5, 0.3, 0.2)
  /** JW-free variant used by oracle-checked queries (DuckDB's builtin
    * jaro_winkler diverges from the reference algorithm, so oracle
    * queries score with lev+jaccard only; JW parity is pinned by golden
    * unit tests instead).
    */
  val oracleSafe: SimilarityWeights = SimilarityWeights(0.5, 0.0, 0.5)
}

/** S5: composite score w1*lev + w2*jw + w3*jac with the equal-string
  * short-circuit to 1.0 BEFORE weighting and null -> 0
  * (similarity/CompositeSimilarityScorer.java:29-50).
  */
object CompositeScorer {
  final case class Breakdown(lev: Double, jw: Double, jaccard: Double, composite: Double)

  def score(s1: String, s2: String, w: SimilarityWeights = SimilarityWeights.default): Double = {
    if (s1 == null || s2 == null) return 0.0
    if (s1 == s2) return 1.0
    w.levenshteinWeight * Levenshtein.similarity(s1, s2) +
      w.jaroWinklerWeight * JaroWinkler.similarity(s1, s2) +
      w.jaccardWeight * Jaccard.similarity(s1, s2)
  }

  def breakdown(s1: String, s2: String, w: SimilarityWeights = SimilarityWeights.default): Breakdown = {
    val lev = Levenshtein.similarity(s1, s2)
    val jw = JaroWinkler.similarity(s1, s2)
    val jac = Jaccard.similarity(s1, s2)
    Breakdown(lev, jw, jac,
      w.levenshteinWeight * lev + w.jaroWinklerWeight * jw + w.jaccardWeight * jac)
  }
}
