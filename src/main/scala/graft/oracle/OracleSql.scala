package graft.oracle

import graft.blocking.BlockingKeys
import graft.norm.Normalizer
import graft.text.TextAnalysis

/** DuckDB-dialect SQL fragment builders for the correctness oracle.
  *
  * Every fragment mirrors a Column expression in the library and is
  * generated from the SAME constants (normalization rule table, minhash
  * coefficients, stopword profiles), so the Spark implementation and the
  * oracle cannot drift. Jaro-Winkler is NOT DuckDB's builtin (a different
  * algorithm): [[jaroWinklerCtes]] ports the reference's match-window loop
  * as a recursive CTE. Big composite-score chains either use
  * SimilarityWeights.oracleSafe or join the JW walk into their scoring
  * CTE (q29); the walk's inputs are MATERIALIZED — DuckDB's default
  * inlining re-evaluates a CTE's upstream chain on every recursion step,
  * which made the q29 oracle 25x slower than materialized.
  */
object OracleSql {

  val P: Long = BlockingKeys.P

  /** Full normalization chain over a column expression. */
  def norm(c: String): String = Normalizer.normalizeSql(c)

  /** First-k-token name derived from the normalized text. */
  def nameK(c: String, k: Int): String =
    s"array_to_string(list_slice(string_split($c, ' '), 1, $k), ' ')"

  /** The reference's default blocking keys (pfx/tok/bg) as a DuckDB list
    * expression over an already-normalized, non-blank name expression.
    */
  def defaultKeysList(n: String): String = {
    val toks = s"string_split($n, ' ')"
    val sorted = s"list_sort($toks)"
    s"""[ 'pfx:' || substr($n, 1, 3),
       | CASE WHEN len($toks) >= 2 THEN 'tok:' || $sorted[1] || '|' || $sorted[2]
       |      ELSE 'tok:' || $toks[1] END,
       | 'bg:' || substr($n, 1, 2) ]""".stripMargin
  }

  /** Levenshtein similarity with the reference's null/equal/empty edges. */
  def levSim(a: String, b: String): String =
    s"""(CASE WHEN $a = $b THEN 1.0
       | WHEN length($a) = 0 OR length($b) = 0 THEN 0.0
       | ELSE 1.0 - CAST(levenshtein($a, $b) AS DOUBLE)
       |            / CAST(greatest(length($a), length($b)) AS DOUBLE) END)""".stripMargin

  /** Token-set Jaccard with the reference's edges (inputs already
    * lowercase single-spaced).
    */
  def tokenJaccard(a: String, b: String): String = {
    val ta = s"list_distinct(string_split($a, ' '))"
    val tb = s"list_distinct(string_split($b, ' '))"
    val inter = s"len(list_intersect($ta, $tb))"
    s"""(CASE WHEN $a = $b THEN 1.0
       | WHEN length($a) = 0 OR length($b) = 0 THEN 0.0
       | ELSE CAST($inter AS DOUBLE)
       |      / CAST(len($ta) + len($tb) - $inter AS DOUBLE) END)""".stripMargin
  }

  /** Oracle-safe composite (lev 0.5 / jac 0.5) with the equal-string
    * short-circuit.
    */
  def oracleScore(a: String, b: String): String =
    s"(CASE WHEN $a = $b THEN 1.0 ELSE 0.5*${levSim(a, b)} + 0.5*${tokenJaccard(a, b)} END)"

  /** D1 decision bands. */
  def decide(score: String, auto: Double = 0.92, syn: Double = 0.80, rev: Double = 0.60): String =
    s"""(CASE WHEN $score >= $auto THEN 'AUTO_MERGE'
       | WHEN $score >= $syn THEN 'SYNONYM_ONLY'
       | WHEN $score >= $rev THEN 'REVIEW'
       | ELSE 'NO_MATCH' END)""".stripMargin

  /** Rolling hash (base 31 mod P) of a string expression's characters. */
  def rollingHash(c: String): String =
    s"""list_reduce(list_concat([CAST(0 AS BIGINT)],
       | list_transform(string_split($c, ''), ch -> CAST(ascii(ch) AS BIGINT))),
       | (acc, x) -> (acc*31 + x) % $P)""".stripMargin

  /** Distinct 3-gram shingles; short strings -> whole string. */
  def shingles(c: String, n: Int = 3): String =
    s"""(CASE WHEN length($c) >= $n THEN
       | list_distinct(list_transform(generate_series(1, length($c) - ${n - 1}),
       |   i -> substr($c, CAST(i AS INT), $n)))
       | ELSE [$c] END)""".stripMargin

  /** 60-bit shingle hashes — mirrors BlockingKeys.shingleHashes60 (the
    * near-dup verify identity; both engines hash identically, so even a
    * collision would verify value-identically).
    */
  def shingleHashes60(c: String): String =
    s"""list_distinct(list_transform(${shingles(c)},
       | sh -> ${rollingHash("sh")} * ${1L << BlockingKeys.SimHashBits} + ${rollingHash2("sh")}))""".stripMargin

  /** B5 sorted-neighborhood key over an already-normalized name
    * expression — mirrors BlockingKeys.sortedNeighborhoodKey (NULL for
    * blank input, handled by the caller's WHERE).
    */
  def snKey(n: String, secondPrefixLen: Int = 2): String = {
    val s = s"list_sort(string_split_regex(lower(trim($n)), '\\s+'))"
    s"""(CASE WHEN len($s) >= 2
       | THEN 'sn:' || $s[1] || '|' || substr($s[2], 1, $secondPrefixLen)
       | ELSE 'sn:' || $s[1] END)""".stripMargin
  }

  /** MinHash signature element j over a shingle-hash list expression. */
  private def minhashJ(hashes: String, j: Int): String = {
    val (aj, bj) = BlockingKeys.Coef(j)
    s"coalesce(list_min(list_transform($hashes, h -> ($aj*h + $bj) % $P)), $P)"
  }

  /** LSH band keys (list of Bands strings) over a text expression —
    * mirrors BlockingKeys.minhashBandKeys, same coefficients.
    */
  def minhashBandKeysList(c: String): String = {
    val hashes = s"list_transform(${shingles(c)}, sh -> ${rollingHash("sh")})"
    val bands = (0 until BlockingKeys.Bands).map { band =>
      val parts = (0 until BlockingKeys.RowsPerBand)
        .map(r => s"CAST(${minhashJ(hashes, band * BlockingKeys.RowsPerBand + r)} AS VARCHAR)")
      s"'lsh:$band:' || ${parts.mkString(" || '_' || ")}"
    }
    s"[ ${bands.mkString(",\n  ")} ]"
  }

  /** Second rolling hash family (base 131 mod P2), the simhash high half. */
  def rollingHash2(c: String): String =
    s"""list_reduce(list_concat([CAST(0 AS BIGINT)],
       | list_transform(string_split($c, ''), ch -> CAST(ascii(ch) AS BIGINT))),
       | (acc, x) -> (acc*131 + x) % ${BlockingKeys.P2})""".stripMargin

  /** 30-bit SimHash half over a token-hash list expression. */
  private def simhashVotes(th: String): String = {
    val bits = (0 until BlockingKeys.SimHashBits).map { b =>
      s"(CASE WHEN list_sum(list_transform($th, h -> ((h >> $b) & 1)*2 - 1)) > 0 THEN ${1L << b} ELSE 0 END)"
    }
    s"(${bits.mkString(" + ")})"
  }

  /** 60-bit SimHash fingerprint over a token-list expression — mirrors
    * BlockingKeys.simhash60FromHashes (high half = rollingHash2 votes).
    */
  def simhash(tokensExpr: String): String = {
    val th1 = s"list_transform($tokensExpr, t -> ${rollingHash("t")})"
    val th2 = s"list_transform($tokensExpr, t -> ${rollingHash2("t")})"
    // CAST: the vote sum is INT32 in DuckDB and the band shift overflows it
    s"(CAST(${simhashVotes(th2)} AS BIGINT) * ${1L << BlockingKeys.SimHashBits} + ${simhashVotes(th1)})"
  }

  /** Lowercase whitespace tokens (empties dropped). */
  def lowerTokens(c: String): String =
    s"list_filter(string_split_regex(lower($c), '\\s+'), t -> length(t) > 0)"

  /** Language-ID argmax with profile-order tie-break, mirroring
    * TextAnalysis.langId.
    */
  def langId(c: String): String = {
    val toks = lowerTokens(c)
    val scores = TextAnalysis.StopwordProfiles.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      lang -> s"len(list_filter($toks, t -> list_contains([$set], t)))"
    }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (lang, s) => s"WHEN $s = $best AND $best > 0 THEN '$lang'" }
    s"(CASE ${cases.mkString(" ")} ELSE 'und' END)"
  }

  /** Dot product of two double-list expressions with deterministic
    * left-fold order (bit-identical to Spark's aggregate(zip_with)).
    */
  def dot(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       | list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))),
       | (x, y) -> x + y)""".stripMargin

  /** Cosine similarity mirroring Ann.cosine. */
  def cosine(a: String, b: String): String =
    s"""(CASE WHEN sqrt(${dot(a, a)}) = 0 OR sqrt(${dot(b, b)}) = 0 THEN 0.0
       | ELSE ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) END)""".stripMargin

  /** D4 effective confidence (decision/ConfidenceDecayEngine.java:78-121). */
  def effectiveConfidence(base: String, days: String, support: String): String =
    s"""least(1.0, greatest(0.0,
       | $base * exp(-0.001 * greatest($days, 0.0))
       | + (CASE WHEN $support <= 0 THEN 0.0
       |    ELSE least(ln(1.0 + $support) * 0.05, 0.15) END)))""".stripMargin

  /** Recursive-CTE port of the reference Jaro-Winkler
    * (similarity/JaroWinklerSimilarity.java:9-110, mirrored by
    * graft.sim.JaroWinkler): DuckDB's builtin jaro_winkler_similarity is a
    * DIFFERENT algorithm (boosts regardless of threshold, different match
    * accounting on multi-word strings), so the oracle walks the reference's
    * greedy match-window assignment itself — one recursion step per s1
    * character, per-pair state = (match flags, match count) — then counts
    * transpositions over the matched subsequences and applies the Winkler
    * prefix boost with the exact IEEE operation order of the Scala kernel
    * (validated bit-exact on 310 adversarial pairs incl. the golden
    * vectors; tools/jw_proto.py is the dev harness).
    *
    * Expects an in-scope CTE `pn(doc_id_a, doc_id_b, name_a, name_b)`
    * (unique per pair) inside a WITH RECURSIVE chain; emits CTEs ending in
    * `jwsc(doc_id_a, doc_id_b, jw_score)` covering ALL pn rows (the
    * equal-name short-circuit included).
    */
  val jaroWinklerCtes: String = {
    import graft.sim.JaroWinkler.{DefaultScalingFactor, MaxPrefixLength}
    // MATERIALIZED: the recursion joins jprep once per step; left to the
    // default inlining DuckDB re-evaluates jprep's upstream chain every
    // iteration (q29's pipeline chain: 324 s -> 13 s at sf0.01).
    s"""jprep AS MATERIALIZED (SELECT doc_id_a, doc_id_b,
       |  string_split(name_a, '') AS c1, string_split(name_b, '') AS c2,
       |  length(name_a) AS l1, length(name_b) AS l2,
       |  greatest(0, greatest(length(name_a), length(name_b)) // 2 - 1) AS mw
       |  FROM pn WHERE name_a <> name_b),
       |jwrec(doc_id_a, doc_id_b, i, matches, m1, m2) AS (
       |  SELECT doc_id_a, doc_id_b, 1, 0,
       |    list_transform(c1, x -> false), list_transform(c2, x -> false)
       |  FROM jprep
       |  UNION ALL
       |  SELECT doc_id_a, doc_id_b, i + 1,
       |    CASE WHEN jf IS NULL THEN matches ELSE matches + 1 END,
       |    CASE WHEN jf IS NULL THEN m1
       |         ELSE list_transform(generate_series(1, l1),
       |                p -> CASE WHEN p = i THEN true ELSE m1[p] END) END,
       |    CASE WHEN jf IS NULL THEN m2
       |         ELSE list_transform(generate_series(1, l2),
       |                p -> CASE WHEN p = jf THEN true ELSE m2[p] END) END
       |  FROM (
       |    SELECT r.doc_id_a, r.doc_id_b, r.i, r.matches, r.m1, r.m2, p.l1, p.l2,
       |      list_min(list_filter(
       |        generate_series(greatest(1, r.i - p.mw), least(r.i + p.mw, p.l2)),
       |        jj -> NOT r.m2[jj] AND p.c1[r.i] = p.c2[jj])) AS jf
       |    FROM jwrec r JOIN jprep p USING (doc_id_a, doc_id_b)
       |    WHERE r.i <= p.l1)
       |),
       |jfin AS (
       |  SELECT f.doc_id_a, f.doc_id_b, f.matches, f.m1, f.m2, p.c1, p.c2, p.l1, p.l2
       |  FROM jwrec f JOIN jprep p USING (doc_id_a, doc_id_b)
       |  WHERE f.i = p.l1 + 1),
       |jtr AS (
       |  SELECT doc_id_a, doc_id_b, matches, l1, l2, c1, c2,
       |    list_transform(list_filter(generate_series(1, l1), i -> m1[i]), i -> c1[i]) AS ms1,
       |    list_transform(list_filter(generate_series(1, l2), i -> m2[i]), i -> c2[i]) AS ms2
       |  FROM jfin),
       |jjaro AS (
       |  SELECT doc_id_a, doc_id_b, l1, l2, c1, c2, matches,
       |    CASE WHEN matches = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE ((CAST(matches AS DOUBLE) / l1) + (CAST(matches AS DOUBLE) / l2)
       |          + ((CAST(matches AS DOUBLE)
       |              - len(list_filter(generate_series(1, len(ms1)), i -> ms1[i] <> ms2[i]))
       |                / CAST(2.0 AS DOUBLE))
       |             / CAST(matches AS DOUBLE))) / CAST(3.0 AS DOUBLE) END AS jaro
       |  FROM jtr),
       |jwsc AS (
       |  SELECT doc_id_a, doc_id_b, CAST(1.0 AS DOUBLE) AS jw_score
       |  FROM pn WHERE name_a = name_b
       |  UNION ALL
       |  SELECT doc_id_a, doc_id_b,
       |    CASE WHEN matches = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE jaro
       |      + coalesce(list_min(list_filter(
       |            generate_series(1, least($MaxPrefixLength, least(l1, l2))), i -> c1[i] <> c2[i])) - 1,
       |          least($MaxPrefixLength, least(l1, l2)))
       |        * CAST($DefaultScalingFactor AS DOUBLE) * (CAST(1.0 AS DOUBLE) - jaro) END
       |  FROM jjaro)""".stripMargin
  }

  /** Mention CTE for the synonym lifecycle: raw first-6-token value,
    * normalized name (caller passes the name6 expression), exact-match
    * entity (min doc_id per normalized), seq = doc_id. Mirrors
    * SparkEntry.mentions — the WHERE applies before the window in both
    * engines.
    */
  def mentionsCte(name6: String): String =
    s"""WITH m AS (
       | SELECT doc_id AS seq,
       |  array_to_string(list_slice(string_split_regex(text, '\\s+'), 1, 6), ' ') AS "value",
       |  n AS normalized,
       |  min(doc_id) OVER (PARTITION BY n) AS entity_id
       | FROM (SELECT doc_id, text, $name6 AS n FROM documents)
       | WHERE n <> '')""".stripMargin

  /** Deterministic relationship fixture mirroring SparkEntry.relsDF. */
  val relsSql: String =
    """SELECT concat('r', doc_id) AS rel_id, doc_id AS src,
      | (doc_id * 7) % 500 AS dst,
      | CASE WHEN doc_id % 3 = 0 THEN 'PARTNER'
      |      WHEN doc_id % 3 = 1 THEN 'SUPPLIER'
      |      ELSE 'COMPETITOR' END AS rel_type,
      | doc_id AS created_seq, 'loader' AS created_by
      |FROM documents""".stripMargin
}
