package graft.norm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** An O(1)/O(n) allocation-free necessary-condition test for one rule: when
  * `mayMatch` returns false the rule's regex provably has no match, so the
  * kernel skips the Matcher scan entirely. Guards are NEVER sufficient —
  * a passing guard still runs the real regex — so they can only skip work,
  * never change a result. Equivalence to the unguarded chain is pinned by
  * NormalizerSpec's property test (random strings over a corner-case
  * alphabet including line terminators and non-ASCII, all entity types).
  */
sealed trait NormGuard { def mayMatch(s: String): Boolean }

object NormGuard {
  /** No cheap necessary condition — always run the regex. */
  case object Always extends NormGuard {
    def mayMatch(s: String): Boolean = true
  }

  /** For `$`-anchored patterns whose match must END in one of `chars`
    * (ASCII, lowercase). Java's non-MULTILINE `$` also matches just
    * before one final line terminator, so a string ending in a
    * terminator is conservatively never skipped.
    */
  final case class EndsIn(chars: String) extends NormGuard {
    def mayMatch(s: String): Boolean = {
      val n = s.length
      if (n == 0) return false
      val c = s.charAt(n - 1)
      if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
        c == '\u2029') return true
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      chars.indexOf(lc.toInt) >= 0
    }
  }

  /** For `^`-anchored patterns: first char must be `c` (lowercase given;
    * ASCII case-insensitive compare, matching (?i)'s ASCII-only folding).
    */
  final case class StartsWithChar(c: Char) extends NormGuard {
    def mayMatch(s: String): Boolean = {
      if (s.isEmpty) return false
      val f = s.charAt(0)
      val lf = if (f >= 'A' && f <= 'Z') (f + 32).toChar else f
      lf == c
    }
  }

  /** Pattern requires a literal occurrence of `c` somewhere. */
  final case class ContainsChar(c: Char) extends NormGuard {
    def mayMatch(s: String): Boolean = s.indexOf(c.toInt) >= 0
  }

  /** Pattern requires a contiguous case-insensitive literal `w`
    * (lowercase given; ASCII folding only, same as (?i)).
    */
  final case class ContainsWordCI(w: String) extends NormGuard {
    def mayMatch(s: String): Boolean = {
      val n = s.length
      val m = w.length
      var i = 0
      while (i + m <= n) {
        var j = 0
        var ok = true
        while (ok && j < m) {
          val c = s.charAt(i + j)
          val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
          ok = lc == w.charAt(j)
          j += 1
        }
        if (ok) return true
        i += 1
      }
      false
    }
  }

  /** For `[^a-zA-Z0-9\s]`: any char outside alnum and java-regex \s
    * (exactly [ \t\n\x0B\f\r] — NOT Unicode whitespace).
    */
  case object AnyNonAlnumSpace extends NormGuard {
    def mayMatch(s: String): Boolean = {
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9')
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r'
        if (!alnum && !ws) return true
        i += 1
      }
      false
    }
  }

  /** For `\s+` -> " ": replacement changes the string only when some \s
    * char is not a plain space, or two spaces are adjacent (a lone ' '
    * rewrites to ' ' — identity).
    */
  case object NeedsWsCollapse extends NormGuard {
    def mayMatch(s: String): Boolean = {
      var i = 0
      val n = s.length
      var prevSpace = false
      while (i < n) {
        val c = s.charAt(i)
        if (c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
          c == '\r') return true
        if (c == ' ') {
          if (prevSpace) return true
          prevSpace = true
        } else prevSpace = false
        i += 1
      }
      false
    }
  }
}

/** One priority-ordered, case-insensitive regex rewrite rule.
  *
  * Semantics of the reference engine (rules/NormalizationRule.java:60-65,
  * rules/NormalizationEngine.java:73-96): rules are applied in ascending
  * priority order (stable within equal priority), each as a global
  * case-insensitive `replaceAll`, followed by a final
  * lowercase + trim + collapse-whitespace cleanup
  * (rules/NormalizationEngine.java:92-93).
  *
  * `entityTypes` empty => applies to all types
  * (rules/NormalizationRule.java appliesTo).
  *
  * `guard` is a pure skip-optimization (see [[NormGuard]]); it never
  * affects the result.
  */
final case class NormRule(
    name: String,
    priority: Int,
    pattern: String,
    replacement: String,
    entityTypes: Set[String] = Set.empty,
    guard: NormGuard = NormGuard.Always) {
  def appliesTo(entityType: Option[String]): Boolean =
    entityType.isEmpty || entityTypes.isEmpty || entityTypes.contains(entityType.get)
  lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern, java.util.regex.Pattern.CASE_INSENSITIVE)
}

/** Data-driven normalization rules + the normalization operator, both as a
  * plain-Scala function (generator/tests) and as a codegen-friendly chain
  * of built-in `regexp_replace` Columns (no UDF in the hot path).
  *
  * Rule list re-expresses rules/DefaultNormalizationRules.java:30-178
  * (company suffixes pri 10, "The " prefix pri 20, and/& pri 50,
  * special chars pri 100, collapse pri 200).
  */
object Normalizer {

  val COMPANY = "COMPANY"
  val PERSON = "PERSON"
  val DATASET = "DATASET"
  val TABLE = "TABLE"

  /** Faithful-port note: the reference's suffix patterns make BOTH
    * separators optional (`,?\s*`) with no word boundary
    * (rules/DefaultNormalizationRules.java:35-91), so they strip
    * word-INTERNAL endings too — "Cisco" normalizes to "cis" (matches
    * `Co$` mid-word), "Texaco" to "texa". That is the reference's own
    * behavior (its tests pin it) and the oracle mirrors it; it is
    * reproduced here deliberately, not an escaping bug. Callers who need
    * boundary-safe suffix stripping should supply their own rule set
    * with `\s+` separators.
    */
  val companyRules: Seq[NormRule] = Seq(
    NormRule("company-inc", 10, """,?\s*(Inc\.?|Incorporated)$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("cd.")),
    NormRule("company-ltd", 10, """,?\s*(Ltd\.?|Limited)$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("d.")),
    NormRule("company-corp", 10, """,?\s*(Corp\.?|Corporation)$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("pn.")),
    NormRule("company-co", 10, """,?\s*(Co\.?|Company)$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("oy.")),
    NormRule("company-sa", 10, """,?\s*S\.?A\.?$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("a.")),
    NormRule("company-llc", 10, """,?\s*(LLC|L\.L\.C\.)$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("c.")),
    NormRule("company-plc", 10, """,?\s*(PLC|P\.L\.C\.)$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("c.")),
    NormRule("company-gmbh", 10, """,?\s*GmbH$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("h")),
    NormRule("company-ag", 10, """,?\s*AG$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("g")),
    NormRule("company-nv", 10, """,?\s*N\.?V\.?$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("v.")),
    NormRule("company-bv", 10, """,?\s*B\.?V\.?$""", "", Set(COMPANY),
      guard = NormGuard.EndsIn("v.")),
    NormRule("company-the", 20, """^The\s+""", "", Set(COMPANY),
      guard = NormGuard.StartsWithChar('t')),
  )

  val commonRules: Seq[NormRule] = Seq(
    // NOTE insertion order matters within priority 50: "and" before "&"
    // (rules/DefaultNormalizationRules.java:145-178 list order after the
    // engine's stable priority sort).
    NormRule("common-and", 50, """\s+and\s+""", " ",
      guard = NormGuard.ContainsWordCI("and")),
    NormRule("common-ampersand", 50, """\s*&\s*""", " ",
      guard = NormGuard.ContainsChar('&')),
    NormRule("common-special-chars", 100, """[^a-zA-Z0-9\s]""", " ",
      guard = NormGuard.AnyNonAlnumSpace),
    NormRule("common-collapse-spaces", 200, """\s+""", " ",
      guard = NormGuard.NeedsWsCollapse),
  )

  val personRules: Seq[NormRule] = Seq(
    NormRule("person-mr", 10, """^Mr\.?\s+""", "", Set(PERSON),
      guard = NormGuard.StartsWithChar('m')),
    NormRule("person-mrs", 10, """^Mrs\.?\s+""", "", Set(PERSON),
      guard = NormGuard.StartsWithChar('m')),
    NormRule("person-ms", 10, """^Ms\.?\s+""", "", Set(PERSON),
      guard = NormGuard.StartsWithChar('m')),
    NormRule("person-dr", 10, """^Dr\.?\s+""", "", Set(PERSON),
      guard = NormGuard.StartsWithChar('d')),
    NormRule("person-jr", 10, """,?\s+(Jr\.?|Junior)$""", "", Set(PERSON),
      guard = NormGuard.EndsIn("r.")),
    NormRule("person-sr", 10, """,?\s+(Sr\.?|Senior)$""", "", Set(PERSON),
      guard = NormGuard.EndsIn("r.")),
  )

  val SCHEMA = "SCHEMA"
  val SERVICE = "SERVICE"
  val API = "API"

  /** N5: metadata-entity rules (rules/MetadataNormalizationRules.java:46-175):
    * version/final/env/date suffixes for DATASET/TABLE, schema prefixes
    * for SCHEMA, env suffixes for SERVICE/API, and underscore/hyphen to
    * space for all metadata types.
    */
  val metadataRules: Seq[NormRule] = Seq(
    NormRule("metadata-version-suffix", 10, """[_\-]v\d+$""", "", Set(DATASET, TABLE),
      guard = NormGuard.EndsIn("0123456789")),
    NormRule("metadata-final-suffix", 10, """[_\-](final|draft)$""", "", Set(DATASET, TABLE),
      guard = NormGuard.EndsIn("lt")),
    NormRule("metadata-dataset-env-suffix", 10, """[_\-](prod|dev|staging|test)$""", "", Set(DATASET, TABLE),
      guard = NormGuard.EndsIn("dvgt")),
    NormRule("metadata-date-suffix-full", 10, """[_\-]\d{4}[_\-]?\d{2}[_\-]?\d{2}$""", "", Set(DATASET, TABLE),
      guard = NormGuard.EndsIn("0123456789")),
    NormRule("metadata-date-suffix-year", 15, """[_\-]\d{4}$""", "", Set(DATASET, TABLE),
      guard = NormGuard.EndsIn("0123456789")),
    NormRule("schema-dbo-prefix", 10, """^dbo\.""", "", Set(SCHEMA),
      guard = NormGuard.StartsWithChar('d')),
    NormRule("schema-public-prefix", 10, """^public\.""", "", Set(SCHEMA),
      guard = NormGuard.StartsWithChar('p')),
    NormRule("schema-raw-prefix", 10, """^raw\.""", "", Set(SCHEMA),
      guard = NormGuard.StartsWithChar('r')),
    NormRule("schema-staging-prefix", 10, """^staging\.""", "", Set(SCHEMA),
      guard = NormGuard.StartsWithChar('s')),
    NormRule("service-env-suffix", 10, """[_\-](dev|staging|prod|production|uat|qa)$""", "", Set(SERVICE, API),
      guard = NormGuard.EndsIn("vgdnta")),
    NormRule("metadata-underscores-to-spaces", 50, "_", " ", Set(DATASET, TABLE, SCHEMA, SERVICE, API),
      guard = NormGuard.ContainsChar('_')),
    NormRule("metadata-hyphens-to-spaces", 50, "-", " ", Set(DATASET, TABLE, SCHEMA, SERVICE, API),
      guard = NormGuard.ContainsChar('-')),
  )

  /** Default engine = company + common rules
    * (rules/DefaultNormalizationRules.java createDefaultEngine), sorted by
    * priority with stable insertion order.
    */
  val defaultRules: Seq[NormRule] = (companyRules ++ commonRules).sortBy(_.priority)

  val allRules: Seq[NormRule] =
    (companyRules ++ personRules ++ metadataRules ++ commonRules).sortBy(_.priority)

  def rulesFor(entityType: Option[String]): Seq[NormRule] =
    allRules.filter(_.appliesTo(entityType))

  /** Plain-Scala normalization (exact reference semantics,
    * rules/NormalizationEngine.java:73-96). Used by the deterministic
    * generator and golden tests; the distributed path uses
    * [[normalizeColumn]].
    */
  def normalize(name: String, entityType: Option[String] = Some(COMPANY)): String = {
    if (name == null || name.trim.isEmpty) return ""
    var result = name
    rulesFor(entityType).foreach { r =>
      // guard = pure skip (NormGuard soundness property in NormalizerSpec)
      if (r.guard.mayMatch(result))
        result = r.compiled.matcher(result).replaceAll(r.replacement)
    }
    result.toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ")
  }

  /** Column-level normalization: the native one-conversion chain
    * ([[NormalizeExpr]] — same java.util.regex patterns, one
    * UTF8String round trip instead of one per rule). Property-tested
    * equal to [[normalizeColumnBuiltins]].
    */
  def normalizeColumn(col: Column, entityType: Option[String] = Some(COMPANY)): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NormalizeExpr(Bridge.expression(col), entityType))
  }

  /** The built-in formulation: a chain of `regexp_replace` calls
    * ((?i) = the reference's Pattern.CASE_INSENSITIVE), fully inside
    * whole-stage codegen. Final cleanup lower+collapse+trim is equivalent
    * to the reference's lower+trim+collapse because the collapse rule maps
    * leading/trailing \s+ to a single literal space. Kept as the
    * executable spec the native expression is property-tested against
    * (and the template [[normalizeSql]] mirrors).
    */
  def normalizeColumnBuiltins(col: Column, entityType: Option[String] = Some(COMPANY)): Column = {
    val chained = rulesFor(entityType).foldLeft(col) { (c, r) =>
      regexp_replace(c, "(?i)" + r.pattern, r.replacement)
    }
    coalesce(trim(regexp_replace(lower(chained), "\\s+", " ")), lit(""))
  }

  /** DuckDB-dialect SQL for the same normalization chain (oracle parity).
    * Generated from the same rule data so Spark and oracle can never
    * drift. DuckDB regexp_replace needs the explicit 'g' flag to match
    * Java's replaceAll.
    */
  def normalizeSql(colExpr: String, entityType: Option[String] = Some(COMPANY)): String = {
    // DuckDB ordinary string literals do not process backslash escapes, so
    // regex patterns embed with single backslashes; only quotes need doubling.
    val chained = rulesFor(entityType).foldLeft(colExpr) { (c, r) =>
      val pat = ("(?i)" + r.pattern).replace("'", "''")
      s"regexp_replace($c, '$pat', '${r.replacement}', 'g')"
    }
    s"coalesce(trim(regexp_replace(lower($chained), '\\s+', ' ', 'g')), '')"
  }

  /** N7: equivalence after normalization (rules/NormalizationEngine.java:101-105). */
  def areEquivalent(a: String, b: String, entityType: Option[String]): Boolean =
    normalize(a, entityType) == normalize(b, entityType)
}
