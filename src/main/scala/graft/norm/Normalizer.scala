package graft.norm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  */
final case class NormRule(
    name: String,
    priority: Int,
    pattern: String,
    replacement: String,
    entityTypes: Set[String] = Set.empty) {
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
    NormRule("company-inc", 10, """,?\s*(Inc\.?|Incorporated)$""", "", Set(COMPANY)),
    NormRule("company-ltd", 10, """,?\s*(Ltd\.?|Limited)$""", "", Set(COMPANY)),
    NormRule("company-corp", 10, """,?\s*(Corp\.?|Corporation)$""", "", Set(COMPANY)),
    NormRule("company-co", 10, """,?\s*(Co\.?|Company)$""", "", Set(COMPANY)),
    NormRule("company-sa", 10, """,?\s*S\.?A\.?$""", "", Set(COMPANY)),
    NormRule("company-llc", 10, """,?\s*(LLC|L\.L\.C\.)$""", "", Set(COMPANY)),
    NormRule("company-plc", 10, """,?\s*(PLC|P\.L\.C\.)$""", "", Set(COMPANY)),
    NormRule("company-gmbh", 10, """,?\s*GmbH$""", "", Set(COMPANY)),
    NormRule("company-ag", 10, """,?\s*AG$""", "", Set(COMPANY)),
    NormRule("company-nv", 10, """,?\s*N\.?V\.?$""", "", Set(COMPANY)),
    NormRule("company-bv", 10, """,?\s*B\.?V\.?$""", "", Set(COMPANY)),
    NormRule("company-the", 20, """^The\s+""", "", Set(COMPANY)),
  )

  val commonRules: Seq[NormRule] = Seq(
    // NOTE insertion order matters within priority 50: "and" before "&"
    // (rules/DefaultNormalizationRules.java:145-178 list order after the
    // engine's stable priority sort).
    NormRule("common-and", 50, """\s+and\s+""", " "),
    NormRule("common-ampersand", 50, """\s*&\s*""", " "),
    NormRule("common-special-chars", 100, """[^a-zA-Z0-9\s]""", " "),
    NormRule("common-collapse-spaces", 200, """\s+""", " "),
  )

  val personRules: Seq[NormRule] = Seq(
    NormRule("person-mr", 10, """^Mr\.?\s+""", "", Set(PERSON)),
    NormRule("person-mrs", 10, """^Mrs\.?\s+""", "", Set(PERSON)),
    NormRule("person-ms", 10, """^Ms\.?\s+""", "", Set(PERSON)),
    NormRule("person-dr", 10, """^Dr\.?\s+""", "", Set(PERSON)),
    NormRule("person-jr", 10, """,?\s+(Jr\.?|Junior)$""", "", Set(PERSON)),
    NormRule("person-sr", 10, """,?\s+(Sr\.?|Senior)$""", "", Set(PERSON)),
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
    NormRule("metadata-version-suffix", 10, """[_\-]v\d+$""", "", Set(DATASET, TABLE)),
    NormRule("metadata-final-suffix", 10, """[_\-](final|draft)$""", "", Set(DATASET, TABLE)),
    NormRule("metadata-dataset-env-suffix", 10, """[_\-](prod|dev|staging|test)$""", "", Set(DATASET, TABLE)),
    NormRule("metadata-date-suffix-full", 10, """[_\-]\d{4}[_\-]?\d{2}[_\-]?\d{2}$""", "", Set(DATASET, TABLE)),
    NormRule("metadata-date-suffix-year", 15, """[_\-]\d{4}$""", "", Set(DATASET, TABLE)),
    NormRule("schema-dbo-prefix", 10, """^dbo\.""", "", Set(SCHEMA)),
    NormRule("schema-public-prefix", 10, """^public\.""", "", Set(SCHEMA)),
    NormRule("schema-raw-prefix", 10, """^raw\.""", "", Set(SCHEMA)),
    NormRule("schema-staging-prefix", 10, """^staging\.""", "", Set(SCHEMA)),
    NormRule("service-env-suffix", 10, """[_\-](dev|staging|prod|production|uat|qa)$""", "", Set(SERVICE, API)),
    NormRule("metadata-underscores-to-spaces", 50, "_", " ", Set(DATASET, TABLE, SCHEMA, SERVICE, API)),
    NormRule("metadata-hyphens-to-spaces", 50, "-", " ", Set(DATASET, TABLE, SCHEMA, SERVICE, API)),
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
