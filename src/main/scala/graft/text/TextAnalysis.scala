package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.blocking.BlockingKeys

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword-profile heuristic), quality scoring, token
  * counting, and document fingerprinting. All pure Column expressions
  * (codegen'd); every formula is reproducible in ANSI-ish SQL for the
  * DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace token count (empties dropped). */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword token count: word pieces + digits runs + punctuation
    * marks each count as one token. A cheap, deterministic proxy for a
    * real tokenizer (no external vocab in a zero-egress build).
    */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern))

  /** Stopword profiles for the 5 corpus languages. Deterministic n-gram /
    * stopword-hit heuristic: score(lang) = matched stopword tokens.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that"),
    "fr" -> Seq("le", "la", "et", "de", "un", "une", "est", "que", "les"),
    "es" -> Seq("el", "la", "y", "de", "un", "una", "es", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "von", "zu", "den"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ta1", "men5"),
  )

  private def langScore(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => stopwords.map(s => t === s).reduce(_ || _)))

  /** Language-ID: argmax of stopword hits; profile order breaks ties
    * (en first); no hits at all -> "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val scores = StopwordProfiles.map { case (lang, words) => lang -> langScore(toks, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  /** Stopword ratio against the English profile (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0))
      .otherwise(langScore(toks, StopwordProfiles.head._2).cast("double") / size(toks))
  }

  /** Punctuation-character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double")
          / length(text))

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: favors moderate length, low
    * punctuation, healthy token lengths. Deterministic and
    * SQL-reproducible; thresholds are corpus-filtering knobs, not magic.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val punct = punctRatio(text)
    val mtl = meanTokenLen(text)
    val tokenScore = when(mtl >= 3.0 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.5))
    greatest(lit(0.0), least(lit(1.0),
      lit(0.4) * lenScore + lit(0.4) * (lit(1.0) - punct) + lit(0.2) * tokenScore))
  }

  /** Document fingerprint: rolling polynomial hash of the full text
    * (base 31 mod P) — a deterministic content id usable for exact-dup
    * detection and incremental lineage.
    */
  def fingerprint(text: Column): Column = BlockingKeys.rollingHash(text)
}
