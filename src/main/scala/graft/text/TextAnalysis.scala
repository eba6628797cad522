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
    // array argmax, NOT a when-chain over per-language comparisons: the
    // chain inlined the full 5-score subtree into every branch (~30
    // copies of the split/filter expression per call — the same codegen
    // blowup the MinHash HOF path hit). Here each langScore appears in
    // ONE array constructor; array_position's first-match rule keeps the
    // profile-order tie-break (en first).
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val scores = array(StopwordProfiles.map { case (_, words) => langScore(toks, words) }: _*)
    val langs = typedlit(StopwordProfiles.map(_._1))
    val best = array_max(scores)
    when(best > 0,
      element_at(langs, array_position(scores, best).cast("int")))
      .otherwise(lit("und"))
  }

  /** Stopword ratio against the English profile (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0))
      .otherwise(langScore(toks, StopwordProfiles.head._2).cast("double") / size(toks))
  }

  /** Punctuation-character ratio. Unicode letter/number classes, not
    * [a-zA-Z0-9]: the ASCII class counted every accented or CJK letter
    * as punctuation, so high-quality fr/es/de/zh text (the languages
    * StopwordProfiles supports) lost the whole punctuation component of
    * qualityScore. RE2 mirrors the classes, so the oracle stays exact.
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", ""))).cast("double")
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
