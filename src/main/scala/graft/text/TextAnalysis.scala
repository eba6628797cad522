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

  /** Let-binding idiom for Column expressions: HOF subtrees are NOT
    * shared by codegen (higher-order functions evaluate interpreted, so
    * every textual occurrence re-runs the whole subtree, split()
    * included — the MinHash staging lesson). Wrapping the value in a
    * 1-element array and projecting through transform binds it to a
    * lambda variable: the expensive expression evaluates ONCE per row
    * however many times the body references it.
    */
  private def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** One fold over the whitespace tokens accumulating (count, payload);
    * `hit` maps a token to the payload increment, `finish` consumes the
    * bound accumulator. Every operator built on this splits the text
    * exactly once per row.
    */
  private def tokenFold(text: Column, lowered: Boolean)
                       (hit: Column => Column)(finish: (Column, Column) => Column): Column =
    aggregate(
      filter(split(if (lowered) lower(text) else text, "\\s+"), t => length(t) > 0),
      struct(lit(0L).as("n"), lit(0L).as("acc")),
      (a, t) => struct((a.getField("n") + 1L).as("n"),
        (a.getField("acc") + hit(t)).as("acc")),
      a => finish(a.getField("n"), a.getField("acc")))

  /** Language-ID: argmax of stopword hits; profile order breaks ties
    * (en first); no hits at all -> "und" (undetermined). ONE pass: a
    * single fold carries all 5 per-language counters, and the score
    * array is let-bound so the argmax's three references don't re-run
    * the fold (the old array-of-langScore form re-split the text once
    * per profile per reference).
    */
  def langId(text: Column): Column = {
    val scores = aggregate(
      filter(split(lower(text), "\\s+"), t => length(t) > 0),
      struct(StopwordProfiles.indices.map(i => lit(0L).as(s"s$i")): _*),
      (a, t) => struct(StopwordProfiles.zipWithIndex.map { case ((_, words), i) =>
        (a.getField(s"s$i") +
          when(words.map(s => t === s).reduce(_ || _), 1L).otherwise(0L)).as(s"s$i")
      }: _*),
      a => array(StopwordProfiles.indices.map(i => a.getField(s"s$i")): _*))
    val langs = typedlit(StopwordProfiles.map(_._1))
    bind(scores) { s =>
      val best = array_max(s)
      when(best > 0,
        element_at(langs, array_position(s, best).cast("int")))
        .otherwise(lit("und"))
    }
  }

  /** Stopword ratio against the English profile (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val sw = StopwordProfiles.head._2
    tokenFold(text, lowered = true)(
      t => when(sw.map(s => t === s).reduce(_ || _), 1L).otherwise(0L)) {
      (n, hits) =>
        when(n === 0L, lit(0.0)).otherwise(hits.cast("double") / n)
    }
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

  /** Mean whitespace-token length (one fold; count and length sum ride
    * the same pass, the ratio computes over the bound accumulator).
    */
  def meanTokenLen(text: Column): Column =
    tokenFold(text, lowered = false)(t => length(t).cast("long")) { (n, len) =>
      when(n === 0L, lit(0.0)).otherwise(len.cast("double") / n)
    }

  /** Composite quality score in [0,1]: favors moderate length, low
    * punctuation, healthy token lengths. Deterministic and
    * SQL-reproducible; thresholds are corpus-filtering knobs, not magic.
    * The token-length component folds inside meanTokenLen's single pass;
    * the mtl band test runs over the bound ratio, so the text splits
    * once per row (the old form re-split it per mtl reference).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val punct = punctRatio(text)
    val tokenScore = bind(meanTokenLen(text)) { mtl =>
      when(mtl >= 3.0 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.5))
    }
    greatest(lit(0.0), least(lit(1.0),
      lit(0.4) * lenScore + lit(0.4) * (lit(1.0) - punct) + lit(0.2) * tokenScore))
  }

  /** Document fingerprint: rolling polynomial hash of the full text
    * (base 31 mod P) — a deterministic content id usable for exact-dup
    * detection and incremental lineage.
    */
  def fingerprint(text: Column): Column = BlockingKeys.rollingHash(text)
}
