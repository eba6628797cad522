package graft.gen

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{Span, TruthDoc}
import graft.norm.Normalizer
import graft.sim.{CompositeScorer, SimilarityWeights}

/** Deterministic synthetic corpus generator with ground truth.
  *
  * Mirrors the reference benchmark corpus shape
  * (benchmark/FuzzyMatchBenchmarkTest.java:26-38 company names +
  * typo/suffix/reorder perturbations; BlockingKeyBenchmark.java:53
  * "company-%d" extension) re-expressed over the interleaved-span input
  * schema. Fully seeded: per-doc RNG = seed ^ (entity, variant), so any
  * subset regenerates identically at any parallelism.
  *
  * Per entity: one canonical doc + k perturbed duplicates. Perturbations
  * are constrained so every duplicate scores >= minDupScore against the
  * canonical under the default composite weights (checked at generation
  * time; fallback = normalize-identical suffix variant), which makes
  * ground-truth clusters equal to the reference's auto-merge closure —
  * the labels the north rule's F1 is measured against.
  */
object DocGen {

  private val vocab: IndexedSeq[String] = IndexedSeq(
    "alpine", "borealis", "cascade", "dynamo", "ember", "foxtail", "granite",
    "horizon", "ivory", "juniper", "krypton", "lumen", "meridian", "nimbus",
    "obsidian", "pinnacle", "quartz", "redwood", "sable", "tundra",
    "umbra", "vertex", "willow", "xenon", "yonder", "zephyr", "anchor",
    "beacon", "cinder", "delta", "echo", "fable")

  private val suffixes = IndexedSeq(
    " Inc.", " Incorporated", " Corp", " Corporation", ", Ltd.", " Limited",
    " LLC", " GmbH", " AG", " Company", "")

  private val mediaKinds = IndexedSeq("image", "audio", "video")

  /** Synthetic filler vocabulary (4096 5-8 char words). A large vocab
    * keeps cross-entity shingle Jaccard low so LSH bands collide for
    * near-duplicates, not for everything (a 32-word vocab saturates the
    * 3-gram space and degenerates blocking).
    */
  private val fillerVocab: IndexedSeq[String] = {
    val rng = new Random(0x5eed5eedL)
    IndexedSeq.fill(4096)((0 until (5 + rng.nextInt(4)))
      .map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
  }

  /** Base (pre-suffix) entity name: three vocab words + a unique id token,
    * optionally followed by `fillerTokens` deterministic per-entity filler
    * words (long-text mode for scale benchmarks — real span texts are
    * hundreds of chars, which makes pairwise scoring compute-dominant and
    * LSH the effective blocking path). Distinct entities share at most two
    * leading words plus random filler overlap, keeping cross-entity
    * composite scores below the auto-merge band.
    */
  def baseName(entityId: Long, fillerTokens: Int = 0): String = {
    val w1 = vocab((entityId % vocab.size).toInt)
    val w2 = vocab(((entityId / vocab.size) % vocab.size).toInt)
    val w3 = vocab(((entityId / (vocab.size * vocab.size)) % vocab.size).toInt)
    val head = s"$w1 $w2 $w3 x$entityId"
    if (fillerTokens <= 0) head
    else {
      val rng = new Random(entityId * 0x9e3779b97f4a7c15L + 17L)
      val filler = (0 until fillerTokens).map(_ => fillerVocab(rng.nextInt(fillerVocab.size)))
      head + " " + filler.mkString(" ")
    }
  }

  private def typoPerturb(name: String, rng: Random): String = {
    // substitute one character beyond position 3 of the longest token,
    // keeping pfx:/bg: blocking keys intact
    val toks = name.split(" ")
    val idx = toks.zipWithIndex.maxBy(_._1.length)._2
    val t = toks(idx)
    if (t.length <= 4) return name
    val pos = 3 + rng.nextInt(t.length - 4) + 1 // in (3, len-1]
    val repl = ('a' + rng.nextInt(26)).toChar
    toks(idx) = t.updated(math.min(pos, t.length - 1), repl)
    toks.mkString(" ")
  }

  /** The k-th variant of an entity's name (variant 0 = canonical). */
  def variantName(entityId: Long, variant: Int, seed: Long, minDupScore: Double,
                  fillerTokens: Int = 0): String = {
    val base = baseName(entityId, fillerTokens)
    val rng = new Random(seed ^ (entityId * 1315423911L + variant * 2654435761L))
    val canonical = base + suffixes((entityId % suffixes.size).toInt)
    if (variant == 0) return canonical
    val candidate =
      if (fillerTokens > 0) {
        // long-text mode: every duplicate is a typo variant (distinct
        // after normalization), so exact-pregrouping cannot collapse the
        // fuzzy-scoring workload the scale benchmark measures
        typoPerturb(base, rng) + suffixes((entityId % suffixes.size).toInt)
      } else variant % 4 match {
        case 1 => base + suffixes(rng.nextInt(suffixes.size)) // suffix swap
        case 2 => // case/whitespace noise (normalize-identical)
          val spaced = canonical.map(c => if (rng.nextBoolean()) c.toUpper else c)
          "  " + spaced.replace(" ", "   ") + " "
        case 3 => typoPerturb(base, rng) + suffixes((entityId % suffixes.size).toInt)
        case _ => canonical
      }
    val ok = CompositeScorer.score(
      Normalizer.normalize(candidate), Normalizer.normalize(canonical),
      SimilarityWeights.default) >= minDupScore
    if (ok) candidate else base + suffixes(rng.nextInt(suffixes.size))
  }

  /** Split a name into 1-3 text spans and interleave 0-2 media spans at
    * deterministic offsets (the span-sequence invariant fixture).
    */
  def toSpans(name: String, entityId: Long, variant: Int, seed: Long): Seq[Span] = {
    val rng = new Random(seed ^ (entityId * 40503L + variant * 69069L + 7L))
    val toks = name.split(" ").filter(_.nonEmpty)
    val nChunks = 1 + rng.nextInt(math.min(3, math.max(1, toks.length)))
    val bounds = (0 to nChunks).map(i => i * toks.length / nChunks)
    val textSpans = (0 until nChunks).flatMap { i =>
      val chunk = toks.slice(bounds(i), bounds(i + 1)).mkString(" ")
      if (chunk.isEmpty) None else Some(("text", chunk, ""))
    }
    val nMedia = rng.nextInt(3)
    val media = (0 until nMedia).map { m =>
      val kind = mediaKinds(rng.nextInt(mediaKinds.size))
      (kind, "", f"media://$kind/$entityId%06d-$variant-$m")
    }
    // interleave: deterministic shuffle of the combined sequence
    val combined = rng.shuffle((textSpans ++ media).toList)
    // keep text spans in their original relative order (offsets establish
    // the interleaving; text order must reconstruct the name)
    val textQueue = scala.collection.mutable.Queue(textSpans: _*)
    combined.zipWithIndex.map { case (s, i) =>
      if (s._1 == "text") { val t = textQueue.dequeue(); Span("text", t._2, "", i) }
      else Span(s._1, "", s._3, i)
    }
  }

  /** Generate `entities * docsPerEntity` docs with ground truth. */
  def corpus(entities: Int, docsPerEntity: Int, seed: Long = 42L,
             minDupScore: Double = 0.93, fillerTokens: Int = 0): Seq[TruthDoc] = {
    for {
      e <- 0 until entities
      v <- 0 until docsPerEntity
    } yield {
      val name = variantName(e, v, seed, minDupScore, fillerTokens)
      val docId = f"doc-${e.toLong * docsPerEntity + v}%09d"
      TruthDoc(docId, e, toSpans(name, e, v, seed))
    }
  }

  /** Corpus as a DataFrame (doc_id, entity_id, spans). Generated
    * distributed: the per-doc seeding means executors build rows
    * independently — no driver-side materialization at bench scale.
    */
  def corpusDF(spark: SparkSession, entities: Int, docsPerEntity: Int,
               seed: Long = 42L, minDupScore: Double = 0.93,
               partitions: Int = 32, fillerTokens: Int = 0): DataFrame = {
    import spark.implicits._
    spark.range(0, entities.toLong * docsPerEntity, 1, partitions)
      .as[Long]
      .map { i =>
        val e = i / docsPerEntity
        val v = (i % docsPerEntity).toInt
        val name = variantName(e, v, seed, minDupScore, fillerTokens)
        TruthDoc(f"doc-$i%09d", e, toSpans(name, e, v, seed))
      }
      .toDF()
  }
}
