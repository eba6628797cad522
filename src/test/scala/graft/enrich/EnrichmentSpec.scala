package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EnrichmentSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def best = Seq(
    ("d1", "d2", "acme corp intl", "acme corp", 0.55),    // below band -> escalate
    ("d3", "d4", "alpha beta", "gamma delta", 0.40),      // escalate, disjoint
    ("d5", "d6", "acme corp", "acme corporation x", 0.58),
    ("d7", "d8", "high scorer", "high scorer", 0.95),     // above band: untouched
  ).toDF("doc_id_a", "doc_id_b", "name_a", "name_b", "score")

  test("stub provider: mapping SYNONYM_ONLY / REVIEW / NO_MATCH, never AUTO_MERGE") {
    val out = Enrichment.escalate(best, StubProvider,
      reviewThreshold = 0.60, confidenceThreshold = 0.5).collect()
      .map(e => e.doc_id_a -> e).toMap
    assert(out.size == 3, "only the sub-review band escalates")
    // acme corp intl vs acme corp: overlap 2/3 = 0.667 >= 0.5 -> SYNONYM_ONLY
    assert(out("d1").decision == "SYNONYM_ONLY")
    assert(out("d3").decision == "NO_MATCH")
    // acme corp vs acme corporation x: 1/4 = 0.25 < 0.34 -> not same -> NO_MATCH
    assert(out("d5").decision == "NO_MATCH")
    assert(!out.values.exists(_.decision == "AUTO_MERGE"), "PRD 7.2: never AUTO_MERGE")
  }

  test("REVIEW band: same-entity but below confidence threshold") {
    val out = Enrichment.escalate(best, StubProvider,
      reviewThreshold = 0.60, confidenceThreshold = 0.9).collect()
      .map(e => e.doc_id_a -> e.decision).toMap
    assert(out("d1") == "REVIEW") // same entity (0.667 >= 0.34) but conf < 0.9
  }

  test("unavailable provider -> REVIEW fallback") {
    val out = Enrichment.escalate(best, NoOpProvider).collect()
    assert(out.length == 3)
    assert(out.forall(_.decision == "REVIEW"))
    assert(out.forall(_.reasoning.contains("unavailable")))
  }
}
