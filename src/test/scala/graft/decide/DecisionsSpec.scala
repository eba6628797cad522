package graft.decide

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.Er

/** Threshold bands (api/ResolutionOptions.java:11-13,
  * core/model/MatchResult.java:33-46) and confidence-decay math
  * (decision/ConfidenceDecayEngine.java:78-121) — FIXTURES.md §3.4/3.5.
  */
class DecisionsSpec extends AnyFunSuite {

  test("decision bands at default thresholds") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = Seq(0.95, 0.92, 0.85, 0.80, 0.70, 0.60, 0.50).toDF("score")
      .select(col("score"), Decisions.decide(col("score")).as("d"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(0.95) == "AUTO_MERGE")
    assert(got(0.92) == "AUTO_MERGE")
    assert(got(0.85) == "SYNONYM_ONLY")
    assert(got(0.80) == "SYNONYM_ONLY")
    assert(got(0.70) == "REVIEW")
    assert(got(0.60) == "REVIEW")
    assert(got(0.50) == "NO_MATCH")
  }

  test("threshold ordering validation rejects auto<syn and syn<review") {
    assertThrows[IllegalArgumentException](Thresholds(autoMerge = 0.7, synonym = 0.8))
    assertThrows[IllegalArgumentException](Thresholds(synonym = 0.5, review = 0.6))
    Thresholds() // defaults must validate
  }

  test("decay: no time elapsed and no support -> base unchanged") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val v = Seq((1.0, 0.0, 0L)).toDF("base", "days", "support")
      .select(Er.effectiveConfidence(col("base"), col("days"), col("support")))
      .collect()(0).getDouble(0)
    assert(v == 1.0)
  }

  test("decay formula: clamp + boost cap") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = Seq(
      (0.9, 100.0, 0L),   // pure decay
      (0.9, 100.0, 50L),  // boost capped at 0.15
      (0.1, 5000.0, 0L),  // decays toward 0, clamped >= 0
    ).toDF("base", "days", "support")
      .select(Er.effectiveConfidence(col("base"), col("days"), col("support")))
      .collect().map(_.getDouble(0))
    val expect0 = 0.9 * math.exp(-0.001 * 100)
    assert(math.abs(rows(0) - expect0) < 1e-12)
    assert(math.abs(rows(1) - math.min(1.0, expect0 + 0.15)) < 1e-12)
    assert(rows(2) >= 0.0 && rows(2) < 0.01)
  }

  test("reinforcement boost: support 0 -> 0; log1p scaling") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = Seq((0.5, 0.0, 0L), (0.5, 0.0, 7L)).toDF("base", "days", "support")
      .select(Er.effectiveConfidence(col("base"), col("days"), col("support")))
      .collect().map(_.getDouble(0))
    assert(rows(0) == 0.5)
    assert(math.abs(rows(1) - (0.5 + math.min(math.log1p(7) * 0.05, 0.15))) < 1e-12)
  }

  test("negative reinforcement: max(0, conf - |penalty|)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = Seq((0.5, 0.05), (0.03, -0.05)).toDF("conf", "pen")
      .select(Er.negativeReinforce(col("conf"), col("pen")))
      .collect().map(_.getDouble(0))
    assert(math.abs(rows(0) - 0.45) < 1e-12)
    assert(rows(1) == 0.0)
  }

  test("best-match argmax keeps the top-scored candidate") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val scores = Seq(
      ("d1", "c1", 0.5), ("d1", "c2", 0.9), ("d1", "c3", 0.9),
      ("d2", "c1", 0.3)).toDF("doc_id_a", "doc_id_b", "score")
    val best = Decisions.bestMatch(scores).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(best("d1") == ("c2", 0.9)) // tie broken by candidate id
    assert(best("d2") == ("c1", 0.3))
  }
}
