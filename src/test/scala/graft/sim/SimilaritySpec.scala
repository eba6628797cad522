package graft.sim

import org.scalatest.funsuite.AnyFunSuite

/** Golden similarity cases ported from
  * similarity/SimilarityEngineTest.java (FIXTURES.md §3.2) plus
  * seeded property checks pinning range/symmetry/identity.
  */
class SimilaritySpec extends AnyFunSuite {

  private val eps = 1e-9

  test("equal strings -> 1.0 for every algorithm") {
    Seq("test", "a", "multi word name").foreach { s =>
      assert(Levenshtein.similarity(s, s) == 1.0)
      assert(JaroWinkler.similarity(s, s) == 1.0)
      assert(Jaccard.similarity(s, s) == 1.0)
      assert(CompositeScorer.score(s, s) == 1.0)
    }
  }

  test("null or empty -> 0.0") {
    Seq(Levenshtein.similarity _, (a: String, b: String) => JaroWinkler.similarity(a, b),
        Jaccard.similarity _).foreach { f =>
      assert(f(null, "x") == 0.0)
      assert(f("x", null) == 0.0)
      assert(f("", "x") == 0.0)
      assert(f("x", "") == 0.0)
    }
    assert(CompositeScorer.score(null, "x") == 0.0)
  }

  test("JW: MARTHA/MARHTA (prefix pair) scores higher than MARTHA/AMRTHA") {
    val prefixed = JaroWinkler.similarity("MARTHA", "MARHTA")
    val swapped = JaroWinkler.similarity("MARTHA", "AMRTHA")
    assert(prefixed > swapped)
  }

  test("JW classics: DWAYNE/DUANE > 0.8; DIXON/DICKSONX > 0.7") {
    assert(JaroWinkler.similarity("DWAYNE", "DUANE") > 0.8)
    assert(JaroWinkler.similarity("DIXON", "DICKSONX") > 0.7)
  }

  test("JW textbook values") {
    // jaro(MARTHA, MARHTA) = 0.944..., jw = 0.961...
    assert(math.abs(JaroWinkler.similarity("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
  }

  test("Jaccard exact fractions") {
    assert(math.abs(Jaccard.similarity("apple orange", "apple banana") - 1.0 / 3) < 0.01)
    assert(math.abs(Jaccard.similarity(
      "international business machines",
      "international business machines corporation") - 0.75) < 0.01)
  }

  test("Levenshtein: microsoft/microsft >= 0.77") {
    assert(Levenshtein.similarity("microsoft", "microsft") >= 0.77)
    assert(Levenshtein.distance("kitten", "sitting") == 3)
  }

  test("composite: microsoft/microsft > 0.50; ibm vs its expansion < 0.5") {
    assert(CompositeScorer.score("microsoft", "microsft") > 0.50)
    assert(CompositeScorer.score("ibm", "international business machines") < 0.5)
  }

  test("weights validation") {
    SimilarityWeights(0.33, 0.34, 0.33) // default must validate
    assertThrows[IllegalArgumentException](SimilarityWeights(0.5, 0.5, 0.5))
    assertThrows[IllegalArgumentException](SimilarityWeights(-0.1, 0.6, 0.5))
    assertThrows[IllegalArgumentException](JaroWinkler.similarity("a", "b", 0.3))
  }

  test("composite equal-string short-circuit beats weighting") {
    // weights that would otherwise produce < 1 for equal strings cannot:
    assert(CompositeScorer.score("zz top", "zz top", SimilarityWeights.tokenFocused) == 1.0)
  }

  test("property: range [0,1], symmetry, identity (seeded sample)") {
    val rng = new scala.util.Random(42)
    def word = (1 to 1 + rng.nextInt(8)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    def phrase = (1 to 1 + rng.nextInt(4)).map(_ => word).mkString(" ")
    (1 to 500).foreach { _ =>
      val a = phrase
      val b = if (rng.nextBoolean()) phrase else a
      Seq(
        Levenshtein.similarity(a, b),
        JaroWinkler.similarity(a, b),
        Jaccard.similarity(a, b),
        CompositeScorer.score(a, b)).foreach { s =>
        assert(s >= 0.0 - eps && s <= 1.0 + eps, s"range for '$a' vs '$b'")
      }
      assert(math.abs(Levenshtein.similarity(a, b) - Levenshtein.similarity(b, a)) < eps)
      assert(math.abs(Jaccard.similarity(a, b) - Jaccard.similarity(b, a)) < eps)
      assert(math.abs(JaroWinkler.similarity(a, b) - JaroWinkler.similarity(b, a)) < eps)
      assert(CompositeScorer.score(a, a) == 1.0)
    }
  }
}
