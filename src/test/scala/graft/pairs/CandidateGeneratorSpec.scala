package graft.pairs

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CandidateGeneratorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def keysDF(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("block_key", "doc_id")
  }

  test("pairs are distinct and canonical (a < b) across shared keys") {
    val keys = keysDF(Seq(
      ("k1", "a"), ("k1", "b"), ("k1", "c"),
      ("k2", "b"), ("k2", "c"))) // (b,c) shared by both keys -> once
    val pairs = CandidateGenerator.candidatePairs(keys)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("oversized blocks are dropped and reported") {
    val keys = keysDF(
      (1 to 50).map(i => ("hot", f"d$i%03d")) ++ Seq(("cold", "x"), ("cold", "y")))
    val pairs = CandidateGenerator.candidatePairs(keys, maxBlockSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y")))
    val st = CandidateGenerator.stats(keys, maxBlockSize = 10)
    assert(st.oversizedKeys == 1 && st.droppedKeyRows == 50)
  }

  test("packed pairs encode exactly the plain pair set (salted included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // long ids, several shared blocks, one salted-range block
    val keys = ((1 to 40).map(i => ("hot", i.toLong)) ++
      Seq(("k1", 3L), ("k1", 7L), ("k1", 50L), ("k2", 7L), ("k2", 50L)))
      .toDF("block_key", "doc_id")
    val plain = CandidateGenerator.candidatePairs(
        keys, maxBlockSize = 10, saltedMaxBlockSize = 100, saltBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val packed = CandidateGenerator.candidatePairsPacked(
        keys, maxBlockSize = 10, saltedMaxBlockSize = 100, saltBuckets = 3)
      .select(shiftright(col("pk"), 31).as("a"),
        col("pk").bitwiseAND(lit((1L << 31) - 1)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(packed == plain)
    assert(plain.nonEmpty && plain.forall { case (a, b) => a < b })
  }

  test("salted pair generation produces the exact same pair set as unsalted") {
    val keys = keysDF((1 to 60).map(i => ("hot", f"d$i%03d")))
    val unsalted = CandidateGenerator.candidatePairs(keys, maxBlockSize = 1000)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(unsalted.size == 60 * 59 / 2)
    val salted = CandidateGenerator.candidatePairs(
        keys, maxBlockSize = 10, saltedMaxBlockSize = 1000, saltBuckets = 7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(salted == unsalted, "salting must distribute work, not change the pair set")
  }

  test("salted mode still drops blocks above the hard cap") {
    val keys = keysDF((1 to 60).map(i => ("hot", f"d$i%03d")) ++ Seq(("c", "x"), ("c", "y")))
    val pairs = CandidateGenerator.candidatePairs(
        keys, maxBlockSize = 10, saltedMaxBlockSize = 50, saltBuckets = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y")))
  }

  test("stats with salting: kept-via-salting blocks are salted, not dropped") {
    // hot60 > saltedMax -> dropped; warm20 in (max, saltedMax] -> salted;
    // cold2 <= max -> plain
    val keys = keysDF(
      (1 to 60).map(i => ("hot", f"h$i%03d")) ++
      (1 to 20).map(i => ("warm", f"w$i%03d")) ++
      Seq(("cold", "x"), ("cold", "y")))
    val st = CandidateGenerator.stats(keys, maxBlockSize = 10, saltedMaxBlockSize = 50)
    assert(st.oversizedKeys == 1 && st.droppedKeyRows == 60,
      s"only the >saltedMax block counts as dropped: $st")
    assert(st.saltedKeys == 1 && st.saltedKeyRows == 20, s"warm block is salted: $st")
    // same table WITHOUT salting: both big blocks are dropped
    val st0 = CandidateGenerator.stats(keys, maxBlockSize = 10)
    assert(st0.oversizedKeys == 2 && st0.droppedKeyRows == 80 && st0.saltedKeys == 0)
  }

  test("saltBuckets = 0 is rejected at the API boundary, not inside the join job") {
    val keys = keysDF(Seq(("k", "a"), ("k", "b")))
    assertThrows[IllegalArgumentException](
      CandidateGenerator.candidatePairs(keys, saltBuckets = 0))
  }
}
