package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CC shapes from FIXTURES.md §4: chain, star, disjoint pairs, cycle,
  * singleton. cluster_id = min member — the batch equivalent of following
  * MERGED_INTO* to the canonical entity (graph/CypherExecutor.java:329-338).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private def run(edges: Seq[(String, String)], vertices: Seq[String]): Map[String, String] = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    ConnectedComponents.run(spark,
        edges.toDF("src", "dst"),
        vertices.toDF("doc_id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("chain a-b-c-d -> one cluster rooted at a") {
    val got = run(Seq("a" -> "b", "b" -> "c", "c" -> "d"), Seq("a", "b", "c", "d"))
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("star centered on z -> rooted at min leaf") {
    val got = run(Seq("z" -> "a", "z" -> "b", "z" -> "c"), Seq("a", "b", "c", "z"))
    assert(got.values.toSet == Set("a"))
  }

  test("two disjoint pairs") {
    val got = run(Seq("a" -> "b", "c" -> "d"), Seq("a", "b", "c", "d"))
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "c", "d" -> "c"))
  }

  test("cycle") {
    val got = run(Seq("a" -> "b", "b" -> "c", "c" -> "a"), Seq("a", "b", "c"))
    assert(got.values.toSet == Set("a"))
  }

  test("singletons own their cluster") {
    val got = run(Seq("a" -> "b"), Seq("a", "b", "x", "y"))
    assert(got("x") == "x" && got("y") == "y" && got("b") == "a")
  }

  test("empty edges -> identity") {
    val got = run(Seq.empty, Seq("p", "q"))
    assert(got == Map("p" -> "p", "q" -> "q"))
  }

  test("long chain converges (log-round star contraction)") {
    val n = 64
    val ids = (0 until n).map(i => f"v$i%03d")
    val edges = (0 until n - 1).map(i => ids(i) -> ids(i + 1))
    val got = run(edges, ids)
    assert(got.values.toSet == Set(ids.head))
  }

  test("property: random graphs match a driver-side union-find (20 seeds)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    for (seed <- 0 until 20) {
      val rng = new scala.util.Random(seed * 7919 + 13)
      val n = 20 + rng.nextInt(60)
      val m = rng.nextInt(2 * n)
      val edges = (0 until m).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      // reference: classic union-find on the driver
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = ConnectedComponents.run(spark,
          edges.toDF("src", "dst"),
          (0 until n).map(_.toLong).toDF("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed n=$n m=$m")
    }
  }

  test("numeric ids use numeric min (type-preserving)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = ConnectedComponents.run(spark,
        Seq((100L, 9L)).toDF("src", "dst"),
        Seq(9L, 100L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(9L -> 9L, 100L -> 9L))
  }

  test("star-forest convergence requires min-root orientation") {
    // A single edge (1 -> 2) is star-SHAPED but points small -> large; a
    // convergence test that ignored orientation would stop immediately
    // and label both nodes 2 instead of the component min 1. Pins the
    // isStarForest orientation condition.
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = ConnectedComponents.run(spark,
        Seq((1L, 2L)).toDF("src", "dst"),
        Seq(1L, 2L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
