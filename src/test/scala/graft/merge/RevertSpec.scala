package graft.merge

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cluster.ConnectedComponents

/** M11 merge revert (merge/MergeEngine.java compensating transaction):
  * removing merge edges splits exactly the components the revert severs,
  * keeps multi-witness merges intact, and leaves untouched clusters
  * byte-identical.
  */
class RevertSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("revert splits severed components, keeps witnessed and untouched ones") {
    // chain 1-2-3-4; triangle 5-6-7; island pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L), (10L, 11L)).toDF("src", "dst")
    val vertices = (1L to 11L).toDF("doc_id")
    val clusters = ConnectedComponents.run(spark, edges, vertices)

    val reverted = Seq((2L, 3L), (5L, 6L)).toDF("src", "dst")
    val after = Revert.revertMerges(spark, clusters, edges, reverted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // chain severed at 2-3: {1,2} and {3,4}
    assert(after(1L) == after(2L) && after(3L) == after(4L))
    assert(after(1L) != after(3L))
    // triangle keeps 5,6 merged via witness 7
    assert(after(5L) == after(6L) && after(6L) == after(7L))
    // untouched island unchanged, incl. its original label
    assert(after(10L) == 10L && after(11L) == 10L)
    // singletons untouched
    assert(after(8L) == 8L && after(9L) == 9L)
  }

  test("reverting every edge yields all singletons") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val vertices = (1L to 3L).toDF("doc_id")
    val clusters = ConnectedComponents.run(spark, edges, vertices)
    val after = Revert.revertMerges(spark, clusters, edges, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
