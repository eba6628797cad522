package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cluster.ConnectedComponents

/** Incremental attach == full recompute (the contraction argument in
  * IncrementalResolve's scaladoc), including the hard case where one new
  * doc bridges two previously-separate clusters.
  */
class IncrementalResolveSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("attach equals full recompute; increment can bridge old clusters") {
    // old world: clusters {1,2} (edge) and {3} and {10,11}
    val oldEdges = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val oldVerts = Seq(1L, 2L, 3L, 10L, 11L).toDF("doc_id")
    val existing = ConnectedComponents.run(spark, oldEdges, oldVerts)

    // increment: 6 bridges old docs 2 and 3; 7-8 form their own pair
    val newIds = Seq(6L, 7L, 8L).toDF("doc_id")
    val newNew = Seq((7L, 8L)).toDF("src", "dst")
    val newOld = Seq((6L, 2L), (6L, 3L)).toDF("src", "dst")

    val inc = IncrementalResolve.attach(spark, existing, newIds, newNew, newOld)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val full = ConnectedComponents.run(spark,
      oldEdges.union(newNew).union(newOld),
      oldVerts.union(newIds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(inc == full)
    // the bridge merged {1,2} and {3} with 6 -> one cluster labelled 1
    assert(inc(3L) == 1L && inc(6L) == 1L)
    // untouched cluster kept its label
    assert(inc(10L) == 10L && inc(11L) == 10L)
    // new-only pair got its own min label
    assert(inc(7L) == 7L && inc(8L) == 7L)
  }

  test("empty increment is a no-op") {
    val existing = ConnectedComponents.run(spark,
      Seq((1L, 2L)).toDF("src", "dst"), Seq(1L, 2L, 3L).toDF("doc_id"))
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = IncrementalResolve.attach(spark, existing,
      Seq.empty[Long].toDF("doc_id"), empty, empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
