package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Plan-property gates for the record-linkage query surface (the
  * relational surface has its own spec): pruning, pushdown, codegen and
  * broadcast shapes the engine depends on at scale, asserted in CI
  * rather than a dev-only main.
  */
class PipelinePlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q01: documents scan pruned to doc_id,text (normalize reads 2 of 5 cols)") {
    val rs = plan("q01_normalize").linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("text") &&
      !rs.contains("lang") && !rs.contains("n_chars"), rs)
  }

  test("q36: event_type equality is pushed to the parquet scan") {
    assert(plan("q36_event_setops").contains("EqualTo(event_type,click)"))
  }

  test("q05: scoring stages are whole-stage codegen'd (native kernels inline)") {
    // AQE renders codegen markers only in the finalized plan -> execute
    val df = SparkEntry.queries("q05_pair_scores")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") || p.contains("WholeStageCodegen"), p)
  }

  test("q25: brute-force ANN broadcasts the item side") {
    assert(plan("q25_ann_topk").contains("Broadcast"))
  }

  test("q45: synonym build is one shuffle over the mention groupBy") {
    val p = plan("q45_synonyms")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }
}
