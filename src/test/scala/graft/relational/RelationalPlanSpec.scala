package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Physical-plan property gates for the relational surface: the plans the
  * engine relies on at 100 TB must actually be produced — pushed parquet
  * filters, pruned scans, broadcast joins on dims, semi/anti joins.
  * (Values are covered by the DuckDB oracle; these pin the SHAPE.)
  */
class RelationalPlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q38: l_shipdate filter is pushed to the parquet scan; scan pruned") {
    val p = plan("q38_pricing_summary")
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("LessThanOrEqual(l_shipdate"), s"no pushed date filter:\n$scanLine")
    val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs.contains("l_partkey") && !rs.contains("l_suppkey"),
      s"scan not pruned to the 6 needed columns:\n$rs")
  }

  test("q39/q40/q41: dimension joins are broadcast, not shuffled") {
    for (q <- Seq("q39_nation_revenue", "q40_region_year_revenue", "q41_brand_supplier")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join in plan")
    }
    // nation/region must NEVER be the shuffled side of a sort-merge join
    val p40 = plan("q40_region_year_revenue")
    assert(!p40.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("n_nationkey") && l.contains("r_regionkey")),
      "region/nation joined via SMJ")
  }

  test("q42/q43: semi and anti joins appear as such (no materialized subquery)") {
    assert(plan("q42_priority_semi").contains("LeftSemi"), "q42 not a semi join")
    assert(plan("q43_anti_join").contains("LeftAnti"), "q43 not an anti join")
  }

  test("q44: single shuffle on o_custkey for the window top-k") {
    val p = plan("q44_top_orders")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "q44 lost its window operator")
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"q44 shuffles more than expected ($exchanges exchanges):\n$p")
  }

  test("q38-q44 stay inside whole-stage codegen (no interpreted hot path)") {
    // AQE prints codegen spans only once the plan is finalized -> execute
    for (q <- Seq("q38_pricing_summary", "q39_nation_revenue", "q41_brand_supplier",
      "q44_top_orders")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // AQE's final-plan rendering marks codegen'd operators "*(n)"
      assert(p.contains("WholeStageCodegen") || p.contains("*("),
        s"$q: no codegen span in the final plan:\n$p")
    }
  }
}
