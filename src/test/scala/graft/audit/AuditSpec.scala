package graft.audit

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class AuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeHistory: per-target rank, most recent first") {
    val edges = Seq(
      ("b", "a", 0.95, "AUTO_MERGE", 3L),
      ("c", "a", 0.90, "AUTO_MERGE", 7L),
      ("e", "d", 0.99, "REVIEW_APPROVED", 1L),
    ).toDF("src", "dst", "confidence", "reason", "merged_seq")
    val h = Audit.mergeHistory(edges).collect()
      .map(r => (r.getAs[String]("entity_id"), r.getAs[String]("merged_from")) ->
        r.getAs[Int]("history_rank")).toMap
    assert(h(("a", "c")) == 1) // seq 7 is latest
    assert(h(("a", "b")) == 2)
    assert(h(("d", "e")) == 1)
  }

  test("auditAfterCursor: strictly-after filter, oldest first, limited") {
    val audit = Seq(
      ("a1", "CREATE", "e1", "sys", 1L),
      ("a2", "MERGE", "e1", "sys", 5L),
      ("a3", "REVIEW", "e1", "sys", 9L),
      ("a4", "CREATE", "e2", "sys", 2L),
    ).toDF("audit_id", "action", "entity_id", "actor_id", "ts_seq")
    val page = Audit.auditAfterCursor(audit, lit("e1"), cursorSeq = 1L, limit = 1).collect()
    assert(page.length == 1 && page(0).getAs[String]("audit_id") == "a2")
  }

  test("auditFirstPagePerEntity: one windowed pass covers every entity") {
    val audit = Seq(
      ("a1", "CREATE", "e1", "sys", 1L),
      ("a2", "MERGE", "e1", "sys", 5L),
      ("a3", "REVIEW", "e1", "sys", 9L),
      ("a4", "CREATE", "e2", "sys", 2L),
    ).toDF("audit_id", "action", "entity_id", "actor_id", "ts_seq")
    val out = Audit.auditFirstPagePerEntity(audit, cursorSeq = 1L, pageSize = 2)
      .select("audit_id", "page_rank").as[(String, Int)].collect().toSet
    assert(out == Set(("a2", 1), ("a3", 2), ("a4", 1)))
  }
}
