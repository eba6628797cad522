package graft.review

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class ReviewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scores = Seq(
    ("d1", "d2", 0.75, "REVIEW"),
    ("d3", "d4", 0.65, "REVIEW"),
    ("d5", "d6", 0.95, "AUTO_MERGE"),
  ).toDF("doc_id_a", "doc_id_b", "score", "decision")

  test("queueFromScores: only REVIEW-band pairs, deterministic ids, PENDING") {
    val q = Review.queueFromScores(scores).collect()
    assert(q.length == 2)
    assert(q.forall(_.getAs[String]("status") == "PENDING"))
    assert(q.map(_.getAs[String]("review_id")).toSet ==
      Set("rev:d1:d2", "rev:d3:d4"))
  }

  test("pendingStats: counts by type and score decile") {
    val stats = Review.pendingStats(Review.queueFromScores(scores)).collect()
      .map(r => r.getAs[Int]("score_decile") -> r.getAs[Long]("pending")).toMap
    assert(stats == Map(7 -> 1L, 6 -> 1L))
  }

  test("approvedEdges / rejectionPenalties split by status") {
    val items = Review.queueFromScores(scores)
      .withColumn("status",
        when(col("src") === "d1", "APPROVED").otherwise("REJECTED"))
    assert(Review.approvedEdges(items).as[(String, String)].collect().toSeq ==
      Seq(("d1", "d2")))
    val pen = Review.rejectionPenalties(items, penalty = 0.1).collect()
    assert(pen.length == 1)
    assert(math.abs(pen(0).getAs[Double]("penalized_score") - 0.55) < 1e-12)
  }
}
