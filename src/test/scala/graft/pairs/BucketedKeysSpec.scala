package graft.pairs

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.blocking.BlockingKeys

class BucketedKeysSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keysDF = {
    val names = Seq(
      (1L, "acme corporation"), (2L, "acme corp"), (3L, "acme incorporated"),
      (4L, "globex industries"), (5L, "globex inc"), (6L, "initech llc"),
      (7L, "initech limited"), (8L, "umbrella co"), (9L, "umbrella company"),
    ).toDF("doc_id", "n")
    BlockingKeys.explodeKeys(names, "doc_id", BlockingKeys.defaultKeys(col("n")))
  }

  test("bucketed candidate pairs == plain candidate pairs") {
    BucketedKeys.write(keysDF, "bk_spec_keys", buckets = 4)
    try {
      val bucketed = BucketedKeys.candidatePairs(spark, "bk_spec_keys")
        .as[(Long, Long)].collect().toSet
      val plain = CandidateGenerator.candidatePairs(keysDF)
        .as[(Long, Long)].collect().toSet
      assert(bucketed == plain && bucketed.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS bk_spec_keys")
  }

  test("the bucketed self-join plans NO exchange on block_key; the plain one must") {
    BucketedKeys.write(keysDF, "bk_spec_keys2", buckets = 4)
    try {
      val k = BucketedKeys.read(spark, "bk_spec_keys2")
      val l = k.select(col("block_key"), col("doc_id").as("doc_id_a"))
      val r = k.select(col("block_key"), col("doc_id").as("doc_id_b"))
      val bucketedPlan = l.join(r, Seq("block_key"))
        .queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange hashpartitioning(block_key"),
        s"bucketed self-join still shuffles:\n$bucketedPlan")

      val pk = keysDF
      val pl = pk.select(col("block_key"), col("doc_id").as("doc_id_a"))
      val pr = pk.select(col("block_key"), col("doc_id").as("doc_id_b"))
      val plainPlan = pl.join(pr, Seq("block_key"))
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning(block_key") ||
        plainPlan.contains("BroadcastHashJoin"),
        s"control: plain self-join shape unexpected:\n$plainPlan")
    } finally spark.sql("DROP TABLE IF EXISTS bk_spec_keys2")
  }

  test("increment join against the bucketed key table: big side exchange-free") {
    BucketedKeys.write(keysDF, "bk_spec_keys3", buckets = 4)
    try {
      val old = BucketedKeys.read(spark, "bk_spec_keys3")
      val inc = Seq((100L, "acme group")).toDF("doc_id", "n")
      val newKeys = BlockingKeys.explodeKeys(inc, "doc_id",
        BlockingKeys.defaultKeys(col("n")))
        .select(col("block_key"), col("doc_id").as("doc_id_a"))
      val joined = newKeys.join(
        old.select(col("block_key"), col("doc_id").as("doc_id_b")), Seq("block_key"))
      joined.collect() // finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      // the bucketed (big) side must not be re-hashed: either the small
      // increment broadcasts (zero hash exchanges), or only the increment
      // side exchanges (exactly one) — never both sides as in the
      // unbucketed control above
      val nExchanges = "Exchange hashpartitioning\\(block_key".r
        .findAllIn(plan).length
      assert(plan.contains("BroadcastHashJoin") || nExchanges <= 1, plan)
    } finally spark.sql("DROP TABLE IF EXISTS bk_spec_keys3")
  }
}
