package graft.synonyms

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class SynonymsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mentionsDF = Seq(
    // (entity_id, value, normalized, seq)
    (1L, "Acme Inc.", "acme", 10L),
    (1L, "ACME Incorporated", "acme", 11L),
    (1L, "Acme Corp", "acme corp", 12L),
    (2L, "Globex GmbH", "globex", 20L),
  ).toDF("entity_id", "value", "normalized", "seq")

  test("fromMentions: one row per (entity, normalized), support = mention count") {
    val syn = Synonyms.fromMentions(mentionsDF, "IMPORT").collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("normalized")) -> r).toMap
    assert(syn.size == 3)
    val acme = syn((1L, "acme"))
    assert(acme.getAs[Long]("support_count") == 2L)
    assert(acme.getAs[String]("value") == "ACME Incorporated") // lexicographic min
    assert(acme.getAs[Long]("created_seq") == 10L)
    assert(acme.getAs[Long]("last_confirmed_seq") == 11L)
    assert(acme.getAs[String]("source") == "IMPORT")
    assert(syn((2L, "globex")).getAs[Long]("support_count") == 1L)
  }

  test("reinforce: matched rows bump support + lastConfirmed, others unchanged") {
    val syn = Synonyms.fromMentions(mentionsDF, "IMPORT")
    val batch = Seq((1L, "acme", 100L), (1L, "acme", 101L)).toDF("entity_id", "normalized", "seq")
    val out = Synonyms.reinforce(syn, batch).collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("normalized")) -> r).toMap
    assert(out((1L, "acme")).getAs[Long]("support_count") == 4L)
    assert(out((1L, "acme")).getAs[Long]("last_confirmed_seq") == 101L)
    assert(out((1L, "acme corp")).getAs[Long]("support_count") == 1L)
    assert(out((1L, "acme corp")).getAs[Long]("last_confirmed_seq") == 12L)
    assert(out.size == 3) // unmatched mentions do not create synonyms
  }

  test("updateConfidence: join-update, unmatched keep confidence") {
    val syn = Synonyms.fromMentions(mentionsDF, "IMPORT", initialConfidence = 0.5)
    val updates = Seq((1L, "acme", 0.91)).toDF("entity_id", "normalized", "new_confidence")
    val out = Synonyms.updateConfidence(syn, updates).collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("normalized")) -> r).toMap
    assert(out((1L, "acme")).getAs[Double]("confidence") == 0.91)
    assert(out((2L, "globex")).getAs[Double]("confidence") == 0.5)
  }

  test("updateConfidence: duplicate update rows do not fan the synonym table out") {
    val syn = Synonyms.fromMentions(mentionsDF, "IMPORT", initialConfidence = 0.5)
    val updates = Seq((1L, "acme", 0.91), (1L, "acme", 0.85))
      .toDF("entity_id", "normalized", "new_confidence")
    val out = Synonyms.updateConfidence(syn, updates)
    assert(out.count() == syn.count(), "one row per key must survive duplicate updates")
    val acme = out.where(col("entity_id") === 1L && col("normalized") === "acme").collect()
    assert(acme.length == 1 && acme(0).getAs[Double]("confidence") == 0.91) // max wins
    // schema order matches fromMentions (position-based unions/appends)
    assert(out.columns.sameElements(syn.columns))
  }

  test("reinforce: NULL last_confirmed_seq on an unmatched row stays NULL (no sentinel leak)") {
    val syn = Synonyms.fromMentions(mentionsDF, "IMPORT")
      .withColumn("last_confirmed_seq",
        when(col("normalized") === "globex", lit(null).cast("long"))
          .otherwise(col("last_confirmed_seq")))
    val batch = Seq((1L, "acme", 100L)).toDF("entity_id", "normalized", "seq")
    val out = Synonyms.reinforce(syn, batch)
    val globex = out.where(col("normalized") === "globex").collect()(0)
    assert(globex.isNullAt(globex.fieldIndex("last_confirmed_seq")),
      "unmatched NULL must pass through unchanged, not become Long.MinValue")
    assert(out.columns.sameElements(syn.columns))
  }

  test("forEntities: semi-join lookup") {
    val syn = Synonyms.fromMentions(mentionsDF, "IMPORT")
    val out = Synonyms.forEntities(syn, Seq(Tuple1(1L)).toDF("entity_id"))
    assert(out.select("normalized").as[String].collect().toSet == Set("acme", "acme corp"))
  }
}
