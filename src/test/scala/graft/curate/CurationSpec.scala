package graft.curate

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Curation = lang allowlist → quality floor → transitive near-dup
  * removal. The keep set must equal a brute-force recompute (signals
  * collected, pairs from the trusted near-dup operator, union-find in
  * plain Scala), and every drop must carry the right reason.
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val en = "the quick brown fox jumps over the lazy dog and runs away with it"
  private def docs = Seq(
    (1L, en + " first version of this document body"),
    (2L, en + " first version of this document badly"), // near-dup of 1
    (3L, en + " an unrelated second topic entirely about different things and matters"),
    (4L, "le renard brun rapide saute par dessus le chien paresseux dans le jardin et la maison"), // fr
    (5L, "the !!!!!!!!!! of ?????????? and !!!!!!!!!!"), // en but junk quality
    (6L, en + " first version of this document body"), // exact dup of 1
    (7L, null.asInstanceOf[String]), // null text -> und
  ).toDF("doc_id", "text")

  test("dispositions: keep set == brute force; reasons correct") {
    val out = Curation.curate(spark, docs, "doc_id", "text",
      langAllow = Set("en"), minQuality = 0.5, nearDupThreshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), Option(r.getString(4)))).toMap

    // brute force: signals + trusted pair operator + union-find
    val sig = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val eligible = sig.filter { case (_, (l, q)) =>
      l == "en" && q.exists(_ >= 0.5) }.keySet
    val pairs = Dedup.minhashNearDups(
      docs.where(col("doc_id").isin(eligible.toSeq: _*)), "doc_id", "text",
      threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map(eligible.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectedKeep = eligible.filter(i => find(i) == i)

    assert(out.filter(_._2._1).keySet == expectedKeep)
    assert(out(4L)._2.contains("lang"), "french doc dropped for language")
    assert(out(5L)._2.contains("quality"), "junk doc dropped for quality")
    assert(out(7L)._2.contains("lang"), "null text identifies as und -> lang drop")
    val nearDupDrops = out.filter(_._2._2.contains("near_dup")).keySet
    assert(nearDupDrops.nonEmpty && nearDupDrops.forall(i => !expectedKeep(i)))
    assert(out(1L)._2.isEmpty && out(1L)._1, "group keeper is the min id")
  }
}
