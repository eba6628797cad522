package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.blocking.BlockingKeys

class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "entirely different content about spark engines"),
    (4L, "entirely different content about spark engines"), // exact dup of 3
    (5L, "zzz qqq xxx"),
  ).toDF("doc_id", "text")

  test("ngramJaccardPairs: full recall — matches brute-force shingle Jaccard") {
    val found = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    // brute force over all pairs
    val sh = docs.withColumn("s", BlockingKeys.shingles(col("text")))
    val l = sh.select(col("doc_id").as("a"), col("text").as("ta"), col("s").as("sa"))
    val r = sh.select(col("doc_id").as("b"), col("text").as("tb"), col("s").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val brute = l.join(r, col("a") < col("b"))
      .withColumn("j", when(col("ta") === col("tb"), lit(1.0))
        .otherwise(inter / ((size(col("sa")) + size(col("sb"))).cast("double") - inter)))
      .where(col("j") >= 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(found == brute)
    assert(found.contains((1L, 2L)) && found.contains((3L, 4L)))
  }

  test("simhashNearDups: exact dups at hamming 0; block cap drops hot bands") {
    val found = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_id_a", "doc_id_b", "hamming").as[(Long, Long, Int)].collect()
    val exact = found.filter(t => t._1 == 3L && t._2 == 4L)
    assert(exact.length == 1 && exact(0)._3 == 0)
    // with an absurdly small cap every band bucket >1 is dropped
    val capped = Dedup.simhashNearDups(docs, "doc_id", "text",
      maxHamming = 30, maxBlockSize = 1)
    assert(capped.count() == 0)
  }
}
