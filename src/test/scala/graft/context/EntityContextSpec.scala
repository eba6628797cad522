package graft.context

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkTestSession

/** EntityContext/EntitySubgraph batch export (api/EntityResolver.java:
  * 454-530): per-entity bundles and min-hop BFS subgraphs.
  */
class EntityContextSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val entities = Seq((1L, "acme"), (2L, "globex"), (3L, "initech"))
    .toDF("entity_id", "value")
  private lazy val synonyms = Seq(
    (1L, "acme corp", 3L, 0.9), (1L, "acme", 5L, 0.95), (2L, "globex", 2L, 0.8))
    .toDF("entity_id", "normalized", "support_count", "confidence")
  private lazy val rels = Seq(
    ("r1", 1L, 2L, "PARTNER"), ("r2", 2L, 3L, "SUPPLIER"), ("r3", 3L, 4L, "PARTNER"))
    .toDF("rel_id", "src", "dst", "rel_type")
  private lazy val decisions = Seq(
    (1L, 2L, 0.7, "REVIEW"), (2L, 3L, 0.95, "AUTO_MERGE"))
    .toDF("doc_id_a", "doc_id_b", "score", "decision")
  private lazy val merges = Seq((1L, 9L, 0.93, 9L))
    .toDF("entity_id", "merged_from", "confidence", "merged_seq")

  test("contextSummary: per-entity scalar bundle") {
    val out = EntityContext.contextSummary(entities, synonyms, rels, decisions, merges)
      .collect().map(r => r.getLong(0) -> r).toMap
    val e1 = out(1L)
    assert(e1.getAs[Long]("n_synonyms") == 2)
    assert(e1.getAs[Long]("synonym_support") == 8)
    assert(e1.getAs[String]("first_synonym") == "acme")
    assert(e1.getAs[Long]("n_rels") == 1)
    assert(e1.getAs[Long]("n_decisions") == 1)
    assert(e1.getAs[Long]("n_merged_from") == 1)
    assert(e1.getAs[Long]("last_merge_seq") == 9L)
    val e3 = out(3L)
    assert(e3.getAs[Long]("n_synonyms") == 0)
    assert(e3.getAs[Long]("n_rels") == 2) // r2 incoming + r3 outgoing
    assert(e3.isNullAt(e3.fieldIndex("last_merge_seq")))
  }

  test("contextStructs: nested arrays present and sorted") {
    val row = EntityContext.contextStructs(entities, synonyms, rels, decisions, merges)
      .where(col("entity_id") === 1L).collect()(0)
    val syn = row.getAs[scala.collection.Seq[Row]]("synonyms").map(_.getString(0)).toSeq
    assert(syn == Seq("acme", "acme corp")) // sort_array => deterministic
    assert(row.getAs[scala.collection.Seq[Row]]("relationships")
      .map(_.getString(0)).toSeq == Seq("r1"))
    assert(row.getAs[scala.collection.Seq[Row]]("merge_history")
      .map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("subgraphNodes: min-hop BFS with depth clamp") {
    // line graph 1-2-3-4, seed 1, depth 2 -> {1:0, 2:1, 3:2}; 4 unreached
    val line = Seq(("r1", 1L, 2L, "X"), ("r2", 2L, 3L, "X"), ("r3", 3L, 4L, "X"))
      .toDF("rel_id", "src", "dst", "rel_type")
    val seeds = Seq(1L).toDF("entity_id")
    val nodes = EntityContext.subgraphNodes(line.select("src", "dst"), seeds, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(nodes == Map(1L -> 0, 2L -> 1, 3L -> 2))

    // depth 0 clamps to 1 like the reference (Math.max(1, ...))
    val d1 = EntityContext.subgraphNodes(line.select("src", "dst"), seeds, 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d1 == Map(1L -> 0, 2L -> 1))
  }

  test("subgraphEdges: relationships touched by layers below the horizon") {
    val line = Seq(("r1", 1L, 2L, "X"), ("r2", 2L, 3L, "X"), ("r3", 3L, 4L, "X"))
      .toDF("rel_id", "src", "dst", "rel_type")
    val seeds = Seq(1L).toDF("entity_id")
    val nodes = EntityContext.subgraphNodes(line.select("src", "dst"), seeds, 2)
    val edges = EntityContext.subgraphEdges(line, nodes, 2)
      .select("rel_id").as[String].collect().toSet
    assert(edges == Set("r1", "r2")) // r3 only touches depth-2 nodes
  }
}
