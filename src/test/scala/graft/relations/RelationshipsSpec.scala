package graft.relations

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class RelationshipsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rels = Seq(
    ("r1", "a", "b", "PARTNER", 1L, "u"),
    ("r2", "a", "c", "PARTNER", 2L, "u"),
    ("r3", "b", "a", "SUPPLIER", 3L, "u"),
  ).toDF("rel_id", "src", "dst", "rel_type", "created_seq", "created_by")

  test("lookups: by source / target / either / between") {
    assert(Relationships.bySource(rels, lit("a")).count() == 2)
    assert(Relationships.byTarget(rels, lit("a")).count() == 1)
    assert(Relationships.byEither(rels, lit("a")).count() == 3)
    assert(Relationships.between(rels, lit("b"), lit("a"))
      .select("rel_id").as[String].collect().toSeq == Seq("r3"))
  }

  test("countsPerEntity: per-direction counts per type") {
    val c = Relationships.countsPerEntity(rels).collect()
      .map(r => (r.getAs[String]("entity_id"), r.getAs[String]("rel_type")) ->
        (r.getAs[Long]("outgoing"), r.getAs[Long]("incoming"), r.getAs[Long]("total"))).toMap
    assert(c(("a", "PARTNER")) == ((2L, 0L, 2L)))
    assert(c(("a", "SUPPLIER")) == ((0L, 1L, 1L)))
    assert(c(("b", "PARTNER")) == ((0L, 1L, 1L)))
    assert(c(("b", "SUPPLIER")) == ((1L, 0L, 1L)))
    assert(c(("c", "PARTNER")) == ((0L, 1L, 1L)))
  }

  test("migrate: endpoints remapped through cluster map, self-loops dropped") {
    val cm = Seq(("a", "A"), ("b", "A"), ("c", "C")).toDF("doc_id", "cluster_id")
    val out = Relationships.migrate(rels, cm)
      .select("rel_id", "src", "dst").as[(String, String, String)].collect().toSet
    // r1 a->b becomes A->A: dropped; r3 b->a becomes A->A: dropped
    assert(out == Set(("r2", "A", "C")))
  }
}
