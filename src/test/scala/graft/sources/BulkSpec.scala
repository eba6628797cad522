package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BulkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("CSV import: header, quoted fields, rejects side output") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("in.csv")
    Files.writeString(f,
      "name,type\n\"Acme, Inc.\",COMPANY\nBeta Corp,COMPANY\n\"   \",COMPANY\n")
    val r = Bulk.importCsv(spark, f.toString)
    val names = r.rows.collect().map(_.getString(0)).toSet
    assert(names == Set("Acme, Inc.", "Beta Corp"))
    val rejects = r.rejects.collect()
    assert(rejects.length == 1)
    assert(rejects(0).getAs[String]("reject_reason") == "blank")
  }

  test("JSONL import") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("in.jsonl")
    Files.writeString(f, """{"name":"Gamma LLC"}""" + "\n" + """{"name":"Delta GmbH"}""" + "\n")
    val r = Bulk.importJsonl(spark, f.toString)
    assert(r.rows.collect().map(_.getAs[String]("name")).toSet == Set("Gamma LLC", "Delta GmbH"))
    assert(r.rejects.isEmpty)
  }

  test("intra-batch dedup is case-insensitive on the name key") {
    import spark.implicits._
    val df = Seq("Acme", "ACME", " acme ", "Other").toDF("name")
    assert(Bulk.dedupBatch(df, "name").count() == 2)
  }

  test("intra-batch dedup with orderCol keeps the FIRST occurrence, deterministically") {
    import spark.implicits._
    val df = Seq((3L, " acme "), (1L, "Acme"), (2L, "ACME"), (4L, "Other"))
      .toDF("seq", "name")
    val kept = Bulk.dedupBatch(df, "name", orderCol = Some("seq"))
      .select("seq", "name").as[(Long, String)].collect().sorted
    assert(kept.sameElements(Array((1L, "Acme"), (4L, "Other"))))
    // repartitioned input must keep the same rows (plan-independent)
    val kept2 = Bulk.dedupBatch(df.repartition(7), "name", orderCol = Some("seq"))
      .select("seq", "name").as[(Long, String)].collect().sorted
    assert(kept.sameElements(kept2))
  }

  test("intra-batch dedup: NULL names pass through, never grouped as duplicates") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, null: String), (3L, "x"), (4L, "X"))
      .toDF("seq", "name")
    // both window (orderCol) and dropDuplicates paths must keep BOTH
    // null rows: a null key is unknown content, not shared content
    val winKept = Bulk.dedupBatch(df, "name", orderCol = Some("seq"))
      .select("seq").as[Long].collect().sorted
    assert(winKept.sameElements(Array(1L, 2L, 3L)))
    assert(Bulk.dedupBatch(df, "name").count() == 3)
  }

  test("CSV export round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-export").resolve("out")
    val df = Seq(("a", 1L), ("b,c", 2L)).toDF("name", "n")
    Bulk.exportCsv(df, dir.toString)
    val back = spark.read.option("header", "true").csv(dir.toString)
    assert(back.count() == 2)
    assert(back.where(org.apache.spark.sql.functions.col("name") === "b,c").count() == 1)
  }

  test("parquet round-trip preserves nested spans; partitionBy prunes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pq").resolve("out")
    val df = Seq(
      ("d1", "en", Seq(graft.model.Span("text", "acme corp", "", 0),
        graft.model.Span("image", "", "media://img/1", 1))),
      ("d2", "fr", Seq(graft.model.Span("text", "globex", "", 0)))
    ).toDF("name", "lang", "spans")
    Bulk.exportParquet(df, dir.toString, partitionBy = Seq("lang"))
    val res = Bulk.importParquet(spark, dir.toString)
    assert(res.rejects.isEmpty)
    assert(res.rows.count() == 2)
    // nested spans byte-identical through the round trip
    val back = res.rows.where($"name" === "d1")
      .select("spans").as[Seq[graft.model.Span]].head()
    assert(back == Seq(graft.model.Span("text", "acme corp", "", 0),
      graft.model.Span("image", "", "media://img/1", 1)))
    // partition pruning reaches the scan
    val pruned = spark.read.parquet(dir.toString).where($"lang" === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$plan")
  }

  test("ORC round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").resolve("out")
    val df = Seq(("a", 1L), ("b", 2L)).toDF("name", "n")
    Bulk.exportOrc(df, dir.toString)
    val res = Bulk.importOrc(spark, dir.toString)
    assert(res.rows.count() == 2 && res.rejects.isEmpty)
  }
}
