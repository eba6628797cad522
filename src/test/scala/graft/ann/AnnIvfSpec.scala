package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AnnIvfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 6 well-separated cluster centers in 8-dim; 40 deterministic
    * perturbed members each.
    */
  private lazy val vectors = {
    val rng = new scala.util.Random(0x1f2e3d)
    val centers = (0 until 6).map(c => Array.tabulate(8)(d =>
      if (d == c) 10.0f else if (d == c + 1) 4.0f else 0.0f))
    (0 until 240).map { i =>
      val c = i % 6
      val v = centers(c).clone()
      for (d <- v.indices) v(d) += (rng.nextFloat() - 0.5f)
      (i.toLong, v.toSeq)
    }
  }

  private lazy val df = vectors.toDF("vec_id", "embedding")

  test("ivfTrain: k deterministic-seeded centroids, cells partition the data") {
    val centroids = Ann.ivfTrain(df, k = 6, iters = 2)
    assert(centroids.size == 6)
    assert(centroids.forall(_.size == 8))
    // after 2 Lloyd rounds the 6 centroids should sit near distinct centers
    val dominantDims = centroids.map(_.zipWithIndex.maxBy(_._1)._2).toSet
    assert(dominantDims.size >= 5, s"centroids collapsed: $dominantDims")
  }

  test("ivfTopK recall@5 >= 0.9 vs brute force at nProbe=2") {
    val queries = df.where($"vec_id" % 40 === 0) // one per cluster
    val centroids = Ann.ivfTrain(df, k = 6, iters = 2)
    val ivf = Ann.ivfTopK(df, queries, centroids, k = 5, nProbe = 2)
      .select("query_id", "item_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Ann.bruteForceTopK(df, queries, k = 5)
      .select("query_id", "item_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, f"mean recall@5 $mean%.2f < 0.9")
  }

  test("persisted IVF index: bit-identical to in-memory ivfTopK; probed cells prune the scan (DPP)") {
    val path = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    val centroids = Ann.ivfTrain(df, k = 6, iters = 2)
    Ann.ivfWriteIndex(df, centroids, path)
    assert(Ann.ivfReadCentroids(spark, path) == centroids) // round-trip exact
    val queries = df.where($"vec_id" % 40 === 0)
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().sorted
    val direct = rows(Ann.ivfTopK(df, queries, centroids, k = 5, nProbe = 2))
    val indexed = Ann.ivfTopKFromIndex(spark, path, queries, k = 5, nProbe = 2)
    assert(rows(indexed).sameElements(direct))
    // plan gate: the partitioned item scan must carry a static cell
    // partition filter — the index read is O(probed cells), not O(index)
    val plan = indexed.queryExecution.executedPlan.toString.toLowerCase
    val pf = plan.indexOf("partitionfilters: [")
    assert(pf >= 0, plan.take(1500))
    val filters = plan.slice(pf, plan.indexOf("]", pf))
    assert(filters.contains("cell#") && filters.contains(" in ("), filters)
  }

  test("ivfAppend: frozen-centroid ingest == retrain-free index over the union") {
    val path = java.nio.file.Files.createTempDirectory("ivf-app").toString
    // train on the first 200 vectors, append the remaining 40 later —
    // the standard lifecycle: quantizer frozen, ingest is assign+append
    val initial = df.where($"vec_id" < 200)
    val batch = df.where($"vec_id" >= 200)
    val centroids = Ann.ivfTrain(initial, k = 6, iters = 2)
    Ann.ivfWriteIndex(initial, centroids, path)
    Ann.ivfAppend(batch, path)
    val queries = df.where($"vec_id" % 40 === 0)
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().sorted
    // identical to serving an index built over the union with the SAME
    // frozen centroids — appended vectors are fully searchable
    val expected = rows(Ann.ivfTopK(df, queries, centroids, k = 5, nProbe = 2))
    val served = rows(Ann.ivfTopKFromIndex(spark, path, queries, k = 5, nProbe = 2))
    assert(served.sameElements(expected))
    assert(served.exists(_._2 >= 200), "appended vectors must be retrievable")
  }
}
