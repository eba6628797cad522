package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Extension wiring: its OWN SparkSession (extensions attach at session
  * build; the shared test session stays extension-free to prove the
  * library also works without them). The underlying SparkContext is
  * shared — only the session is new — and the shared session is restored
  * as default/active afterwards.
  */
class GraftExtensionsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val shared = graft.SparkTestSession.spark // ensure the shared SC exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf (bound at SparkContext
    // creation) — with a shared context the programmatic form applies;
    // spark-submit deployments use
    //   --conf spark.sql.extensions=graft.plans.GraftExtensions
    val s = SparkSession.builder()
      .master(shared.sparkContext.master)
      .appName("graft-ext-tests")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = {
    SparkSession.setDefaultSession(graft.SparkTestSession.spark)
    SparkSession.setActiveSession(graft.SparkTestSession.spark)
  }

  test("injected SQL functions resolve and compute") {
    val r = spark.sql(
      """SELECT lev_sim('kitten', 'sitting') AS lev,
        |       jaro_winkler('MARTHA', 'MARHTA') AS jw,
        |       token_jaccard('a b c', 'a b d') AS jac,
        |       size(minhash_band_keys('hello world')) AS bands""".stripMargin)
      .collect()(0)
    assert(math.abs(r.getDouble(0) - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.9611111111111111) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    assert(r.getInt(3) == graft.blocking.BlockingKeys.Bands)
  }

  test("lev_sim length-bound prefilter: injected, idempotent, result-identical") {
    import spark.implicits._
    // a real (parquet) source — a local relation this small would be
    // fully evaluated away by ConvertToLocalRelation before the rule
    // could be observed
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString
    Seq(
      ("acme corporation", "acme corporatiom"),   // near-identical
      ("acme", "acme corporation international"), // hopeless length gap
      ("globex", "globex")
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("ext_pairs")
    val q = spark.sql("SELECT a, b FROM ext_pairs WHERE lev_sim(a, b) >= 0.9")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("(1.0 -"), s"prefilter bound missing from plan:\n$plan")
    // the bound appears exactly once (rule is idempotent across passes)
    assert(plan.sliding("(1.0 -".length).count(_ == "(1.0 -") == 1, plan)
    val rows = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("acme corporation", "acme corporatiom"), ("globex", "globex")))
  }

  test("prefilter does not fire for non-literal thresholds or other comparisons") {
    import spark.implicits._
    Seq(("x", "y", 0.5)).toDF("a", "b", "t").createOrReplaceTempView("ext_pairs2")
    val p = spark.sql("SELECT * FROM ext_pairs2 WHERE lev_sim(a, b) >= t")
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("(1.0 -"), s"rule must not fire on non-literal threshold:\n$p")
  }
}
