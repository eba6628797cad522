package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the candidate-distinct stage (guide §1/§2): rebuilds the
  * pipeline's 3-strategy key table over the sf docs, then times
  * candidatePairsPacked under config variations and prints the FINAL
  * (post-AQE) executed plan, so codegen/join-strategy hypotheses are
  * checked against what actually ran.
  */
object PairsProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = for { s <- si.submissionTime; e <- si.completionTime } yield (e - s) / 1000.0
        System.err.println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d wall=${wall.getOrElse(-1.0)}%6.2fs cpu=${m.executorRunTime / 1000.0}%7.2fs gc=${m.jvmGCTime / 1000.0}%5.2fs shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%7dKB")
      }
    })
    import graft.blocking.BlockingKeys

    val named = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("name", array_join(slice(split(col("text"), "\\s+"), 1, 12), " "))
      .withColumn("normalized",
        graft.norm.Normalizer.normalizeColumn(col("name"), Some(graft.norm.Normalizer.COMPANY)))
      .select(col("doc_id").cast("long").as("doc_id"), col("normalized"))
    val reps = named.groupBy("normalized").agg(min("doc_id").as("doc_id"))
    val keySource = reps.select(col("doc_id"), col("normalized"))
    val keyTables = Seq(
      BlockingKeys.explodeKeys(keySource, "doc_id", BlockingKeys.defaultKeys(col("normalized"))),
      keySource.select(BlockingKeys.sortedNeighborhoodKey(col("normalized")).as("block_key"), col("doc_id"))
        .where(col("block_key").isNotNull),
      BlockingKeys.minhashKeyTable(keySource, "doc_id", col("normalized")))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // variant 1: columnar-cached keys (the pipeline's shape)
    val keysCached = keyTables.reduce(_ union _).persist()
    time("keys.persist.count")(keysCached.count())
    val d1 = graft.pairs.CandidateGenerator.candidatePairsPacked(keysCached, 1000)
    (1 to 3).foreach(i => time(s"packed.distinct.count cached rep$i")(d1.count()))
    System.err.println("[probe] final plan (cached):\n" +
      d1.queryExecution.executedPlan.toString.linesIterator.take(28).mkString("\n"))
    keysCached.unpersist()

    // variant 2: localCheckpointed keys
    val keysCk = keyTables.reduce(_ union _).localCheckpoint(true)
    val d2 = graft.pairs.CandidateGenerator.candidatePairsPacked(keysCk, 1000)
    (1 to 3).foreach(i => time(s"packed.distinct.count localckpt rep$i")(d2.count()))

    // variant 3: cached keys, whole-stage codegen OFF (hypothesis check)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val keysC3 = keyTables.reduce(_ union _).persist()
    keysC3.count()
    val d3 = graft.pairs.CandidateGenerator.candidatePairsPacked(keysC3, 1000)
    (1 to 2).foreach(i => time(s"packed.distinct.count codegenOFF rep$i")(d3.count()))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    keysC3.unpersist()


    // decomposition: raw join emit vs distinct agg
    val keysD = keyTables.reduce(_ union _).localCheckpoint(true)
    val sized = keysD.groupBy("block_key").agg(count(lit(1)).as("block_n"))
    val small = keysD.join(sized.where(col("block_n") <= 1000).select("block_key"), Seq("block_key"))
    val l = small.select(col("block_key"), col("doc_id").as("doc_id_a"))
    val r = small.select(col("block_key"), col("doc_id").as("doc_id_b"))
    val rawJ = l.join(r, Seq("block_key")).where(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b")
    (1 to 3).foreach(i => time(s"raw.join.count rep$i")(rawJ.count()))
    val rawPk = rawJ.select(org.apache.spark.sql.functions.shiftleft(col("doc_id_a"), 31)
      .bitwiseOR(col("doc_id_b")).as("pk"))
    val rawMat = rawPk.localCheckpoint(true)
    (1 to 3).foreach(i => time(s"distinct.only.count rep$i")(rawMat.distinct().count()))
    System.err.println(s"[probe] raw pair rows: ${rawMat.count()}")


    // coalesce experiments: union of 3 strategies = 3x upstream partitions
    for (parts <- Seq(32, 8)) {
      val kc = keyTables.reduce(_ union _).coalesce(parts).persist()
      time(s"keys.coalesce$parts.count")(kc.count())
      val dd = graft.pairs.CandidateGenerator.candidatePairsPacked(kc, 1000, hintBroadcast = true)
      (1 to 3).foreach(i => time(s"packed.coalesce$parts rep$i")(dd.count()))
      kc.unpersist()
    }
    // hint without coalesce for comparison
    val kh2 = keyTables.reduce(_ union _).persist()
    kh2.count()
    val dh = graft.pairs.CandidateGenerator.candidatePairsPacked(kh2, 1000, hintBroadcast = true)
    (1 to 3).foreach(i => time(s"packed.hint96 rep$i")(dh.count()))
    kh2.unpersist()
    // bisection on the REAL key table
    val kD = keyTables.reduce(_ union _).localCheckpoint(true)
    System.err.println(s"[probe] distinct keys: ${kD.select("block_key").distinct().count()}")
    val lA = kD.select(col("block_key"), col("doc_id").as("a"))
    val rA = kD.select(col("block_key"), col("doc_id").as("b"))
    val noCap = lA.join(rA, Seq("block_key")).where(col("a") < col("b"))
    (1 to 2).foreach(i => time(s"A.noCap.join.count rep$i")(noCap.count()))
    val kH = kD.select(xxhash64(col("block_key")).as("bk"), col("doc_id")).localCheckpoint(true)
    val lH = kH.select(col("bk"), col("doc_id").as("a"))
    val rH = kH.select(col("bk"), col("doc_id").as("b"))
    (1 to 2).foreach(i => time(s"B.hashedKey.join.count rep$i")(
      lH.join(rH, Seq("bk")).where(col("a") < col("b")).count()))
    (1 to 2).foreach(i => time(s"C.shuffleHash.join.count rep$i")(
      lA.hint("SHUFFLE_HASH").join(rA, Seq("block_key")).where(col("a") < col("b")).count()))
    (1 to 2).foreach(i => time(s"D.merge.join.count rep$i")(
      lA.hint("MERGE").join(rA, Seq("block_key")).where(col("a") < col("b")).count()))
    // raw pair volume for context
    val raw = keysCached // reuse plan shape without cache
    System.err.println(s"[probe] key rows: ${keyTables.reduce(_ union _).count()}")
    spark.stop()
    if (raw == null) ()
  }
}
