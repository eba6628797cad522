package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries and
  * assert the plan properties the engine relies on at scale:
  * parquet filter pushdown, column pruning (ReadSchema), broadcast vs
  * shuffle join selection, and WholeStageCodegen coverage.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Er.register(spark)

    def planOf(name: String): String = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan.toString
    }

    var failures = 0
    def check(name: String, what: String)(ok: String => Boolean): Unit = {
      val p = planOf(name)
      val pass = ok(p)
      println(s"[plan] $name :: $what -> ${if (pass) "OK" else "FAIL"}")
      if (!pass) { failures += 1; println(p.linesIterator.take(40).mkString("\n")) }
    }

    // column pruning: normalization reads only doc_id+text, not all 5 cols
    check("q01_normalize", "ReadSchema pruned to doc_id,text") { p =>
      val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      rs.contains("doc_id") && rs.contains("text") && !rs.contains("n_chars")
    }
    // filter pushdown: validation status filter not applicable (projection),
    // but the synonym-lookup dict filter (doc_id % 10 = 0)'s base scan must
    // push IsNotNull and prune columns
    check("q10_synonym_lookup", "parquet scan prunes to doc_id,text") { p =>
      p.linesIterator.filter(_.contains("ReadSchema"))
        .forall(rs => !rs.contains("lang") && !rs.contains("source"))
    }
    // events filter pushdown: event_type = 'click' reaches the scan
    check("q36_event_setops", "PushedFilters carries event_type equality") { p =>
      p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]") ||
        p.contains("EqualTo(event_type,click)")
    }
    // whole-stage codegen: the scoring query's stages are codegen'd
    // (toString marks codegen stages with "*(n)")
    check("q05_pair_scores", "WholeStageCodegen present") { p =>
      p.contains("*(")
    }
    // broadcast: ANN brute force broadcasts the item side
    check("q25_ann_topk", "BroadcastHashJoin or BroadcastNestedLoopJoin") { p =>
      p.contains("Broadcast")
    }
    println(s"[plan] failures=$failures")
    if (failures > 0) sys.exit(1)
    spark.stop()
  }
}
