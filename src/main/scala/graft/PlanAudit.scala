package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "audit")
    val d = "/root/testdata/sf0.001"
    println(f"AUDIT ${"query"}%-28s exch cart bnlj smj bhj scans wscg noncg")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // Materialize first: with AQE the pre-execution plan still shows
        // estimate-based joins (e.g. SMJ) that the runtime re-plans to
        // broadcast — the census must reflect the plan that actually ran.
        val qe = fn(spark, d).queryExecution
        qe.toRdd.count()
        // AdaptiveSparkPlan.toString prints the final plan followed by the
        // initial (estimate-based) one — census only what actually ran.
        val p = qe.executedPlan.toString.split("== Initial Plan ==").head
        def c(s: String) = p.sliding(s.length).count(_ == s)
        // Codegen census (the "widen WholeStageCodegen spans" rule made
        // measurable): wscg = fused spans; noncg = physical operator
        // lines running OUTSIDE any span (no "*(id)" marker) — the
        // row-based residue (exchanges, cached scans, object
        // operators). A hot-path operator drifting out of codegen
        // shows up here as noncg growth round over round.
        // spans print as "*(id)" operator prefixes in the final plan
        val wscg = "\\*\\((\\d+)\\)".r.findAllMatchIn(p)
          .map(_.group(1)).toSet.size
        val opLine = "^[\\s:+*-]*[A-Z][A-Za-z]+".r
        val nonCg = p.linesIterator.count { l =>
          opLine.findFirstIn(l).isDefined && !l.contains("*(") &&
            !l.contains("WholeStageCodegen") && !l.contains("== ")
        }
        println(f"AUDIT $name%-28s ${c("Exchange hashpartitioning")}%4d ${c("CartesianProduct")}%4d ${c("BroadcastNestedLoopJoin")}%4d ${c("SortMergeJoin")}%4d ${c("BroadcastHashJoin")}%4d ${c("FileScan")}%5d $wscg%4d $nonCg%5d")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
      finally graft.ops.TransientCache.releaseAll()
    }
    spark.stop()
  }
}
