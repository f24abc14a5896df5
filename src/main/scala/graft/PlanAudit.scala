package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "audit")
    val d = "/root/testdata/sf0.001"
    println(f"AUDIT ${"query"}%-28s exch cart bnlj smj bhj scans")
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
        println(f"AUDIT $name%-28s ${c("Exchange hashpartitioning")}%4d ${c("CartesianProduct")}%4d ${c("BroadcastNestedLoopJoin")}%4d ${c("SortMergeJoin")}%4d ${c("BroadcastHashJoin")}%4d ${c("FileScan")}%5d")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
      finally graft.ops.TransientCache.releaseAll()
    }
    spark.stop()
  }
}
