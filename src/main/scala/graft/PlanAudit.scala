package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "audit")
    val d = "/root/testdata/sf0.001"
    println(f"AUDIT ${"query"}%-28s exch cart bnlj smj bhj scans")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        def c(s: String) = p.sliding(s.length).count(_ == s)
        println(f"AUDIT $name%-28s ${c("Exchange hashpartitioning")}%4d ${c("CartesianProduct")}%4d ${c("BroadcastNestedLoopJoin")}%4d ${c("SortMergeJoin")}%4d ${c("BroadcastHashJoin")}%4d ${c("FileScan")}%5d")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
