package graft

object PlanAudit {

  /** Per-query physical-plan census over the EXECUTED plan (AQE final).
    * wscg = distinct WholeStageCodegen spans; noncg = physical-operator
    * lines running outside every span — the row-based residue. Pure
    * wrapper nodes (InputAdapter, ReusedExchange, AQEShuffleRead, …) are
    * excluded from noncg (r8 advice item 4): they are plumbing that
    * appears/disappears with plan shape, not operators leaving codegen,
    * and counting them blurred the round-over-round drift signal. */
  final case class Census(exch: Int, cart: Int, bnlj: Int, smj: Int,
                          bhj: Int, scans: Int, wscg: Int, noncg: Int)

  /** Nodes that never execute row-processing work of their own: pipe
    * fittings between spans, AQE rewrites, and reuse markers. */
  private val wrapperNodes = Set(
    "InputAdapter", "ReusedExchange", "ReusedSubquery", "AQEShuffleRead",
    "ShuffleQueryStage", "BroadcastQueryStage", "TableCacheQueryStage",
    "ResultQueryStage", "AdaptiveSparkPlan", "Subquery", "SubqueryBroadcast",
    "ColumnarToRow", "RowToColumnar", "WholeStageCodegen")

  def census(qe: org.apache.spark.sql.execution.QueryExecution): Census = {
    // Materialize first: with AQE the pre-execution plan still shows
    // estimate-based joins (e.g. SMJ) that the runtime re-plans to
    // broadcast — the census must reflect the plan that actually ran.
    qe.toRdd.count()
    // AdaptiveSparkPlan.toString prints the final plan followed by the
    // initial (estimate-based) one — census only what actually ran.
    val p = qe.executedPlan.toString.split("== Initial Plan ==").head
    def c(s: String) = p.sliding(s.length).count(_ == s)
    val wscg = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
    val opLine = "^[\\s:+*-]*([A-Z][A-Za-z]+)".r
    val nonCg = p.linesIterator.count { l =>
      opLine.findFirstMatchIn(l) match {
        case Some(m) =>
          !l.contains("*(") && !l.contains("== ") &&
            !wrapperNodes.contains(m.group(1))
        case None => false
      }
    }
    Census(c("Exchange hashpartitioning"), c("CartesianProduct"),
      c("BroadcastNestedLoopJoin"), c("SortMergeJoin"),
      c("BroadcastHashJoin"), c("FileScan"), wscg, nonCg)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "audit")
    val d = "/root/testdata/sf0.001"
    println(f"AUDIT ${"query"}%-28s exch cart bnlj smj bhj scans wscg noncg")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val cs = census(fn(spark, d).queryExecution)
        println(f"AUDIT $name%-28s ${cs.exch}%4d ${cs.cart}%4d ${cs.bnlj}%4d ${cs.smj}%4d ${cs.bhj}%4d ${cs.scans}%5d ${cs.wscg}%4d ${cs.noncg}%5d")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
      finally graft.ops.TransientCache.releaseAll()
    }
    spark.stop()
  }
}
