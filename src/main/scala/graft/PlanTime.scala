package graft

/** Driver planning-latency probe (dev tool; r13 measurement for the
  * "attack driver planning latency" item). Per query, times (a)
  * DataFrame CONSTRUCTION (operator-tree building plus any driver-side
  * artifact work in the builder) and (b) `executedPlan`
  * materialization (analysis + cache substitution + optimization +
  * physical planning — AQE's runtime re-plan excluded since nothing
  * executes). Two passes per query; the second is quoted (first-pass
  * analysis of the session artifacts is a one-time cost that warm
  * bench passes never pay either). Prints per-query ms and suite
  * totals — the measured share of the bench wall that never touches
  * an executor.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PLANTIME_ONLY
  * (optional substring filter).
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = sys.env.get("SPARK_GRAFT_PLANTIME_ONLY").map(_.split(",").toSeq)
    val spark = GraftSession.local(cpus, "graft-plantime")
    val selected = (only match {
      case Some(pats) => SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    final case class T(build: Double, plan: Double)
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): T = {
      val t0 = System.nanoTime()
      val df = graft.queries.Parity.outputDoubles(fn(spark, sfDir))
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      graft.ops.TransientCache.releaseAll()
      T((t1 - t0) / 1e6, (t2 - t1) / 1e6)
    }
    val rows = selected.map { case (name, fn) =>
      try {
        once(fn) // pass 1: JIT + artifact builders + first analysis
        val t = once(fn) // pass 2: the steady-state planning cost
        (name, t)
      } catch {
        case e: Throwable =>
          System.err.println(s"[plantime] $name FAILED: ${e.getMessage}")
          (name, T(-1, -1))
      }
    }
    val ok = rows.filter(_._2.build >= 0)
    ok.sortBy(r => -(r._2.build + r._2.plan)).take(30).foreach { case (n, t) =>
      println(f"PLANTIME $n%-32s build=${t.build}%8.1fms plan=${t.plan}%8.1fms")
    }
    println(f"PLANTIME_TOTAL n=${ok.size} build_s=${ok.map(_._2.build).sum / 1e3}%.2f plan_s=${ok.map(_._2.plan).sum / 1e3}%.2f")
    spark.stop()
  }
}
