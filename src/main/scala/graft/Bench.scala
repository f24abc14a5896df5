package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, "graft-bench")
    // Warm the JVM/codegen/parquet paths and materialize the member-
    // catalog session cache so the first measured query is not charged
    // the one-time JIT + catalog-derivation cost.
    try {
      SparkEntry.entry(spark).count()
      graft.model.MemberCatalog.members(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // Honest full-plan materialization: `.count()` would let Catalyst prune
    // aggregates/projections for some plans; counting the physical plan's
    // InternalRow RDD executes every operator as written. n>=2 iterations
    // make first-run JIT/codegen noise visible; headline = warmed run.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // Optional comma-separated substring filter for iterating on a hot
    // query without paying the full suite (dev-only; the driver ignores it).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(pats) => SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }
      case None => SparkEntry.queries
    }
    // A thrown query must never masquerade as a timing (round-5 verdict
    // item 3: two analysis-time crashes looked like 15x speedups). Failed
    // names are tracked per pass, reported in BENCH_SUMMARY, and excluded
    // from every total.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def runPass(cold: Boolean): Map[String, Double] =
      selected.flatMap { case (name, fn) =>
        if (cold) {
          // Cold = no cross-query amortization: evict the session-shared
          // artifacts (signature tables, kNN graph, PQ model, member
          // catalog) AND their CacheManager entries, so each query pays
          // its own full build. Measures the "built once per session"
          // claim instead of asserting it.
          graft.ops.SessionCache.clear(spark)
          spark.catalog.clearCache()
        }
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += name
            false
          }
          finally graft.ops.TransientCache.releaseAll()
        if (ok) Some(name -> (System.nanoTime() - t0) / 1e9) else None
      }
    // SPARK_GRAFT_BENCH_COLD=1 -> cold-only (dev loop); default runs the
    // warm iterations first (headline, comparable across rounds) and then
    // ONE cold pass so both numbers land in every round's output.
    val coldOnly = sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    val perIter = if (coldOnly) Seq.empty else (1 to iters).map(_ => runPass(cold = false))
    val cold = runPass(cold = true)
    val warmed = if (coldOnly) cold else perIter.last
    def r3(v: Double): String = f"$v%.3f"
    val qs = warmed.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (warmed.nonEmpty) warmed.values.sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    val iterTotals = (perIter.map(_.values.sum) :+ coldTotal).map(r3).mkString("[", ",", "]")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Summary FIRST (human/tail-grep), full metric JSON as the LAST stdout
    // line — round-5's BENCH had "parsed": null in the driver artifact, so
    // keep the machine-readable line last, pure JSON, and 3-decimal-compact.
    val slowest = warmed.toSeq.sortBy(-_._2).take(20)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    println(s"""BENCH_SUMMARY {"total":${r3(total)},"cold_total":${r3(coldTotal)},"n_queries":${warmed.size},"failed":$failedJson,"slowest20":$slowest}""")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"iteration_totals":$iterTotals,"cold_total":${r3(coldTotal)},"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
