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
    // item 3: two analysis-time crashes looked like 15x speedups).
    // Failures are tracked PER PASS (r6 advice: a query that throws in
    // an early warm iteration but recovers by the reported pass must not
    // contaminate the reported pass's failed list, and a cold-only
    // failure must be distinguishable from a warm one), reported in
    // BENCH_SUMMARY, and excluded from every total.
    final case class Pass(times: Map[String, Double], failed: Seq[String], artifacts: Map[String, Double])
    def runPass(cold: Boolean): Pass = {
      val failed = scala.collection.mutable.LinkedHashSet.empty[String]
      graft.ops.SessionCache.drainBuildLog(spark) // attribute builds to this pass only
      val times = selected.flatMap { case (name, fn) =>
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
        // Same Parity.outputDoubles wrap as Verify.dumpAll so the benched
        // plan is the verified plan (the cast is a final projection; cost
        // is noise-level).
        val ok =
          try { graft.queries.Parity.outputDoubles(fn(spark, sfDir))
            .queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += name
            false
          }
          finally graft.ops.TransientCache.releaseAll()
        if (ok) Some(name -> (System.nanoTime() - t0) / 1e9) else None
      }
      Pass(times.toMap, failed.toSeq, graft.ops.SessionCache.drainBuildLog(spark))
    }
    // SPARK_GRAFT_BENCH_COLD=1 -> cold-only (dev loop); default runs the
    // warm iterations first (headline, comparable across rounds) and then
    // ONE cold pass so both numbers land in every round's output.
    val coldOnly = sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    val perIter = if (coldOnly) Seq.empty else (1 to iters).map(_ => runPass(cold = false))
    val cold = runPass(cold = true)
    val warmed = if (coldOnly) cold else perIter.last
    def r3(v: Double): String = f"$v%.3f"
    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    def jarr(xs: Iterable[String]): String = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (warmed.times.nonEmpty) warmed.times.values.sum else 0.0
    val coldTotal = if (cold.times.nonEmpty) cold.times.values.sum else 0.0
    val iterTotals = (perIter.map(_.times.values.sum) :+ coldTotal).map(r3).mkString("[", ",", "]")
    // Artifact builds are charged to whichever query misses first, so the
    // warm total decomposes as: query work + artifact_build_s (the builds
    // the reported pass paid; on a fully-warmed pass this is ~0 because
    // iteration 1 already built everything). first_pass_artifact_build_s
    // is the real once-per-session amortized cost.
    val firstPassArtifacts = perIter.headOption.map(_.artifacts.values.sum).getOrElse(0.0)
    val slowest = warmed.times.toSeq.sortBy(-_._2).take(20)
    // Full machine-readable dump -> file (137-entry stdout lines were the
    // likely cause of two rounds of "parsed": null in the driver
    // artifact); stdout keeps only a compact line.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_JSON", "bench.json")
    val full =
      s"""{"sf":"$sfDir","total":${r3(total)},"cold_total":${r3(coldTotal)},"n_queries":${warmed.times.size},
         |"iteration_totals":$iterTotals,
         |"failed_warm":${jarr(warmed.failed)},"failed_cold":${jarr(cold.failed)},
         |"artifact_build_s":${r3(warmed.artifacts.values.sum)},
         |"first_pass_artifact_build_s":${r3(firstPassArtifacts)},
         |"artifacts_first_pass":${jmap(perIter.headOption.map(_.artifacts).getOrElse(cold.artifacts))},
         |"artifacts_cold":${jmap(cold.artifacts)},
         |"queries":${jmap(warmed.times)},
         |"queries_cold":${jmap(cold.times)}}""".stripMargin
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath), full.getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    println(s"""BENCH_SUMMARY {"total":${r3(total)},"cold_total":${r3(coldTotal)},"n_queries":${warmed.times.size},"failed_warm":${jarr(warmed.failed)},"failed_cold":${jarr(cold.failed)},"artifact_build_s":${r3(warmed.artifacts.values.sum)},"first_pass_artifact_build_s":${r3(firstPassArtifacts)},"full_json":"$outPath"}""")
    // Machine-readable line LAST, pure JSON, and SMALL: totals + the 20
    // slowest warm queries only (the full per-query map lives in the
    // file above). "failed" keeps the legacy union meaning for the
    // driver; per-pass splits are in BENCH_SUMMARY and the file.
    val failedUnion = (warmed.failed ++ cold.failed).distinct
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(slowest)},"n_queries":${warmed.times.size},"cold_total":${r3(coldTotal)},"artifact_build_s":${r3(warmed.artifacts.values.sum)},"first_pass_artifact_build_s":${r3(firstPassArtifacts)},"failed":${jarr(failedUnion)},"full_json":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
