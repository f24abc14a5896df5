package graft

import graft.service.JobService
import org.scalatest.funsuite.AnyFunSuite

/** Multi-writer contention pin for the job queue (r8 verdict item 6):
  * the reference's v3 architecture is multi-writer (edge submitter +
  * runner), and JobService's idempotence claims were only ever exercised
  * single-threaded. Two REAL concurrent drainers race the same PENDING
  * backlog over one shared event log; the atomic per-(job, generation)
  * claim token must yield exactly one COMPLETED per job — repeated over
  * rounds with varying backlog sizes and a deterministic stagger so the
  * interleaving actually varies (both drainers released by a barrier).
  */
class JobsConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("two concurrent drainers: every job lands COMPLETED exactly once, " +
    "one claim token per job, no stray RUNNING tail") {
    import org.apache.spark.sql.functions.col
    val mdx = "SELECT {[Measures].[sum_qty]} ON COLUMNS FROM [Sales]"
    // Warm every codegen path the drainers hit (event-log append encoder,
    // readJobs window, result write) on the MAIN thread first: Janino's
    // first compile of the same generated classes from two threads at
    // once can spuriously fail to resolve a nested-class accessor (a
    // compile-cache race, nothing to do with the claim machine under
    // test), and a warm cache turns the contended compiles into hits.
    locally {
      val warmRoot = java.nio.file.Files
        .createTempDirectory("graft_jobs_conc_warm").toString
      val w = JobService.submit(spark, warmRoot, "SALES", mdx)
      JobService.runPending(spark, warmRoot, sf)
      assert(JobService.status(spark, warmRoot, w).get.status ==
        JobService.Completed)
    }
    // The rare residual: the JVM-wide codegen cache is small enough that
    // a parallel SUITE can evict a warmed entry mid-round, re-exposing
    // the Janino race. One retry per drainer keeps the spec about claim
    // semantics (drains are idempotent — a retried sweep re-reads the
    // same log, so every exactly-once assertion below still binds).
    def drainWithOneRetry(root: String): Unit =
      try JobService.runPending(spark, root, sf)
      catch { case e: Throwable
        if { var c: Throwable = e; var hit = false
             while (c != null && !hit) {
               hit = c.getClass.getName.contains("CompileException"); c = c.getCause }
             hit } =>
        JobService.runPending(spark, root, sf)
      }
    for (round <- 1 to 3) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_jobs_conc_$round").toString
      val ids = (1 to (1 + round)).map(_ =>
        JobService.submit(spark, root, "SALES", mdx))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CyclicBarrier(2)
      val threads = (1 to 2).map { t =>
        new Thread(() => {
          try {
            gate.await() // maximal contention: both hit the same backlog
            if (t == 2) Thread.sleep(round * 37L) // vary the interleaving
            drainWithOneRetry(root)
            // second sweep: anything the first pass lost to a tie must
            // already be terminal, so this must be a no-op
            drainWithOneRetry(root)
          } catch { case e: Throwable => errs.add(e) }
        }, s"drainer-$t")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      assert(errs.isEmpty, s"drainer threw (round $round): ${errs.peek()}")
      val events = spark.read.parquet(s"$root/job_events")
      ids.foreach { id =>
        assert(JobService.status(spark, root, id).get.status ==
          JobService.Completed, s"$id did not complete (round $round)")
        val completes = events.where(col("id") === id &&
          col("status") === JobService.Completed).count()
        assert(completes == 1,
          s"$id landed COMPLETED $completes times (round $round)")
        // the loser of a tie must not have appended a claim row: one
        // RUNNING per generation, and gen 1 is the only generation here
        val runnings = events.where(col("id") === id &&
          col("status") === JobService.Running).count()
        assert(runnings == 1,
          s"$id has $runnings RUNNING rows (round $round)")
        assert(JobService.result(spark, root, id).count() > 0)
      }
      val tokens = Option(new java.io.File(s"$root/claims").listFiles())
        .getOrElse(Array.empty[java.io.File]).map(_.getName).sorted
      assert(tokens.toSeq == ids.map(id => s"$id.gen-1").sorted,
        s"claim tokens drifted (round $round): ${tokens.toSeq}")
    }
  }
}
