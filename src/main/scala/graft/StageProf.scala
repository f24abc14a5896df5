package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage profiler for registry queries — the measurement step of
  * the optimization rounds (guide §1: find WHERE the time goes before
  * changing anything). Runs each selected query twice (warm) and
  * prints, for the second run, every stage's wall time, executor-task
  * time, task count, and shuffle/input volumes, plus the top call-site
  * line from the stage's callsite so stages map back to operators.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROF_ONLY
  * (comma-separated name-substring filter; default = nothing, must be
  * set — profiling all 278 is not the use case).
  */
object StageProf {
  final case class St(name: String, wallMs: Long, taskMs: Long, tasks: Int,
                      shufReadMb: Double, shufWriteMb: Double, inputMb: Double,
                      site: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = sys.env.getOrElse("SPARK_GRAFT_PROF_ONLY", "").split(",").filter(_.nonEmpty).toSeq
    require(only.nonEmpty, "set SPARK_GRAFT_PROF_ONLY=q258,... (substring filter)")
    val spark = GraftSession.local(cpus, "graft-prof")

    val stages = mutable.ArrayBuffer.empty[St]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (!collecting) return
        val i = sc.stageInfo
        val wall = (for { s <- i.submissionTime; c <- i.completionTime } yield c - s).getOrElse(-1L)
        val m = i.taskMetrics
        stages += St(s"stage${i.stageId}", wall, m.executorRunTime, i.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6,
          i.details.linesIterator.filter(l =>
            l.contains("graft") && !l.contains("StageProf")).take(1).mkString.trim)
      }
    })

    val selected = SparkEntry.queries
      .filter { case (n, _) => only.exists(n.contains) }.toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.queries.Parity.outputDoubles(fn(spark, sfDir))
          .queryExecution.toRdd.count()
        val el = (System.nanoTime() - t0) / 1e9
        graft.ops.TransientCache.releaseAll()
        el
      }
      val cold = run()                 // pass 1: artifacts + JIT
      stages.clear(); collecting = true
      val warm = run()                 // pass 2: the measured pass
      collecting = false
      println(f"== $name cold=$cold%.2fs warm=$warm%.2fs stages=${stages.size}")
      val tot = stages.map(_.wallMs).sum
      println(f"   sum(stage wall)=${tot / 1e3}%.2fs (gaps to warm = driver/planning/barrier)")
      stages.sortBy(-_.wallMs).take(25).foreach { s =>
        println(f"   ${s.wallMs}%6dms wall ${s.taskMs}%7dms task ${s.tasks}%4d tasks " +
          f"in=${s.inputMb}%7.1fMB sr=${s.shufReadMb}%6.1fMB sw=${s.shufWriteMb}%6.1fMB  ${s.site}")
      }
    }
    spark.stop()
  }
}
