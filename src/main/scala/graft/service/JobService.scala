package graft.service

import graft.mdx.MdxLowerer
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Async job lifecycle mirroring the reference's jobs table
  * (`database/migrations/002_jobs_table.sql:5-14`: id, catalog_code,
  * mdx_query, status PENDING|RUNNING|COMPLETED|FAILED, result JSON,
  * error, created/updated timestamps) and its runner state machine
  * (`backend/db_runner.py:26-103`).
  *
  * Storage is a parquet job-state table (at scale: Delta + MERGE for the
  * status transitions; parquet overwrite keeps this environment
  * dependency-free — the transition protocol is identical). Result
  * payloads are written as per-job parquet (the JSONB analogue), keyed by
  * job id like the reference's request-id-keyed relay files.
  */
object JobService {

  final case class Job(
      id: String, catalog_code: String, mdx_query: String, status: String,
      error_message: String, duration_seconds: Double,
      created_at: java.sql.Timestamp, updated_at: java.sql.Timestamp)

  val Pending = "PENDING"; val Running = "RUNNING"
  val Completed = "COMPLETED"; val Failed = "FAILED"

  private def jobsPath(root: String) = s"$root/jobs"
  private def resultPath(root: String, id: String) = s"$root/results/$id"

  def readJobs(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    try spark.read.parquet(jobsPath(root))
    catch { case _: Throwable => Seq.empty[Job].toDF() }
  }

  /** Submit: append a PENDING row, return the job id (Q1). */
  def submit(spark: SparkSession, root: String, catalogCode: String,
             mdx: String): String = {
    import spark.implicits._
    val id = java.util.UUID.randomUUID().toString
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val row = Seq(Job(id, catalogCode, mdx, Pending, "", 0.0, now, now)).toDF()
    row.write.mode(SaveMode.Append).parquet(jobsPath(root))
    id
  }

  private def transition(spark: SparkSession, root: String, id: String,
                         status: String, error: String = "",
                         duration: Double = 0.0): Unit = {
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val updated = readJobs(spark, root)
      .withColumn("status", when(col("id") === id, lit(status)).otherwise(col("status")))
      .withColumn("error_message",
        when(col("id") === id, lit(error)).otherwise(col("error_message")))
      .withColumn("duration_seconds",
        when(col("id") === id, lit(duration)).otherwise(col("duration_seconds")))
      .withColumn("updated_at", when(col("id") === id, lit(now)).otherwise(col("updated_at")))
    val rows = updated.collect() // job table is driver-small by contract
    import spark.implicits._
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), updated.schema)
      .write.mode(SaveMode.Overwrite).parquet(jobsPath(root))
  }

  /** Poll (Q3): current status row for a job id. */
  def status(spark: SparkSession, root: String, id: String): Option[Job] = {
    import spark.implicits._
    readJobs(spark, root).where(col("id") === id).as[Job].collect().headOption
  }

  /** Runner loop body (Q2): claim PENDING jobs, execute the MDX, write the
    * result parquet, transition to COMPLETED/FAILED with duration. */
  def runPending(spark: SparkSession, root: String, sfDir: String): Int = {
    import spark.implicits._
    val pending = readJobs(spark, root).where(col("status") === Pending)
      .select("id", "mdx_query").as[(String, String)].collect()
    pending.foreach { case (id, mdx) =>
      transition(spark, root, id, Running)
      val t0 = System.nanoTime()
      try {
        MdxLowerer.run(spark, sfDir, mdx)
          .write.mode(SaveMode.Overwrite).parquet(resultPath(root, id))
        transition(spark, root, id, Completed,
          duration = (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Exception =>
          transition(spark, root, id, Failed,
            error = Option(e.getMessage).getOrElse(e.getClass.getName).take(500),
            duration = (System.nanoTime() - t0) / 1e9)
      }
    }
    pending.length
  }

  /** Completed-job result (the JSONB payload analogue). */
  def result(spark: SparkSession, root: String, id: String): DataFrame =
    spark.read.parquet(resultPath(root, id))
}
