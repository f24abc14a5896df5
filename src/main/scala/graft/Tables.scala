package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish star schema (TESTDATA.md).
  *
  * Every query entry receives an `sfDir` (e.g. `/root/testdata/sf0.01`);
  * tables are single parquet files `sfDir/<name>.parquet`. At cluster
  * scale these would be partitioned parquet/Delta directories — the
  * loaders are the single place that would change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  /** `events.parquet` stores TIMESTAMP(NANOS) which Spark has no native
    * type for; with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * every session builder) it reads as nanos-since-epoch LongType, which
    * we truncate to a microsecond TimestampType column. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Register every table as a temp view (DMV-style SQL surface, SURVEY §2.1 S2). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

/** Local SparkSession factory used by tests AND the Verify/Bench mains —
  * one builder so AQE (skew-join + partition coalesce, the protections a
  * 100× scale-up relies on) and parity configs can't drift between the
  * test, verify, and bench environments (round-1 verdict item 3). */
object GraftSession {
  def local(threads: Int = 4, app: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(app)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Dump timestamps as µs (not INT96/ns): the driver's pandas read of
      // our parquet then agrees with the DuckDB oracle's .df() dtype.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
