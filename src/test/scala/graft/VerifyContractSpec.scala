package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The failure-visible Verify contract (round-5 verdict item 2).
  *
  * Round 5 shipped two analysis-time-broken queries that VANISHED from
  * CORRECTNESS instead of going red, because a thrown query wrote nothing.
  * This spec drives Verify.dumpAll with a deliberately-broken query and
  * asserts a regression is a visible artifact, never a missing key:
  *  - the produced-dir set equals the registered query-name set;
  *  - the broken query's dir holds an `_ERR` marker (so the driver's
  *    parquet read fails loudly), not a stale parquet result;
  *  - `_errors.json` names exactly the failures (and is `{}` when clean).
  */
class VerifyContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val good: (SparkSession, String) => DataFrame =
    (s, d) => Tables.region(s, d)
  private val broken: (SparkSession, String) => DataFrame =
    (s, d) => Tables.events(s, d).selectExpr("no_such_column + 1")

  test("a thrown query leaves an _ERR sentinel and an _errors.json row") {
    val out = Files.createTempDirectory("verify_contract").toString
    val errors = Verify.dumpAll(spark, sf, out,
      Seq("vc_good" -> good, "vc_broken" -> broken))

    assert(errors.keySet == Set("vc_broken"))
    // Produced-dir set == registered set: nothing vanishes.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("vc_good", "vc_broken"))
    // The good query is a readable parquet result.
    assert(spark.read.parquet(s"$out/vc_good").count() > 0)
    // The broken query's dir is a sentinel: _ERR marker present, no
    // parquet footer for the driver to mistake for a result.
    assert(Files.exists(Paths.get(s"$out/vc_broken/_ERR")))
    assert(!new java.io.File(s"$out/vc_broken").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    val errJson = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("\"vc_broken\""))
    assert(!errJson.contains("vc_good"))
  }

  test("a clean run writes an empty _errors.json") {
    val out = Files.createTempDirectory("verify_contract_clean").toString
    val errors = Verify.dumpAll(spark, sf, out, Seq("vc_good" -> good))
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")) == "{}")
  }

  test("dumpAll normalizes raw tz-aware timestamps and decimals (r7 item 1)") {
    // Round 7 shipped three queries that forgot the per-query
    // Parity.outputDoubles cast and failed the driver's schema gate on
    // tz-aware day columns. The normalization now lives in dumpAll
    // itself, so a query emitting RAW date_trunc TimestampType (and a
    // raw decimal) must still dump as NTZ + double — i.e. the written
    // parquet can never carry the dtypes the driver's compare rejects.
    val raw: (SparkSession, String) => DataFrame = (s, d) =>
      Tables.events(s, d).selectExpr(
        "date_trunc('day', ts) AS day",
        "CAST(value AS DECIMAL(18,3)) AS v")
    // Direct query output really is the dangerous pair of dtypes…
    val direct = raw(spark, sf).schema
    assert(direct("day").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(direct("v").dataType.isInstanceOf[
      org.apache.spark.sql.types.DecimalType])
    // …and the dump boundary neutralizes both, unconditionally.
    val out = Files.createTempDirectory("verify_contract_ntz").toString
    val errors = Verify.dumpAll(spark, sf, out, Seq("vc_raw_ts" -> raw))
    assert(errors.isEmpty)
    val dumped = spark.read.parquet(s"$out/vc_raw_ts").schema
    assert(dumped("day").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(dumped("v").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("a failed overwrite of a previously-green result leaves no stale parquet") {
    val out = Files.createTempDirectory("verify_contract_stale").toString
    Verify.dumpAll(spark, sf, out, Seq("vc_q" -> good))
    assert(spark.read.parquet(s"$out/vc_q").count() > 0)
    // Same name breaks next run: the old green result must not survive.
    Verify.dumpAll(spark, sf, out, Seq("vc_q" -> broken))
    assert(Files.exists(Paths.get(s"$out/vc_q/_ERR")))
    assert(!new java.io.File(s"$out/vc_q").listFiles()
      .exists(_.getName.endsWith(".parquet")))
  }
}
