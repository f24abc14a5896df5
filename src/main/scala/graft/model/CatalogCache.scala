package graft.model

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable member-catalog cache with checksum validation — the engine
  * analogue of the reference's checksum-validated tiered cache
  * (`frontend/src/utils/cache.ts:30-38,94,120-123`, X4 `simpleHash`):
  * memory tier = `MemberCatalog.members` persist; disk tier = this
  * parquet checkpoint; the checksum detects stale/corrupt snapshots.
  *
  * The checksum is an order-independent xxhash64+XOR fold over all
  * columns — cheap (one pass, map-side partial agg), partition-layout-
  * agnostic, and overflow-free under ANSI mode. */
object CatalogCache {

  /** Content checksum of a member catalog DataFrame. */
  def checksum(members: DataFrame): Long = {
    val cols = members.columns.map(col)
    members.select(xxhash64(cols: _*).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
  }

  /** Write the disk tier; returns the content checksum to store alongside. */
  def write(members: DataFrame, path: String): Long = {
    members.write.mode(SaveMode.Overwrite).parquet(path)
    checksum(members.sparkSession.read.parquet(path))
  }

  /** Read the disk tier, validating against the expected checksum
    * (throws on mismatch — the reference falls back to a fresh scan). */
  def readValidated(spark: SparkSession, path: String, expected: Long): DataFrame = {
    val df = spark.read.parquet(path)
    val got = checksum(df)
    if (got != expected)
      throw new IllegalStateException(
        s"catalog cache checksum mismatch: expected $expected, got $got")
    df
  }
}
