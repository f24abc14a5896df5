package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale tooling (SURVEY.md §7.4 / §4): skew salting and bucketed
  * co-location — the two manual levers that complement AQE on a real
  * cluster. */
object ScaleOps {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, salt); the small side is exploded across all salt
    * values. Same rows as a plain inner equi-join, but hot keys spread
    * over `salt` reducers instead of one. Use when AQE skew handling
    * isn't available (e.g. a forced shuffle plan) or keys are
    * pathologically hot. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Persist a DataFrame bucketed+sorted on its join key: two tables
    * bucketed the same way equi-join with NO shuffle exchange (the
    * Spark analogue of the reference's Postgres b-tree co-location,
    * `database/migrations/001_initial_schema.sql:81-84`). */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    // Idempotent: drop catalog entry AND any orphaned location left by a
    // previous process (the in-memory catalog forgets, the files don't).
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }
}
