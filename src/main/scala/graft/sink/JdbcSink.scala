package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S8: real JDBC bulk upsert — the reference's Postgres `ON CONFLICT`
  * batch loader (`database/migrate_csv_to_db.py:89-175`) re-expressed the
  * way a Spark pipeline loads a warehouse: write the batch
  * partition-parallel into a STAGING table via the JDBC datasource, then
  * one set-based `MERGE` from staging into the target — never row-by-row
  * driver loops.
  *
  * The embedded Derby engine (shipped with Spark) stands in for Postgres:
  * same SQL shape (`MERGE` ≡ `INSERT ... ON CONFLICT DO UPDATE`), same
  * Spark-side API (`df.write.jdbc`) — against Postgres only the URL,
  * driver class, and conflict clause change.
  *
  * Scale notes: the JDBC write is per-partition parallel (`numPartitions`
  * caps connections); the MERGE is one server-side set operation over the
  * staging batch, not O(rows) round-trips; the read-back can be
  * predicate-partitioned (`partitionColumn`) for large tables.
  */
object JdbcSink {

  val DriverClass = "org.apache.derby.jdbc.EmbeddedDriver"

  private def withConn[A](url: String)(f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def exec(conn: java.sql.Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  /** Create target + staging with an explicit DDL schema: letting the
    * datasource autocreate would map StringType to CLOB under Derby's
    * dialect, which breaks ORDER BY and key comparisons. */
  def createMemberTables(url: String): Unit = withConn(url) { conn =>
    Seq("target", "staging").foreach { t =>
      exec(conn,
        s"""CREATE TABLE $t (
           |  member_key BIGINT NOT NULL PRIMARY KEY,
           |  caption    VARCHAR(256),
           |  region_key BIGINT,
           |  batch      INT)""".stripMargin)
    }
  }

  /** Upsert one batch: truncate staging, bulk-append the batch through
    * the JDBC datasource, MERGE on the key. */
  def upsertBatch(spark: SparkSession, url: String, batch: DataFrame): Unit = {
    withConn(url)(exec(_, "TRUNCATE TABLE staging"))
    batch.write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url).option("dbtable", "staging")
      .option("driver", DriverClass)
      .save()
    withConn(url)(exec(_,
      """MERGE INTO target t USING staging s
        |ON t.member_key = s.member_key
        |WHEN MATCHED THEN UPDATE SET
        |  caption = s.caption, region_key = s.region_key, batch = s.batch
        |WHEN NOT MATCHED THEN INSERT (member_key, caption, region_key, batch)
        |  VALUES (s.member_key, s.caption, s.region_key, s.batch)""".stripMargin))
  }

  /** Shut down the embedded database rooted at `dir` and remove its
    * files. Derby signals a successful single-db shutdown with
    * SQLException 08006 — expected, swallowed. */
  def shutdownAndDelete(dir: String): Unit = {
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(dir))
  }

  /** Read the target table back as a DataFrame. Derby reports SQL
    * identifiers uppercased; fold them back to lower_snake_case so the
    * round-trip schema matches what was written (and any oracle). */
  def readTarget(spark: SparkSession, url: String): DataFrame = {
    val raw = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "target")
      .option("driver", DriverClass)
      .load()
    raw.toDF(raw.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
  }
}
