package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Event-stream batch twins: the deterministic batch formulations of the
  * streaming operators in graft.streaming.EventsStream (oracle-checkable;
  * the streaming forms are asserted equivalent in StreamingSpec). */
object EventQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization (30 min): the batch twin of
    // EventsStream.sessionize, via lag + running sum of session starts.
    "q45_events_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value").cast("decimal(18,6)")).as("total_value"))
        .orderBy(col("user_id"), col("session_id"))
        
    }),

    // F18 JSON decode: parse the props payload, aggregate per event type.
    "q46_events_json" -> ((s, d) => {
      val schema = new StructType().add("k", IntegerType)
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), schema).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"),
          sum(col("k")).cast("bigint").as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q45_events_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) pts
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN pts IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(pts AS TIMESTAMP)) > 1800000000
        |    THEN 1 ELSE 0 END nw
        |  FROM l),
        |x AS (
        |  SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) sid
        |  FROM s)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q46_events_json" ->
      """SELECT event_type,
        |  count(CAST(props->>'$.k' AS INT)) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'$.k' AS INT)) AS min_k,
        |  max(CAST(props->>'$.k' AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
