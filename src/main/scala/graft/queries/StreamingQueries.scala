package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streaming

/** Batch faces of the streaming operators ([[graft.streaming.Streaming]]):
  * Spark's unified batch/stream semantics mean the SAME `windowedCounts`
  * plan runs here over the events table and in StreamingSpec over a
  * stream — the DuckDB oracle checks the one logical definition.
  */
object StreamingQueries {

  val qs: Seq[Q] = Seq(

    // ---- tumbling event-time window aggregate (batch face)
    Q.sql(
      "q_stream_tumbling_window",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |       event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      Streaming.windowedCounts(Tables.events(s, dir))
        .withColumn("sum_value", round(col("sum_value"), 2))
    },

    // ---- sliding event-time window (2h window, 1h slide): every event
    // lands in exactly two overlapping windows. Oracle: unnest the two
    // window starts per event. State at stream scale is bounded by the
    // watermark exactly as for tumbling windows; cost is window/slide ×
    // the tumbling row count.
    Q.sql(
      "q_stream_sliding_window",
      """WITH hits AS (
        |  SELECT unnest([CAST(date_trunc('hour', ts) AS TIMESTAMP),
        |                 CAST(date_trunc('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR]) AS window_start,
        |         event_type, value
        |  FROM events)
        |SELECT window_start, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM hits GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
    },

    // ---- native session_window aggregation (Spark's built-in gap
    // session operator — the declarative sibling of the stateful
    // flatMapGroupsWithState formulation; same oracle shape as
    // q_stream_sessions)
    Q.sql(
      "q_stream_session_window",
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |               OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |       CAST(count(*) AS INT) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_seq""".stripMargin
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).cast("int").as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("n_events"), col("sum_value"))
    },

    // ---- sessionization via typed stateful operator, run in batch mode
    // (flatMapGroupsWithState works on batch Datasets too); oracle is the
    // window-function sessionization — two independent formulations must
    // agree on session boundaries and aggregates
    Q.sql(
      "q_stream_sessions",
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |               OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       CAST(count(*) AS INT) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_seq""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val events = Tables.events(s, dir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[Streaming.Event]
      Streaming.sessionize(events, java.time.Duration.ofMinutes(30), emitTrailing = true)
        .toDF()
        .withColumn("sum_value", round(col("sum_value"), 2))
    }
  )
}
