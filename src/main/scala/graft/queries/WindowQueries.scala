package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function coverage (SURVEY.md §2.5) plus the SCD2/as-of shapes
  * built from them (§2.3 J3–J5, §2.1 S13's history construction).
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (user_id, o_custkey) — one shuffle on the partition key, then local
  * sort; no skew risk since per-key row counts are bounded. Ordering
  * always carries a unique tiebreaker (event_id / o_orderkey) so results
  * are deterministic across engines (SURVEY §4 risk 4).
  */
object WindowQueries {

  /** Monthly revenue per customer — shared base for lag/running windows. */
  private def monthlyRev(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"), date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))

  private val monthlyRevSql =
    """SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |       round(sum(o_totalprice), 2) AS rev
      |FROM orders GROUP BY 1, 2""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- W1: row_number latest-row dedup (reference: int_accounts_current.sql:4-10)
    Q.sql(
      "q_win_dedup_latest",
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events) t WHERE rn = 1""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    },

    // ---- W2: lag (reference: fct_account_month.sql:79-83, begin-of-month MRR)
    Q.sql(
      "q_win_lag",
      s"""WITH mr AS ($monthlyRevSql)
         |SELECT o_custkey, month_start, rev,
         |       coalesce(lag(rev) OVER (PARTITION BY o_custkey ORDER BY month_start), 0.0) AS prev_rev
         |FROM mr""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("month_start"))
      monthlyRev(s, dir)
        .withColumn("prev_rev", coalesce(lag(col("rev"), 1).over(w), lit(0.0)))
    },

    // ---- W3: running max flag over rows-preceding frame (fct_account_month.sql:93-101)
    Q.sql(
      "q_win_running_flag",
      s"""WITH mr AS ($monthlyRevSql)
         |SELECT o_custkey, month_start, rev,
         |       coalesce(max(CASE WHEN rev > 200000 THEN 1 ELSE 0 END)
         |         OVER (PARTITION BY o_custkey ORDER BY month_start
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS was_big_before
         |FROM mr""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("month_start"))
        .rowsBetween(Window.unboundedPreceding, -1)
      monthlyRev(s, dir)
        .withColumn("was_big_before",
          coalesce(max(when(col("rev") > 200000, 1).otherwise(0)).over(w), lit(0)))
    },

    // ---- running sum over rows frame (cumulative revenue)
    Q.sql(
      "q_win_running_sum",
      s"""WITH mr AS ($monthlyRevSql)
         |SELECT o_custkey, month_start, rev,
         |       round(sum(rev) OVER (PARTITION BY o_custkey ORDER BY month_start
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_rev
         |FROM mr""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("month_start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthlyRev(s, dir)
        .withColumn("cum_rev", round(sum(col("rev")).over(w), 2))
    },

    // ---- W4: unordered whole-partition window (fct_subscription_month.sql:107,119)
    Q.sql(
      "q_win_partition_min",
      """SELECT o_orderkey, o_custkey,
        |       min(o_orderdate) OVER (PARTITION BY o_custkey) AS first_order_ts,
        |       (o_orderdate = min(o_orderdate) OVER (PARTITION BY o_custkey)) AS is_first_order
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, dir)
        .withColumn("first_order_ts", min(col("o_orderdate")).over(w))
        .withColumn("is_first_order", col("o_orderdate") === col("first_order_ts"))
        .select("o_orderkey", "o_custkey", "first_order_ts", "is_first_order")
    },

    // ---- rank/dense_rank top-k per group (beyond reference; complete surface)
    Q.sql(
      "q_win_rank_topk",
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
        |         dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
        |  FROM orders) t WHERE rnk <= 10""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc)
      Tables.orders(s, dir)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 10)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk", "drnk")
    },

    // ---- distribution windows: percent_rank / cume_dist (completes the
    // ranking-function surface beside rank/dense_rank/ntile)
    Q.sql(
      "q_win_percent_rank",
      """SELECT o_orderkey, o_orderpriority,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
    },

    // ---- lead + gap sessionization (streaming-adjacent; events log)
    Q.sql(
      "q_win_sessionize",
      """SELECT user_id, event_id, ts,
        |       CAST(sum(CASE WHEN gap_s IS NULL OR gap_s >= 1800 THEN 1 ELSE 0 END)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |FROM (
        |  SELECT user_id, event_id, ts,
        |         datediff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
        |  FROM events) t""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("session_seq",
          sum(when(col("gap_s").isNull || col("gap_s") >= 1800, 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("user_id", "event_id", "ts", "session_seq")
    },

    // ---- S13 shape: SCD2 version history built from an append-only log
    // (valid_from/valid_to intervals like dbt snapshots; snap_accounts.sql:3-11)
    Q.sql(
      "q_scd2_versions_from_log",
      """SELECT user_id, event_id AS version_id, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version_seq,
        |       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM events WHERE event_type = 'signup'""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).filter(col("event_type") === "signup")
        .select(
          col("user_id"), col("event_id").as("version_id"), col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"),
          row_number().over(w).as("version_seq"),
          lead(col("ts"), 1).over(w).isNull.as("is_current"))
    },

    // ---- J3/J5 shape: SCD2 as-of join — attach the dim version valid at
    // fact time (reference: fct_subscription_month.sql:123-138)
    Q.sql(
      "q_asof_join_scd2",
      """WITH dim AS (
        |  SELECT user_id, event_id AS state_id, value AS state_value, ts AS valid_from,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM events WHERE event_type = 'click'),
        |fact AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, f.value, d.state_id, d.state_value
        |FROM fact f LEFT JOIN dim d
        |  ON f.user_id = d.user_id AND f.ts >= d.valid_from
        | AND (d.valid_to IS NULL OR f.ts < d.valid_to)""".stripMargin
    ) { (s, dir) =>
      // As-of via union + last-observed-state window rather than an
      // interval join: tag state (click) rows 0 and fact (purchase) rows
      // 1, sort by (ts, tag, event_id) per user, carry the last non-null
      // state forward. Because SCD2 validity intervals partition time per
      // key, "last state at or before fact ts" IS the interval match —
      // one shuffle on user_id, zero join fan-out, skew-free. (The
      // equivalent interval join re-shuffles both sides and pays a
      // per-pair residual filter.)
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("tag"), col("event_id"),
          col("event_id").as("c_state_id"), col("value").as("c_state_value"),
          lit(null).cast("long").as("f_event_id"), lit(null).cast("double").as("f_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"),
          lit(null).cast("long").as("c_state_id"), lit(null).cast("double").as("c_state_value"),
          col("event_id").as("f_event_id"), col("value").as("f_value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("state_id", last(col("c_state_id"), ignoreNulls = true).over(w))
        .withColumn("state_value", last(col("c_state_value"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("f_event_id").as("event_id"), col("user_id"),
          col("f_value").as("value"), col("state_id"), col("state_value"))
    }
  )
}
