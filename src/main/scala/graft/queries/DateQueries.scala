package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Date/calendar coverage (SURVEY.md §2.8 date functions, dim_date's spine,
  * and the J1/J2 range joins).
  *
  * Scale notes: the months spine is tiny at any data scale (one row per
  * month), so the range joins broadcast it — a BroadcastNestedLoopJoin
  * whose inner side is O(#months), the right physical plan per SURVEY §4.
  */
object DateQueries {

  val qs: Seq[Q] = Seq(

    // ---- date part extraction + month arithmetic (dim_date.sql:21-48)
    Q.sql(
      "q_date_functions",
      """SELECT DISTINCT
        |  CAST(date_trunc('month', o_orderdate) AS DATE)                 AS month_start,
        |  CAST(extract(year FROM o_orderdate) AS INT)                    AS o_year,
        |  CAST(extract(quarter FROM o_orderdate) AS INT)                 AS o_quarter,
        |  CAST(extract(month FROM o_orderdate) AS INT)                   AS o_month,
        |  strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%B') AS month_name,
        |  CAST(datediff('month', DATE '1970-01-01',
        |       CAST(date_trunc('month', o_orderdate) AS DATE)) AS INT)   AS month_index,
        |  last_day(CAST(o_orderdate AS DATE))                            AS month_end,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
        |  CAST(extract(year FROM o_orderdate) * 100 + extract(month FROM o_orderdate) AS INT) AS year_month
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      val monthStart = date_trunc("month", col("o_orderdate")).cast("date")
      Tables.orders(s, dir).select(
        monthStart.as("month_start"),
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        month(col("o_orderdate")).as("o_month"),
        date_format(monthStart, "MMMM").as("month_name"),
        months_between(monthStart, lit("1970-01-01").cast("date")).cast("int").as("month_index"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        add_months(monthStart, 1).as("next_month"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int").as("year_month")
      ).distinct()
    },

    // ---- date spine generation (dbt_utils.date_spine; dim_date.sql:7-14)
    Q.sql(
      "q_date_spine",
      """SELECT CAST(gs AS DATE) AS date_day,
        |       CAST(extract(year FROM gs) AS INT) AS y,
        |       CAST(extract(month FROM gs) AS INT) AS m,
        |       (CAST(gs AS DATE) = CAST(date_trunc('month', gs) AS DATE)) AS is_month_start
        |FROM generate_series(DATE '2023-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(gs)""".stripMargin
    ) { (s, dir) =>
      s.range(1)
        .select(explode(sequence(
          lit("2023-01-01").cast("date"), lit("2024-12-31").cast("date"),
          expr("interval 1 day"))).as("date_day"))
        .select(
          col("date_day"),
          year(col("date_day")).as("y"),
          month(col("date_day")).as("m"),
          (col("date_day") === trunc(col("date_day"), "month")).as("is_month_start"))
    },

    // ---- J1/J2: range join of a fact onto a months spine
    // (reference: fct_subscription_month.sql:56-64)
    Q.sql(
      "q_range_join_spine",
      """WITH w AS (
        |  SELECT o_orderkey, o_totalprice,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS from_m,
        |         CAST(CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 2 MONTH AS DATE) AS to_m
        |  FROM orders),
        |m AS (SELECT DISTINCT from_m AS month_start FROM w)
        |SELECT month_start, count(*) AS n_active, round(sum(o_totalprice), 2) AS total
        |FROM w JOIN m ON month_start BETWEEN from_m AND to_m
        |GROUP BY month_start""".stripMargin
    ) { (s, dir) =>
      val w = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_trunc("month", col("o_orderdate")).cast("date").as("from_m"),
        add_months(date_trunc("month", col("o_orderdate")).cast("date"), 2).as("to_m"))
      val months = w.select(col("from_m").as("month_start")).distinct()
      w.join(broadcast(months), col("month_start").between(col("from_m"), col("to_m")))
        .groupBy(col("month_start"))
        .agg(count(lit(1)).as("n_active"), round(sum(col("o_totalprice")), 2).as("total"))
    }
  )
}
