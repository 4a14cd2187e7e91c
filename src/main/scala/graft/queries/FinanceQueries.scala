package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's finance business logic rebuilt end-to-end (SURVEY.md
  * §3.4): subscription-month periodic snapshot fact
  * (`fct_subscription_month.sql`), account-month movement classification
  * (`fct_account_month.sql:79-153`), and the MRR waterfall mart
  * (`mart_mrr_waterfall_month.sql`). The testdata has no subscriptions
  * table, so one is derived deterministically from `orders` — the SAME
  * derivation CTE on the Spark and DuckDB sides.
  *
  * Numeric determinism: MRR = floor(o_totalprice/100) — whole-dollar
  * doubles, so sums are exact integers regardless of partial-aggregation
  * order and the movement classification's =/>/< compares are exact in
  * both engines (SURVEY.md §7.4 risk 3 applied to money).
  *
  * Scale notes:
  *  - The months fan-out uses `explode(sequence(start_month, end_month))`
  *    per subscription instead of a range join — scan-local generation, no
  *    join at all, so it scales linearly with fact rows (the range-join
  *    formulation is demonstrated separately in q_range_join_spine).
  *  - The only driver-side value is the global max month (one scalar agg,
  *    parquet-stats-cheap; reference does the same via scalar subquery,
  *    `fct_subscription_month.sql:49-50`).
  *  - Movement classification: one groupBy(account) builds a
  *    calendar-bounded month→MRR map; begin/end/movement are per-row map
  *    lookups (two exchanges total, no self-join, no window sort —
  *    pinned in PlanSpec).
  *  - The difference-array formulation (+mrr at the first EOM-active
  *    month, −mrr after the last, per-account prefix sum) is implemented
  *    as q_fct_account_month_delta against the SAME oracle: it skips the
  *    sub×month fan-out entirely (events are 2 rows per subscription),
  *    which is what survives 100 TB — the 64× amplification probe has
  *    the spine formulation going superlinear (90× time, the
  *    high-cardinality partial agg over the fan-out falls back to
  *    sort-based) while the delta runs ~13× less data through every
  *    exchange. The spine form stays the default because the
  *    subscription-month fact materializes the fan-out anyway.
  */
object FinanceQueries {

  /** Deterministic subscriptions table derived from orders. */
  private def subscriptions(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey").as("subscription_id"),
      col("o_custkey").as("account_id"),
      col("o_orderdate").cast("date").as("start_date"),
      when(col("o_orderkey") % 3 === 0, lit(null).cast("date"))
        .otherwise(date_add(col("o_orderdate").cast("date"),
          (lit(30) + col("o_orderkey") % 500).cast("int"))).as("end_date"),
      floor(col("o_totalprice") / 100).cast("double").as("mrr_amount"),
      (col("o_orderkey") % 20 === 0).as("is_trial"))

  private val subsSql =
    """subs AS (
      |  SELECT o_orderkey AS subscription_id,
      |         o_custkey  AS account_id,
      |         CAST(o_orderdate AS DATE) AS start_date,
      |         CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |              ELSE CAST(o_orderdate AS DATE) + CAST(30 + o_orderkey % 500 AS INT)
      |         END AS end_date,
      |         CAST(floor(o_totalprice / 100) AS DOUBLE) AS mrr_amount,
      |         (o_orderkey % 20 = 0) AS is_trial
      |  FROM orders)""".stripMargin

  /** Global "max month" bound (the reference's scalar subquery over the
    * subscriptions table): max month of coalesce(end, start). */
  private def maxMonthCol: Column =
    max(date_trunc("month", coalesce(col("end_date"), col("start_date"))).cast("date"))

  /** Last month a subscription is active AT END-OF-MONTH: the month of
    * (end_date + 1 day) minus one month — equals month(end) exactly when
    * end is its month's last day, else the month before; null end = the
    * corpus's max month. ONE definition shared by fctSubscriptionMonth
    * and waterfallDelta (which previously hand-derived the equivalent
    * `end = last_day(end) ? month(end) : month(end)−1` form) so the EOM
    * invariant cannot drift between two hash-pinned queries. */
  private def eomActiveEnd(endDate: Column, maxMonth: Column): Column =
    when(endDate.isNull, maxMonth)
      .otherwise(add_months(
        date_trunc("month", date_add(endDate, 1)).cast("date"), -1))

  /** fct_subscription_month: one row per subscription × active month with
    * EOM-activity flag and trial-aware MRR.
    * Reference: `fct_subscription_month.sql:44-92`. */
  private def fctSubscriptionMonth(s: SparkSession, dir: String): DataFrame = {
    val subs = subscriptions(s, dir)
    val spine = subs
      // global max month — the reference's scalar subquery, kept IN-PLAN
      // as a broadcast 1-row agg: one job instead of a driver pre-collect
      // plus the main job (~35% faster — BASELINE.md r17 measurement)
      .crossJoin(broadcast(subs.agg(maxMonthCol.as("_max_month"))))
      .withColumn("start_month", date_trunc("month", col("start_date")).cast("date"))
      .withColumn("end_month_b",
        least(coalesce(date_trunc("month", col("end_date")).cast("date"),
          col("_max_month")), col("_max_month")))
      .withColumn("month_start_date",
        explode(sequence(col("start_month"), col("end_month_b"), expr("interval 1 month"))))
    val nextMonth = add_months(col("month_start_date"), 1)
    val active = (col("start_date") < nextMonth) &&
      (col("end_date").isNull || col("end_date") >= date_sub(nextMonth, 1))
    spine.select(
      col("subscription_id"), col("account_id"), col("month_start_date"),
      active.as("is_active_at_eom"),
      when(active && !col("is_trial"), col("mrr_amount")).otherwise(0.0).as("mrr_eom"),
      (col("month_start_date") === col("start_month")).as("is_start_month"),
      // reference fct_subscription_month.sql: end flag only for a real
      // end_date landing in this month (end_month_b is a spine bound only)
      (col("end_date").isNotNull &&
        date_trunc("month", col("end_date")).cast("date") === col("month_start_date"))
        .as("is_end_month"))
  }

  private val fctSubMonthSql =
    s"""WITH $subsSql,
       |bounds AS (
       |  SELECT CAST(date_trunc('month', max(coalesce(end_date, start_date))) AS DATE) AS max_m
       |  FROM subs),
       |spine AS (
       |  SELECT s.*, CAST(date_trunc('month', start_date) AS DATE) AS start_month,
       |         least(coalesce(CAST(date_trunc('month', end_date) AS DATE), b.max_m), b.max_m) AS end_month_b,
       |         CAST(unnest(generate_series(CAST(date_trunc('month', start_date) AS DATE),
       |              least(coalesce(CAST(date_trunc('month', end_date) AS DATE), b.max_m), b.max_m),
       |              INTERVAL 1 MONTH)) AS DATE) AS month_start_date
       |  FROM subs s CROSS JOIN bounds b),
       |base AS (
       |  SELECT *,
       |         (start_date < CAST(month_start_date + INTERVAL 1 MONTH AS DATE)
       |          AND (end_date IS NULL OR end_date >= CAST(month_start_date + INTERVAL 1 MONTH AS DATE) - 1))
       |           AS is_active_at_eom
       |  FROM spine)
       |SELECT subscription_id, account_id, month_start_date, is_active_at_eom,
       |       CASE WHEN is_active_at_eom AND NOT is_trial THEN mrr_amount ELSE CAST(0.0 AS DOUBLE) END AS mrr_eom,
       |       (month_start_date = start_month) AS is_start_month,
       |       (end_date IS NOT NULL AND CAST(date_trunc('month', end_date) AS DATE) = month_start_date) AS is_end_month
       |FROM base""".stripMargin

  /** fct_account_month: account-month MRR begin/end + movement
    * classification. Reference: `fct_account_month.sql:49-153`
    * (monthly_mrr rollup, lag begin-MRR W2, has-paid-before running flag
    * W3, multi-arm CASE P10). */
  private def fctAccountMonth(s: SparkSession, dir: String): DataFrame = {
    val monthly = fctSubscriptionMonth(s, dir)
      .groupBy(col("account_id"), col("month_start_date"))
      .agg(sum(col("mrr_eom")).as("m_mrr"))
    // Account spine: every month from first activity to one month past
    // last activity (so the churn-to-zero month exists; reference
    // fct_account_month.sql:37-47 adds "+ interval 1 month").
    //
    // Formulation: ONE groupBy(account) collects the account's
    // month→MRR map + bounds; the spine explode, begin/end lookups and
    // the has-paid-before flag are then per-row map expressions. The
    // spine-join-plus-two-windows alternative pays the whole monthly
    // pipeline TWICE (Catalyst does not share the subtree feeding both
    // the bounds aggregate and the join), plus an SMJ sort and a window
    // sort — measured 2.5× slower at sf0.1. Map size is calendar-bounded
    // (≤ months per account), so per-group state stays tiny at any
    // corpus scale.
    val acct = monthly.groupBy(col("account_id")).agg(
      map_from_entries(collect_list(struct(col("month_start_date"), col("m_mrr")))).as("mm"),
      min(col("month_start_date")).as("first_m"),
      max(col("month_start_date")).as("last_m"),
      min(when(col("m_mrr") > 0, col("month_start_date"))).as("first_paid_m"))
    val spined = acct.withColumn("month_start_date",
      explode(sequence(col("first_m"), add_months(col("last_m"), 1), expr("interval 1 month"))))
    val mrrEnd = coalesce(element_at(col("mm"), col("month_start_date")), lit(0.0))
    val mrrBegin = coalesce(element_at(col("mm"), add_months(col("month_start_date"), -1)), lit(0.0))
    // "has paid before" = some strictly earlier month had MRR > 0
    val wasPaid = col("first_paid_m").isNotNull && col("first_paid_m") < col("month_start_date")
    spined.select(
      col("account_id"), col("month_start_date"),
      mrrBegin.as("mrr_begin"), mrrEnd.as("mrr_end"),
      when(mrrBegin === 0 && mrrEnd > 0 && !wasPaid, "new")
        .when(mrrBegin === 0 && mrrEnd > 0, "reactivation")
        .when(mrrBegin > 0 && mrrEnd === 0, "churn")
        .when(mrrEnd > mrrBegin, "expansion")
        .when(mrrEnd < mrrBegin, "contraction")
        .otherwise("flat").as("movement"))
  }

  /** fct_account_month via interval deltas — NO sub×month fan-out.
    * Presence bounds come from a plain min/max per account; EOM-active
    * MRR becomes ±mrr events at the active range's edges (2 rows per
    * subscription); the account's monthly series is one prefix-sum
    * window over its spine. Exact because money is whole-dollar doubles
    * (integer adds in any order); hash-matches the spine formulation's
    * oracle. The movement/begin columns need no lag: begin = cumsum −
    * this month's delta. */
  private def fctAccountMonthDelta(s: SparkSession, dir: String): DataFrame = {
    val subs = subscriptions(s, dir)
    // max month as a broadcast 1-row agg (see fctSubscriptionMonth):
    // the crossJoin'd `_max_month` column replaces the old driver
    // pre-collect; one job, and the broadcast exchange is reused by
    // every subtree that needs the bound
    val subsB = subs.crossJoin(broadcast(subs.agg(maxMonthCol.as("_max_month"))))
    val startMonth = date_trunc("month", col("start_date")).cast("date")
    val presEnd = least(
      coalesce(date_trunc("month", col("end_date")).cast("date"),
        col("_max_month")), col("_max_month"))
    // presence bounds ≡ the months the sub-month spine would emit
    val bounds = subsB
      .groupBy(col("account_id"))
      .agg(min(startMonth).as("first_m"), max(presEnd).as("last_m"))
    val eomEnd = eomActiveEnd(col("end_date"), col("_max_month"))
    val events = subsB
      .filter(!col("is_trial") && col("mrr_amount").isNotNull)
      .withColumn("sm", startMonth)
      .withColumn("ee", eomEnd)
      .filter(col("sm") <= col("ee"))
      .select(col("account_id"), explode(array(
        struct(col("sm").as("month_start_date"), col("mrr_amount").as("d")),
        struct(add_months(col("ee"), 1).as("month_start_date"),
          (-col("mrr_amount")).as("d")))).as("ev"))
      .select(col("account_id"), col("ev.month_start_date"), col("ev.d"))
      .groupBy(col("account_id"), col("month_start_date"))
      .agg(sum(col("d")).as("delta"))
    val spine = bounds.withColumn("month_start_date",
      explode(sequence(col("first_m"), add_months(col("last_m"), 1), expr("interval 1 month"))))
    val joined = spine.join(events, Seq("account_id", "month_start_date"), "left")
      .withColumn("delta", coalesce(col("delta"), lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("account_id")).orderBy(col("month_start_date"))
    import org.apache.spark.sql.expressions.Window.{unboundedPreceding, currentRow}
    val mrrEnd = sum(col("delta")).over(w.rowsBetween(unboundedPreceding, currentRow))
    val cum = joined
      .withColumn("mrr_end", mrrEnd)
      .withColumn("mrr_begin", col("mrr_end") - col("delta"))
      .withColumn("was_paid", coalesce(
        max(when(col("mrr_end") > 0, 1).otherwise(0))
          .over(w.rowsBetween(unboundedPreceding, -1)), lit(0)))
    cum.select(
      col("account_id"), col("month_start_date"),
      col("mrr_begin"), col("mrr_end"),
      when(col("mrr_begin") === 0 && col("mrr_end") > 0 && col("was_paid") === 0, "new")
        .when(col("mrr_begin") === 0 && col("mrr_end") > 0, "reactivation")
        .when(col("mrr_begin") > 0 && col("mrr_end") === 0, "churn")
        .when(col("mrr_end") > col("mrr_begin"), "expansion")
        .when(col("mrr_end") < col("mrr_begin"), "contraction")
        .otherwise("flat").as("movement"))
  }

  private val fctAcctMonthSql =
    s"""WITH $subsSql,
       |bounds AS (
       |  SELECT CAST(date_trunc('month', max(coalesce(end_date, start_date))) AS DATE) AS max_m
       |  FROM subs),
       |fct AS (
       |  SELECT s.account_id,
       |         CAST(unnest(generate_series(CAST(date_trunc('month', start_date) AS DATE),
       |              least(coalesce(CAST(date_trunc('month', end_date) AS DATE), b.max_m), b.max_m),
       |              INTERVAL 1 MONTH)) AS DATE) AS month_start_date,
       |         start_date, end_date, mrr_amount, is_trial
       |  FROM subs s CROSS JOIN bounds b),
       |monthly AS (
       |  SELECT account_id, month_start_date,
       |         sum(CASE WHEN start_date < CAST(month_start_date + INTERVAL 1 MONTH AS DATE)
       |                   AND (end_date IS NULL OR end_date >= CAST(month_start_date + INTERVAL 1 MONTH AS DATE) - 1)
       |                   AND NOT is_trial THEN mrr_amount ELSE CAST(0.0 AS DOUBLE) END) AS m_mrr
       |  FROM fct GROUP BY 1, 2),
       |spine AS (
       |  SELECT account_id,
       |         CAST(unnest(generate_series(min(month_start_date),
       |              CAST(max(month_start_date) + INTERVAL 1 MONTH AS DATE),
       |              INTERVAL 1 MONTH)) AS DATE) AS month_start_date
       |  FROM monthly GROUP BY account_id),
       |joined AS (
       |  SELECT sp.account_id, sp.month_start_date, coalesce(m.m_mrr, 0.0) AS mrr_end
       |  FROM spine sp LEFT JOIN monthly m
       |    ON sp.account_id = m.account_id AND sp.month_start_date = m.month_start_date),
       |flagged AS (
       |  SELECT account_id, month_start_date, mrr_end,
       |         coalesce(lag(mrr_end) OVER (PARTITION BY account_id ORDER BY month_start_date), 0.0) AS mrr_begin,
       |         coalesce(max(CASE WHEN mrr_end > 0 THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY account_id ORDER BY month_start_date
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS was_paid_before
       |  FROM joined)
       |SELECT account_id, month_start_date, mrr_begin, mrr_end,
       |       CASE WHEN mrr_begin = 0 AND mrr_end > 0 AND was_paid_before = 0 THEN 'new'
       |            WHEN mrr_begin = 0 AND mrr_end > 0 THEN 'reactivation'
       |            WHEN mrr_begin > 0 AND mrr_end = 0 THEN 'churn'
       |            WHEN mrr_end > mrr_begin THEN 'expansion'
       |            WHEN mrr_end < mrr_begin THEN 'contraction'
       |            ELSE 'flat' END AS movement
       |FROM flagged""".stripMargin

  /** mart_mrr_waterfall_month: month-grain MRR movement rollup with
    * conditional distinct account counts. Reference:
    * `mart_mrr_waterfall_month.sql:29-51` (A3/A4/A6). */
  private def waterfall(s: SparkSession, dir: String): DataFrame = {
    val am = fctAccountMonth(s, dir)
    def mrrOf(mv: String, c: org.apache.spark.sql.Column) =
      sum(when(col("movement") === mv, c).otherwise(0.0))
    am.groupBy(col("month_start_date")).agg(
      sum(col("mrr_begin")).as("begin_mrr"),
      sum(col("mrr_end")).as("end_mrr"),
      mrrOf("new", col("mrr_end")).as("new_mrr"),
      mrrOf("reactivation", col("mrr_end")).as("reactivation_mrr"),
      mrrOf("expansion", col("mrr_end") - col("mrr_begin")).as("expansion_mrr"),
      mrrOf("contraction", col("mrr_begin") - col("mrr_end")).as("contraction_mrr"),
      mrrOf("churn", col("mrr_begin")).as("churn_mrr"),
      // fct_account_month is UNIQUE on (account_id, month): the
      // reference's count(distinct case ...) degenerates to a plain
      // conditional count — same values, but Spark skips the 4-way
      // distinct-aggregate expand (one hash aggregate instead of five)
      count(when(col("movement") === "new", lit(1))).as("new_accounts"),
      count(when(col("movement") === "churn", lit(1))).as("churned_accounts"),
      count(when(col("movement") === "expansion", lit(1))).as("expansion_accounts"),
      count(when(col("mrr_end") > 0, lit(1))).as("active_accounts"))
  }

  private val waterfallSql = {
    val am = fctAcctMonthSql
    s"""WITH am AS ($am)
       |SELECT month_start_date,
       |       sum(mrr_begin) AS begin_mrr,
       |       sum(mrr_end)   AS end_mrr,
       |       sum(CASE WHEN movement = 'new' THEN mrr_end ELSE 0.0 END) AS new_mrr,
       |       sum(CASE WHEN movement = 'reactivation' THEN mrr_end ELSE 0.0 END) AS reactivation_mrr,
       |       sum(CASE WHEN movement = 'expansion' THEN mrr_end - mrr_begin ELSE 0.0 END) AS expansion_mrr,
       |       sum(CASE WHEN movement = 'contraction' THEN mrr_begin - mrr_end ELSE 0.0 END) AS contraction_mrr,
       |       sum(CASE WHEN movement = 'churn' THEN mrr_begin ELSE 0.0 END) AS churn_mrr,
       |       count(DISTINCT CASE WHEN movement = 'new' THEN account_id END) AS new_accounts,
       |       count(DISTINCT CASE WHEN movement = 'churn' THEN account_id END) AS churned_accounts,
       |       count(DISTINCT CASE WHEN movement = 'expansion' THEN account_id END) AS expansion_accounts,
       |       count(DISTINCT CASE WHEN mrr_end > 0 THEN account_id END) AS active_accounts
       |FROM am GROUP BY month_start_date""".stripMargin
  }

  /** The waterfall from INTERVAL DELTAS — O(subs) rows, no sub×month
    * fan-out: each subscription contributes +mrr at its first active
    * month and −mrr after its last (EOM semantics folded into the
    * interval bounds), per-account prefix-sum windows over its few delta
    * months classify movements, and calendar-grain prefix sums produce the
    * totals. ~36× fewer shuffled rows than the spine formulation at this
    * calendar — the formulation of choice when only month-grain output
    * is needed. Oracle: the SAME SQL as q_mrr_waterfall, so the
    * hash-compare proves the two formulations identical.
    *
    * Exactness: money is whole-dollar doubles (integers ≤ 2^53), so
    * prefix sums and ±cancellation are exact in any order and the
    * `after == 0` churn compare is safe.
    */
  private def waterfallDelta(s: SparkSession, dir: String): DataFrame = {
    val subs = subscriptions(s, dir)
    // max-month bound in-plan (broadcast 1-row agg, reused exchange)
    // instead of a driver pre-collect — see fctSubscriptionMonth
    val em = date_trunc("month", col("end_date")).cast("date")
    val base = subs
      .crossJoin(broadcast(subs.agg(maxMonthCol.as("_max_month"))))
      .select(
        col("account_id"),
        date_trunc("month", col("start_date")).cast("date").as("start_month"),
        least(coalesce(em, col("_max_month")), col("_max_month")).as("end_month_b"),
        // last month the sub is active at EOM (shared eomActiveEnd
        // definition), clamped to the corpus max month
        least(eomActiveEnd(col("end_date"), col("_max_month")),
          col("_max_month")).as("active_end"),
        when(!col("is_trial"), coalesce(col("mrr_amount"), lit(0.0)))
          .otherwise(0.0).as("m"))
    val contributing = base.filter(col("m") =!= 0.0 && col("active_end") >= col("start_month"))
    val deltas = contributing
      .select(col("account_id"), col("start_month").as("month"), col("m").as("d"))
      .unionByName(contributing.select(
        col("account_id"), add_months(col("active_end"), 1).as("month"), negate(col("m")).as("d")))
    // per-account transitions as pure window expressions (same shape as
    // fctAccountMonthDelta — stays in codegen, no encoder boundary):
    // after = prefix sum of the month's net delta, before = the same
    // prefix over strictly PRIOR rows (so before_n is bit-identical to
    // after_{n-1} — same left-to-right fold, not a float subtraction),
    // paid-ever = any strictly-prior month with after > 0. Zero-net months
    // carry state through the prefix sums but emit no transition row.
    //
    // ONE exchange for the whole section: the explicit repartition on
    // account_id satisfies both the (account_id, month) hash aggregate
    // (hash on a subset of the grouping keys clusters the full key) and
    // every account-partitioned window after it — a plain
    // groupBy(account_id, month) would hash-partition on BOTH keys and
    // force the windows to re-shuffle on account_id alone.
    val wAcct = Window.partitionBy(col("account_id")).orderBy(col("month"))
    val trans = deltas
      .repartition(col("account_id"))
      .groupBy(col("account_id"), col("month")).agg(sum(col("d")).as("d"))
      .withColumn("after",
        sum(col("d")).over(wAcct.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("before", coalesce(
        sum(col("d")).over(wAcct.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("paid_ever", coalesce(
        max(when(col("after") > 0, 1).otherwise(0))
          .over(wAcct.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .filter(col("d") =!= 0.0)
      .select(col("account_id"), col("month"), col("before"), col("after"),
        when(col("before") === 0 && col("after") > 0 && col("paid_ever") === 0, "new")
          .when(col("before") === 0 && col("after") > 0, "reactivation")
          .when(col("before") > 0 && col("after") === 0, "churn")
          .when(col("after") > col("before"), "expansion")
          .otherwise("contraction").as("movement"))
    val byMonth = trans.groupBy(col("month")).agg(
      sum(col("after") - col("before")).as("dm"),
      sum((col("after") > 0).cast("int") - (col("before") > 0).cast("int")).as("dactive"),
      sum(when(col("movement") === "new", col("after")).otherwise(0.0)).as("new_mrr_d"),
      sum(when(col("movement") === "reactivation", col("after")).otherwise(0.0)).as("reactivation_mrr_d"),
      sum(when(col("movement") === "expansion", col("after") - col("before")).otherwise(0.0)).as("expansion_mrr_d"),
      sum(when(col("movement") === "contraction", col("before") - col("after")).otherwise(0.0)).as("contraction_mrr_d"),
      sum(when(col("movement") === "churn", col("before")).otherwise(0.0)).as("churn_mrr_d"),
      count(when(col("movement") === "new", lit(1))).as("new_accounts_d"),
      count(when(col("movement") === "churn", lit(1))).as("churned_accounts_d"),
      count(when(col("movement") === "expansion", lit(1))).as("expansion_accounts_d"))
    // month presence = union of account spines [first, last+1], from
    // per-account bounds over ALL subs (zero-MRR spine rows included)
    val presence = base.groupBy(col("account_id"))
      .agg(min(col("start_month")).as("f"), max(col("end_month_b")).as("l"))
      .select(explode(array(
        struct(col("f").as("month"), lit(1).as("p")),
        struct(add_months(col("l"), 2).as("month"), lit(-1).as("p")))).as("x"))
      .select(col("x.month"), col("x.p"))
      .groupBy(col("month")).agg(sum(col("p")).as("pres_d"))
    // calendar spine across the global range; prefix sums at month grain
    // (≤ a few dozen rows — the single-partition window is intentional).
    // The spine unnests directly from the 1-row bounds agg: no driver
    // collect, no extra job.
    val cal = base.agg(
        min(col("start_month")).as("lo"),
        add_months(max(col("end_month_b")), 1).as("hi"))
      .select(explode(sequence(
        col("lo"), col("hi"), expr("interval 1 month"))).as("month"))
    val w = Window.orderBy(col("month")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(byMonth, Seq("month"), "left")
      .join(presence, Seq("month"), "left")
      .withColumn("end_mrr", sum(coalesce(col("dm"), lit(0.0))).over(w))
      .withColumn("active_cnt", sum(coalesce(col("dactive"), lit(0L))).over(w))
      .withColumn("present", sum(coalesce(col("pres_d"), lit(0L))).over(w))
      .filter(col("present") > 0)
      .select(
        col("month").as("month_start_date"),
        (col("end_mrr") - coalesce(col("dm"), lit(0.0))).as("begin_mrr"),
        col("end_mrr"),
        coalesce(col("new_mrr_d"), lit(0.0)).as("new_mrr"),
        coalesce(col("reactivation_mrr_d"), lit(0.0)).as("reactivation_mrr"),
        coalesce(col("expansion_mrr_d"), lit(0.0)).as("expansion_mrr"),
        coalesce(col("contraction_mrr_d"), lit(0.0)).as("contraction_mrr"),
        coalesce(col("churn_mrr_d"), lit(0.0)).as("churn_mrr"),
        coalesce(col("new_accounts_d"), lit(0L)).as("new_accounts"),
        coalesce(col("churned_accounts_d"), lit(0L)).as("churned_accounts"),
        coalesce(col("expansion_accounts_d"), lit(0L)).as("expansion_accounts"),
        col("active_cnt").as("active_accounts"))
  }

  /** Exposed for FinanceSpec's singular-test assertions. */
  private[graft] def fctSubscriptionMonthDf = fctSubscriptionMonth _
  private[graft] def fctAccountMonthDf = fctAccountMonth _
  private[graft] def waterfallDf = waterfall _

  val qs: Seq[Q] = Seq(
    Q.sql("q_fct_subscription_month", fctSubMonthSql)(fctSubscriptionMonth),
    Q.sql("q_fct_account_month", fctAcctMonthSql)(fctAccountMonth),
    // same oracle text as q_fct_account_month: the delta formulation
    // must hash-match the spine formulation's results exactly
    Q.sql("q_fct_account_month_delta", fctAcctMonthSql)(fctAccountMonthDelta),
    Q.sql("q_mrr_waterfall", waterfallSql)(waterfall),
    // same oracle text as q_mrr_waterfall: the delta formulation must
    // hash-match the spine formulation's results exactly
    Q.sql("q_mrr_waterfall_delta", waterfallSql)(waterfallDelta)
  )
}
