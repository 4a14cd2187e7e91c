package graft.finance

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine._

/** The reference warehouse's complete model DAG on the engine runtime:
  * raw → staging (incremental append + record_hash) → current views →
  * SCD2 snapshots → dimensions (surrogate keys, as-of account attach) →
  * monthly facts (range-join spine, EOM semantics, SCD2 key attach,
  * movement classification) → MRR waterfall mart, with the reference's
  * generic + singular tests attached to their nodes.
  *
  * Mirrors the semantics of every model and snapshot under
  * `/root/reference/models` and `/root/reference/snapshots`
  * (SURVEY.md §2, §3.4) on driver-provided `raw_accounts` /
  * `raw_subscriptions` sources; exercised end-to-end (multi-batch,
  * incremental ≡ full-refresh) in FinanceWarehouseSpec.
  *
  * Scale: staging appends only the new batch (high-water mark); facts are
  * month-partitioned and restated via dynamic partition overwrite; dims
  * and the months spine are broadcast-sized at any fact scale; snapshot
  * merge shuffles on the natural key only.
  */
object FinanceWarehouse {

  final case class Vars(
      dateStart: String = "2023-01-01",
      dateEnd: String = "2025-12-31")

  private val BackDate = "1900-01-01" // first-version back-dating, fct_subscription_month.sql:131-136

  private def hashText(c: Column): Column = coalesce(c.cast("string"), lit(""))

  def models(vars: Vars): Seq[Model] = Seq(

    // ---- staging: defensive casts + content hash, incremental append
    // (stg_accounts.sql / stg_subscriptions.sql)
    Model("stg_accounts", Seq("raw_accounts"),
      Materialization.IncrementalAppend("ingested_at"),
      checks = Seq(Checks.notNull("account_id")))((_, r) => {
      val a = r("raw_accounts")
      val cleaned = a.select(
        Exprs.cleanString(col("account_id")).as("account_id"),
        Exprs.cleanString(col("name")).as("name"),
        lower(Exprs.cleanString(col("segment"))).as("segment"),
        col("signup_date").cast("date").as("signup_date"),
        col("ingested_at"), col("source_file"))
      cleaned.withColumn("record_hash", md5(concat_ws("|",
        hashText(col("account_id")), hashText(col("name")),
        hashText(col("segment")),
        hashText(date_format(col("signup_date"), "yyyy-MM-dd")))))
    }),

    Model("stg_subscriptions", Seq("raw_subscriptions"),
      Materialization.IncrementalAppend("ingested_at"),
      checks = Seq(
        Checks.notNull("subscription_id", "account_id"),
        Checks.acceptedValues("plan", Seq("monthly", "annual"))))((_, r) => {
      val s = r("raw_subscriptions")
      val cleaned = s.select(
        Exprs.cleanString(col("subscription_id")).as("subscription_id"),
        Exprs.cleanString(col("account_id")).as("account_id"),
        lower(Exprs.cleanString(col("plan"))).as("plan"),
        col("start_date").cast("date").as("start_date"),
        col("end_date").cast("date").as("end_date"),
        // negative money → null (stg_subscriptions.sql:27-28)
        when(col("mrr_amount").cast("double") < 0, lit(null).cast("double"))
          .otherwise(col("mrr_amount").cast("double")).as("mrr_amount"),
        col("is_trial").cast("boolean").as("is_trial"),
        col("ingested_at"), col("source_file"))
      cleaned.withColumn("record_hash", md5(concat_ws("|",
        hashText(col("subscription_id")), hashText(col("account_id")),
        hashText(col("plan")),
        hashText(date_format(col("start_date"), "yyyy-MM-dd")),
        hashText(date_format(col("end_date"), "yyyy-MM-dd")),
        hashText(col("mrr_amount")), hashText(col("is_trial")))))
    }),

    // ---- current truth: latest row per key (int_*_current.sql, W1)
    Model("int_accounts_current", Seq("stg_accounts"), Materialization.View,
      checks = Seq(Checks.unique("account_id")))((_, r) =>
      latestPerKey(r("stg_accounts"), "account_id")),

    Model("int_subscriptions_current", Seq("stg_subscriptions"), Materialization.View,
      checks = Seq(Checks.unique("subscription_id")))((_, r) =>
      latestPerKey(r("stg_subscriptions"), "subscription_id")),

    // ---- SCD2 snapshots on record_hash (snap_*.sql)
    Model("snap_accounts", Seq("int_accounts_current"),
      Materialization.Scd2Snapshot("account_id", Seq("record_hash")))(
      (_, r) => r("int_accounts_current")),

    Model("snap_subscriptions", Seq("int_subscriptions_current"),
      Materialization.Scd2Snapshot("subscription_id", Seq("record_hash")))(
      (_, r) => r("int_subscriptions_current")),

    // ---- conformed calendar (dim_date.sql)
    Model("dim_date", Seq(), Materialization.Table,
      checks = Seq(Checks.unique("date_day")))((s, _) => {
      val spine = s.range(1).select(explode(sequence(
        lit(vars.dateStart).cast("date"), lit(vars.dateEnd).cast("date"),
        expr("interval 1 day"))).as("date_day"))
      spine.select(
        col("date_day"),
        year(col("date_day")).as("year"),
        quarter(col("date_day")).as("quarter"),
        month(col("date_day")).as("month"),
        date_format(col("date_day"), "MMMM").as("month_name"),
        Exprs.monthStart(col("date_day")).as("month_start_date"),
        last_day(col("date_day")).as("month_end_date"),
        (col("date_day") === Exprs.monthStart(col("date_day"))).as("is_month_start"),
        (year(col("date_day")) * 100 + month(col("date_day"))).cast("int").as("year_month"),
        months_between(Exprs.monthStart(col("date_day")), lit("1970-01-01").cast("date"))
          .cast("int").as("month_index"))
    }),

    // ---- SCD2 dimensions with surrogate keys (dim_account.sql)
    Model("dim_account", Seq("snap_accounts"), Materialization.Table,
      checks = Seq(Checks.unique("account_key"), Checks.notNull("account_key")))(
      (_, r) => r("snap_accounts").select(
        Exprs.surrogateKey(col("account_id"), col(Snapshot.ValidFrom)).as("account_key"),
        col("account_id"), col("name"), col("segment"), col("signup_date"),
        col(Snapshot.ValidFrom).as("valid_from"),
        col(Snapshot.ValidTo).as("valid_to"),
        col(Snapshot.ValidTo).isNull.as("is_current"))),

    // dim_subscription attaches the account version valid at the
    // subscription version's birth (J5 as-of at timestamp grain)
    Model("dim_subscription", Seq("snap_subscriptions", "dim_account"),
      Materialization.Table,
      checks = Seq(Checks.unique("subscription_key")))((_, r) => {
      val snap = r("snap_subscriptions").select(
        Exprs.surrogateKey(col("subscription_id"), col(Snapshot.ValidFrom)).as("subscription_key"),
        col("subscription_id"), col("account_id"), col("plan"),
        col("start_date"), col("end_date"), col("mrr_amount"), col("is_trial"),
        col(Snapshot.ValidFrom).as("valid_from"),
        col(Snapshot.ValidTo).as("valid_to"),
        col(Snapshot.ValidTo).isNull.as("is_current"))
      val acct = r("dim_account").select(
        col("account_key"), col("account_id").as("a_account_id"),
        col("valid_from").as("a_from"), col("valid_to").as("a_to"))
      snap.join(broadcast(acct),
          col("account_id") === col("a_account_id") &&
            col("valid_from") >= col("a_from") &&
            (col("a_to").isNull || col("valid_from") < col("a_to")), "left")
        .drop("a_account_id", "a_from", "a_to")
    }),

    // ---- subscription-month periodic snapshot fact
    // (fct_subscription_month.sql traced in SURVEY §3.4)
    Model("fct_subscription_month",
      Seq("int_subscriptions_current", "dim_date", "dim_subscription", "dim_account"),
      Materialization.DeleteInsert("month_start_date"),
      checks = Seq(
        Checks.uniqueCombination("subscription_id", "month_start_date"),
        Checks.singular("eom_boundary")(df =>
          df.filter(!col("is_active_at_eom") && col("mrr_eom") =!= 0.0))))((s, r) => {
      val months = r("dim_date").filter(col("is_month_start"))
        .select(col("date_day").as("month_start_date"))
      val maxMonth = months.agg(max(col("month_start_date"))).first().getDate(0)
      val subs = r("int_subscriptions_current")
      val bounded = subs
        .withColumn("start_month", Exprs.monthStart(col("start_date")))
        .withColumn("end_month_b",
          least(coalesce(Exprs.monthStart(col("end_date")), lit(maxMonth)), lit(maxMonth)))
      // J1 range join onto the broadcast months spine
      val spine = bounded.join(broadcast(months),
        col("month_start_date").between(col("start_month"), col("end_month_b")))
      val active = Exprs.activeAtEom(col("start_date"), col("end_date"), col("month_start_date"))
      val base = spine.select(
        col("subscription_id"), col("account_id"), col("month_start_date"),
        active.as("is_active_at_eom"),
        when(active && !coalesce(col("is_trial"), lit(false)),
          coalesce(col("mrr_amount"), lit(0.0))).otherwise(0.0).as("mrr_eom"),
        (col("month_start_date") === col("start_month")).as("is_start_month"),
        // reference semantics (fct_subscription_month.sql:82): end flag only
        // when a real end_date lands in this month; end_month_b stays a
        // spine bound only — open-ended subs are never flagged as ending
        (col("end_date").isNotNull &&
          Exprs.monthStart(col("end_date")) === col("month_start_date")).as("is_end_month"))
      // J3/J4 as-of SCD2 key attach, first version back-dated (W4); the
      // interval predicate is part of the LEFT join condition so
      // unmatched fact rows survive with a null key (reference
      // fct_subscription_month.sql:123-138)
      val subDim = scd2AtMonthGrain(r("dim_subscription"),
        "subscription_id", "subscription_key")
        .withColumnRenamed("subscription_id", "d_id")
      val acctDim = scd2AtMonthGrain(r("dim_account"), "account_id", "account_key")
        .withColumnRenamed("account_id", "d_id")
      def asOf(df: DataFrame, dim: DataFrame, factKey: String) =
        df.join(broadcast(dim),
            col(factKey) === col("d_id") &&
              col("month_start_date") >= col("vf_month") &&
              (col("vt_month").isNull || col("month_start_date") < col("vt_month")),
            "left")
          .drop("d_id", "vf_month", "vt_month")
      asOf(asOf(base, subDim, "subscription_id"), acctDim, "account_id")
    }),

    // ---- account-month fact with movement classification
    // (fct_account_month.sql)
    Model("fct_account_month", Seq("fct_subscription_month", "dim_date"),
      Materialization.DeleteInsert("month_start_date"),
      checks = Seq(Checks.uniqueCombination("account_id", "month_start_date")))((s, r) => {
      val monthly = r("fct_subscription_month")
        .groupBy(col("account_id"), col("month_start_date"))
        .agg(sum(col("mrr_eom")).as("m_mrr"))
      val maxMonth = r("dim_date").filter(col("is_month_start"))
        .agg(max(col("date_day"))).first().getDate(0)
      val spine = monthly.groupBy(col("account_id"))
        .agg(min(col("month_start_date")).as("first_m"), max(col("month_start_date")).as("last_m"))
        .withColumn("month_start_date", explode(sequence(
          col("first_m"),
          least(add_months(col("last_m"), 1), lit(maxMonth)),
          expr("interval 1 month"))))
        .select("account_id", "month_start_date")
      val w = Window.partitionBy(col("account_id")).orderBy(col("month_start_date"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      spine.join(monthly, Seq("account_id", "month_start_date"), "left")
        .withColumn("mrr_end", coalesce(col("m_mrr"), lit(0.0)))
        .withColumn("mrr_begin", coalesce(lag(col("mrr_end"), 1).over(w), lit(0.0)))
        .withColumn("was_paid_before",
          coalesce(max(when(col("mrr_end") > 0, 1).otherwise(0)).over(wPrev), lit(0)))
        .withColumn("movement",
          when(col("mrr_begin") === 0 && col("mrr_end") > 0 && col("was_paid_before") === 0, "new")
            .when(col("mrr_begin") === 0 && col("mrr_end") > 0, "reactivation")
            .when(col("mrr_begin") > 0 && col("mrr_end") === 0, "churn")
            .when(col("mrr_end") > col("mrr_begin"), "expansion")
            .when(col("mrr_end") < col("mrr_begin"), "contraction")
            .otherwise("flat"))
        .drop("m_mrr")
    }),

    // ---- MRR waterfall mart (mart_mrr_waterfall_month.sql)
    Model("mart_mrr_waterfall_month", Seq("fct_account_month"),
      Materialization.Table,
      checks = Seq(
        Checks.unique("month_start_date"),
        Checks.singular("waterfall_ties_out")(df => df.filter(Checks.tiesOut(
          col("begin_mrr") + col("new_mrr") + col("reactivation_mrr") +
            col("expansion_mrr") - col("contraction_mrr") - col("churn_mrr"),
          col("end_mrr"))))))((_, r) => {
      val am = r("fct_account_month")
      def mrrOf(mv: String, c: Column) = sum(when(col("movement") === mv, c).otherwise(0.0))
      am.groupBy(col("month_start_date")).agg(
        sum(col("mrr_begin")).as("begin_mrr"),
        sum(col("mrr_end")).as("end_mrr"),
        mrrOf("new", col("mrr_end")).as("new_mrr"),
        mrrOf("reactivation", col("mrr_end")).as("reactivation_mrr"),
        mrrOf("expansion", col("mrr_end") - col("mrr_begin")).as("expansion_mrr"),
        mrrOf("contraction", col("mrr_begin") - col("mrr_end")).as("contraction_mrr"),
        mrrOf("churn", col("mrr_begin")).as("churn_mrr"),
        countDistinct(when(col("movement") === "new", col("account_id"))).as("new_accounts"),
        countDistinct(when(col("movement") === "churn", col("account_id"))).as("churned_accounts"),
        countDistinct(when(col("mrr_end") > 0, col("account_id"))).as("active_accounts"))
    })
  )

  /** W1 latest-row-per-key with deterministic tiebreak (SURVEY §7.4
    * risk 4: `source_file` then stable hash order breaks exact ties). */
  def latestPerKey(df: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col("ingested_at").desc, col("source_file").desc, col("record_hash").desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Month-truncated SCD2 validity with first-version back-dating
    * (fct_subscription_month.sql:97-121): the earliest version of a key
    * covers all history before the snapshot first saw it.
    *
    * Divergence from the reference (documented per SURVEY §7.4): when
    * several versions of a key start in the SAME month, raw
    * month-truncation makes their intervals degenerate and a month can
    * match more than one version. At month grain only the latest version
    * of each month is visible at EOM, so we keep that one and rebuild
    * contiguous month intervals with `lead` — exactly one match per
    * fact month, always. */
  private def scd2AtMonthGrain(dim: DataFrame, key: String, keyCol: String): DataFrame = {
    val wKey = Window.partitionBy(col(key))
    val wInMonth = Window.partitionBy(col(key), col("vf_raw")).orderBy(col("valid_from").desc)
    val wOrder = Window.partitionBy(col(key)).orderBy(col("vf_raw"))
    dim.select(col(key), col(keyCol), col("valid_from"),
        Exprs.monthStart(col("valid_from")).as("vf_raw"))
      .withColumn("rn", row_number().over(wInMonth)).filter(col("rn") === 1).drop("rn")
      .withColumn("vt_month", lead(col("vf_raw"), 1).over(wOrder))
      .withColumn("vf_month",
        when(col("vf_raw") === min(col("vf_raw")).over(wKey), lit(BackDate).cast("date"))
          .otherwise(col("vf_raw")))
      .drop("vf_raw", "valid_from")
  }
}
