package graft.queries

import graft.SparkSpec
import graft.engine.Checks
import org.apache.spark.sql.functions._

/** The reference's three singular tests, ported to the rebuilt pipeline
  * (SURVEY.md §2.11; `/root/reference/tests/`): violation queries
  * asserted empty over sf0.001.
  */
class FinanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val subMonth = FinanceQueries.fctSubscriptionMonthDf(spark, dir).cache()
  private lazy val acctMonth = FinanceQueries.fctAccountMonthDf(spark, dir).cache()
  private lazy val wf = FinanceQueries.waterfallDf(spark, dir).cache()

  test("waterfall algebra ties out: begin+new+react+expansion-contraction-churn = end") {
    // reference: tests/test_waterfall_ties_out.sql:15-26 (tolerance 1e-4)
    val violations = wf.filter(Checks.tiesOut(
      col("begin_mrr") + col("new_mrr") + col("reactivation_mrr") +
        col("expansion_mrr") - col("contraction_mrr") - col("churn_mrr"),
      col("end_mrr")))
    assert(violations.isEmpty, violations.head(3).mkString("; "))
  }

  test("account-month end MRR ties to sum of subscription-month MRR") {
    // reference: tests/test_account_month_ties_subscription_month.sql:19-33
    val subAgg = subMonth.groupBy(col("account_id"), col("month_start_date"))
      .agg(sum(col("mrr_eom")).as("sub_mrr"))
    val violations = acctMonth
      .join(subAgg, Seq("account_id", "month_start_date"), "left")
      .filter(Checks.tiesOut(col("mrr_end"), coalesce(col("sub_mrr"), lit(0.0))))
    assert(violations.isEmpty, violations.head(3).mkString("; "))
  }

  test("EOM boundary: subscription ended before month-end contributes 0 MRR") {
    // reference: tests/test_eom_end_date_boundary.sql:15-25
    val violations = subMonth
      .filter(!col("is_active_at_eom") && col("mrr_eom") =!= 0.0)
    assert(violations.isEmpty, violations.head(3).mkString("; "))
  }

  test("movement classification is total and mutually exclusive") {
    // every (begin,end) pair maps to exactly one arm (fct_account_month.sql:111-119)
    val n = acctMonth.count()
    val byMovement = acctMonth.groupBy(col("movement")).count()
    assert(byMovement.agg(sum(col("count"))).first().getLong(0) == n)
    val known = Set("new", "reactivation", "churn", "expansion", "contraction", "flat")
    val labels = byMovement.select("movement").collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(known), labels)
  }

  test("waterfall densifies: consecutive months, begin(m+1) = end(m) summed") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("month_start_date"))
    val chained = wf
      .withColumn("next_begin", lead(col("begin_mrr"), 1).over(w))
      .withColumn("next_month", lead(col("month_start_date"), 1).over(w))
      .filter(col("next_month").isNotNull)
      // chain check only where months are consecutive; account spines are
      // per-account so global begin(m+1)=end(m) holds when every account
      // active at m is still in its spine at m+1 — guaranteed by the
      // +1-month spine extension except at the global last month.
      .filter(add_months(col("month_start_date"), 1) === col("next_month"))
      .filter(Checks.tiesOut(col("end_mrr"), col("next_begin"), tol = 1e-6))
    // all active accounts' spines extend one month past last activity, so
    // every non-terminal month chains exactly
    assert(chained.isEmpty, chained.head(3).mkString("; "))
  }
}
