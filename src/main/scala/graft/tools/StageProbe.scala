package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: where does q_fct_account_month's time go at 64x?
  * Times each pipeline stage in isolation over the amplified copy. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale_64"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val subMonth = graft.queries.FinanceQueries.fctSubscriptionMonthDf(spark, dir)
    t("a_sub_month")(subMonth)
    val monthly = subMonth
      .groupBy(col("account_id"), col("month_start_date"))
      .agg(sum(col("mrr_eom")).as("m_mrr"))
    t("b_monthly_agg")(monthly)
    val acct = monthly.groupBy(col("account_id")).agg(
      map_from_entries(collect_list(struct(col("month_start_date"), col("m_mrr")))).as("mm"),
      min(col("month_start_date")).as("first_m"),
      max(col("month_start_date")).as("last_m"),
      min(when(col("m_mrr") > 0, col("month_start_date"))).as("first_paid_m"))
    t("c_map_agg")(acct)
    val spined = acct.withColumn("month_start_date",
      explode(sequence(col("first_m"), add_months(col("last_m"), 1), expr("interval 1 month"))))
    t("d_spine_explode")(spined)
    t("e_full")(graft.queries.FinanceQueries.fctAccountMonthDf(spark, dir))
    spark.stop()
  }
}
