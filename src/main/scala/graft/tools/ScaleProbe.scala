package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity: amplify orders N× (unique keys preserved) and check the
  * heaviest pipelines' runtime scales ~linearly — evidence the plans
  * survive data growth (no quadratic fan-out, no driver collects). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val amp = 16
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val big = orders.crossJoin(spark.range(amp).toDF("rep"))
      .withColumn("o_orderkey", col("o_orderkey") * amp + col("rep"))
      .withColumn("o_custkey", col("o_custkey") * amp + col("rep"))
      .drop("rep")
    big.write.mode("overwrite").parquet("/tmp/scale/orders.parquet")
    for (t <- Seq("lineitem","customer","nation","region"))
      spark.read.parquet(s"$dir/$t.parquet").write.mode("overwrite").parquet(s"/tmp/scale/$t.parquet")
    println(s"amplified orders: ${spark.read.parquet("/tmp/scale/orders.parquet").count()} rows")
    for (q <- Seq("q_fct_subscription_month","q_fct_account_month","q_mrr_waterfall","q_mrr_waterfall_delta","q_win_lag","q_agg_rollup")) {
      // warm at sf0.1 then measure amplified
      graft.SparkEntry.queries(q)(spark, dir).count()
      val t0 = System.nanoTime(); val base = graft.SparkEntry.queries(q)(spark, dir).count()
      val t1 = System.nanoTime(); val bigN = graft.SparkEntry.queries(q)(spark, "/tmp/scale").count()
      val t2 = System.nanoTime()
      println(f"$q base=${(t1-t0)/1e9}%.2fs ($base rows) x$amp=${(t2-t1)/1e9}%.2fs ($bigN rows) ratio=${(t2-t1).toDouble/(t1-t0)}%.1f")
    }
    spark.stop()
  }
}
