package graft.tools
import org.apache.spark.sql.SparkSession

/** One-off diagnostic: is a heavy plan's superlinearity at 64x
  * amplification shuffle-partition sizing (per-partition spill) or
  * algorithmic? Runs the query over the amplified copy once per shuffle
  * partition count — if time falls as partitions grow, the fix is sizing
  * partitions to the data (the 100 TB rule: keep per-task state in
  * memory), not a different plan. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale_64"
    val q = if (args.length > 1) args(1) else "q_fct_account_month"
    val parts = if (args.length > 2) args.drop(2).toSeq else Seq("32", "256")
    for (p <- parts) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", p)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$q parts=$p ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.stop()
    }
  }
}
