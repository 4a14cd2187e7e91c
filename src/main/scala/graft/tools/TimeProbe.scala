package graft.tools
import org.apache.spark.sql.SparkSession
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // noop-format sink, NOT count(): under count() Catalyst dead-codes
    // every unreferenced output expression (the Bench honesty rule), so
    // counted timings here would not be comparable to Bench's numbers
    for (n <- Seq("q_dedup_clusters","q_ann_ivf_topk"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$n run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
