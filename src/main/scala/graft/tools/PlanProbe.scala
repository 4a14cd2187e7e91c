package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan dump for named driver-contract queries:
  * `runMain graft.tools.PlanProbe q_a q_b [sfDir]` — the explain-and-
  * iterate loop's fastest feedback (SURVEY.md §4). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val (qs, dir) = args.partition(_.startsWith("q_"))
    val sfDir = dir.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- qs) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
