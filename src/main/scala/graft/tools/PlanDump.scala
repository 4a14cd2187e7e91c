package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `explain("formatted")` dumps for the r21 optimization evidence:
  * `runMain graft.tools.PlanDump <suffix> <outDir> <name...> [sfDir]`
  * writes `<outDir>/<name>_<suffix>.txt` for each name — declared
  * driver-contract queries (q_*) AND the named INTERNAL plans whose
  * shape an optimization targets but which no declared query exposes as
  * its final plan (a bench row's build phase runs them during
  * construction): `pq_codebook_training` = ProductQuantizer.entriesDf
  * over the sf corpus. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val outDir = args(1)
    val rest = args.drop(2)
    val (names, dirArg) = rest.partition(a => !a.startsWith("/"))
    val sfDir = dirArg.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def quantized: DataFrame =
      // same construction as SimilarityQueries.quantized (the native
      // quantize_i64 kernel), so internal-plan dumps match production
      graft.Tables.embeddings(spark, sfDir).select(
        col("vec_id"), col("label"), expr("quantize_i64(embedding)").as("q"))
        .withColumn("nsq", expr("dot_i64(q, q)"))
    def internal(name: String): Option[DataFrame] = name match {
      case "pq_codebook_training" => Some(
        graft.similarity.ProductQuantizer.entriesDf(
          quantized.select(col("vec_id"), col("q"), col("nsq"))))
      case "ivf_centroids_training" => Some(
        graft.similarity.IncrementalIvfIndex.centroids(quantized, 64))
      case _ => None
    }
    for (n <- names) {
      val df = internal(n).getOrElse(graft.SparkEntry.queries(n)(spark, sfDir))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"wrote $outDir/${n}_$suffix.txt (${plan.length} bytes)")
    }
    spark.stop()
  }
}
