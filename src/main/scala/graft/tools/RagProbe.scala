package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** RAG-retrieval stage diagnostic (the r19 re-grade of the board's last
  * live perf-weak row): where does q_rag_chunk_retrieval's query phase
  * go at sf0.1, and is the two-level chunk→doc aggregation worth a
  * one-exchange rewrite (pre-repartition on (query_id, doc_id) so the
  * chunk-grain agg AND the doc-grain max-pool both run under ONE
  * exchange — HashPartitioning(q,d) satisfies ClusteredDistribution
  * (q,d,chunk))? Stage times are median-of-3, interleaved full-query
  * controls bracket the variant. */
object RagProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (w, s) = (24, 16) // ChunkW, ChunkStride
    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name ${runs.sorted.apply(1)}%.3fs  (${runs.map(r => f"$r%.2f").mkString(",")})")
    }
    def toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    def dterm = toks
      .select(col("doc_id"), explode(array_distinct(col("t"))).as("tok"))
    def dfreq = dterm.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    def nd = graft.Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    def qd = toks.select(col("doc_id")).orderBy(col("doc_id")).limit(5)
      .withColumnRenamed("doc_id", "query_id")
    def qw = dterm
      .join(broadcast(qd), col("doc_id") === col("query_id"))
      .join(dfreq, Seq("tok"))
      .crossJoin(broadcast(nd))
      .select(col("query_id"), col("tok"),
        round(log(col("n") * lit(1.0) / col("df")) * 1000000, 0)
          .cast("long").as("w"))
    def cterm = toks
      .select(col("doc_id"),
        explode(expr(
          s"sequence(0, CASE WHEN size(t) <= $w THEN 0 " +
            s"ELSE (size(t) - $w + $s - 1) div $s END)")).as("chunk_id"),
        col("t"))
      .select(col("doc_id"), col("chunk_id"),
        explode(array_distinct(expr(s"slice(t, 1 + chunk_id * $s, $w)"))).as("tok"))
    def scored = cterm.join(broadcast(qw), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
    // warm
    graft.SparkEntry.queries("q_rag_chunk_retrieval")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    t("r0_toks_scan")(toks)
    t("r1_dterm")(dterm)
    t("r2_dfreq_agg")(dfreq)
    t("r3_qw_weights")(qw)
    t("r4_cterm_generator")(cterm)
    t("r5_scored_bcast_join")(scored)
    t("r6_full_v1")(graft.SparkEntry.queries("q_rag_chunk_retrieval")(spark, dir))
    // v2: ONE exchange serves chunk-grain sum AND doc-grain max-pool
    def v2 = {
      val cs = scored.repartition(col("query_id"), col("doc_id"))
        .groupBy(col("query_id"), col("doc_id"), col("chunk_id"))
        .agg(sum(col("w")).as("s"))
      val ds = cs.groupBy(col("query_id"), col("doc_id"))
        .agg(max(col("s")).as("score"))
      ds.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rnk") <= 10)
        .select(col("query_id"), col("doc_id"),
          col("rnk").cast("int").as("rnk"), col("score"))
    }
    t("r7_v2_one_exchange")(v2)
    t("r8_full_v1_again")(graft.SparkEntry.queries("q_rag_chunk_retrieval")(spark, dir))
    t("r9_v2_again")(v2)
    spark.stop()
  }
}
