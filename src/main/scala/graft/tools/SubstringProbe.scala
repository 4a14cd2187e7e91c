package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic (r17): where does q_dedup_substring_spans' query
  * phase go at sf0.1? Times each stage in isolation, median-of-3. */
object SubstringProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val SpanK = 8
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
    def win = toks.filter(size(col("t")) >= SpanK)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, size(t) - ${SpanK - 1})")).as("pos"),
        col("t"))
      .withColumn("h", xxhash64(
        (0 until SpanK).map(j => expr(s"element_at(t, pos + $j)")): _*))
    // warm
    graft.SparkEntry.queries("q_dedup_substring_spans")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    t("s0_scan_toks")(toks)
    t("s1_win_hash")(win.select(col("doc_id"), col("pos"), col("h")))
    // transform-form generator: hashes built per-doc in one row op,
    // explode emits bare longs (t never rides an exploded row)
    def win2 = toks.filter(size(col("t")) >= SpanK)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(t) - ${SpanK - 1}),
           | i -> xxhash64(${(0 until SpanK).map(j => s"element_at(t, i + $j)").mkString(",")}))"""
          .stripMargin)))
    t("s1b_win_hash_transform")(win2)
    def hc = win.groupBy(col("h")).agg(count(lit(1)).as("ch"))
      .filter(col("ch") >= 2).select(col("h"))
    t("s2_hash_count")(hc)
    def cand = win.join(broadcast(hc), Seq("h"))
      .select(col("doc_id"), col("pos"),
        array_join(expr(s"slice(t, pos, $SpanK)"), " ").as("g"))
    t("s3_cand_strings")(cand)
    def cnt = cand.groupBy(col("g")).agg(count(lit(1)).as("c"))
    t("s4_exact_recount")(cnt)
    t("s5_full_v1")(graft.SparkEntry.queries("q_dedup_substring_spans")(spark, dir))
    t("s6_full_remove")(graft.SparkEntry.queries("q_dedup_substring_remove")(spark, dir))
    spark.stop()
  }
}
