package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Substring-dedup stage diagnostic. r17: where does the query phase go
  * at sf0.1 (answer: the scan floor)? r18: is the "generator runs under
  * each consumer" recomputation a lever (answer: NO — v2 caches the wide
  * position stream and is 2.5× SLOWER, v3 caches just the candidate
  * survivors and is a wash; regeneration is codegen-cheap, the 16× cost
  * is the 9M-row hash-count exchange). Interleaved v1 controls bracket
  * each variant. Stage times are median-of-3. */
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
    // v2: generator runs ONCE into a cached wide position stream
    // (doc_id, pos, h, tk0..tk7); the hash-count branch prunes to the h
    // column off the columnar cache, the candidate branch probes it
    def spansV2(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val tokCols = (0 until SpanK).map(j =>
        expr(s"element_at(t, pos + $j)").as(s"tk$j"))
      val wide = win.select(Seq(col("doc_id"), col("pos"), col("h")) ++ tokCols: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hc2 = wide.groupBy(col("h")).agg(count(lit(1)).as("ch"))
        .filter(col("ch") >= 2).select(col("h"))
      val keys = (0 until SpanK).map(j => s"tk$j")
      val cand2 = wide.join(broadcast(hc2), Seq("h"))
      val cnt2 = cand2.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      val dup2 = cand2.join(broadcast(cnt2.filter(col("c") >= 2)), keys)
        .withColumn("run_key", col("pos") - org.apache.spark.sql.functions
          .row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("pos"))))
      (dup2.groupBy(col("doc_id"), col("run_key"))
        .agg(min(col("pos")).cast("int").as("span_start"),
          (max(col("pos")) + (SpanK - 1)).cast("int").as("span_end"),
          count(lit(1)).cast("int").as("n_grams"))
        .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams")),
        wide)
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val (df, wide) = spansV2()
      df.write.format("noop").mode("overwrite").save()
      println(f"s7_full_v2_cached run$i ${(System.nanoTime() - t0) / 1e9}%.3fs")
      wide.unpersist(); ()
    }
    // interleaved v1 re-run (same-session A/B control)
    t("s8_full_v1_again")(graft.SparkEntry.queries("q_dedup_substring_spans")(spark, dir))
    // v3: cache only the CANDIDATE survivors (~9% of positions) — v1
    // recomputes the generator under BOTH consumers of cand (the exact
    // recount and the dup join), i.e. three generator runs per query
    def spansV3(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val tokCols = (0 until SpanK).map(j =>
        expr(s"element_at(t, pos + $j)").as(s"tk$j"))
      val hc3 = win.groupBy(col("h")).agg(count(lit(1)).as("ch"))
        .filter(col("ch") >= 2).select(col("h"))
      val cand3 = win.join(broadcast(hc3), Seq("h"))
        .select(Seq(col("doc_id"), col("pos")) ++ tokCols: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keys = (0 until SpanK).map(j => s"tk$j")
      val cnt3 = cand3.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      val dup3 = cand3.join(broadcast(cnt3.filter(col("c") >= 2)), keys)
        .withColumn("run_key", col("pos") - org.apache.spark.sql.functions
          .row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("pos"))))
      (dup3.groupBy(col("doc_id"), col("run_key"))
        .agg(min(col("pos")).cast("int").as("span_start"),
          (max(col("pos")) + (SpanK - 1)).cast("int").as("span_end"),
          count(lit(1)).cast("int").as("n_grams"))
        .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams")),
        cand3)
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val (df, c) = spansV3()
      df.write.format("noop").mode("overwrite").save()
      println(f"s9_full_v3_candcache run$i ${(System.nanoTime() - t0) / 1e9}%.3fs")
      c.unpersist(); ()
    }
    t("s10_full_v1_again")(graft.SparkEntry.queries("q_dedup_substring_spans")(spark, dir))
    // v4 (r21, the last untested lever — VERDICT task 2): pack the 8
    // token columns into ONE BINARY key before the exact-recount
    // exchange. An UnsafeRow ships 8 offset/length words + padding for
    // the 8-string tuple; the packed key is one field, and BinaryType
    // group/join comparison is raw byte compare (no collation path).
    // Injective because tokens come from split(' '). The recount
    // exchange itself only carries the ~9% survivors, so this targets
    // per-row width, not row count.
    def spansV4() = {
      val pk = array_join(expr(s"slice(t, pos, $SpanK)"), " ")
        .cast("binary").as("pk")
      val hc4 = win.groupBy(col("h")).agg(count(lit(1)).as("ch"))
        .filter(col("ch") >= 2).select(col("h"))
      val cand4 = win.join(broadcast(hc4), Seq("h"))
        .select(col("doc_id"), col("pos"), pk)
      val cnt4 = cand4.groupBy(col("pk")).agg(count(lit(1)).as("c"))
      val dup4 = cand4.join(broadcast(cnt4.filter(col("c") >= 2)), Seq("pk"))
        .withColumn("run_key", col("pos") - org.apache.spark.sql.functions
          .row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("pos"))))
      dup4.groupBy(col("doc_id"), col("run_key"))
        .agg(min(col("pos")).cast("int").as("span_start"),
          (max(col("pos")) + (SpanK - 1)).cast("int").as("span_end"),
          count(lit(1)).cast("int").as("n_grams"))
        .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"))
    }
    t("s11_full_v4_packedkey")(spansV4())
    t("s12_full_v1_again")(graft.SparkEntry.queries("q_dedup_substring_spans")(spark, dir))
    spark.stop()
  }
}
