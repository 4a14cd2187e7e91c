package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity: amplify orders N× (unique keys preserved) and check the
  * heaviest pipelines' runtime scales ~linearly — evidence the plans
  * survive data growth (no quadratic fan-out, no driver collects).
  *
  * Args = amplification factors (default `16 64`); each point reruns the
  * probe queries against a freshly amplified copy so the output is a
  * scaling CURVE, not one ratio. The timed action is a noop-format write
  * (same honesty rule as Bench: `count()` dead-codes output expressions).
  *
  * SPARK_GRAFT_INIT_PARTS (optional): AQE initialPartitionNum. The
  * production answer to shuffle spill at growing SF is sizing shuffle
  * partitions to the data (brief §scale); with AQE coalescing, a high
  * initial count lets the runtime pick per-stage parallelism from actual
  * sizes instead of the static 32 — set e.g. 256 to measure how much of
  * a 64× point's superlinearity is spill vs. algorithmic. When set, each
  * amplified point is timed TWICE in the same run — default conf, then
  * with the knob — so both ratios share one baseline denominator
  * (cross-run ratios are invalid at this noise floor).
  *
  * SPARK_GRAFT_PROBE_QUERIES (optional): comma-separated subset of the
  * probe list, for re-measuring a few queries without paying the full
  * board (an x64 spine query is ~5 min/shot × 3 repeats).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val amps = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(16, 64)
    // the embedding amplification below rotates by rep % 64 (= Dims) —
    // only 64 distinct rotations exist, so any amp beyond that would
    // emit byte-identical replica vectors and silently measure the
    // adversarial 100%-duplicate workload this scheme exists to avoid
    require(amps.forall(_ <= 64),
      s"amp > 64 would duplicate embedding vectors (64 = Dims distinct rotations); got $amps")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def consume(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val allQueries = Seq("q_fct_subscription_month", "q_fct_account_month",
      "q_mrr_waterfall", "q_mrr_waterfall_delta", "q_win_lag", "q_agg_rollup",
      // LLM-pipeline operators (documents-table amplification below)
      "q_pipeline_decontaminate", "q_pipeline_shard_pack",
      "q_pipeline_sequence_pack", "q_pipeline_sequence_pack_incremental",
      "q_pipeline_pack_bestfit",
      "q_dedup_winnow_fingerprints", "q_dedup_winnow_pairs",
      "q_dedup_winnow_incremental",
      "q_dedup_minhash_lsh", "q_dedup_keep_longest",
      "q_pipeline_repeated_ngrams", "q_text_token_entropy",
      "q_text_pmi_bigrams", "q_text_zipf_fit",
      "q_pipeline_split_leakage", "q_pipeline_block_dedup",
      "q_text_pii_redact", "q_pipeline_mix_temperature", "q_dedup_semantic",
      "q_media_dedup_phash", "q_text_tfidf",
      // embeddings-table operators (label remap grows k with the corpus)
      "q_dedup_semantic_probed", "q_ann_ivf_incremental",
      "q_ann_ivf_incremental_multiprobe", "q_ann_ivf_pq",
      "q_ann_ivf_pq_incremental", "q_ann_ivf_pq_residual",
      "q_ann_ivf_pq_residual_incremental", "q_ann_ivf_pq_incremental_multiprobe",
      "q_ann_ivf_pq_residual_incremental_multiprobe",
      "q_ann_ivf_incremental_delete", "q_ann_ivf_incremental_compact",
      "q_ann_bruteforce_topk", "q_ann_sq8_rerank",
      // r14: the r13 scan-local ADC probes + the r13 bench outliers
      "q_ann_ivf_pq_multiprobe_kernel", "q_ann_ivf_pq_residual_multiprobe_kernel",
      "q_pipeline_curation_funnel", "q_pipeline_quality_classifier",
      "q_text_gopher_rules", "q_ts_resample_locf",
      // r14: filtered vector search (predicate-on-candidate-scan forms)
      "q_ann_filtered_topk", "q_ann_ivf_incremental_filtered",
      // r15: retrieval + tokenizer-induction pack
      "q_text_bm25_topk", "q_text_bm25_incremental", "q_hybrid_search_rrf",
      "q_ann_recall_eval", "q_ann_mmr_rerank", "q_ann_ivf_retrain",
      "q_text_bpe_pairs", "q_text_bpe_vocab", "q_text_lm_score",
      "q_ann_ivf_incremental_retrain",
      // r15b: compression/mining/mixing pack
      "q_ann_binary_hamming", "q_ann_matryoshka_rerank",
      "q_ann_hard_negatives", "q_ann_semi_hard_negatives",
      "q_pipeline_mix_epochs", "q_pipeline_sample_fixed_k",
      "q_pipeline_embedding_coverage", "q_ann_ivf_binary", "q_ann_knn_graph",
      "q_ann_graph_hubness", "q_ann_knn_graph_incremental",
      "q_ts_interpolate_linear",
      // r16: passage-grain dedup / late-interaction / chunking pack
      "q_dedup_substring_spans", "q_dedup_substring_remove",
      "q_ann_maxsim_colbert", "q_text_chunk_windows",
      // r16: merge-upsert materialization lifecycle + merge-maintained state
      "q_engine_merge_upsert", "q_dedup_crawl_registry",
      "q_dedup_substring_incremental", "q_engine_microbatch",
      "q_rag_chunk_retrieval",
      // r19: tokenizer application + token-true packing + clip filter
      "q_text_bpe_encode", "q_text_bpe_encode_frozen", "q_text_bpe_fertility",
      "q_pipeline_pack_tokens", "q_media_clip_filter",
      // r19 late additions: roundtrip decode + persisted-vocab shards
      "q_text_bpe_decode", "q_text_bpe_encode_incremental")
    val queries = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
      .fold(allQueries)(sub => allQueries.filter(sub.contains))
    val initParts = sys.env.get("SPARK_GRAFT_INIT_PARTS")
    val InitPartsKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    // median-of-3 per point: single-shot probe timings drifted ±20%
    // between runs of identical code (same noise floor that moved Bench
    // to medians), which is fatal to a ratio whose denominator is a
    // few seconds
    def time(q: String, d: String): Double =
      Seq.fill(3) {
        val t0 = System.nanoTime()
        consume(graft.SparkEntry.queries(q)(spark, d))
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    // warm once, then baseline
    queries.foreach(q => consume(graft.SparkEntry.queries(q)(spark, dir)))
    val base = queries.map(q => q -> time(q, dir)).toMap
    println(queries.map(q => f"$q base=${base(q)}%.2fs").mkString("  "))

    for (amp <- amps) {
      val scaled = s"/tmp/scale_$amp"
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      orders.crossJoin(spark.range(amp.toLong).toDF("rep"))
        .withColumn("o_orderkey", col("o_orderkey") * amp + col("rep"))
        .withColumn("o_custkey", col("o_custkey") * amp + col("rep"))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$scaled/orders.parquet")
      // documents: every replica's TOKENS get a replica suffix, so
      // replicas share no shingles/n-grams — an amplified corpus with the
      // base corpus's per-document statistics and duplicate RATE. Naive
      // text copies would instead multiply every LSH bucket and n-gram
      // group by amp (a 100%-duplicate workload — deliberately quadratic
      // until the chain cap), measuring a different operator than the
      // one scaled.
      spark.read.parquet(s"$dir/documents.parquet")
        .crossJoin(spark.range(amp.toLong).toDF("rep"))
        .withColumn("doc_id", col("doc_id") * amp + col("rep"))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), w => concat(w, lit("_"), col("rep"))), " "))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$scaled/documents.parquet")
      // embeddings: replicas are the base vectors ROTATED by rep%dims
      // positions — norm-preserving and near-orthogonal to the
      // originals on random data, so the amplified corpus keeps the
      // base similar-pair RATE (identical copies would instead measure
      // the adversarial 100%-duplicate case). Labels are remapped per
      // replica so the cluster COUNT grows with the corpus and cluster
      // SIZE stays bounded — the published SemDeDup configuration (k ∝
      // corpus); a fixed k would grow clusters by amp and measure the
      // within-cluster quadratic, not the operator's scaling.
      spark.read.parquet(s"$dir/embeddings.parquet")
        .crossJoin(spark.range(amp.toLong).toDF("rep"))
        .withColumn("vec_id", col("vec_id") * amp + col("rep"))
        .withColumn("label", (col("label") * amp + col("rep")).cast("int"))
        .withColumn("embedding", expr(
          "concat(slice(embedding, (CAST(rep AS INT) % 64) + 1, 64 - (CAST(rep AS INT) % 64)), " +
            "slice(embedding, 1, CAST(rep AS INT) % 64))"))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
      // events: replicas remap user_id AND event_id, so each replica is
      // a fresh user population with the base per-user series shape —
      // the hourly-grid/LOCF unit of work per user stays constant and
      // the USER count grows with the corpus (naive copies would stack
      // amp observations on the same instants, measuring a different,
      // artificially-tied workload)
      spark.read.parquet(s"$dir/events.parquet")
        .crossJoin(spark.range(amp.toLong).toDF("rep"))
        .withColumn("event_id", col("event_id") * amp + col("rep"))
        .withColumn("user_id", col("user_id") * amp + col("rep"))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$scaled/events.parquet")
      for (t <- Seq("lineitem", "customer", "nation", "region"))
        spark.read.parquet(s"$dir/$t.parquet")
          .write.mode("overwrite").parquet(s"$scaled/$t.parquet")
      for (q <- queries) {
        val sec = time(q, scaled)
        val knobbed = initParts.fold("") { n =>
          spark.conf.set(InitPartsKey, n)
          val s2 = try time(q, scaled) finally spark.conf.unset(InitPartsKey)
          f"  x${amp}_ip$n=${s2}%.2fs ratio=${s2 / base(q)}%.1f"
        }
        println(f"$q x$amp=${sec}%.2fs ratio=${sec / base(q)}%.1f$knobbed")
      }
    }
    spark.stop()
  }
}
