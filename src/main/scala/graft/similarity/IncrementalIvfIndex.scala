package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Materialization, Model}

/** An IVF (inverted-file) ANN index maintained incrementally as engine
  * models — the high-water-mark idiom (reference `stg_accounts.sql:9-11`)
  * applied to vector search, so a growing embedding corpus is indexed
  * without re-assigning history: the published IVF lifecycle (train
  * coarse quantizer once, then stream arrivals through it) expressed as
  * a two-model DAG.
  *
  *  - `ivf_centroids` (Table): per-label element-wise integer SUM over
  *    the TRAINING snapshot (cosine is scale-invariant, so sum ≡ mean
  *    and stays integer-exact). The training ref is a FIXED snapshot by
  *    contract — at 100 TB a sample of the corpus, not the corpus — so
  *    the rebuild-per-build is deterministic-identical, k tiny rows. A
  *    CHANGED snapshot (retraining) invalidates every assignment: full
  *    refresh by design, exactly like [[graft.dedup.IncrementalDecontam]]'s
  *    versioned eval set.
  *  - `ivf_index` (IncrementalAppend on vec_id): arrivals past the
  *    model's own high-water mark are assigned to their nearest trained
  *    centroid. Assignment is the map-side `max`-of-struct argmax over a
  *    BROADCAST k-row centroid table — the exchange carries one partial
  *    row per vector, never N×k (the same shape the semantic-dedup
  *    assignment uses). With centroids frozen, an assignment is
  *    immutable: every arriving vector emits exactly one index row, so
  *    the data rows ARE the scan frontier — no marker row (the
  *    emission-watermark trap cannot arise).
  *
  * The index row stores the quantized vector beside its cluster; at
  * 100 TB this column is where product-quantization codes would go —
  * the layout (cluster-keyed, cluster-partitionable storage) is the
  * part that matters: a probe reads one cluster's partition, N/k of
  * the corpus.
  *
  * `q_ann_ivf_incremental` hash-checks a two-batch build's search
  * results against a one-shot DuckDB oracle over the same snapshot;
  * IncrementalIvfIndexSpec proves the index itself matches the one-shot
  * assignment build-by-build and that each build's work is delta-only.
  */
object IncrementalIvfIndex {

  /** Trained coarse quantizer: per-label integer centroid sums over the
    * (fixed) training snapshot of (vec_id, label, q, nsq) rows. */
  def centroids(training: DataFrame, dims: Int): DataFrame = {
    graft.functions.GraftFunctions.register(training.sparkSession)
    training.groupBy(col("label"))
      .agg(array((1 to dims).map(i => sum(element_at(col("q"), i))): _*).as("c"))
      .withColumn("ncsq", expr("dot_i64(c, c)"))
  }

  /** Nearest-centroid assignment of (vec_id, q, nsq) rows against the
    * k-row centroid table: the shared scan-local kernel
    * ([[CentroidAssign.kernel]]) — exact integer-dot cosine per centroid,
    * ties to the LOWEST label (matching the oracle's `ORDER BY sim DESC,
    * label` rank), ZERO exchanges. The previous broadcast-crossJoin +
    * max-of-struct form streamed N×k rows through a partial aggregate;
    * the kernel took q_ann_ivf_incremental's 64× ScaleProbe point from
    * 77.9× to the README table's current value. Emits
    * (vec_id, cluster, q, nsq). */
  def assign(vecs: DataFrame, cent: DataFrame): DataFrame =
    CentroidAssign.kernel(
      // project away any extra batch columns (notably a raw `label`,
      // which is NOT the learned cluster)
      vecs.select(col("vec_id"), col("q"), col("nsq")),
      CentroidAssign.collectCentroids(cent))
      .select(col("vec_id"), col("cluster"), col("q"), col("nsq"))

  /** The index DAG, wired to read (vec_id, label, q, nsq) batches from
    * `vectorsRef` and the fixed training snapshot from `trainingRef`. */
  def models(vectorsRef: String, trainingRef: String, dims: Int): Seq[Model] = Seq(
    Model("ivf_centroids", Seq(trainingRef), Materialization.Table)((_, r) =>
      centroids(r(trainingRef), dims)),
    Model.incremental(
      "ivf_index", Seq(vectorsRef, "ivf_centroids"),
      // cluster-partitioned storage: a probe of cluster c is a
      // planning-time-pruned scan of one partition directory (N/k of
      // the data) — pinned by IncrementalIvfIndexSpec on the executed
      // plan's PartitionFilters; appends only touch the partitions
      // their rows belong to
      Materialization.IncrementalAppend("vec_id", Seq("cluster"))) { (_, r, prior) =>
      val hwm = Incremental.hwm(prior, "vec_id")
      assign(r(vectorsRef).filter(col("vec_id") > hwm), r("ivf_centroids"))
        // co-locate each cluster in one write task before the hive
        // partitioned write: without this every scan task fans out one
        // file per cluster it touches (tasks × k tiny files at 64×
        // scale); with it the batch writes exactly one file per cluster
        // per build — one N-row exchange, paid once at write time
        .repartition(col("cluster"))
    })

  /** Probe the accumulated index: queries are corpus vectors (vec_id <
    * nQueries) probing their OWN cluster — each query's candidate set is
    * one cluster's rows (N/k of the corpus; cluster-partitioned storage
    * makes this a pruned scan at 100 TB), ranked by exact integer-dot
    * cosine. Output matches the oracle: (query_id, vec_id, rnk, cos_sim). */
  def searchTopK(index: DataFrame, nQueries: Int, topK: Int): DataFrame = {
    graft.functions.GraftFunctions.register(index.sparkSession)
    val qs = index.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("cluster"),
        col("q").as("qq"), col("nsq").as("nq"))
    // skew-safe final reduce: the bounded topk_cos aggregate collapses
    // each scan partition to ≤k candidates per query before the
    // exchange (the row_number window form shuffled the whole probed
    // cluster into one partition per query)
    index.join(broadcast(qs),
        index("cluster") === qs("cluster") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("dot_i64(qq, q)").as("dot"), col("nq"), col("nsq").as("nc"))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_cos(struct(vec_id, dot, nq, nc), $topK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.vec_id").as("vec_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        round(col("col.cos"), 4).as("cos_sim"))
  }
}
