package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Recall contract for the ANN variants: every approximation is graded
  * against the brute-force top-k ground truth, and multi-probe LSH must
  * strictly beat single-probe (the whole point of probing the two
  * lowest-|margin| neighbor buckets is recovering true neighbors whose
  * sign vector differs from the query's by one near-boundary bit).
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pairs(name: String): Set[(Long, Long)] = {
    import spark.implicits._
    graft.SparkEntry.queries(name)(spark, dir)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect().toSet
  }

  test("multi-probe LSH recall strictly exceeds single-probe, within brute-force truth") {
    val truth = pairs("q_ann_bruteforce_topk")
    val single = pairs("q_ann_lsh_topk")
    val multi = pairs("q_ann_lsh_multiprobe")
    // each variant's hits are graded against brute-force ground truth
    val singleRecall = (single intersect truth).size
    val multiRecall = (multi intersect truth).size
    assert(multiRecall > singleRecall,
      s"multi-probe recall $multiRecall must beat single-probe $singleRecall of ${truth.size}")
    // probing a superset of buckets can only add candidates: every
    // single-probe true hit survives in the multi-probe result
    assert((single intersect truth).subsetOf(multi))
  }

  test("multi-probe IVF (nprobe=2) recall dominates single-probe, within brute-force truth") {
    val truth = pairs("q_ann_bruteforce_topk")
    val single = pairs("q_ann_ivf_topk")
    val multi = pairs("q_ann_ivf_multiprobe")
    val singleRecall = (single intersect truth).size
    val multiRecall = (multi intersect truth).size
    // the 2-cluster candidate set is a superset of the 1-cluster set, so
    // true hits can only be added — ≥ always; on this corpus (queries
    // near centroid boundaries — see the semantic-dedup geometry note)
    // the second cluster recovers real neighbors, so require a STRICT win
    assert((single intersect truth).subsetOf(multi intersect truth))
    assert(multiRecall > singleRecall,
      s"nprobe=2 recall $multiRecall must beat nprobe=1 $singleRecall of ${truth.size}")
  }

  test("filtered search: predicate honored exactly; widened filtered IVF measured vs filtered truth") {
    import spark.implicits._
    // filtered TRUTH: every returned candidate satisfies the predicate,
    // and each query returns a full k (pre-filtering can never starve
    // the result below k while ≥ k qualifying candidates exist)
    val truth = pairs("q_ann_filtered_topk")
    assert(truth.nonEmpty && truth.forall { case (_, v) => v % 3 == 0 })
    val perQuery = truth.groupBy(_._1).values.map(_.size).toSet
    assert(perQuery == Set(10), s"per-query result sizes $perQuery")
    // the filtered result is NOT a subset-filter of the unfiltered
    // top-k (post-filtering): qualifying neighbors outside the
    // unfiltered top-10 must appear
    val unfiltered = pairs("q_ann_bruteforce_topk")
    assert((truth -- unfiltered).nonEmpty,
      "filtered truth ⊆ unfiltered top-k — predicate too weak to distinguish pre/post filtering")
    // filtered IVF: predicate honored, recall graded against the
    // FILTERED truth; the 1/sel-widened probe (3 clusters) must keep a
    // usable floor on this near-isotropic corpus, where even unfiltered
    // single-probe IVF recall sits near 0.5 (the semantic-dedup geometry
    // note: 42% own-label rate) — measured 0.48 when pinned
    val ivf = pairs("q_ann_ivf_filtered")
    assert(ivf.forall { case (_, v) => v % 3 == 0 })
    val recall = (ivf intersect truth).size.toDouble / truth.size
    assert(recall >= 0.4, s"filtered-IVF recall vs filtered truth $recall")
  }

  test("SQ8 shortlist + exact re-rank: near-full recall at 8-bit candidate scoring") {
    val truth = pairs("q_ann_bruteforce_topk")
    val sq8 = pairs("q_ann_sq8_rerank")
    val recall = (sq8 intersect truth).size.toDouble / truth.size
    // int8 scoring only has to land true neighbors inside the 3k-wide
    // shortlist — exact re-rank fixes their order — so losses can only
    // happen at the shortlist BOUNDARY; pin a high floor and record the
    // measured value in the assertion message
    assert(recall >= 0.9, s"SQ8 re-rank recall $recall (${(sq8 intersect truth).size}/${truth.size})")
  }

  test("IVF-PQ: ADC table-lookup scoring keeps recall close to full-precision IVF") {
    val ivf = pairs("q_ann_ivf_topk")
    val pq = pairs("q_ann_ivf_pq")
    // same coarse cluster probed, so the candidate sets match; PQ codes
    // (M=8 bytes per candidate) only have to land true neighbors inside
    // the 3k-wide ADC shortlist — exact re-rank fixes their order — so
    // disagreement can only come from the shortlist boundary. PQ is a
    // coarser code than SQ8 (8 codebook indices vs 64 int8 components),
    // so the floor is lower than SQ8's 0.9, but must stay well above
    // chance; the measured value is recorded in the assertion message.
    val agree = (pq intersect ivf).size.toDouble / ivf.size
    assert(agree >= 0.5, s"IVF-PQ agreement with full-precision IVF $agree")
    // recall vs absolute truth can never EXCEED the IVF stage's (ADC
    // cannot recover a neighbor the cluster probe lost)
    val truth = pairs("q_ann_bruteforce_topk")
    assert((pq intersect truth).size <= (ivf intersect truth).size,
      s"PQ recall ${(pq intersect truth).size} vs IVF ${(ivf intersect truth).size} of ${truth.size}")
  }

  test("residual PQ (IVFADC): lower total reconstruction error than raw-vector PQ; IVF-bounded recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val PQ = graft.similarity.ProductQuantizer
    graft.functions.GraftFunctions.register(spark)
    // sf0.001 corpus quantized the engine way
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"label".cast("int").as("label"),
        transform($"embedding", x => round(x * 100, 0).cast("long")).as("q"))
      .withColumn("nsq", expr("dot_i64(q, q)"))
      .localCheckpoint()

    // PQ reconstruction: r̂ = concatenation of the coded entries
    // (subspaces partition the dims)
    def rhat(entTab: org.apache.spark.sql.Column) = flatten(
      array((0 until PQ.M).map(m => element_at(element_at(entTab, m + 1),
        element_at(col("codes"), m + 1) + 1)): _*))

    // raw-vector PQ reconstruction error: Σ |v − r̂_raw|²
    val cbRaw = PQ.train(e)
    val rawErr = e.withColumn("codes", PQ.codesCol)
      .withColumn("vhat", rhat(PQ.entriesLit(cbRaw)))
      .withColumn("d", expr("zip_with(q, vhat, (a, b) -> a - b)"))
      .agg(sum(expr("dot_i64(d, d)"))).first().getLong(0)

    // residual PQ: same codebook budget over v − m_c (floor-div
    // integer cluster means), v̂ = m_c + r̂, error Σ |v − v̂|²
    val means = e.groupBy($"label")
      .agg(array((1 to 64).map(i => sum(element_at($"q", i))): _*).as("s"),
        count(lit(1)).as("n"))
      .select($"label", expr("transform(s, x -> (x - pmod(x, n)) div n)").as("mc"))
    val resid = e.select($"vec_id", $"label", $"q".as("qv"))
      .join(broadcast(means), "label")
      .withColumn("q", expr("zip_with(qv, mc, (a, b) -> a - b)"))
      .withColumn("nsq", expr("dot_i64(q, q)"))
      .localCheckpoint()
    val cbRes = PQ.train(resid.select($"vec_id", $"q", $"nsq"))
    val resErr = resid.withColumn("codes", PQ.codesCol)
      .withColumn("rh", rhat(PQ.entriesLit(cbRes)))
      .withColumn("vhat", expr("zip_with(mc, rh, (a, b) -> a + b)"))
      .withColumn("d", expr("zip_with(qv, vhat, (a, b) -> a - b)"))
      .agg(sum(expr("dot_i64(d, d)"))).first().getLong(0)

    // the published IVFADC claim, as a measured property on this
    // corpus: the same codebook budget spent on residuals reconstructs
    // strictly better in aggregate
    assert(resErr < rawErr,
      s"residual PQ error $resErr must beat raw PQ error $rawErr")

    // and the operator's recall is bounded by its coarse stage, like
    // every composed probe
    val ivf = pairs("q_ann_ivf_topk")
    val pqr = pairs("q_ann_ivf_pq_residual")
    val truth = pairs("q_ann_bruteforce_topk")
    assert((pqr intersect truth).size <= (ivf intersect truth).size)
    val agree = (pqr intersect ivf).size.toDouble / ivf.size
    assert(agree >= 0.5, s"residual-PQ agreement with full-precision IVF $agree")
  }

  test("PQ multi-probe over the incremental index: strict recall win over single-probe PQ") {
    val truth = pairs("q_ann_bruteforce_topk")
    val single = pairs("q_ann_ivf_pq_incremental")
    val multi = pairs("q_ann_ivf_pq_incremental_multiprobe")
    // nprobe=2 doubles the ADC candidate pool; unlike the exact
    // multi-probe, a FIXED shortlist means new candidates can in
    // principle displace a single-probe survivor at the boundary, so
    // the pin is the recall WIN (the reason the production config runs
    // nprobe>1), not hit-set containment
    val singleRecall = (single intersect truth).size
    val multiRecall = (multi intersect truth).size
    assert(multiRecall > singleRecall,
      s"PQ nprobe=2 recall $multiRecall must beat nprobe=1 $singleRecall of ${truth.size}")
  }

  test("residual-PQ multi-probe (full IVFADC config): strict recall win over single-probe residual") {
    val truth = pairs("q_ann_bruteforce_topk")
    val single = pairs("q_ann_ivf_pq_residual_incremental")
    val multi = pairs("q_ann_ivf_pq_residual_incremental_multiprobe")
    val singleRecall = (single intersect truth).size
    val multiRecall = (multi intersect truth).size
    assert(multiRecall > singleRecall,
      s"residual-PQ nprobe=2 recall $multiRecall must beat nprobe=1 $singleRecall of ${truth.size}")
  }

  test("IVF+SQ8 composed probe: recall bounded by IVF stage, codes lose little") {
    val ivf = pairs("q_ann_ivf_topk")
    val ivfSq8 = pairs("q_ann_ivf_sq8")
    // same cluster probed, so candidate sets match; int8 scoring only
    // reorders the shortlist boundary — the composed result must agree
    // with full-precision single-probe IVF on nearly everything
    val agree = (ivfSq8 intersect ivf).size.toDouble / ivf.size
    assert(agree >= 0.9, s"IVF+SQ8 agreement with IVF $agree")
    // and recall vs absolute truth can never EXCEED the IVF stage's
    // (codes cannot recover a neighbor the cluster probe lost)
    val truth = pairs("q_ann_bruteforce_topk")
    assert((ivfSq8 intersect truth).size <= (ivf intersect truth).size)
  }

  test("retrain assignment step: k-means objective monotone, migration matrix consistent") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q_ann_ivf_retrain")(spark, dir)
      .select($"label".cast("int"), $"n_before".cast("long"),
        $"n_after".cast("long"), $"n_stay".cast("long"))
      .as[(Int, Long, Long, Long)].collect()
    // conservation: the step moves vectors, never creates or drops them
    assert(out.map(_._2).sum == out.map(_._3).sum)
    assert(out.forall { case (_, _, after, stay) => stay <= after })
    // the Lloyd guarantee: reassigning each vector to its NEAREST
    // centroid maximizes Σ cos(v, c_assign) over all assignments with
    // these centroids — in particular it is ≥ the incumbent labeling's
    // objective (strict whenever anything moved)
    val e = graft.Tables.embeddings(spark, dir).selectExpr(
      "vec_id", "label",
      "transform(embedding, x -> cast(round(x * 100) as bigint)) as q")
      .selectExpr("vec_id", "label", "q", "dot_i64(q, q) as nsq")
    val cent = e.groupBy($"label")
      .agg(org.apache.spark.sql.functions.array((1 to 64).map(i =>
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.element_at($"q", i))): _*).as("c"))
      .selectExpr("label", "c", "dot_i64(c, c) as ncsq")
    val cents = graft.similarity.CentroidAssign.collectCentroids(cent)
    val assigned = graft.similarity.CentroidAssign
      .kernel(e.select($"vec_id", $"q", $"nsq"), cents)
    val objAfter = assigned.agg(org.apache.spark.sql.functions.sum($"cos_c"))
      .as[Double].head()
    val centMap = cents.map(c => c._1 -> c).toMap
    val objBefore = e.select($"vec_id", $"label", $"q", $"nsq")
      .as[(Long, Int, Array[Long], Long)].collect().map { case (_, l, q, nsq) =>
        val (_, c, ncsq) = centMap(l)
        var d = 0L; var i = 0
        while (i < q.length) { d += q(i) * c(i); i += 1 }
        d / math.sqrt(nsq.toDouble * ncsq.toDouble)
      }.sum
    // tolerance covers summation-order epsilon when nothing moved
    // (Spark's partition-order sum vs the driver-side replay)
    assert(objAfter >= objBefore - 1e-9,
      s"assignment step must not worsen the objective: $objAfter < $objBefore")
    val moved = out.map { case (_, _, after, stay) => after - stay }.sum
    if (moved > 0) assert(objAfter > objBefore)
  }

  // ---------- driver-side exact replays of the two-stage variants ----------
  // 500 × 64 int vectors fit on the driver, so the spec replays each
  // shortlist + re-rank with the same integer arithmetic / IEEE ops /
  // tie-break contract and requires EXACT (query_id, vec_id, rnk)
  // equality — a stronger check than a recall floor (which is also
  // asserted, with the measured value noted, so a geometry change in
  // the testdata is caught as a drifted floor, not silently).

  private lazy val corpus: Array[(Long, Int, Array[Long])] = {
    import spark.implicits._
    graft.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("int"),
        DedupQueries.quantize($"embedding").as("q"))
      .as[(Long, Int, Array[Long])].collect()
  }

  private def triples(name: String): Set[(Long, Long, Int)] = {
    import spark.implicits._
    graft.SparkEntry.queries(name)(spark, dir)
      .select($"query_id".cast("long"), $"vec_id".cast("long"), $"rnk".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
  }

  /** cos over the first `pref` dims (prefix norms on BOTH sides — the
    * Matryoshka coarse metric; pref = 64 is the full exact cosine). */
  private def cosOf(a: Array[Long], b: Array[Long], pref: Int = 64): Double = {
    var d = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < pref) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** The engine-wide ANN ordering contract: (cos DESC, vec_id ASC),
    * NaN-largest via Double.compare — mirrors [[graft.functions.TopKCos]]. */
  private val bestFirst: Ordering[(Long, Double)] = (a, b) => {
    val c = java.lang.Double.compare(b._2, a._2)
    if (c != 0) c else java.lang.Long.compare(a._1, b._1)
  }

  test("binary Hamming shortlist + exact re-rank: bit-for-bit driver replay; recall floor") {
    val byId = corpus.map(v => v._1 -> v._3).toMap
    def word(q: Array[Long], off: Int): Long =
      (0 until 32).foldLeft(0L)((a, i) => if (q(off + i) > 0) a | (1L << i) else a)
    val expected = (0L until 5L).flatMap { qid =>
      val qv = byId(qid)
      val (qw1, qw2) = (word(qv, 0), word(qv, 32))
      val shortlist = corpus.filter(_._1 != qid).map { c =>
        (c._1, java.lang.Long.bitCount(qw1 ^ word(c._3, 0))
          + java.lang.Long.bitCount(qw2 ^ word(c._3, 32)))
      }.sortBy(t => (t._2, t._1)).take(30).map(_._1)
      shortlist.map(id => (id, cosOf(qv, byId(id)))).sorted(bestFirst).take(10)
        .zipWithIndex.map { case ((id, _), i) => (qid, id, i + 1) }
    }.toSet
    assert(triples("q_ann_binary_hamming") == expected)
    // recall floor vs brute-force truth: measured 0.60 on this corpus —
    // 1-bit codes keep over half the true top-10 through a 30-wide
    // shortlist even on near-isotropic data
    val truth = pairs("q_ann_bruteforce_topk")
    val got = pairs("q_ann_binary_hamming")
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"binary-Hamming recall $recall")
  }

  test("Matryoshka prefix rerank: bit-for-bit driver replay; prefix recall floor") {
    val byId = corpus.map(v => v._1 -> v._3).toMap
    val expected = (0L until 5L).flatMap { qid =>
      val qv = byId(qid)
      val shortlist = corpus.filter(_._1 != qid)
        .map(c => (c._1, cosOf(qv, c._3, 16))).sorted(bestFirst).take(30)
      shortlist.map(t => (t._1, cosOf(qv, byId(t._1)))).sorted(bestFirst).take(10)
        .zipWithIndex.map { case ((id, _), i) => (qid, id, i + 1) }
    }.toSet
    assert(triples("q_ann_matryoshka_rerank") == expected)
    // measured 0.36 on this corpus — honest for RANDOM embeddings,
    // where the 16-dim prefix carries only 1/4 of the information;
    // MRL-trained embeddings front-load it (the operator's premise)
    val truth = pairs("q_ann_bruteforce_topk")
    val got = pairs("q_ann_matryoshka_rerank")
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.25, s"matryoshka recall $recall")
  }

  test("semi-hard negatives: cross-label only, below the nearest-positive bound, full k, exact replay") {
    val byId = corpus.map(v => v._1 -> (v._2, v._3)).toMap
    val expected = (0L until 5L).flatMap { qid =>
      val (ql, qv) = byId(qid)
      val others = corpus.filter(_._1 != qid)
      val bound = others.filter(_._2 == ql).map(c => cosOf(qv, c._3)).max
      others.filter(_._2 != ql).map(c => (c._1, cosOf(qv, c._3)))
        .filter(_._2 < bound).sorted(bestFirst).take(10)
        .zipWithIndex.map { case ((id, _), i) => (qid, id, i + 1) }
    }.toSet
    val got = triples("q_ann_semi_hard_negatives")
    assert(got == expected)
    // structural re-statements of the replay (readable failure modes):
    // every returned negative is cross-label, and each query fills k
    val labels = corpus.map(v => v._1 -> v._2).toMap
    assert(got.forall { case (q, v, _) => labels(v) != labels(q) })
    assert(got.groupBy(_._1).values.forall(_.size == 10))
    // semi-hard ≠ hard: the bound actually excludes some top negatives
    // on this corpus (measured overlap 26/50)
    assert(got.map(t => (t._1, t._2)) != pairs("q_ann_hard_negatives"))
  }

  test("IVF+binary composed probe: recall bounded by the cluster stage, codes lose little") {
    val truth = pairs("q_ann_bruteforce_topk")
    val ivf = pairs("q_ann_ivf_topk")
    val ivfB = pairs("q_ann_ivf_binary")
    // candidates ⊆ probed cluster's members, so the composed probe can
    // never recover a neighbor the cluster stage lost
    assert((ivfB intersect truth).size <= (ivf intersect truth).size)
    // the 1-bit codes keep most of what the cluster stage kept
    // (measured 0.14 vs the cluster stage's 0.16 on this corpus)
    assert((ivfB intersect truth).size.toDouble / truth.size >= 0.1)
  }

  test("kNN graph: exact driver replay; out-degree = min(k, cluster size - 1); edges in-cluster") {
    import spark.implicits._
    val byId = corpus.map(v => v._1 -> (v._2, v._3)).toMap
    val byLabel = corpus.groupBy(_._2)
    val expected = corpus.flatMap { case (src, lab, q) =>
      byLabel(lab).filter(_._1 != src)
        .map(c => (c._1, cosOf(q, c._3))).sorted(bestFirst).take(3)
        .zipWithIndex.map { case ((nbr, _), i) => (src, nbr, i + 1) }
    }.toSet
    val got = graft.SparkEntry.queries("q_ann_knn_graph")(spark, dir)
      .select($"src_id".cast("long"), $"nbr_id".cast("long"), $"rnk".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
    // structural restatements: edges never cross clusters; out-degree
    // is min(k, |cluster| − 1)
    assert(got.forall { case (s0, n, _) => byId(s0)._1 == byId(n)._1 })
    val deg = got.groupBy(_._1).view.mapValues(_.size).toMap
    corpus.foreach { case (id, lab, _) =>
      assert(deg.getOrElse(id, 0) == math.min(3, byLabel(lab).length - 1))
    }
  }

  test("hubness: degrees consistent with the kNN edge set; mutual edges symmetric") {
    import spark.implicits._
    val edges = graft.SparkEntry.queries("q_ann_knn_graph")(spark, dir)
      .select($"src_id".cast("long"), $"nbr_id".cast("long"))
      .as[(Long, Long)].collect().toSet
    val hub = graft.SparkEntry.queries("q_ann_graph_hubness")(spark, dir)
      .select($"vec_id".cast("long"), $"in_degree".cast("long"), $"n_mutual".cast("long"))
      .as[(Long, Long, Long)].collect()
    // every vector appears exactly once; in-degrees recompute from the
    // edge set; mutual = reciprocated out-edges
    assert(hub.length == corpus.length)
    val indeg = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val mut = edges.groupBy(_._1).view
      .mapValues(_.count { case (s0, n) => edges.contains((n, s0)) }.toLong).toMap
    hub.foreach { case (v, ind, m) =>
      assert(ind == indeg.getOrElse(v, 0L), s"in_degree($v)")
      assert(m == mut.getOrElse(v, 0L), s"n_mutual($v)")
    }
    // conservation + symmetry: Σ in-degree = |E|, Σ mutual is even
    assert(hub.map(_._2).sum == edges.size)
    assert(hub.map(_._3).sum % 2 == 0)
    // the diagnostic has signal on this corpus: the in-degree
    // distribution is not flat (hubs exist)
    assert(hub.map(_._2).distinct.length > 1)
  }
}
