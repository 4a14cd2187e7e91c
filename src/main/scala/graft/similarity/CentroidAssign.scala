package graft.similarity

import org.apache.spark.sql.DataFrame

/** Shared EXACT nearest-centroid assignment kernel — the one hot loop
  * behind both SemDeDup-style semantic dedup
  * ([[graft.queries.DedupQueries]]) and the incremental IVF index
  * ([[IncrementalIvfIndex]]).
  *
  * Why a typed kernel and not a declarative argmax: the assignment is a
  * dense N×k integer GEMM with an argmax reduction. The declarative
  * forms (broadcast crossJoin + partial `max_by`/max-of-struct) are
  * correct and shuffle only ~N rows, but they MATERIALIZE N×k joined
  * rows through codegen'd projection + hash-aggregate machinery — at the
  * 64× ScaleProbe point (N=128k, k=640, 82M rows) that row machinery is
  * ~6–10× the cost of the arithmetic. The kernel runs the loop directly
  * over a broadcast centroid array: scan-local, zero exchanges, and the
  * measured 64× points dropped from 90.5× (semantic dedup, r10) / 77.9×
  * (IVF assign, r11 pre-kernel) to single-digit ratios (README scaling
  * table). Same measured-kernel-over-expression tradeoff as the MinHash
  * signature and bigram-Jaccard loops.
  *
  * Exactness contract (hash-checked by the DuckDB oracles): cosine is
  * `dot / sqrt(nsq · ncsq)` over exact 64-bit integer dots — identical
  * IEEE double ops to the declarative/SQL forms — and ascending-label
  * iteration with a strict `>` reproduces `ORDER BY cos DESC, label ASC`
  * tie-breaking bit-for-bit.
  */
object CentroidAssign {

  /** Collect the k-row centroid table `(label, c, ncsq)` to the driver,
    * sorted by label (the tie order). Centroids are broadcast-sized by
    * contract — the published SemDeDup/IVF configurations keep
    * k ∝ corpus/10⁵ — so this moves the same bytes the declarative plan
    * broadcast; at k = 10⁵, 64 dims it is ~50 MB, the standard broadcast
    * budget. */
  def collectCentroids(cent: DataFrame): Array[(Int, Array[Long], Long)] = {
    val s = cent.sparkSession
    import s.implicits._
    cent.selectExpr("cast(label as int) label", "c", "ncsq")
      .as[(Int, Array[Long], Long)].collect().sortBy(_._1)
  }

  /** Assign every `(vec_id, q, nsq)` row to its nearest centroid. Emits
    * `(vec_id, cluster, cos_c, q, nsq)` with `cos_c` = cosine to the
    * assigned centroid. */
  def kernel(
      vecs: DataFrame,
      cents: Array[(Int, Array[Long], Long)]): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    vecs.selectExpr("vec_id", "q", "nsq")
      .as[(Long, Array[Long], Long)]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, q, nsq) =>
          var bestL = -1
          var bestCos = Double.NegativeInfinity
          var j = 0
          while (j < cs.length) {
            val (l, c, ncsq) = cs(j)
            var dot = 0L
            var i = 0
            while (i < q.length) { dot += q(i) * c(i); i += 1 }
            val cos = dot / math.sqrt(nsq.toDouble * ncsq.toDouble)
            if (cos > bestCos) { bestCos = cos; bestL = l }
            j += 1
          }
          (id, bestL, bestCos, q, nsq)
        }
      }.toDF("vec_id", "cluster", "cos_c", "q", "nsq")
  }
}
