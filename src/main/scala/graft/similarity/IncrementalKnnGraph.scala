package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Materialization, Model}

/** INCREMENTAL maintenance of the cluster-bounded kNN graph
  * (`q_ann_knn_graph`'s edge set) as a ONE-model engine DAG — the graph
  * analogue of the incremental IVF index, built on a different
  * restatement shape:
  *
  * Edges are NOT append-only state. A new arrival can displace an OLD
  * vector's current neighbors, so the edge rows of every cluster that
  * receives arrivals must be RESTATED, not appended to. That is exactly
  * the [[Materialization.DeleteInsert]] contract (the reference's
  * rolling-month restatement, re-keyed): the model is hive-partitioned
  * by `cluster`, each build recomputes edges ONLY for the clusters
  * containing vectors past the previous frontier, and dynamic partition
  * overwrite replaces exactly those clusters' partitions. Untouched
  * clusters' edges are bit-identical to a full rebuild because a
  * cluster's edge set depends only on its own members.
  *
  * Cost per build ∝ Σ over TOUCHED clusters of |c|² — at production
  * scale with k ∝ corpus (bounded cluster size, the SemDeDup
  * configuration) that is (arrivals) × (cluster size), not N², and the
  * recompute joins ride the cluster-partitioned layout co-located.
  *
  * Frontier: the max `src_id` over the stored edges. Every vector in a
  * cluster of ≥ 2 members emits ≥ 1 edge, so the frontier tracks
  * arrivals exactly; a vector landing in a SINGLETON cluster emits no
  * edges and stays past the frontier — its cluster is simply recomputed
  * again next build (idempotent, still-empty) until a second member
  * arrives. Correctness is unaffected; only that one degenerate
  * cluster's (trivial) recompute repeats.
  */
object IncrementalKnnGraph {

  /** Per-source top-`k` same-cluster edges of `vecs`
    * (vec_id, label, q, nsq) — the same bounded topk_cos reduce as the
    * batch query, emitting `(src_id, nbr_id, rnk, cos_sim, cluster)`. */
  private def edges(vecs: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val pairs = vecs.as("a").join(
        vecs.select(col("vec_id").as("cand_id"), col("label").as("clabel"),
          col("q").as("cq"), col("nsq").as("cnsq")),
        col("clabel") === col("label") && col("cand_id") =!= col("vec_id"))
      .select(col("vec_id").as("src_id"), col("label").as("cluster"),
        col("cand_id").as("nbr_id"),
        expr("dot_i64(q, cq)").as("dot"), col("nsq").as("nq"),
        col("cnsq").as("nc"))
    pairs.groupBy(col("src_id"), col("cluster"))
      .agg(expr(s"topk_cos(struct(nbr_id, dot, nq, nc), $k)").as("top"))
      .select(col("src_id"), col("cluster"), posexplode(col("top")))
      .select(col("src_id"), col("col.vec_id").as("nbr_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        round(col("col.cos"), 4).as("cos_sim"), col("cluster"))
  }

  /** The graph DAG: `knn_edges`, DeleteInsert-restated by cluster.
    * `vectorsRef` must resolve to `(vec_id, label, q, nsq)`. */
  def models(vectorsRef: String, k: Int = 3): Seq[Model] = Seq(
    Model.incremental("knn_edges", Seq(vectorsRef),
      Materialization.DeleteInsert("cluster")) { (_, r, prior) =>
      val vecs = r(vectorsRef)
      val touched = prior match {
        case None => vecs.select(col("label")).distinct()
        case Some(p) =>
          val hwm = p.agg(max(col("src_id"))).first()
          val fresh = if (hwm.isNullAt(0)) vecs
            else vecs.filter(col("vec_id") > hwm.getLong(0))
          fresh.select(col("label")).distinct()
      }
      // all members of every touched cluster — old members' neighbor
      // lists change when arrivals join their cluster
      edges(vecs.join(broadcast(touched), "label"), k)
    })
}
