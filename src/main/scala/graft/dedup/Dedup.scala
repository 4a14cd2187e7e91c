package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-level deduplication: candidate pairs (from LSH / blocking /
  * cosine) form a similarity graph; the survivor set is one canonical
  * document per connected component. Component labels come from
  * iterative min-label propagation — the standard distributed
  * connected-components algorithm (each round is one join + aggregate;
  * rounds needed = graph diameter, which for near-dup clusters is tiny).
  *
  * Scale notes: every iteration is a shuffle on doc_id (no driver-side
  * graph); `maxIter` bounds work on adversarial chain-shaped clusters —
  * real near-dup components are cliques or near-cliques (diameter ≤ 3).
  * Labels are cached per round and unpersisted after; convergence check
  * is a count of changed labels (one aggregate), not a full compare.
  *
  * Incremental posture: with [[IncrementalDedup]] the CANDIDATE stage is
  * delta-only, but components + survivors re-run batch over the
  * accumulated candidate table each build. That is the right trade, not
  * a shortcut: (a) the candidate table is bounded — per band, a bucket
  * of b docs emits ≤ C(min(b, MaxBucket), 2) pairs and oversized buckets
  * degrade to one edge per doc, so candidates are O(dup_rate × corpus)
  * rows of three longs (a 100 TB corpus with 20% near-dups is ~tens of
  * GB of pairs — cluster-trivial, and it only grows with NEW duplicates);
  * (b) merging components incrementally is not local — one new pair can
  * fuse two old clusters, re-electing survivors for every member, so a
  * correct incremental merge needs the old component state joined at
  * full width anyway; (c) survivor flips on merge mean downstream keep
  * decisions are not append-only, so a rebuild from the (tiny) candidate
  * table is both cheaper and simpler than patching state. If candidates
  * ever stopped being small relative to the cluster, the fix is a
  * coarser candidate threshold, not an incremental CC.
  */
object Dedup {

  /** @param pairs candidate pairs (doc_a, doc_b)
    * @param maxIter hard bound on label-propagation rounds — rounds
    *        needed = component diameter, so 30 covers any real near-dup
    *        graph (cliques and near-cliques, diameter ≤ 3) with a wide
    *        margin. Non-convergence at the bound FAILS LOUDLY rather
    *        than returning partially-merged labels: a silent unconverged
    *        result would split one true component into several clusters
    *        and break the min-doc-id survivor contract (and any exact
    *        oracle equivalence) with no signal.
    * @param smallGraphThreshold pair count below which the component
    *        computation runs as a driver-side union-find: the candidate
    *        GRAPH is orders of magnitude smaller than the corpus (it
    *        only contains near-duplicates), so even petabyte corpora
    *        usually yield a driver-sized graph; the distributed
    *        label-propagation path stays available above the threshold
    * @return (doc_id, cluster) — cluster = min doc_id of the component */
  def connectedComponents(
      pairs: DataFrame,
      maxIter: Int = 30,
      // sized for the DRIVER's heap, not just the pair count: the
      // collect path holds the pair array plus a boxed-Long parent map
      // of up to 2× distinct ids — ~100 bytes/entry with HashMap
      // overhead, so 1M pairs ≈ low hundreds of MB worst case; beyond
      // that the distributed label-propagation branch wins anyway
      smallGraphThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Pin the candidate pipeline ONCE: the size probe and whichever path
    // follows (collect or label propagation) read the checkpointed rows,
    // so the upstream plan — typically an expensive LSH candidate
    // generation — executes exactly once.
    val typed = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .localCheckpoint()
    if (typed.count() <= smallGraphThreshold) {
      // union-find over the collected pair list; find is ITERATIVE
      // (loop to root, then path-compress) because adversarial union
      // order builds O(n) parent chains and recursion would overflow
      // the stack far below the pair-count threshold
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElseUpdate(root, root) != root) root = parent(root)
        var cur = x
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      typed.collect().foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      parent.keys.toSeq.map(k => (k, find(k))).toDF("doc_id", "cluster")
    } else distributedComponents(typed.toDF("doc_a", "doc_b"), maxIter)
  }

  private def distributedComponents(pairs: DataFrame, maxIter: Int): DataFrame = {
    // Iterative algorithms MUST truncate lineage each round —
    // localCheckpoint materializes the round and cuts the logical plan,
    // otherwise Catalyst re-analyzes (and may re-execute) a plan that
    // doubles per iteration. Also pins the candidate-pair input, which
    // is typically an expensive LSH pipeline.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // each node adopts the min label among itself and its neighbors
      val prop = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("cluster")).as("neighbor_min"))
      val next = labels.join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("neighbor_min"), col("cluster"))).as("cluster"),
          (coalesce(col("neighbor_min"), col("cluster")) < col("cluster")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      iter += 1
    }
    // Partial labels are worse than no labels: an unconverged round
    // leaves one true component split across clusters, silently electing
    // extra survivors. maxIter is a cost bound, not a quality dial.
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents: label propagation did not converge after " +
        s"$maxIter iterations ($changed labels still changing) — the " +
        "candidate graph has a component with diameter > maxIter; raise " +
        "maxIter or coarsen the candidate threshold")
    labels
  }

  /** Survivor selection over a corpus: every document keeps its
    * component's canonical (min) doc_id; documents in no candidate pair
    * are their own survivor. `keep = (doc_id == survivor)` drives the
    * actual dedup filter. */
  def survivors(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("survivor_doc_id"))
      .withColumn("keep", col("doc_id") === col("survivor_doc_id"))
  }
}
