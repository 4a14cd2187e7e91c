package graft.dedup

import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Materialization, Model}
import graft.queries.DedupQueries

/** Incremental near-duplicate detection as engine models — the
  * reference's high-water-mark idiom (`stg_accounts.sql:9-11`) applied
  * to the MinHash/LSH pipeline, so a growing corpus is deduplicated
  * without re-hashing history:
  *
  *  - `band_index` persists the LSH band index `(doc_id, band_idx,
  *    band_key)` as an incremental-append model. Each build shingles and
  *    minhashes ONLY documents past the index's own high-water mark —
  *    at 100 TB this is the difference between hashing a daily batch and
  *    hashing the whole corpus every day. Monotone `doc_id` is the
  *    arrival order (the same assumption the exact-dedup survivor rule
  *    already makes); a timestamped feed would watermark on its
  *    ingestion column instead.
  *
  *  - `neardup_candidates` appends, per build, every candidate pair that
  *    involves at least one NEW document: the new batch's bands join the
  *    FULL persisted index on the band key (new ≪ index, so the shuffle
  *    is batch-sized on one side), buckets that exceed
  *    [[DedupQueries.MaxBucket]] degrade to one edge per new document
  *    (connectivity preserved, quadratic blow-up impossible — the same
  *    cap class as the batch pipeline), and pairs between two
  *    already-indexed documents are never re-emitted.
  *
  *    EXACTNESS DOMAIN: while every bucket stays ≤ MaxBucket, the union
  *    of all batches' candidates EQUALS the batch pipeline's pair set
  *    on the final corpus (each pair emits exactly once, when its
  *    larger member arrives) — the regime the q_dedup_incremental
  *    oracle hash-checks, and the one the testdata generator's tiny
  *    buckets guarantee. Once a bucket crosses the cap, append-only
  *    emission cannot match the batch form's pair set (the batch chain
  *    replaces earlier all-pairs, which an append-only log cannot
  *    retract; the star-to-min edge also differs from a chain edge) —
  *    the guarantee drops to COMPONENT equality, which is what every
  *    downstream consumer (connected components → survivor choice)
  *    actually consumes, and the Jaccard verify prunes any false links
  *    either form introduces. (IncrementalDedupSpec pins pair-set
  *    equality below the cap and component equality above it.)
  *    Each build also
  *    appends one null-pair MARKER row carrying the scan frontier in
  *    [[CandidateWatermark]], so the high-water mark advances even when
  *    a batch yields no pairs — consumers read real pairs via [[pairs]].
  *
  * Bucket statistics (size, min member) are one aggregate over the index
  * per build; the index is ~tens of bytes per document, so even at
  * 100 TB of text this scan is of a table ~1000× smaller than the
  * corpus. A second incremental rollup could amortize it further if the
  * index itself became scan-bound.
  */
object IncrementalDedup {

  /** Candidate rows carry `hwm_doc_id` = the band-index FRONTIER (max
    * doc_id the index held when the build ran) — the documents scanned
    * through, not the documents paired. Watermarking on emitted pairs
    * would stall on a duplicate-free batch (nothing emitted ⇒ HWM stuck ⇒
    * the next build re-joins the whole unpaired history — O(corpus) work
    * per build at 100 TB); the frontier advances whether or not pairs
    * emit, carried by one marker row per build (see [[pairs]]). */
  val CandidateWatermark = "hwm_doc_id"

  /** Strip the per-build frontier marker rows (null doc_a/doc_b) — every
    * consumer of the `neardup_candidates` model reads pairs through this. */
  def pairs(candidates: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    candidates.filter(col("doc_a").isNotNull)

  /** The two models, wired to read documents from `docsRef`
    * (doc_id, text). Add both to an Engine alongside the source. */
  def models(docsRef: String): Seq[Model] = Seq(
    Model.incremental(
      "band_index", Seq(docsRef), Materialization.IncrementalAppend("doc_id")) {
      (_, r, prior) =>
        val docs = r(docsRef)
        // filter BEFORE the minhash kernel: the HWM scalar comes off the
        // prior index's parquet footer stats (the shared Incremental.hwm
        // helper; -1 sentinel ≡ no filter for the nonnegative doc_id
        // domain), and the doc_id predicate prunes the documents scan —
        // a typed kernel downstream of the filter never sees old rows.
        // (The engine's own HWM filter on the OUTPUT would run after
        // hashing; this one runs before.)
        val newDocs =
          docs.filter(col("doc_id") > lit(Incremental.hwm(prior, "doc_id")))
        DedupQueries.bandsFor(newDocs)
    },
    Model.incremental(
      "neardup_candidates", Seq("band_index"),
      Materialization.IncrementalAppend(CandidateWatermark)) {
      (s, r, prior) =>
        val index = r("band_index") // full persisted index, incl. this batch
        val schema: Incremental.Schema = Seq(
          "doc_a" -> "long", "doc_b" -> "long", CandidateWatermark -> "long")
        val hwm = Incremental.hwm(prior, CandidateWatermark)
        // The scan frontier as of THIS build — one scalar off the index's
        // parquet footer stats, same cost class as the HWM read itself.
        Incremental.frontier(index, "doc_id") match {
          case None =>
            // empty corpus: nothing scanned, nothing to watermark
            Incremental.emptyFrame(s, schema)
          case Some(frontier) =>
          // docs past the frontier the PREVIOUS build scanned through —
          // always exactly this batch, pairs or no pairs last time.
          val newBands = index.filter(col("doc_id") > hwm)
          val stats = index.groupBy(col("band_idx"), col("band_key"))
            .agg(count(lit(1)).as("bsz"))
          val joined = newBands.select(
              col("band_idx"), col("band_key"), col("doc_id").as("new_id"))
            .join(index.withColumnRenamed("doc_id", "other_id"),
              Seq("band_idx", "band_key"))
            .filter(col("new_id") =!= col("other_id"))
            .join(stats, Seq("band_idx", "band_key"))
          val small = joined.filter(col("bsz") <= DedupQueries.MaxBucket)
            .select(least(col("new_id"), col("other_id")).as("doc_a"),
              greatest(col("new_id"), col("other_id")).as("doc_b"))
          // oversized buckets: ONE edge per new doc — to the smallest
          // other member — keeps the bucket's component connected at
          // linear cost (the incremental analogue of the batch chain cap)
          val capped = joined.filter(col("bsz") > DedupQueries.MaxBucket)
            .groupBy(col("band_idx"), col("band_key"), col("new_id"))
            .agg(min(col("other_id")).as("other_id"))
            .select(least(col("new_id"), col("other_id")).as("doc_a"),
              greatest(col("new_id"), col("other_id")).as("doc_b"))
          // one marker row records the frontier even when zero pairs
          // emit (see Incremental.markerRow for why emission-watermarking
          // would stall); re-runs stay append-nothing idempotent.
          small.union(capped).distinct()
            .withColumn(CandidateWatermark, lit(frontier))
            .unionByName(Incremental.markerRow(s, schema, CandidateWatermark, frontier))
        }
    })
}
