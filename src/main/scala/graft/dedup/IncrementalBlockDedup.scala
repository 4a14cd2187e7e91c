package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Materialization, Model}
import graft.queries.PipelineQueries

/** Incremental corpus-wide block dedup as an engine model — the
  * high-water-mark idiom (reference `stg_accounts.sql:9-11`, same shape
  * as [[IncrementalDedup]]) applied to keep-first block dedup
  * ([[PipelineQueries.blockDedup]]), so a growing corpus is cleaned
  * without re-blocking history.
  *
  * The whole pipeline is ONE append-only state table, because keep-first
  * state is immutable under monotone arrival: a block's first occurrence
  * in (doc_id, block_no) order can never be displaced by a LATER
  * document. `block_first` therefore appends, per build, only the blocks
  * this batch introduces to the corpus:
  *
  *  - new documents (past the model's own high-water mark) are blocked
  *    scan-locally and hashed to 64-bit keys — the persisted state is
  *    ~12 bytes per distinct block instead of the block text itself
  *    (at 100 TB a string-keyed index would be a second copy of the
  *    corpus; a key collision merges two blocks' identities, the same
  *    benign failure class as [[PipelineQueries.repeatedNgrams]]'s
  *    hashed grams);
  *  - the batch's first occurrence per hash (one batch-grain window)
  *    anti-joins the accumulated state on `block_hash` — hashes already
  *    claimed by history drop out. At scale the state table is persisted
  *    bucketed by `block_hash` (BucketingSpec mechanics) so this
  *    per-build join co-locates instead of reshuffling the index;
  *  - one null-hash MARKER row carries the scan frontier, so the
  *    high-water mark advances even when a batch introduces no new
  *    blocks — an all-duplicate batch must not cause the next build to
  *    re-block it (the emission-watermark trap [[IncrementalDedup]]
  *    documents). Consumers read real state via [[firstOccurrences]].
  *
  * [[cleanedDocs]] rebuilds any document set against the accumulated
  * state: an occurrence is kept iff it IS the recorded first — so
  * incremental builds reproduce the batch pipeline's output on the
  * corpus-so-far exactly (IncrementalBlockDedupSpec proves equality
  * build-by-build, modulo 64-bit hash identity).
  */
object IncrementalBlockDedup {

  /** Strip the per-build frontier marker rows (null block_hash) — every
    * consumer of the `block_first` model reads state through this. */
  def firstOccurrences(blockFirst: DataFrame): DataFrame =
    blockFirst.filter(col("block_hash").isNotNull)

  /** The state model, wired to read documents from `docsRef`
    * (doc_id, text). Add to an Engine alongside the source. */
  def models(docsRef: String, blockTokens: Int = 16): Seq[Model] = Seq(
    Model.incremental(
      "block_first", Seq(docsRef), Materialization.IncrementalAppend("doc_id")) {
      (s, r, prior) =>
        val docs = r(docsRef)
        val schema: Incremental.Schema = Seq(
          "block_hash" -> "long", "doc_id" -> "long", "block_no" -> "int")
        // HWM = the last build's frontier (marker or data rows, whichever
        // is newer) — one scalar off the prior state's parquet footer
        // stats; the doc_id predicate prunes the documents scan BEFORE
        // any blocking work.
        val hwm = Incremental.hwm(prior, "doc_id")
        val newDocs = docs.filter(col("doc_id") > hwm)
        Incremental.frontier(newDocs, "doc_id") match {
          case None =>
            // no new documents: append nothing (idempotent re-run)
            Incremental.emptyFrame(s, schema)
          case Some(frontier) =>
          val blocks = PipelineQueries.blocksOf(newDocs, blockTokens)
            .select(xxhash64(col("block")).as("block_hash"),
              col("doc_id"), col("block_no"))
          // the batch's own first occurrence per hash (batch-grain window)
          val w = Window.partitionBy(col("block_hash"))
            .orderBy(col("doc_id"), col("block_no"))
          val batchFirst = blocks
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
          // hashes history already claimed drop out; survivors are the
          // corpus-level first occurrences this batch contributes
          val fresh = prior match {
            case Some(t) => batchFirst.join(
              firstOccurrences(t).select(col("block_hash")),
              Seq("block_hash"), "left_anti")
            case None => batchFirst
          }
          fresh.unionByName(Incremental.markerRow(s, schema, "doc_id", frontier))
        }
    })

  /** Rebuild cleaned documents against the accumulated state: a block
    * occurrence is kept iff it is the recorded corpus-level first. Same
    * output shape as [[PipelineQueries.blockDedup]]
    * (doc_id, n_blocks, n_kept, text_clean). */
  def cleanedDocs(docs: DataFrame, blockFirst: DataFrame,
      blockTokens: Int = 16): DataFrame = {
    val blocks = PipelineQueries.blocksOf(docs, blockTokens)
      .withColumn("block_hash", xxhash64(col("block")))
    val kept = firstOccurrences(blockFirst)
      .select(col("block_hash"), col("doc_id"), col("block_no"),
        lit(true).as("keep"))
    val marked = blocks
      .join(kept, Seq("block_hash", "doc_id", "block_no"), "left")
      .withColumn("keep", coalesce(col("keep"), lit(false)))
    PipelineQueries.rebuildCleaned(marked)
  }
}
