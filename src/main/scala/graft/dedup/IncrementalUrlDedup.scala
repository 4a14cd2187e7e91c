package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Materialization, Model}
import graft.queries.DedupQueries

/** Incremental URL-level dedup as an engine model — the high-water-mark
  * idiom (reference `stg_accounts.sql:9-11`) applied to canonical-URL
  * dedup ([[DedupQueries.canonicalUrl]]), so a growing crawl is
  * deduplicated without re-canonicalizing history.
  *
  * Keep = min(doc_id) per canonical URL is keep-first immutable under
  * monotone arrival — a URL's first claimant can never be displaced by
  * a LATER document — the same property [[IncrementalBlockDedup]]
  * exploits, so the pipeline is ONE append-only state table:
  *
  *  - new documents (past the model's own high-water mark) are
  *    canonicalized scan-locally (the whole normalization chain is
  *    per-row regex inside whole-stage codegen) and hashed to 64-bit
  *    keys — persisted state is ~16 bytes per distinct URL, not the URL
  *    text (a key collision merges two URLs' identities, the same
  *    benign failure class as the hashed block/gram state tables);
  *  - the batch's min doc_id per hash (one batch-grain aggregate)
  *    anti-joins the accumulated state on `url_hash` — URLs history
  *    already claimed drop out;
  *  - one null-hash MARKER row carries the scan frontier (see
  *    [[graft.engine.Incremental.markerRow]]), so an all-re-crawl batch
  *    — every URL already claimed — still advances the high-water mark
  *    instead of forcing the next build to re-canonicalize it.
  *
  * [[dedupedUrls]] rebuilds the batch operator's full output shape
  * against the accumulated state; IncrementalUrlDedupSpec proves
  * two-batch ≡ one-shot equality build-by-build, and
  * `q_dedup_url_incremental` hash-checks the rebuilt corpus against the
  * same DuckDB oracle as the batch query.
  */
object IncrementalUrlDedup {

  /** Strip the per-build frontier marker rows (null url_hash) — every
    * consumer of the `url_first` model reads state through this. */
  def urlFirst(state: DataFrame): DataFrame =
    state.filter(col("url_hash").isNotNull)

  /** The state model, wired to read `(doc_id, url)` rows from
    * `urlsRef`. Add to an Engine alongside the source. */
  def models(urlsRef: String): Seq[Model] = Seq(
    Model.incremental(
      "url_first", Seq(urlsRef), Materialization.IncrementalAppend("doc_id")) {
      (s, r, prior) =>
        val schema: Incremental.Schema = Seq(
          "url_hash" -> "long", "doc_id" -> "long")
        val hwm = Incremental.hwm(prior, "doc_id")
        val newUrls = r(urlsRef).filter(col("doc_id") > hwm)
        Incremental.frontier(newUrls, "doc_id") match {
          case None =>
            Incremental.emptyFrame(s, schema)
          case Some(frontier) =>
            // the batch's own first claimant per canonical URL (one
            // batch-grain aggregate, map-side partial min)
            val batchFirst = newUrls
              .select(xxhash64(DedupQueries.canonicalUrl(col("url"))).as("url_hash"),
                col("doc_id"))
              .groupBy(col("url_hash"))
              .agg(min(col("doc_id")).as("doc_id"))
            // URLs history already claimed drop out; survivors are the
            // corpus-level first claimants this batch contributes
            val fresh = prior match {
              case Some(t) => batchFirst.join(
                urlFirst(t).select(col("url_hash")), Seq("url_hash"), "left_anti")
              case None => batchFirst
            }
            fresh.unionByName(Incremental.markerRow(s, schema, "doc_id", frontier))
        }
    })

  /** Rebuild the batch operator's output against the accumulated state:
    * a document keeps iff it IS the recorded first claimant of its
    * canonical URL. Same output shape as `q_dedup_url`
    * (doc_id, url, canonical_url, keep, n_aliases); `n_aliases` is a
    * corpus-wide read-side count — alias cardinality grows with the
    * crawl, so it is recomputed per read, never stored. */
  def dedupedUrls(urls: DataFrame, state: DataFrame): DataFrame = {
    val keepers = urlFirst(state)
      .select(col("url_hash"), col("doc_id").as("keeper_doc_id"))
    val w = Window.partitionBy(col("canonical_url"))
    urls
      .withColumn("canonical_url", DedupQueries.canonicalUrl(col("url")))
      .withColumn("url_hash", xxhash64(col("canonical_url")))
      .join(keepers, Seq("url_hash"), "left")
      // a URL past the accumulated state's frontier (its url_first
      // build hasn't run yet) has no keeper row — keep must read FALSE,
      // not NULL, or a downstream filter(keep) silently drops it while
      // n_aliases still counts it
      .select(col("doc_id"), col("url"), col("canonical_url"),
        (col("keeper_doc_id").isNotNull &&
          col("doc_id") === col("keeper_doc_id")).as("keep"),
        count(lit(1)).over(w).as("n_aliases"))
  }
}
