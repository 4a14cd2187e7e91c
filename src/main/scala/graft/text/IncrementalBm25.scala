package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Materialization, Model}

/** Incremental BM25 corpus statistics as an engine model — the
  * high-water-mark idiom (reference `stg_accounts.sql:9-11`) applied to
  * the side table every lexical-search stack maintains next to its
  * index: per-term document frequency plus the corpus size/length
  * scalars BM25's idf and length normalization read.
  *
  * Why the stats are append-only: over an append-only corpus each
  * document is tokenized by exactly ONE batch (the build's HWM filter),
  * and df(term), N, and Σ dl are all ADDITIVE over disjoint document
  * sets — so a batch contributes `(term, df_batch)` rows plus one
  * corpus row, and the read side folds generations with a plain sum.
  * No read-modify-write, no merge: the same monotone-arrival property
  * the dedup state tables exploit.
  *
  * State shape (one model, two row kinds discriminated by null
  * pattern):
  *  - term rows `(term, df, null, null, frontier)` — the batch's
  *    distinct document count per term (full vocabulary: the table is
  *    query-agnostic; queries prune to their terms at read);
  *  - one corpus row `(null, null, n_docs, sum_dl, frontier)`.
  * EVERY row carries the batch frontier as its `doc_id` watermark: the
  * engine's append path keeps only rows with watermark > prior HWM, so
  * a null watermark would silently drop the batch's stats (the bug the
  * first cut of this model had). A non-empty batch always emits its
  * corpus row, so the frontier always advances — no separate marker
  * row is needed (the IncrementalDecontam "data rows ARE the frontier"
  * case, not the marker case).
  *
  * Scoring replays the IDENTICAL arithmetic
  * ([[graft.queries.TextQueries.bm25Score]]) against the accumulated
  * stats: df and N stay exact longs, avgdl is the same
  * exact-integer-sum ÷ count division the batch `avg` performs, so the
  * incremental ranking bit-matches the one-shot batch ranking — and
  * `q_text_bm25_incremental` hash-checks against the SAME DuckDB oracle
  * as `q_text_bm25_topk`.
  */
object IncrementalBm25 {

  /** The stats model, wired to read `(doc_id, text)` rows from
    * `docsRef`. Add to an Engine alongside the source. */
  def models(docsRef: String): Seq[Model] = Seq(
    Model.incremental(
      "bm25_stats", Seq(docsRef), Materialization.IncrementalAppend("doc_id")) {
      (s, r, prior) =>
        val schema: Incremental.Schema = Seq(
          "term" -> "string", "df" -> "long",
          "n_docs" -> "long", "sum_dl" -> "long", "doc_id" -> "long")
        val hwm = Incremental.hwm(prior, "doc_id")
        val newDocs = r(docsRef).filter(col("doc_id") > hwm)
        Incremental.frontier(newDocs, "doc_id") match {
          case None =>
            Incremental.emptyFrame(s, schema)
          case Some(frontier) =>
            // batch-grain term stats: one well-combined exchange (the
            // vocabulary collapses map-side, like any word-count)
            val termRows = newDocs
              .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
              .groupBy(col("term"))
              .agg(countDistinct(col("doc_id")).as("df"))
              .select(col("term"), col("df"),
                lit(null).cast("long").as("n_docs"),
                lit(null).cast("long").as("sum_dl"),
                lit(frontier).cast("long").as("doc_id"))
            val corpusRow = newDocs
              .agg(count(lit(1)).as("n_docs"),
                sum(size(split(col("text"), " ")).cast("long")).as("sum_dl"))
              .select(lit(null).cast("string").as("term"),
                lit(null).cast("long").as("df"),
                col("n_docs"), col("sum_dl"),
                lit(frontier).cast("long").as("doc_id"))
            termRows.unionByName(corpusRow)
        }
    })

  /** Accumulated document frequency per term — fold the per-batch
    * generations. Callers prune to their query terms BEFORE this
    * aggregate (the isin filter pushes to the state scan, so only the
    * queried postings rows leave it). */
  def termDf(state: DataFrame): DataFrame =
    state.filter(col("term").isNotNull)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))

  /** Accumulated corpus scalars as the one-row `(n, avgdl)` frame
    * [[graft.queries.TextQueries.bm25Score]] expects. avgdl divides the
    * exact long total by the exact long count — the same operand bits
    * the batch `avg(...)` produces (integer-valued double sums are
    * exact far past any corpus length). */
  def corpusStats(state: DataFrame): DataFrame =
    state.filter(col("n_docs").isNotNull)
      .agg(sum(col("n_docs")).as("n_l"), sum(col("sum_dl")).as("dl_l"))
      .select(col("n_l").as("n"),
        (col("dl_l").cast("double") / col("n_l").cast("double")).as("avgdl"))
}
