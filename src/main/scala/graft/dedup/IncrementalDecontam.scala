package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Materialization, Model}
import graft.queries.PipelineQueries

/** Incremental n-gram decontamination as an engine model — the
  * high-water-mark idiom (reference `stg_accounts.sql:9-11`) applied to
  * [[PipelineQueries.decontaminate]], so a growing corpus is screened
  * against a FIXED eval/benchmark set without re-exploding history's
  * n-grams every build (gram explosion amplifies by tokens/doc — the
  * heaviest stage of the batch pipeline at scale; see the ScaleProbe
  * decontamination curve).
  *
  * Contamination is a pure per-document property of (doc grams × eval
  * grams): with the eval set static, a document's flag can never change
  * after it is computed — so `contam_flags` is append-only with NO
  * rescan and NO marker row. Every new document emits exactly one flag
  * row (zeros included), which makes the data rows themselves the scan
  * frontier: an all-clean batch advances the high-water mark the same
  * way a contaminated one does (the emission-watermark trap
  * [[IncrementalDedup]] documents cannot arise).
  *
  * A CHANGED eval set invalidates the whole table — that is a full
  * refresh by design, exactly like the reference's full-refresh flag on
  * incremental models; the standard protocol treats the benchmark list
  * as a versioned input.
  *
  * Scale notes: the doc_id > hwm predicate prunes the documents scan
  * off parquet footer stats BEFORE the gram explode; the eval gram set
  * is benchmark-sized and broadcast by AQE (hint-free, same plan as the
  * batch operator); per-build work is O(new docs' grams), independent
  * of corpus size.
  */
object IncrementalDecontam {

  /** The flags model, wired to read training docs from `docsRef` and the
    * (static) eval set from `evalRef` — both (doc_id, text). */
  def models(docsRef: String, evalRef: String, n: Int = 8): Seq[Model] = Seq(
    Model.incremental(
      "contam_flags", Seq(docsRef, evalRef), Materialization.IncrementalAppend("doc_id")) {
      (s, r, prior) =>
        val hwm = Incremental.hwm(prior, "doc_id")
        val newDocs = r(docsRef).filter(col("doc_id") > hwm)
          .select(col("doc_id"), col("text"))
        val matched = PipelineQueries.decontaminate(
          newDocs, r(evalRef), "doc_id", "text", n)
        // one row per NEW document, zeros for the clean ones — the flag
        // table is the curation signal AND its own frontier
        newDocs.select(col("doc_id"))
          .join(matched, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("matched_ngrams"), lit(0L)).as("matched_ngrams"),
            coalesce(col("eval_docs"), lit(0L)).as("eval_docs"),
            col("matched_ngrams").isNotNull.as("contaminated"))
    })
}
