package graft.dedup

import graft.SparkSpec
import graft.engine.Engine
import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-incremental decontamination ≡ the full-corpus batch protocol —
  * the contam_flags model must reproduce, over successive builds, the
  * batch operator's answer on the corpus-so-far (zeros included), while
  * each build explodes only its own batch's grams, and an all-clean
  * batch still advances the high-water mark (no marker machinery: every
  * new doc emits its own flag row). */
class IncrementalDecontamSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3 // 3-gram for compact fixtures

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private val evalSet = docsDf(Seq(
    1000L -> "alpha beta gamma delta",   // grams: "alpha beta gamma", "beta gamma delta"
    1001L -> "omega psi chi phi"))

  // batch 1: one contaminated (shares "alpha beta gamma"), one clean
  private val batch1 = Seq(
    1L -> "zz alpha beta gamma yy",
    2L -> "totally clean text one")
  // batch 2: ALL clean — the hwm must still advance
  private val batch2 = Seq(
    3L -> "more clean words here",
    4L -> "nothing shared at all")
  // batch 3: contaminated against BOTH eval docs
  private val batch3 = Seq(
    5L -> "beta gamma delta omega psi chi")

  private def flagsSet(df: DataFrame): Set[(Long, Long, Long, Boolean)] =
    df.select($"doc_id", $"matched_ngrams", $"eval_docs", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSet

  /** The batch protocol's answer on `docs`: decontaminate + zero rows. */
  private def batchFlags(docs: DataFrame): Set[(Long, Long, Long, Boolean)] =
    flagsSet(docs.select($"doc_id")
      .join(PipelineQueries.decontaminate(docs, evalSet, "doc_id", "text", N),
        Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"matched_ngrams", lit(0L)).as("matched_ngrams"),
        coalesce($"eval_docs", lit(0L)).as("eval_docs"),
        $"matched_ngrams".isNotNull.as("contaminated")))

  test("3-batch incremental flags ≡ batch protocol; all-clean batch advances hwm") {
    val dir = tmpDir("incdecon")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("train" -> current, "evalset" -> evalSet),
      IncrementalDecontam.models("train", "evalset", N))

    var docs = docsDf(batch1)
    val r1 = engineFor(docs).build()
    assert(r1.ok, r1.results.mkString("; "))
    assert(r1("contam_flags").rows == 2)
    assert(flagsSet(spark.read.parquet(s"$dir/contam_flags")) == batchFlags(docs))
    // doc 1's counts: one shared gram, one eval doc
    assert(flagsSet(spark.read.parquet(s"$dir/contam_flags"))
      .contains((1L, 1L, 1L, true)))

    // all-clean batch: 2 zero rows appended — they ARE the frontier
    docs = docsDf(batch1 ++ batch2)
    val r2 = engineFor(docs).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("contam_flags").rows == 2)
    assert(flagsSet(spark.read.parquet(s"$dir/contam_flags")) == batchFlags(docs))

    // batch 3 must process ONLY doc 5 (1 appended row), proving the
    // all-clean batch advanced the hwm instead of being re-scanned
    docs = docsDf(batch1 ++ batch2 ++ batch3)
    val r3 = engineFor(docs).build()
    assert(r3.ok, r3.results.mkString("; "))
    assert(r3("contam_flags").rows == 1)
    val finalFlags = flagsSet(spark.read.parquet(s"$dir/contam_flags"))
    assert(finalFlags == batchFlags(docs))
    // doc 5 hit both eval docs; "beta gamma delta" + "omega psi chi" +
    // the bridging grams count only if present in eval (they are not)
    assert(finalFlags.contains((5L, 2L, 2L, true)))

    // idempotent re-run: no new docs → nothing appended
    val r4 = engineFor(docs).build()
    assert(r4.ok, r4.results.mkString("; "))
    assert(r4("contam_flags").rows == 0)
    assert(flagsSet(spark.read.parquet(s"$dir/contam_flags")) == batchFlags(docs))
    // exactly one flag row per train doc ever written — no rescans
    val perDoc = spark.read.parquet(s"$dir/contam_flags")
      .groupBy($"doc_id").count().filter($"count" > 1).count()
    assert(perDoc == 0)
  }
}
