package graft.queries

import graft.SparkSpec
import graft.dedup.{IncrementalBlockDedup, IncrementalDecontam}
import graft.engine.{Check, Checks, Engine, Materialization, Model}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LLM-curation pipeline as ONE engine DAG — the "switch to this
  * library" story for training-data curation: URL-level dedup (a view,
  * Catalyst fuses it into every consumer) → incremental decontamination
  * flags → incremental block-dedup state → curated table (cleaned text,
  * contamination filtered), with dbt-style checks gating the final
  * stage. Over successive builds the incremental stages process ONLY
  * the new batch, the curated table always equals the batch protocol
  * run on the corpus-so-far, and a no-new-docs rebuild appends nothing.
  */
class CurationDagSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3      // decontamination gram size
  private val Blk = 8    // block-dedup span (tokens)

  private val all = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    .select($"doc_id", $"text")
  private val evalSet = all.filter($"doc_id" % 50 === 0)
  private val train = all.filter($"doc_id" % 50 =!= 0)

  /** Keep-first URL dedup over a deterministically planted URL (docs
    * whose id shares a %100 residue alias to one page). */
  private def urlKept(docs: DataFrame): DataFrame = {
    val url = concat(lit("HTTPS://WWW.ExAmple.COM/Docs/"),
      (col("doc_id") % 100).cast("string"),
      when(col("doc_id") % 2 === 0, "?utm_source=feed").otherwise(""))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("canonical_url"))
    docs.withColumn("canonical_url", DedupQueries.canonicalUrl(url))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .filter(col("keep")).select(col("doc_id"), col("text"))
  }

  /** The batch protocol's curated set over the same corpus: URL keep →
    * batch decontaminate → batch block dedup → cleaned, uncontaminated. */
  private def expected(docs: DataFrame): Set[(Long, String)] = {
    val kept = urlKept(docs)
    val contaminated = PipelineQueries
      .decontaminate(kept, evalSet, "doc_id", "text", N).select($"doc_id")
    PipelineQueries.blockDedup(kept, Blk)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"text_clean").as[(Long, String)].collect().toSet
  }

  private def curatedSet(dir: String): Set[(Long, String)] =
    spark.read.parquet(s"$dir/curated")
      .select($"doc_id", $"text_clean").as[(Long, String)].collect().toSet

  test("url dedup → decontam → block dedup → curated runs as one gated DAG") {
    val dir = tmpDir("curdag")

    def engineFor(current: DataFrame): Engine = {
      val urlView = Model("url_kept", Seq("docs"), Materialization.View)(
        (_, r) => urlKept(r("docs")))
      val curated = Model("curated",
        Seq("url_kept", "contam_flags", "block_first"), Materialization.Table,
        checks = Seq(Checks.notNull("doc_id", "text_clean"), Checks.unique("doc_id"),
          new Check("no_contaminated_in_curated", (df, r) =>
            df.join(r("contam_flags").filter(col("contaminated")), Seq("doc_id"))))) {
        (_, r) =>
          IncrementalBlockDedup.cleanedDocs(r("url_kept"), r("block_first"), Blk)
            .join(r("contam_flags").filter(col("contaminated")).select(col("doc_id")),
              Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("n_blocks"), col("n_kept"), col("text_clean"))
      }
      new Engine(spark, dir,
        Map("docs" -> current, "evalset" -> evalSet),
        Seq(urlView) ++
          IncrementalDecontam.models("url_kept", "evalset", N) ++
          IncrementalBlockDedup.models("url_kept", Blk) :+ curated)
    }

    val b = train.agg(min($"doc_id"), max($"doc_id")).first()
    val mid = (b.getLong(0) + b.getLong(1)) / 2
    val batch1 = train.filter($"doc_id" <= mid)

    // build 1: half the corpus
    val r1 = engineFor(batch1).build()
    assert(r1.ok, r1.results.mkString("; "))
    assert(curatedSet(dir) == expected(batch1))
    val flags1 = r1("contam_flags").rows
    assert(flags1 > 0)

    // build 2: full corpus — incremental stages see only the new batch
    val r2 = engineFor(train).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(curatedSet(dir) == expected(train))
    val keptTotal = urlKept(train).count()
    assert(flags1 + r2("contam_flags").rows == keptTotal,
      s"flag rows ${flags1}+${r2("contam_flags").rows} vs kept $keptTotal")

    // build 3: nothing new — incremental stages append zero, curated converges
    val r3 = engineFor(train).build()
    assert(r3.ok, r3.results.mkString("; "))
    assert(r3("contam_flags").rows == 0)
    assert(r3("block_first").rows == 0)
    assert(curatedSet(dir) == expected(train))
  }
}
