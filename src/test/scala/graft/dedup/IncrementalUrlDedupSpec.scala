package graft.dedup

import graft.SparkSpec
import graft.engine.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-incremental URL dedup ≡ one-shot keep-first — the engine-model
  * pipeline (IncrementalUrlDedup) must reproduce, over successive
  * builds, the batch operator's answer on the crawl-so-far, while each
  * build canonicalizes only its own batch and the state high-water mark
  * advances even on an all-re-crawl batch. */
class IncrementalUrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def urlsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "url")

  /** The batch answer: min doc_id per canonical URL over the full frame. */
  private def batchSet(urls: DataFrame): Set[(Long, String, Boolean, Long)] = {
    val w = Window.partitionBy($"canonical_url")
    urls
      .withColumn("canonical_url",
        graft.queries.DedupQueries.canonicalUrl($"url"))
      .select($"doc_id", $"canonical_url",
        ($"doc_id" === min($"doc_id").over(w)).as("keep"),
        count(lit(1)).over(w).as("n_aliases"))
      .as[(Long, String, Boolean, Long)].collect().toSet
  }

  private def incrementalSet(urls: DataFrame, dir: String): Set[(Long, String, Boolean, Long)] =
    IncrementalUrlDedup.dedupedUrls(urls, spark.read.parquet(s"$dir/url_first"))
      .select($"doc_id", $"canonical_url", $"keep", $"n_aliases")
      .as[(Long, String, Boolean, Long)].collect().toSet

  private val batch1 = Seq(
    1L -> "https://a.com/x",
    2L -> "HTTPS://WWW.A.com/x/", // alias of 1 (scheme/www/case/slash)
    3L -> "https://b.com/y?utm_s=1&page=2") // leading utm + real param
  private val batch2 = Seq(
    4L -> "http://a.com/x#frag", // re-crawl of URL claimed by doc 1
    5L -> "https://b.com/y?page=2", // alias of 3 post-'&'-re-anchor
    6L -> "https://c.com/z") // genuinely new

  test("incremental state reproduces the batch answer; delta-only canonicalization") {
    var urls = urlsDf(batch1)
    val dir = tmpDir("incurl")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("urls" -> current),
      IncrementalUrlDedup.models("urls"))

    // build 1: 2 distinct canonical URLs + 1 marker
    val r1 = engineFor(urls).build()
    assert(r1.ok, r1.results.mkString("; "))
    assert(r1("url_first").rows == 3)
    assert(incrementalSet(urls, dir) == batchSet(urls))

    // build 2: only c.com/z is new to the crawl → 1 state row + 1 marker
    urls = urlsDf(batch1 ++ batch2)
    val r2 = engineFor(urls).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("url_first").rows == 2)
    val got = incrementalSet(urls, dir)
    assert(got == batchSet(urls))
    // cross-batch keep-first: docs 4 and 5 are dropped by history
    assert(got.collect { case (id, _, keep, _) if !keep => id } == Set(2L, 4L, 5L))

    // idempotent re-run appends nothing
    val r3 = engineFor(urls).build()
    assert(r3("url_first").rows == 0)
  }

  test("all-re-crawl batch still advances the state watermark") {
    // batch 2 re-crawls batch 1's URLs verbatim: zero new state rows.
    // The frontier marker must STILL move the HWM, so build 3
    // canonicalizes only ITS batch — an emission watermark would
    // re-canonicalize batch 2 on every later build.
    val b1 = Seq(1L -> "https://a.com/p")
    val b2 = Seq(2L -> "https://www.A.com/p/") // same canonical URL
    val b3 = Seq(3L -> "https://a.com/q")
    val dir = tmpDir("incurl_nodup")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("urls" -> current),
      IncrementalUrlDedup.models("urls"))
    def hwm(): Long = spark.read.parquet(s"$dir/url_first")
      .agg(max($"doc_id")).first().getLong(0)

    assert(engineFor(urlsDf(b1)).build().ok)
    assert(hwm() == 1L)

    val r2 = engineFor(urlsDf(b1 ++ b2)).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("url_first").rows == 1) // the marker row alone
    assert(hwm() == 2L)

    val r3 = engineFor(urlsDf(b1 ++ b2 ++ b3)).build()
    assert(r3.ok, r3.results.mkString("; "))
    assert(r3("url_first").rows == 2) // q's first claimant + marker
    assert(hwm() == 3L)

    val all = urlsDf(b1 ++ b2 ++ b3)
    assert(incrementalSet(all, dir) == batchSet(all))
  }
}
