package graft.dedup

import graft.SparkSpec
import graft.engine.Engine
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-incremental near-dup dedup ≡ full-corpus LSH — the engine-model
  * pipeline (IncrementalDedup) must produce, over successive builds, the
  * same candidates the batch pipeline produces on the final corpus,
  * while each build hashes only its own batch. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    IncrementalDedup.pairs(df)
      .select($"doc_a".cast("long"), $"doc_b".cast("long"))
      .as[(Long, Long)].collect().toSet

  // near-dup families: shared word 3-grams within a family, none across
  private val batch1 = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "pack my box with five dozen liquor jugs today",
    4L -> "entirely unrelated text about winter mountain hiking gear",
    5L -> "the quick brown fox jumps over the sleepy dog")
  private val batch2 = Seq(
    6L -> "the quick brown fox jumps over the lazy dog again", // dups 1/2/5
    7L -> "pack my box with five dozen liquor jugs tomorrow", // dups 3
    8L -> "completely fresh content on deep sea coral reefs",
    9L -> "completely fresh content on deep sea coral fish") // dups 8

  test("two-batch incremental candidates ≡ full-corpus LSH; delta-only hashing") {
    var docs = docsDf(batch1)
    val dir = tmpDir("incdedup")
    // rebuild engine per batch with the current docs snapshot — warehouse
    // state persists across Engine instances (all state is on disk),
    // which is exactly how a scheduled pipeline re-instantiates
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("documents" -> current), IncrementalDedup.models("documents"))

    // build 1
    val r1 = engineFor(docs).build()
    assert(r1.ok, r1.results.mkString("; "))
    assert(r1("band_index").rows == 4L * batch1.size) // Bands × docs
    val afterB1 = pairSet(spark.read.parquet(s"$dir/neardup_candidates"))
    assert(afterB1 == pairSet(DedupQueries.minhashCandidatesFor(docsDf(batch1))))

    // build 2: source now holds BOTH batches, but only batch2 is hashed
    docs = docsDf(batch1 ++ batch2)
    val r2 = engineFor(docs).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("band_index").rows == 4L * batch2.size) // delta-only hashing
    // index parity: persisted index == batch pipeline's bands on the union
    val idx = spark.read.parquet(s"$dir/band_index")
      .select($"doc_id", $"band_idx", $"band_key").as[(Long, Int, String)].collect().toSet
    val full = DedupQueries.bandsFor(docs)
      .as[(Long, Int, String)].collect().toSet
    assert(idx == full)
    // candidate parity: union of the two builds' appends == one-shot LSH
    val accumulated = pairSet(spark.read.parquet(s"$dir/neardup_candidates"))
    assert(accumulated == pairSet(DedupQueries.minhashCandidatesFor(docs)))
    // and the second build emitted ONLY pairs touching batch2
    val newPairs = accumulated -- afterB1
    assert(newPairs.nonEmpty && newPairs.forall { case (a, b) => a >= 6L || b >= 6L })

    // idempotent re-run appends nothing
    val r3 = engineFor(docs).build()
    assert(r3("band_index").rows == 0)
    assert(r3("neardup_candidates").rows == 0)
    assert(pairSet(spark.read.parquet(s"$dir/neardup_candidates")) == accumulated)
  }

  test("oversized bucket across batches: linear edges, same components") {
    // 90 identical docs split 50/40: one LSH bucket per band, larger than
    // MaxBucket(64) after batch 2 — candidates must stay linear and the
    // cluster assignment must match the batch pipeline's
    val all = (1L to 90L).map(i => i -> "same words repeated for every single document here")
    val dir = tmpDir("incdedup_big")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("documents" -> current), IncrementalDedup.models("documents"))
    assert(engineFor(docsDf(all.take(50))).build().ok)
    assert(engineFor(docsDf(all)).build().ok)
    val pairs = IncrementalDedup.pairs(
      spark.read.parquet(s"$dir/neardup_candidates"))
    // batch1's bucket (50 ≤ 64) is all-pairs: C(50,2); batch2's 40 new
    // docs land in a 90-member bucket → one edge each. Linear from here.
    assert(pairs.count() == 50L * 49 / 2 + 40)
    val incClusters = Dedup.survivors(
      docsDf(all).select($"doc_id"), pairs.select($"doc_a", $"doc_b"))
      .select($"doc_id".cast("long"), $"survivor_doc_id".cast("long"))
      .as[(Long, Long)].collect().toSet
    val fullClusters = Dedup.survivors(
      docsDf(all).select($"doc_id"),
      DedupQueries.minhashCandidatesFor(docsDf(all)))
      .select($"doc_id".cast("long"), $"survivor_doc_id".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(incClusters == fullClusters)
    assert(incClusters.forall(_._2 == 1L)) // one component, survivor = min
  }

  test("randomized 3-batch incremental ≡ one-shot batch LSH (seeded property)") {
    // seeded corpus: template families (shared word 3-grams within a
    // family) mixed with unique fillers, split into three UNEVEN batches
    // — after every build the accumulated candidate set must equal the
    // batch pipeline on the corpus-so-far, with delta-only hashing
    val rnd = new scala.util.Random(8) // fixed seed: reproducible corpus
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val templates = Seq.fill(12)(sentence(9))
    val all: Seq[(Long, String)] = (1L to 120L).map { id =>
      id -> (if (rnd.nextBoolean()) {
        // family member: a template with one word perturbed at the tail
        templates(rnd.nextInt(templates.size)) + " " + words(rnd.nextInt(words.size))
      } else sentence(12 + rnd.nextInt(6))) // unique-ish filler
    }
    val cuts = Seq(0, 47, 81, 120)
    val dir = tmpDir("incdedup_prop")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("documents" -> current), IncrementalDedup.models("documents"))
    for (b <- 1 until cuts.size) {
      val sofar = all.take(cuts(b))
      val r = engineFor(docsDf(sofar)).build()
      assert(r.ok, r.results.mkString("; "))
      // delta-only hashing: this build banded only its own batch
      assert(r("band_index").rows == 4L * (cuts(b) - cuts(b - 1)))
      // accumulated candidates ≡ one-shot batch LSH on the corpus-so-far
      assert(pairSet(spark.read.parquet(s"$dir/neardup_candidates"))
        == pairSet(DedupQueries.minhashCandidatesFor(docsDf(sofar))),
        s"batch $b diverged")
    }
  }

  test("duplicate-free corpus still advances the candidates watermark") {
    // no shared word 3-grams anywhere: zero pairs in every build. The
    // watermark must STILL move to each build's band-index frontier —
    // a pair-emission watermark would stall at -1 and re-join the whole
    // accumulated index against itself on every subsequent build.
    val uniq1 = Seq(
      1L -> "solar panels convert sunlight into usable electricity",
      2L -> "ancient mariners navigated oceans using star positions",
      3L -> "fermented cabbage dishes appear across many cuisines")
    val uniq2 = Seq(
      4L -> "volcanic soil produces exceptionally fertile farmland",
      5L -> "migratory birds cross continents twice every year")
    val dir = tmpDir("incdedup_nodup")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("documents" -> current), IncrementalDedup.models("documents"))
    def hwm(): Long = spark.read.parquet(s"$dir/neardup_candidates")
      .agg(max($"hwm_doc_id")).first().getLong(0)

    val r1 = engineFor(docsDf(uniq1)).build()
    assert(r1.ok, r1.results.mkString("; "))
    val cands1 = spark.read.parquet(s"$dir/neardup_candidates")
    assert(IncrementalDedup.pairs(cands1).count() == 0)
    // zero pairs, yet the frontier is recorded: build 2's newBands
    // filter (doc_id > hwm) will therefore scan ONLY batch-2 bands
    assert(hwm() == 3L)

    val r2 = engineFor(docsDf(uniq1 ++ uniq2)).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("band_index").rows == 4L * uniq2.size) // delta-only hashing
    assert(r2("neardup_candidates").rows == 1) // the marker row alone
    assert(IncrementalDedup.pairs(
      spark.read.parquet(s"$dir/neardup_candidates")).count() == 0)
    assert(hwm() == 5L)

    // no new docs: append-nothing idempotent, frontier unchanged
    val r3 = engineFor(docsDf(uniq1 ++ uniq2)).build()
    assert(r3("neardup_candidates").rows == 0)
    assert(hwm() == 5L)
  }
}
