package graft.dedup

import graft.SparkSpec
import graft.engine.Engine
import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-incremental block dedup ≡ full-corpus keep-first — the
  * engine-model pipeline (IncrementalBlockDedup) must reproduce, over
  * successive builds, the batch pipeline's cleaned output on the
  * corpus-so-far, while each build blocks only its own batch and the
  * state high-water mark advances even on all-duplicate batches. */
class IncrementalBlockDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def blk(prefix: String): String =
    (1 to 16).map(i => s"$prefix$i").mkString(" ")

  private def cleanedSet(df: DataFrame): Set[(Long, Long, Long, String)] =
    df.select($"doc_id".cast("long"), $"n_blocks".cast("long"),
      $"n_kept".cast("long"), $"text_clean")
      .as[(Long, Long, Long, String)].collect().toSet

  private val batch1 = Seq(
    1L -> s"${blk("a")} ${blk("b")}", // first occurrence of a and b
    2L -> s"${blk("a")} ${blk("c")}", // a dropped, c kept
    3L -> "short unique text") // sub-width doc: one short block
  private val batch2 = Seq(
    4L -> s"${blk("c")} ${blk("d")}", // c claimed by doc 2 → dropped
    5L -> s"${blk("d")} ${blk("d")}") // both copies post-date doc 4's d

  test("incremental state reproduces batch blockDedup; delta-only blocking") {
    var docs = docsDf(batch1)
    val dir = tmpDir("incblock")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("documents" -> current),
      IncrementalBlockDedup.models("documents"))

    // build 1: batch1 has 4 distinct blocks (a, b, c, short) + 1 marker
    val r1 = engineFor(docs).build()
    assert(r1.ok, r1.results.mkString("; "))
    assert(r1("block_first").rows == 5)
    val state1 = spark.read.parquet(s"$dir/block_first")
    assert(cleanedSet(IncrementalBlockDedup.cleanedDocs(docs, state1))
      == cleanedSet(PipelineQueries.blockDedup(docs, 16)))

    // build 2: only d is new to the corpus (claimed at doc 4, block 1;
    // doc 5's copies both post-date it) → 1 state row + 1 marker
    docs = docsDf(batch1 ++ batch2)
    val r2 = engineFor(docs).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("block_first").rows == 2)
    val state2 = spark.read.parquet(s"$dir/block_first")
    val expected = cleanedSet(PipelineQueries.blockDedup(docs, 16))
    assert(cleanedSet(IncrementalBlockDedup.cleanedDocs(docs, state2)) == expected)
    // doc 5 must come back fully emptied by cross-batch keep-first
    assert(expected.exists { case (id, nb, nk, txt) =>
      id == 5L && nb == 2L && nk == 0L && txt.isEmpty })

    // idempotent re-run appends nothing
    val r3 = engineFor(docs).build()
    assert(r3("block_first").rows == 0)
  }

  test("all-duplicate batch still advances the state watermark") {
    // batch 2 repeats batch 1's blocks verbatim: zero new state rows.
    // The frontier marker must STILL move the HWM, so build 3 blocks
    // only ITS batch — an emission watermark would re-block batch 2
    // on every later build.
    val b1 = Seq(1L -> s"${blk("p")} ${blk("q")}")
    val b2 = Seq(2L -> s"${blk("q")} ${blk("p")}") // same blocks, swapped
    val b3 = Seq(3L -> s"${blk("r")} ${blk("p")}")
    val dir = tmpDir("incblock_nodup")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("documents" -> current),
      IncrementalBlockDedup.models("documents"))
    def hwm(): Long = spark.read.parquet(s"$dir/block_first")
      .agg(max($"doc_id")).first().getLong(0)

    assert(engineFor(docsDf(b1)).build().ok)
    assert(hwm() == 1L)

    val r2 = engineFor(docsDf(b1 ++ b2)).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("block_first").rows == 1) // the marker row alone
    assert(hwm() == 2L)

    val r3 = engineFor(docsDf(b1 ++ b2 ++ b3)).build()
    assert(r3.ok, r3.results.mkString("; "))
    assert(r3("block_first").rows == 2) // r's first occurrence + marker
    assert(hwm() == 3L)

    // final state cleans the full corpus identically to the batch op
    val all = docsDf(b1 ++ b2 ++ b3)
    val state = spark.read.parquet(s"$dir/block_first")
    assert(cleanedSet(IncrementalBlockDedup.cleanedDocs(all, state))
      == cleanedSet(PipelineQueries.blockDedup(all, 16)))
  }

  test("randomized 3-batch incremental ≡ one-shot batch dedup (seeded property)") {
    // seeded corpus mixing repeated template blocks with unique blocks,
    // split into three uneven batches — after every build the state
    // must clean the corpus-so-far exactly like the batch pipeline
    val rnd = new scala.util.Random(16)
    val shared = Vector.fill(6)(blk(s"t${rnd.nextInt(1000)}_"))
    def uniqueBlk(id: Long, j: Int): String =
      (1 to 16).map(i => s"u${id}_${j}_$i").mkString(" ")
    val all: Seq[(Long, String)] = (1L to 60L).map { id =>
      val nBlocks = 1 + rnd.nextInt(3)
      id -> (0 until nBlocks).map { j =>
        if (rnd.nextBoolean()) shared(rnd.nextInt(shared.size))
        else uniqueBlk(id, j)
      }.mkString(" ")
    }
    val cuts = Seq(0, 23, 41, 60)
    val dir = tmpDir("incblock_prop")
    def engineFor(current: DataFrame) = new Engine(
      spark, dir, Map("documents" -> current),
      IncrementalBlockDedup.models("documents"))
    for (b <- 1 until cuts.size) {
      val sofar = docsDf(all.take(cuts(b)))
      val r = engineFor(sofar).build()
      assert(r.ok, r.results.mkString("; "))
      val state = spark.read.parquet(s"$dir/block_first")
      assert(cleanedSet(IncrementalBlockDedup.cleanedDocs(sofar, state))
        == cleanedSet(PipelineQueries.blockDedup(sofar, 16)), s"batch $b diverged")
    }
  }
}
