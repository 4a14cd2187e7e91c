package graft.similarity

import graft.SparkSpec
import graft.engine.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-incremental IVF index ≡ one-shot assignment — the engine-model
  * DAG (IncrementalIvfIndex) must reproduce, over successive builds,
  * the one-shot nearest-centroid assignment of the corpus-so-far, while
  * each build assigns only its own batch against the once-trained
  * centroids. */
class IncrementalIvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 4

  /** Tiny quantized corpus with an unambiguous cluster structure: two
    * axis-aligned groups (labels 0/1) plus later arrivals near each
    * axis. Vector 5 carries label 0 but sits on label 1's axis — the
    * LEARNED assignment must move it, proving the index partitions by
    * trained centroid, not by the raw label. */
  private def vecsDf(rows: Seq[(Long, Int, Seq[Long])]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    rows.toDF("vec_id", "label", "q")
      .withColumn("q", $"q".cast("array<long>"))
      .withColumn("nsq", expr("dot_i64(q, q)"))
  }

  private val training = Seq(
    (0L, 0, Seq(10L, 1L, 0L, 0L)),
    (1L, 0, Seq(9L, 0L, 1L, 0L)),
    (2L, 1, Seq(0L, 10L, 0L, 1L)),
    (3L, 1, Seq(1L, 9L, 0L, 0L)))
  private val arrivals = Seq(
    (4L, 0, Seq(8L, 1L, 1L, 0L)),
    (5L, 0, Seq(0L, 8L, 1L, 0L)), // labeled 0, nearest centroid is 1
    (6L, 1, Seq(1L, 7L, 0L, 1L)))

  private def engineFor(dir: String, batch: DataFrame): Engine = new Engine(
    spark, dir, Map(
      "vectors" -> batch,
      "vectors_training" -> vecsDf(training)),
    IncrementalIvfIndex.models("vectors", "vectors_training", Dims))

  private def indexSet(dir: String): Set[(Long, Int)] =
    spark.read.parquet(s"$dir/ivf_index")
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toSet

  test("incremental index reproduces the one-shot assignment; delta-only; learned not labeled") {
    val dir = tmpDir("incivf")
    val all = vecsDf(training ++ arrivals)

    // build 1: training corpus only — 4 index rows, no marker needed
    // (every row emits exactly one row; data rows are the frontier)
    val r1 = engineFor(dir, vecsDf(training)).build()
    assert(r1.ok, r1.results.mkString("; "))
    assert(r1("ivf_index").rows == 4)

    // build 2: 3 arrivals → exactly 3 appended rows
    val r2 = engineFor(dir, all).build()
    assert(r2.ok, r2.results.mkString("; "))
    assert(r2("ivf_index").rows == 3)

    // accumulated state ≡ one-shot assignment of the full corpus
    val oneShot = IncrementalIvfIndex.assign(
        all, IncrementalIvfIndex.centroids(vecsDf(training), Dims))
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toSet
    assert(indexSet(dir) == oneShot)

    // the learned partition disagrees with the raw label where it must
    assert(indexSet(dir).contains(5L -> 1))
    assert(indexSet(dir).contains(4L -> 0))

    // idempotent re-run appends nothing
    val r3 = engineFor(dir, all).build()
    assert(r3("ivf_index").rows == 0)
  }

  test("probe reads one cluster; top-k ranks by exact integer-dot cosine") {
    val dir = tmpDir("incivf2")
    engineFor(dir, vecsDf(training ++ arrivals)).build()
    val hits = IncrementalIvfIndex.searchTopK(
        spark.read.parquet(s"$dir/ivf_index"), nQueries = 1, topK = 2)
      .select($"query_id", $"vec_id", $"rnk").as[(Long, Long, Int)]
      .collect().toSet
    // query 0 (cluster 0) must see only cluster-0 members {1, 4},
    // ranked: vec 4 (cos 81/√(101·66) ≈ .9921) above vec 1 (90/√(101·82) ≈ .9890)
    assert(hits == Set((0L, 4L, 1), (0L, 1L, 2)))
  }

  test("ivf_index storage is cluster-partitioned; a probe is a pruned scan") {
    val dir = tmpDir("incivf3")
    engineFor(dir, vecsDf(training ++ arrivals)).build()

    // hive layout: one directory per cluster, and an APPEND (second
    // build) only adds files inside its rows' partitions
    val dirs = new java.io.File(s"$dir/ivf_index").listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("cluster=0", "cluster=1"), dirs)

    // "a probe reads one cluster's partition": the filter lands in the
    // scan's PartitionFilters (planning-time directory pruning), never a
    // post-scan data filter — the PartitionPruningSpec contract, now on
    // the index table itself
    val index = spark.read.parquet(s"$dir/ivf_index")
    val probe = index.filter($"cluster" === 1)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("cluster"), scanLine)
    assert(probe.count() == index.filter($"cluster" === 1).count())

    // searchTopK's cluster-equi join: the big side's scan must carry a
    // DYNAMIC partition-pruning filter on cluster (runtime directory
    // pruning from the broadcast query side) — at 100 TB this is what
    // makes "probe = the probed clusters' partitions" true inside the
    // join itself, not just for a manual filter
    val hits = IncrementalIvfIndex.searchTopK(index, nQueries = 1, topK = 2)
    assert(hits.count() == 2)
    val searchPlan = hits.queryExecution.executedPlan.toString
    assert(searchPlan.toLowerCase.contains("dynamicpruning"), searchPlan)
  }

  test("multi-probe search: literal two-cluster PartitionFilters; strict recall win") {
    val dir = tmpDir("incivfmp")
    // vec 7 is query 0's third-nearest TRUE neighbor (cos ≈ .719) but
    // lands in cluster 1 (cos .787 to c1 vs .690 to c0) — exactly the
    // near-boundary neighbor single-probe loses and nprobe=2 recovers
    val extra = Seq((7L, 1, Seq(6L, 7L, 1L, 0L)))
    engineFor(dir, vecsDf(training ++ arrivals ++ extra)).build()
    val index = spark.read.parquet(s"$dir/ivf_index")
    val cent = spark.read.parquet(s"$dir/ivf_centroids")

    def hitSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val single = hitSet(IncrementalIvfIndex.searchTopK(index, nQueries = 1, topK = 3))
    val multi = IncrementalIvfIndex.searchTopKMultiProbe(
      index, cent, nQueries = 1, topK = 3, nprobe = 2)
    val multiHits = hitSet(multi)

    // PLANNING-TIME pruning with BOTH probed clusters: the literal isin
    // lands in the executed scan's PartitionFilters (no DPP dependency)
    multi.collect()
    val scanLine = multi.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PartitionFilters")).mkString(" | ")
    assert(scanLine.contains("cluster"), scanLine)
    assert(scanLine.replaceAll("\\s", "").contains("IN(0,1)"), scanLine)

    // candidate superset under exact scoring ⇒ single-probe hits survive,
    // and the cluster-1 near-boundary neighbor is a strict recall win
    assert(single == Set((0L, 4L), (0L, 1L))) // cluster 0 has only 2 others
    assert(single.subsetOf(multiHits))
    assert(multiHits == Set((0L, 4L), (0L, 1L), (0L, 7L)))

    // FILTERED probe: the metadata predicate (odd vec_id) rides the
    // SAME pruned scan — PartitionFilters keep both probed clusters,
    // the predicate lands in the data scan, queries probe regardless,
    // and results honor the filter exactly (qualifying neighbors below
    // the unfiltered top-k appear: pre-filtering, not post-)
    val filt = IncrementalIvfIndex.searchTopKMultiProbe(
      index, cent, nQueries = 1, topK = 3, nprobe = 2,
      candFilter = Some($"vec_id" % 2 === 1))
    filt.collect()
    val fPlan = filt.queryExecution.executedPlan.toString
    val fScan = fPlan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString(" | ")
    assert(fScan.replaceAll("\\s", "").contains("IN(0,1)"), fScan)
    assert(fPlan.replaceAll("\\s", "").contains("(vec_id#"), fPlan)
    val fHits = hitSet(filt)
    assert(fHits.forall(_._2 % 2 == 1), fHits)
    assert(fHits == Set((0L, 1L), (0L, 7L), (0L, 3L)), fHits)
  }

  test("scan-local multi-probe (kernelTopN) ≡ driver-derived multi-probe ranking") {
    val dir = tmpDir("incivfmp2")
    val extra = Seq((7L, 1, Seq(6L, 7L, 1L, 0L))) // the near-boundary neighbor
    val all = vecsDf(training ++ arrivals ++ extra)
    engineFor(dir, all).build()
    val index = spark.read.parquet(s"$dir/ivf_index")
    val cent = spark.read.parquet(s"$dir/ivf_centroids")
    val cents = CentroidAssign.collectCentroids(cent)
    def hitSet(df: DataFrame): Set[(Long, Long, Int)] =
      df.select($"query_id", $"vec_id", $"rnk").as[(Long, Long, Int)]
        .collect().toSet

    // the kernel's per-row probe ranking (scan-local, streaming-safe)
    // must agree bit-for-bit with the ad-hoc path's driver-side ranking
    // over the collected centroid table — same math, two homes
    val queries = all.filter($"vec_id" < 2)
    val viaKernel = hitSet(IncrementalIvfIndex.searchTopKFor(
      index, queries, cents, topK = 3, nprobe = 2))
    val viaDriver = hitSet(IncrementalIvfIndex.searchTopKMultiProbe(
      index, cent, nQueries = 2, topK = 3, nprobe = 2))
    assert(viaKernel == viaDriver)

    // candidate superset: single-probe results survive, and the
    // cluster-1 boundary neighbor 7 is the strict recall win
    val single = hitSet(IncrementalIvfIndex.searchTopKFor(
      index, queries, cents, topK = 3))
    assert(single.map(t => (t._1, t._2)).subsetOf(viaKernel.map(t => (t._1, t._2))))
    assert(viaKernel.exists(t => t._1 == 0L && t._2 == 7L))
    assert(!single.exists(t => t._1 == 0L && t._2 == 7L))
  }

  test("PQ-coded index: codes stored beside cluster, code-only pruned probe, incremental ≡ one-shot") {
    // 64-dim corpus (ProductQuantizer's fixed 8×8 subspace geometry)
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"label".cast("int").as("label"),
        transform($"embedding", x => round(x * 100, 0).cast("long")).as("q"))
      .withColumn("nsq", expr("dot_i64(q, q)"))
      .localCheckpoint()
    val bounds = e.agg(min($"vec_id"), max($"vec_id")).first()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2

    def buildInto(dir: String, batches: Seq[org.apache.spark.sql.DataFrame]): Unit =
      batches.foreach { b =>
        val rpt = new Engine(spark, dir,
          Map("vectors" -> b, "vectors_training" -> e),
          IncrementalIvfIndex.modelsPQ("vectors", "vectors_training", 64)).build()
        assert(rpt.ok, rpt.results.mkString("; "))
      }
    val incDir = tmpDir("incivfpq_inc")
    val oneDir = tmpDir("incivfpq_one")
    buildInto(incDir, Seq(e.filter($"vec_id" <= mid), e))
    buildInto(oneDir, Seq(e))

    // stored codes/norms ≡ a fresh scan-local encode of the same corpus
    // against the same frozen codebook (assignment immutability extends
    // to the PQ columns)
    val cb = ProductQuantizer.collectCodebook(
      spark.read.parquet(s"$incDir/pq_codebook"))
    val expected = IncrementalIvfIndex.assign(e, IncrementalIvfIndex.centroids(e, 64))
      .withColumn("codes", ProductQuantizer.codesCol)
      .withColumn("npq", ProductQuantizer.npqCol(cb))
      .select($"vec_id", $"cluster", $"codes", $"npq")
      .as[(Long, Int, Seq[Int], Long)].collect().toSet
    val stored = spark.read.parquet(s"$incDir/ivf_index")
      .select($"vec_id", $"cluster", $"codes", $"npq")
      .as[(Long, Int, Seq[Int], Long)].collect().toSet
    assert(stored == expected)

    // incremental build ≡ one-shot build, through the PQ probe itself
    def probe(dir: String): Set[(Long, Long, Int)] =
      IncrementalIvfIndex.searchTopKPQ(
          spark.read.parquet(s"$dir/ivf_index"),
          spark.read.parquet(s"$dir/pq_codebook"),
          nQueries = 5, topK = 10, shortK = 30)
        .select($"query_id", $"vec_id", $"rnk").as[(Long, Long, Int)]
        .collect().toSet
    val incHits = probe(incDir)
    assert(incHits == probe(oneDir))
    assert(incHits.map(_._1) == Set(0L, 1L, 2L, 3L, 4L))

    // the candidate scan is COLUMN-pruned to the code columns (never
    // the stored vector) and PARTITION-pruned to the probed clusters
    val hits = IncrementalIvfIndex.searchTopKPQ(
      spark.read.parquet(s"$incDir/ivf_index"),
      spark.read.parquet(s"$incDir/pq_codebook"),
      nQueries = 5, topK = 10, shortK = 30)
    hits.collect()
    val plan = hits.queryExecution.executedPlan.toString
    val codeScan = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("codes")).getOrElse("")
    assert(codeScan.nonEmpty, plan)
    assert(!codeScan.contains("q:array"), codeScan) // stored vector not read
    assert(codeScan.contains("PartitionFilters") && codeScan.contains("cluster"),
      codeScan)
  }

  test("property: kernelTopN ≡ declarative (cos DESC, label ASC) rank ≤ n on seeded random corpora") {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    // small value domains force near-ties, duplicate centroids, and
    // occasional zero vectors (NaN cosines) — the scan-local insertion
    // sort must reproduce the window rank under every partitioning
    val rnd = new scala.util.Random(314159)
    for (trial <- 1 to 5) {
      val dims = 8
      val k = 3 + rnd.nextInt(5)
      val n = 20 + rnd.nextInt(40)
      val nprobe = 1 + rnd.nextInt(k)
      val vecs = (0 until n).map { i =>
        (i.toLong, Seq.fill(dims)((rnd.nextInt(5) - 2).toLong))
      }.toDF("vec_id", "q")
        .withColumn("q", $"q".cast("array<long>"))
        .withColumn("nsq", expr("dot_i64(q, q)"))
        .repartition(1 + rnd.nextInt(4))
      val cents: Array[(Int, Array[Long], Long)] = (0 until k).map { l =>
        val c = Array.fill(dims)((rnd.nextInt(5) - 2).toLong)
        (l, c, c.map(x => x * x).sum)
      }.toArray
      val got = CentroidAssign.kernelTopN(vecs, cents, nprobe)
        .select($"vec_id", $"probes").as[(Long, Seq[Int])].collect().toMap
      val centDf = cents.toSeq.map { case (l, c, ncsq) => (l, c.toSeq, ncsq) }
        .toDF("label", "c", "ncsq")
      val cos = expr("dot_i64(q, c)") /
        sqrt($"nsq".cast("double") * $"ncsq".cast("double"))
      val w = Window.partitionBy($"vec_id").orderBy(cos.desc, $"label")
      val want = vecs.crossJoin(centDf)
        .withColumn("rnk", row_number().over(w)).filter($"rnk" <= nprobe)
        .select($"vec_id", $"rnk", $"label")
        .as[(Long, Int, Int)].collect()
        .groupBy(_._1)
        .map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3).toSeq }
      assert(got == want, s"trial=$trial k=$k n=$n nprobe=$nprobe")
    }
  }

  test("residual-PQ index (IVFADC): stored codes ≡ fresh residual encode; incremental ≡ one-shot; pruned probe") {
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"label".cast("int").as("label"),
        transform($"embedding", x => round(x * 100, 0).cast("long")).as("q"))
      .withColumn("nsq", expr("dot_i64(q, q)"))
      .localCheckpoint()
    val bounds = e.agg(min($"vec_id"), max($"vec_id")).first()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2

    def buildInto(dir: String, batches: Seq[DataFrame]): Unit =
      batches.foreach { b =>
        val rpt = new Engine(spark, dir,
          Map("vectors" -> b, "vectors_training" -> e),
          IncrementalIvfIndex.modelsPQResidual("vectors", "vectors_training", 64)).build()
        assert(rpt.ok, rpt.results.mkString("; "))
      }
    val incDir = tmpDir("incivfpqr_inc")
    val oneDir = tmpDir("incivfpqr_one")
    buildInto(incDir, Seq(e.filter($"vec_id" <= mid), e))
    buildInto(oneDir, Seq(e))

    // stored residual codes + |m_c + r̂|² ≡ a fresh scan-local encode of
    // the same corpus against the same frozen means + codebook
    val cb = ProductQuantizer.collectCodebook(
      spark.read.parquet(s"$incDir/pq_codebook"))
    val means = spark.read.parquet(s"$incDir/ivf_means")
    val expected = IncrementalIvfIndex.assign(e, IncrementalIvfIndex.centroids(e, 64))
      .join(org.apache.spark.sql.functions.broadcast(means), "cluster")
      .withColumn("qr", expr("zip_with(q, mc, (a, b) -> a - b)"))
      .withColumn("codes", ProductQuantizer.codesColOf("qr"))
      .withColumn("npq", ProductQuantizer.npqResidualCol(cb))
      .select($"vec_id", $"cluster", $"codes", $"npq")
      .as[(Long, Int, Seq[Int], Long)].collect().toSet
    val stored = spark.read.parquet(s"$incDir/ivf_index")
      .select($"vec_id", $"cluster", $"codes", $"npq")
      .as[(Long, Int, Seq[Int], Long)].collect().toSet
    assert(stored == expected)

    // incremental ≡ one-shot, through the residual-ADC probe itself
    def probe(dir: String): Set[(Long, Long, Int)] =
      IncrementalIvfIndex.searchTopKPQResidual(
          spark.read.parquet(s"$dir/ivf_index"),
          spark.read.parquet(s"$dir/pq_codebook"),
          spark.read.parquet(s"$dir/ivf_means"),
          nQueries = 5, topK = 10, shortK = 30)
        .select($"query_id", $"vec_id", $"rnk").as[(Long, Long, Int)]
        .collect().toSet
    val incHits = probe(incDir)
    assert(incHits == probe(oneDir))
    assert(incHits.map(_._1) == Set(0L, 1L, 2L, 3L, 4L))

    // candidate scan: code columns only (never the stored vector),
    // partition-pruned to the probed clusters
    val hits = IncrementalIvfIndex.searchTopKPQResidual(
      spark.read.parquet(s"$incDir/ivf_index"),
      spark.read.parquet(s"$incDir/pq_codebook"),
      spark.read.parquet(s"$incDir/ivf_means"),
      nQueries = 5, topK = 10, shortK = 30)
    hits.collect()
    val plan = hits.queryExecution.executedPlan.toString
    val codeScan = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("codes")).getOrElse("")
    assert(codeScan.nonEmpty, plan)
    assert(!codeScan.contains("q:array"), codeScan)
    assert(codeScan.contains("PartitionFilters") && codeScan.contains("cluster"),
      codeScan)
  }

  test("deletion lifecycle: probe-time tombstones ≡ compaction; frontier survives; 1 file/cluster") {
    val dir = tmpDir("incivfdel")
    engineFor(dir, vecsDf(training)).build()
    val eng = engineFor(dir, vecsDf(training ++ arrivals))
    assert(eng.build().ok)
    def index() = spark.read.parquet(s"$dir/ivf_index")
    def files(cluster: Int): Int = new java.io.File(s"$dir/ivf_index/cluster=$cluster")
      .listFiles.count(_.getName.startsWith("part-"))
    // append-per-build file accumulation: cluster 0 got rows in both
    // builds (training 0,1 then arrival 4) — the small-files problem
    assert(files(0) >= 2, files(0))

    // tombstones: a cluster-0 member (4) AND the frontier row (6)
    val tomb = Seq(4L, 6L).toDF("vec_id")
    def hitSet(df: DataFrame): Set[(Long, Long, Int)] =
      df.select($"query_id", $"vec_id", $"rnk").as[(Long, Long, Int)]
        .collect().toSet
    val probeTimeDf = IncrementalIvfIndex.searchTopKWithDeletes(
      index(), tomb, nQueries = 1, topK = 3)
    val probeTime = hitSet(probeTimeDf)
    // deleted candidate 4 is gone from query 0's results, survivor 1 stays
    assert(probeTime == Set((0L, 1L, 1)))
    // the tombstone anti-join does NOT cost the probe its runtime
    // partition pruning: the candidate scan still carries the
    // dynamicpruning filter on cluster (at 100 TB, losing it would turn
    // the probe into a full-index read)
    assert(probeTimeDf.queryExecution.executedPlan.toString
      .toLowerCase.contains("dynamicpruning"))

    // compaction physically applies the tombstones
    val keptRows = eng.compact("ivf_index", Some(tomb))
    assert(keptRows == 5, keptRows) // 7 index rows − 2 deleted

    // content: deleted DATA rows gone; exactly one file per cluster
    val post = index()
    assert(post.filter($"cluster".isNotNull && $"vec_id".isin(4L, 6L)).count() == 0)
    assert(files(0) == 1 && files(1) == 1, (files(0), files(1)))

    // the deleted frontier row's mark survives as a marker (null
    // partition column — the hive default partition no probe reads)
    assert(post.agg(max($"vec_id")).first().getLong(0) == 6L)

    // plain probe over the compacted index ≡ the probe-time tombstone
    // path — the two halves of the deletion lifecycle agree bit-for-bit
    assert(hitSet(IncrementalIvfIndex.searchTopK(post, nQueries = 1, topK = 3))
      == probeTime)

    // partition pruning intact on the rewritten layout
    val probe = post.filter($"cluster" === 1)
    probe.collect()
    val scanLine = probe.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("cluster"), scanLine)

    // rebuild from the SAME source: nothing is resurrected — the marker
    // keeps the HWM at 6, so the build appends zero rows
    val r = engineFor(dir, vecsDf(training ++ arrivals)).build()
    assert(r("ivf_index").rows == 0)
    assert(post.filter($"cluster".isNotNull && $"vec_id".isin(4L, 6L)).count() == 0)

    // a genuinely new arrival still appends delta-only past the mark
    val r2 = engineFor(dir,
      vecsDf(training ++ arrivals :+ ((7L, 1, Seq(1L, 8L, 0L, 0L))))).build()
    assert(r2("ivf_index").rows == 1)
    assert(index().filter($"vec_id" === 7L && $"cluster" === 1).count() == 1)
  }

  test("retrain: one Lloyd step moves boundary rows, survives later builds, converges") {
    val dir = tmpDir("incivfrt")
    // drift arrivals pull cluster 1 toward the x=y diagonal; vector 6
    // sits ON the diagonal and ties to cluster 0 under the snapshot
    // centroids ((19,1,1,0)/(1,19,0,1): equal dots 140/140, equal
    // norms, lowest label wins) but is strictly closer to the UPDATED
    // cluster 1 once the drift mass is in its centroid
    val drift = Seq(
      (4L, 1, Seq(5L, 9L, 0L, 0L)),
      (5L, 1, Seq(6L, 8L, 0L, 0L)),
      (6L, 0, Seq(7L, 7L, 0L, 0L)))
    assert(engineFor(dir, vecsDf(training ++ drift)).build().ok)
    assert(indexSet(dir) == Set(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1,
      4L -> 1, 5L -> 1, 6L -> 0))

    // retrain: centroid update from actual membership, reassignment,
    // cluster-partitioned rewrite + swap
    val rt1 = IncrementalIvfIndex.retrain(spark, dir, Dims)
    assert(rt1 == IncrementalIvfIndex.Retrained(rows = 7, moved = 1, clusters = 2))
    assert(indexSet(dir).contains(6L -> 1)) // the boundary row moved
    def cents(): Set[(Int, Seq[Long], Long)] =
      spark.read.parquet(s"$dir/ivf_centroids")
        .select($"label".cast("int"), $"c", $"ncsq")
        .as[(Int, Seq[Long], Long)].collect().toSet
    val retrained = Set(
      (0, Seq(26L, 8L, 1L, 0L), 741L),   // members {0,1,6}
      (1, Seq(12L, 36L, 0L, 1L), 1441L)) // members {2,3,4,5}
    assert(cents() == retrained)
    // layout contract preserved: one file per cluster after the rewrite
    Seq(0, 1).foreach { c =>
      assert(new java.io.File(s"$dir/ivf_index/cluster=$c")
        .listFiles.count(_.getName.startsWith("part-")) == 1)
    }

    // DURABILITY: the next build must assign its arrival against the
    // RETRAINED quantizer (train-once centroids = stored state), not a
    // re-derivation from the snapshot. (51,50,0,0) discriminates:
    // snapshot dots 1019 vs 1001 → cluster 0; retrained cosines
    // 1726/√741 < 2412/√1441 → cluster 1.
    val r2 = engineFor(dir,
      vecsDf(training ++ drift :+ ((7L, 0, Seq(51L, 50L, 0L, 0L))))).build()
    assert(r2.ok && r2("ivf_index").rows == 1)
    assert(indexSet(dir).contains(7L -> 1))
    assert(cents() == retrained) // the build did NOT revert the swap

    // a second retrain over the enlarged corpus is a fixed point here:
    // the Lloyd step can only improve the objective, and this corpus
    // has converged after one move
    val rt2 = IncrementalIvfIndex.retrain(spark, dir, Dims)
    assert(rt2 == IncrementalIvfIndex.Retrained(rows = 8, moved = 0, clusters = 2))

    // frontier markers survive a retrain verbatim: compact away the
    // frontier row (marker at 7), retrain, and nothing resurrects
    engineFor(dir, vecsDf(training ++ drift)).compact(
      "ivf_index", Some(Seq(7L).toDF("vec_id")))
    IncrementalIvfIndex.retrain(spark, dir, Dims)
    val post = spark.read.parquet(s"$dir/ivf_index")
    assert(post.agg(max($"vec_id")).first().getLong(0) == 7L) // marker kept
    assert(post.filter($"cluster".isNotNull && $"vec_id" === 7L).count() == 0)
    val r3 = engineFor(dir,
      vecsDf(training ++ drift :+ ((7L, 0, Seq(51L, 50L, 0L, 0L))))).build()
    assert(r3("ivf_index").rows == 0) // HWM held at 7 by the marker
  }

  test("retrainIfNeeded: drift detector gates the rewrite, converges to a no-op, sidecar logged") {
    val dir = tmpDir("incivfrtp")
    val drift = Seq(
      (4L, 1, Seq(5L, 9L, 0L, 0L)),
      (5L, 1, Seq(6L, 8L, 0L, 0L)),
      (6L, 0, Seq(7L, 7L, 0L, 0L)))
    assert(engineFor(dir, vecsDf(training ++ drift)).build().ok)
    val before = indexSet(dir)

    // permissive threshold: the stored quantizer still agrees with its
    // members well enough — detect-only pass, index untouched
    assert(IncrementalIvfIndex.retrainIfNeeded(spark, dir, Dims, minSelfCos = 0.5).isEmpty)
    assert(indexSet(dir) == before)

    // tight threshold: the drift arrivals have pulled cluster 1's mass
    // off its snapshot-trained centroid — the full retrain runs
    val rt = IncrementalIvfIndex.retrainIfNeeded(spark, dir, Dims, minSelfCos = 0.9999)
    assert(rt.contains(IncrementalIvfIndex.Retrained(rows = 7, moved = 1, clusters = 2)))
    assert(indexSet(dir).contains(6L -> 1))

    // convergence: at most one more Lloyd step (which moves nothing),
    // then the member means ARE the stored centroids — self-cos is
    // exactly 1.0 and the policy is a permanent no-op at any threshold
    val rt2 = IncrementalIvfIndex.retrainIfNeeded(spark, dir, Dims, minSelfCos = 0.9999)
    rt2.foreach(r => assert(r.moved == 0))
    assert(IncrementalIvfIndex.retrainIfNeeded(spark, dir, Dims, minSelfCos = 0.9999).isEmpty)

    // sidecar observability: one line per check, in order, with the
    // triggered line carrying the retrain report
    val log = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/ivf_index.maintenance.jsonl")).trim.split("\n")
    assert(log.length == 4, log.mkString("|"))
    assert(log(0).contains("\"due\":false") && !log(0).contains("\"moved\""))
    assert(log(1).contains("\"due\":true") && log(1).contains("\"moved\":1"))
    assert(log.last.contains("\"due\":false"))
  }
}
