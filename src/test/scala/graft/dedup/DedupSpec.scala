package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, triangle, and singleton clusters (both paths)") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    for (threshold <- Seq(Long.MaxValue /* union-find */, 0L /* distributed */)) {
      val cc = Dedup.connectedComponents(pairs, smallGraphThreshold = threshold)
        .as[(Long, Long)].collect().toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L), s"threshold=$threshold")
      assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L), s"threshold=$threshold")
      assert(Seq(20L, 21L).forall(cc(_) == 20L), s"threshold=$threshold")
    }
  }

  test("connected components: distributed path fails loudly when unconverged") {
    // chain of 12 (diameter 11) with maxIter=3: min-label propagation
    // cannot converge; partial labels must throw, never return
    val pairs = (1L to 12L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](
      Dedup.connectedComponents(pairs, maxIter = 3, smallGraphThreshold = 0L))
    assert(e.getMessage.contains("did not converge"))
  }

  test("survivors: one keeper per cluster, unpaired docs keep themselves") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val s = Dedup.survivors(docs, pairs)
      .select($"doc_id", $"survivor_doc_id", $"keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(s == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 4L, false), (6L, 6L, true)))
  }

  test("adversarial LSH corpus: degenerate buckets cap to chains, clusters survive") {
    // 300 identical documents land every band in ONE bucket of 300
    // members (> MaxBucket=64): uncapped expansion would be
    // 300·299/2 ≈ 45k pairs PER BAND; the chain degradation emits
    // exactly n-1 per band. A handful of distinct docs must stay apart.
    val nDup = 300
    val dupText = "the same boilerplate text repeated verbatim everywhere"
    val docs = ((1L to nDup.toLong).map(i => (i, dupText)) ++
      Seq((1001L, "completely different content about spark execution"),
        (1002L, "another unique document mentioning catalyst optimizer")))
      .toDF("doc_id", "text")
    val cand = graft.queries.DedupQueries.minhashCandidatesFor(docs)
    val n = cand.count()
    // linear, not quadratic: 4 bands × (n-1) chain edges, deduped across
    // bands to exactly n-1 distinct consecutive pairs
    assert(n == nDup - 1, s"expected ${nDup - 1} chain pairs, got $n")
    // connectivity preserved: the identical block is ONE cluster with
    // min-id survivor; the unique docs survive on their own
    val surv = Dedup.survivors(docs.select($"doc_id"), cand)
    assert(surv.filter($"keep").count() == 3) // 1 keeper + 2 uniques
    assert(surv.filter($"survivor_doc_id" === 1L).count() == nDup)
  }

  test("adversarial semantic corpus: degenerate cluster caps to a chain, keep-first survives") {
    // 300 identical embeddings collapse into ONE learned cluster
    // (> MaxCluster=64): uncapped in-cluster expansion would be
    // 300·299/2 ≈ 45k pairs; the nearest-centroid-order chain emits
    // exactly n-1. A 3-member orthogonal cluster stays all-pairs.
    import graft.queries.DedupQueries
    val nDup = 300
    val v = Array.fill(64)(0.5) // the near-dup block
    val w = Array.tabulate(64)(i => if (i % 2 == 0) 0.5 else -0.5) // dot(v,w)=0
    val emb = ((1L to nDup.toLong).map(i => (i, 0L, v)) ++
      Seq((1001L, 1L, w), (1002L, 1L, w), (1003L, 1L, w)))
      .toDF("vec_id", "label", "embedding")
    val assign = DedupQueries.semanticAssignFor(emb)
    val pairs = DedupQueries.semanticPairsFor(assign)
    // linear, not quadratic: (nDup-1) chain pairs + C(3,2) small-cluster pairs
    assert(pairs.count() == (nDup - 1) + 3)
    // keep-first survives the degradation: identical chain neighbours are
    // all similar, the drop candidate is always the pair's larger id, so
    // exactly the min id of each cluster keeps
    val dropped = pairs
      .filter($"dot" > 0 && $"dot" * $"dot" * 100 >= lit(9) * $"na" * $"nb")
      .select($"vb").distinct()
    val keep = assign.join(dropped, $"vec_id" === $"vb", "left")
      .filter($"vb".isNull).select($"vec_id").as[Long].collect().sorted.toSeq
    assert(keep == Seq(1L, 1001L))
  }

  test("semantic assignment kernel: exact argmax incl. (cos DESC, label ASC) ties") {
    import graft.queries.DedupQueries
    // labels 5 and 2 get IDENTICAL centroids (same single member vector)
    // -> every vector's cosine to both is bit-equal; the tie must break
    // to the LOWER label (2), never 5, matching the oracle's ORDER BY
    val a = Array.fill(64)(0.5)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 0.5 else -0.5)
    val emb = Seq(
      (1L, 5L, a), (2L, 2L, a), // identical centroids for labels 2 and 5
      (3L, 7L, b), (4L, 7L, b))
      .toDF("vec_id", "label", "embedding")
    val got = DedupQueries.semanticAssignFor(emb)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(got(1L) == 2 && got(2L) == 2, s"tie must break to lowest label: $got")
    assert(got(3L) == 7 && got(4L) == 7)
    // cross-check the kernel against an independent declarative argmax
    val e = emb.select($"vec_id", $"label",
      transform($"embedding", x => round(x * 100, 0).cast("long")).as("q"))
      .withColumn("nsq", expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (s, x) -> s + x)"))
    val cent = e.groupBy($"label")
      .agg(array((1 to 64).map(i => sum(element_at($"q", i))): _*).as("c"))
      .withColumn("ncsq", expr("aggregate(zip_with(c, c, (a, b) -> a * b), 0L, (s, x) -> s + x)"))
    val cos = expr("aggregate(zip_with(q, c, (a, b) -> a * b), 0L, (s, x) -> s + x)") /
      sqrt($"nsq".cast("double") * $"ncsq".cast("double"))
    val want = e.drop("label").crossJoin(cent)
      .select($"vec_id", struct(cos.as("cos"), (-$"label").as("nl"), $"label").as("cand"))
      .groupBy($"vec_id").agg(max($"cand").as("best"))
      .select($"vec_id", $"best.label".cast("int")).as[(Long, Int)].collect().toMap
    assert(got == want)
  }

  test("property: assignment kernel ≡ declarative argmax on seeded random corpora") {
    import graft.queries.DedupQueries
    // small value domains force near-ties and duplicate centroids; the
    // kernel must match an independent declarative (cos DESC, label ASC)
    // argmax on every trial and partitioning
    val rnd = new scala.util.Random(271828)
    for (trial <- 1 to 6) {
      val dims = 64
      val k = 2 + rnd.nextInt(5)
      val n = 30 + rnd.nextInt(50)
      val emb = (0 until n).map { i =>
        (i.toLong, rnd.nextInt(k).toLong,
          Array.fill(dims)((rnd.nextInt(5) - 2) * 0.01))
      }.toDF("vec_id", "label", "embedding").repartition(1 + rnd.nextInt(4))
      val got = DedupQueries.semanticAssignFor(emb)
        .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
      val e = emb.select($"vec_id", $"label",
        transform($"embedding", x => round(x * 100, 0).cast("long")).as("q"))
        .withColumn("nsq", expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (s, x) -> s + x)"))
      val cent = e.groupBy($"label")
        .agg(array((1 to dims).map(i => sum(element_at($"q", i))): _*).as("c"))
        .withColumn("ncsq", expr("aggregate(zip_with(c, c, (a, b) -> a * b), 0L, (s, x) -> s + x)"))
      val cos = expr("aggregate(zip_with(q, c, (a, b) -> a * b), 0L, (s, x) -> s + x)") /
        sqrt($"nsq".cast("double") * $"ncsq".cast("double"))
      val want = e.drop("label").crossJoin(cent)
        .select($"vec_id", struct(cos.as("cos"), (-$"label").as("nl"), $"label").as("cand"))
        .groupBy($"vec_id").agg(max($"cand").as("best"))
        .select($"vec_id", $"best.label".cast("int")).as[(Long, Int)].collect().toMap
      assert(got == want, s"trial=$trial k=$k n=$n")
    }
  }

  test("probed assignment agrees with exact on most of the corpus (measured recall)") {
    import graft.queries.DedupQueries
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = DedupQueries.semanticAssignFor(emb)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    val probed = DedupQueries.semanticProbeAssignFor(emb)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(probed.keySet == exact.keySet) // every vector still assigned
    val agree = exact.count { case (id, c) => probed(id) == c }.toDouble / exact.size
    // near-isotropic corpus (see semanticAssignFor scaladoc): the top-2-of-4
    // group probe reproduces the exact argmax for ~89% of vectors; pin a
    // floor well above chance (k=10 -> 10% chance agreement) and record
    // that it is APPROXIMATE by design (< 1.0 would not be a bug)
    assert(agree >= 0.8, s"probe agreement $agree below floor")
  }

  test("probe agreement is a geometry property: ~1.0 on clustered corpora, degrades with isotropy") {
    // The ~89% sf-corpus agreement above is a property of THAT corpus's
    // near-isotropy, not of the probe: on a genuinely clustered corpus
    // (tight clusters around separated centroids — the geometry the
    // published SemDeDup configurations assume) the top-2-group probe
    // must reproduce the exact argmax essentially always, because the
    // true centroid's group representative dominates the coarse ranking.
    // Seeded property over both geometries: clustered ≥ 0.95 AND
    // strictly above the same-size isotropic corpus's agreement.
    import graft.queries.DedupQueries
    import org.apache.spark.sql.DataFrame
    val dims = 64
    val k = 10
    val n = 500
    def corpus(seed: Int, clustered: Boolean): DataFrame = {
      val rnd = new scala.util.Random(seed)
      val cents = Array.fill(k)(Array.fill(dims)(rnd.nextDouble() * 2 - 1))
      (0 until n).map { i =>
        val lbl = i % k
        val v =
          if (clustered) cents(lbl).map(_ + (rnd.nextDouble() - 0.5) * 0.1).toSeq
          else Seq.fill(dims)(rnd.nextDouble() * 2 - 1) // label ⟂ vector
        (i.toLong, lbl, v)
      }.toDF("vec_id", "label", "embedding")
    }
    def agreement(emb: DataFrame): Double = {
      val exact = DedupQueries.semanticAssignFor(emb)
        .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
      val probed = DedupQueries.semanticProbeAssignFor(emb)
        .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
      assert(probed.keySet == exact.keySet)
      exact.count { case (id, c) => probed(id) == c }.toDouble / exact.size
    }
    for (seed <- Seq(7, 8)) {
      val clusteredAgree = agreement(corpus(seed, clustered = true))
      val isotropicAgree = agreement(corpus(100 + seed, clustered = false))
      assert(clusteredAgree >= 0.95,
        s"seed=$seed clustered agreement $clusteredAgree below 0.95")
      assert(clusteredAgree > isotropicAgree,
        s"seed=$seed clustered $clusteredAgree must beat isotropic $isotropicAgree")
    }
  }

  test("end-to-end: LSH candidates -> clusters over the documents table") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q_dedup_clusters")(spark, dir)
    assert(out.count() == 500) // one row per document
    // keepers are a subset; every cluster's survivor is its min member
    val bad = out.filter($"survivor_doc_id" > $"doc_id").count()
    assert(bad == 0)
    assert(out.filter($"keep").count() <= 500)
    assert(out.filter($"keep").count() > 400) // synthetic corpus: few dups
  }

  test("winnowing guarantee: any shared run of ≥ W+K-1 tokens yields a shared fingerprint") {
    // Schleimer et al. 2003's detection property, checked adversarially:
    // a shared 6-token run (= W+K-1 with W=4, K=3) contains W consecutive
    // shared 3-grams — a complete window in BOTH docs — so the window's
    // min-hash gram is the same gram in both and the pair MUST surface.
    // Unrelated docs (unique vocabularies) must never pair.
    val rnd = new scala.util.Random(7)
    def words(n: Int, tag: String) =
      (1 to n).map(_ => tag + rnd.nextInt(100000)).mkString(" ")
    val planted = (0 until 40).flatMap { i =>
      val shared = words(6, s"sh${i}_")
      Seq(
        (i * 2L, s"${words(5 + rnd.nextInt(25), s"a${i}_")} $shared ${words(5 + rnd.nextInt(25), s"b${i}_")}"),
        (i * 2L + 1, s"${words(5 + rnd.nextInt(25), s"c${i}_")} $shared ${words(5 + rnd.nextInt(25), s"d${i}_")}"))
    }
    val lone = (1000 until 1010).map(i => (i.toLong, words(40, s"x${i}_")))
    val dir = tmpDir("winnowg")
    (planted ++ lone).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    val pairs = graft.SparkEntry.queries("q_dedup_winnow_pairs")(spark, dir)
      .as[(Long, Long)].collect().toSet
    (0 until 40).foreach { i =>
      assert(pairs.contains((i * 2L, i * 2L + 1)), s"planted pair $i missed")
    }
    lone.foreach { case (id, _) =>
      assert(!pairs.exists(p => p._1 == id || p._2 == id), s"lone doc $id paired")
    }
    // fingerprint table self-consistency: every fingerprint's hash IS
    // the md5 of the 3-gram at its claimed position
    val fps = graft.SparkEntry.queries("q_dedup_winnow_fingerprints")(spark, dir)
      .as[(Long, Int, String)].collect()
    val text = (planted ++ lone).toMap
    fps.foreach { case (id, pos, h) =>
      val t = text(id).split(" ", -1)
      assert(pos >= 1 && pos + 2 <= t.length, s"doc $id pos $pos out of range")
      val gram = t.slice(pos - 1, pos + 2).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(hex == h, s"doc $id pos $pos fingerprint mismatch")
    }
    // density sanity: every doc emits at least one fingerprint and far
    // fewer than its gram count (expected ~2/(W+1))
    val perDoc = fps.groupBy(_._1).map { case (id, xs) => id -> xs.length }
    (planted ++ lone).foreach { case (id, tx) =>
      val nGrams = math.max(tx.split(" ", -1).length - 2, 1)
      assert(perDoc.getOrElse(id, 0) >= 1, s"doc $id has no fingerprint")
      assert(perDoc(id) <= nGrams, s"doc $id over-fingerprinted")
    }
  }
}
