package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-side semantics for the curation pipeline operators
  * (PipelineQueries): the approx quantile gate is bounded against the
  * exact gate, shard packing is pinned to its single-window spec at
  * multiple bucket widths, mix-sample keep rates land inside binomial
  * bounds, and decontamination hits planted overlaps and nothing else.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private val diversity =
    expr("(cast(size(array_distinct(split(text, ' '))) as bigint) * 10000)" +
      " div size(split(text, ' '))")

  // ---------- quantile gate: approx within sketch tolerance of exact ----------

  test("quantileFilterApprox agrees with the exact gate up to threshold-boundary ties") {
    val docs = graft.Tables.documents(spark, dir)
    val q = 0.25
    val exact = PipelineQueries.quantileFilter(docs, "doc_id", "lang", diversity, q)
      .select($"doc_id", $"lang", $"metric")
    val approx = PipelineQueries.quantileFilterApprox(docs, "doc_id", "lang", diversity, q)

    val thr = approx.groupBy($"lang").agg(min($"metric").as("thr_lb"))
      .as[(String, Long)].collect().toMap
    val eKept = exact.select($"lang", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    val aKept = approx.select($"lang", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    val metricOf = docs.select($"lang", $"doc_id", diversity.as("m"))
      .as[(String, Long, Long)].collect().map { case (l, id, m) => (l, id) -> m }.toMap
    val byLang = metricOf.keys.groupBy(_._1)

    assert(eKept.keySet == aKept.keySet)
    eKept.keySet.foreach { lang =>
      val e = eKept(lang); val a = aKept(lang)
      val n = byLang(lang).size
      // 1) the two gates may only disagree at the threshold boundary:
      //    every disagreeing doc's metric equals one of the two gates'
      //    boundary values (exact gate's lowest kept metric vs sketch
      //    threshold) — no interior doc flips
      val eBoundary = e.map(id => metricOf((lang, id))).min
      val aBoundary = thr(lang)
      val lo = math.min(eBoundary, aBoundary); val hi = math.max(eBoundary, aBoundary)
      val disagree = (e diff a) ++ (a diff e)
      disagree.foreach { id =>
        val m = metricOf((lang, id))
        assert(m >= lo && m <= hi, s"lang=$lang doc=$id metric=$m outside [$lo,$hi]")
      }
      // 2) kept-count within 5% of the stratum (sketch accuracy 10000
      //    stores all values at this scale, so drift is tie-mass only)
      assert(math.abs(e.size - a.size) <= math.max(1, n / 20),
        s"lang=$lang exact=${e.size} approx=${a.size} n=$n")
      // 3) approx keeps everything strictly above its threshold and
      //    nothing below it (the gate really is a scan-local filter)
      assert(a.forall(id => metricOf((lang, id)) >= aBoundary))
      assert(byLang(lang).forall { case (_, id) =>
        metricOf((lang, id)) < aBoundary || a.contains(id) })
    }
  }

  // ---------- shard packing: distributed form ≡ single-window spec ----------

  test("shardPack matches the single-window spec at several bucket widths") {
    val docs = graft.Tables.documents(spark, dir)
    val tokens = size(split($"text", " "))
    val budget = 512L
    val d = docs.select($"doc_id", tokens.cast("long").as("n_tokens"))
    val spec = d.withColumn("cum",
        sum($"n_tokens").over(Window.orderBy($"doc_id")))
      .select($"doc_id", expr(s"(cum - n_tokens) div $budget").as("shard_id"))
      .as[(Long, Long)].collect().toMap
    for (bw <- Seq(1L, 7L, 64L, 100000L)) {
      val got = PipelineQueries.shardPack(docs, "doc_id", tokens, budget, bw)
        .select($"doc_id", $"shard_id").as[(Long, Long)].collect().toMap
      assert(got == spec, s"bucketWidth=$bw diverges from the window spec")
    }
  }

  test("shardPack: one shard per document, ids contiguous and monotone in doc order") {
    val docs = graft.Tables.documents(spark, dir)
    val out = PipelineQueries.shardPack(docs, "doc_id", size(split($"text", " ")), 512L)
      .select($"doc_id", $"shard_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.length == docs.count()) // never splits or drops a document
    val shards = out.map(_._2)
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b }) // monotone
    assert(shards.distinct.sorted.sameElements(0L to shards.max)) // no gaps
  }

  // ---------- sequence packing: boundary splits tile docs exactly ----------

  test("sequencePack matches the single-window spec at several bucket widths") {
    val docs = graft.Tables.documents(spark, dir)
    val tokens = size(split($"text", " "))
    val ctx = 64L
    val d = docs.select($"doc_id", tokens.cast("long").as("n"))
    val spec = d.withColumn("start",
        sum($"n").over(Window.orderBy($"doc_id")) - $"n")
      .withColumn("seq_id", explode(expr(
        s"sequence(start div $ctx, (start + n - 1) div $ctx)")))
      .select($"doc_id", $"seq_id",
        (greatest($"seq_id" * ctx - $"start", lit(0L)) + 1L).cast("int"),
        least(($"seq_id" + 1L) * ctx - $"start", $"n").cast("int"))
      .as[(Long, Long, Int, Int)].collect().toSet
    for (bw <- Seq(1L, 7L, 64L, 100000L)) {
      val got = PipelineQueries.sequencePack(docs, "doc_id", tokens, ctx, bw)
        .as[(Long, Long, Int, Int)].collect().toSet
      assert(got == spec, s"bucketWidth=$bw diverges from the window spec")
    }
  }

  test("sequencePack: spans tile each doc; every sequence but the last holds exactly ctx tokens") {
    val docs = graft.Tables.documents(spark, dir)
    val ctx = 64L
    val out = PipelineQueries.sequencePack(docs, "doc_id",
      size(split($"text", " ")), ctx).as[(Long, Long, Int, Int)].collect()
    val nTok = docs.select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    // per doc: spans contiguous 1..n — nothing dropped, nothing doubled
    out.groupBy(_._1).foreach { case (id, rows) =>
      val spans = rows.sortBy(_._3).map(r => (r._3, r._4))
      assert(spans.head._1 == 1 && spans.last._2 == nTok(id), s"doc $id")
      spans.zip(spans.tail).foreach { case ((_, t), (f2, _)) =>
        assert(f2 == t + 1, s"doc $id gap/overlap at $t") }
    }
    // per sequence: token mass exactly ctx except the final partial one
    val bySeq = out.groupBy(_._2).map { case (sq, rows) =>
      sq -> rows.map(r => r._4 - r._3 + 1L).sum }
    val maxSeq = bySeq.keys.max
    bySeq.foreach { case (sq, tot) =>
      if (sq < maxSeq) assert(tot == ctx, s"seq $sq holds $tot tokens")
      else assert(tot <= ctx) }
    // and sequence ids are the contiguous range 0..maxSeq
    assert(bySeq.keys.min == 0L && bySeq.size == maxSeq + 1)
  }

  test("packBestFit: valid FFD packing, no doc splits, padding beats concat-and-cut's split rate") {
    val docs = graft.Tables.documents(spark, dir)
    val cap = 128
    // targetGroup 20 forces several salted groups even on the sf0.001
    // corpus, so the per-salt replay below exercises real salting
    val out = PipelineQueries.packBestFit(docs, "doc_id", "text", cap, 20)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    // every document appears exactly once — docs never split across bins
    assert(out.length == docs.count() &&
      out.map(_._1).distinct.length == out.length)
    // bin loads respect capacity (overflow bins hold exactly one doc)
    val byBin = out.groupBy(r => (r._3, r._4))
    byBin.foreach { case (bin, rows) =>
      val load = rows.map(_._2).sum
      if (rows.exists(_._5)) assert(rows.length == 1, s"overflow bin $bin shared")
      else assert(load <= cap, s"bin $bin overfull: $load")
    }
    // bin ids per salt are the contiguous range 1..nbins
    byBin.keys.toSeq.groupBy(_._1).foreach { case (salt, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids == (1L to ids.length).toSeq, s"salt $salt bins $ids")
    }
    // FFD correctness: a doc opened a NEW bin only if no earlier bin of
    // its salt could have held it at its insertion time — spot-check by
    // replaying the fold driver-side
    out.groupBy(_._3).foreach { case (salt, rows) =>
      val sorted = rows.sortBy(r => (-r._2, r._1))
      val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
      sorted.foreach { r =>
        val idx = loads.indexWhere(_ + r._2 <= cap)
        val bin = if (idx < 0) { loads += r._2; loads.length } else {
          loads(idx) += r._2; idx + 1
        }
        assert(bin.toLong == r._4, s"salt $salt doc ${r._1}: bin ${r._4} != FFD $bin")
      }
    }
    // the headline economics: best-fit wastes less than concat-and-cut
    // fragments — padding fraction ≤ the split-doc fraction
    val realBins = byBin.filter(!_._2.exists(_._5))
    val padFrac = 1.0 - realBins.values.map(_.map(_._2).sum).sum.toDouble /
      (realBins.size.toLong * cap)
    val seq = PipelineQueries.sequencePack(docs, "doc_id",
      size(split($"text", " ")), 64L).as[(Long, Long, Int, Int)].collect()
    val splitFrac = seq.groupBy(_._1).count(_._2.map(_._2).distinct.length > 1)
      .toDouble / seq.map(_._1).distinct.length
    assert(padFrac <= splitFrac,
      f"padding $padFrac%.4f should not exceed split rate $splitFrac%.4f")
    // the 20-doc groups pay ~1 part-filled bin each (amortized over few
    // bins); production-sized groups (625) measured ~2.6% padding
    assert(padFrac < 0.15, f"padding $padFrac%.4f unexpectedly high")
  }

  test("incremental packing appends only delta offsets, continuing from the frontier") {
    val docs = graft.Tables.documents(spark, dir).select($"doc_id",
      size(split($"text", " ")).cast("long").as("n_tokens"))
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val mid = ids(ids.length / 2)
    val wh = tmpDir("seqpackinc")
    var src = docs.filter($"doc_id" <= mid)
    val e = new graft.engine.Engine(spark, wh, Map.empty, Seq(
      graft.engine.Model.incremental("pack_offsets", Seq(),
        graft.engine.Materialization.IncrementalAppend("doc_id")) {
        (_, _, prior) =>
          val base = prior.map(_.agg(max($"end_tok")).first())
            .filter(!_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
          val hwm = prior.map(_.agg(max($"doc_id")).first())
            .filter(!_.isNullAt(0)).map(_.getLong(0)).getOrElse(Long.MinValue)
          PipelineQueries.packOffsets(src.filter($"doc_id" > hwm),
              "doc_id", $"n_tokens")
            .select($"doc_id", $"n_tokens",
              ($"start" + base).as("start"), ($"end_tok" + base).as("end_tok"))
      }))
    val r0 = e.build(); assert(r0.ok, r0.results.mkString("; "))
    src = docs
    val r1 = e.build(); assert(r1.ok, r1.results.mkString("; "))
    // batch 2 wrote ONLY the delta's offset rows
    assert(r1("pack_offsets").rows == ids.count(_ > mid).toLong)
    // and the maintained state equals the one-shot offsets bit-for-bit
    val oneShot = PipelineQueries.packOffsets(docs, "doc_id", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    val maintained = spark.read.parquet(s"$wh/pack_offsets")
      .select($"doc_id", $"n_tokens", $"start", $"end_tok")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(maintained == oneShot)
  }

  // ---------- mix sampling: deterministic, binomial-bounded ----------

  test("mixSample keep rates land within 4-sigma binomial bounds per stratum") {
    // synthetic corpus large enough for tight bounds (n=20000 ⇒ 4σ≈1.3%)
    val n = 20000L
    val corpus = spark.range(n).select($"id".as("doc_id"),
      when($"id" % 4 === 0, "keepall").otherwise("sampled").as("stratum"))
    val rate = 0.35
    val kept = PipelineQueries.mixSample(corpus, "doc_id", "stratum", Map("sampled" -> rate))
    val counts = kept.groupBy($"stratum").count().as[(String, Long)].collect().toMap
    // absent stratum kept whole
    assert(counts("keepall") == corpus.filter($"stratum" === "keepall").count())
    val ns = corpus.filter($"stratum" === "sampled").count()
    val sigma = math.sqrt(rate * (1 - rate) / ns)
    // + 1/65536 threshold-granularity slack on top of the 4σ band
    val tol = 4 * sigma + 1.0 / 65536
    val got = counts("sampled").toDouble / ns
    assert(math.abs(got - rate) <= tol, s"keep rate $got vs $rate (tol $tol)")
  }

  test("mixEpochs: integer-ratio strata replicate exactly; fractional epochs binomial-bounded") {
    val n = 1000L
    // strata sized 16n / 4n / n → epochs 1 / 2 / 4 (perfect squares:
    // zero fractional part, so replication is EXACTLY deterministic)
    val corpus = spark.range(21 * n).select($"id".as("doc_id"),
      when($"id" < 16 * n, "big").when($"id" < 20 * n, "mid")
        .otherwise("small").as("stratum"))
    val out = PipelineQueries.mixEpochs(corpus, "doc_id", "stratum")
    val counts = out.groupBy($"stratum").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 16 * n, "mid" -> 8 * n, "small" -> 4 * n))
    // copies are numbered 1..n_copies with no duplicates
    val bad = out.groupBy($"doc_id", $"n_copies")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"),
        org.apache.spark.sql.functions.max($"copy").as("mx"))
      .filter($"c" =!= $"n_copies" || $"mx" =!= $"n_copies").count()
    assert(bad == 0)

    // fractional case: sizes 2n / n → epochs sqrt(2) ≈ 1.4142 for the
    // small stratum; extra-copy rate within 4σ binomial bounds (+
    // 1/65536 threshold granularity)
    val c2 = spark.range(3 * n).select($"id".as("doc_id"),
      when($"id" < 2 * n, "big").otherwise("small").as("stratum"))
    val o2 = PipelineQueries.mixEpochs(c2, "doc_id", "stratum")
    val small = o2.filter($"stratum" === "small").count().toDouble / n - 1
    val p = math.sqrt(2.0) - 1
    val tol = 4 * math.sqrt(p * (1 - p) / n) + 1.0 / 65536
    assert(math.abs(small - p) <= tol, s"extra-copy rate $small vs $p (tol $tol)")
    // the big stratum is the max: exactly one epoch, no extras
    assert(o2.filter($"stratum" === "big").count() == 2 * n)
  }

  test("sampleFixedK: exactly k per stratum, layout-independent, short strata kept whole") {
    val docs = graft.Tables.documents(spark, dir)
    val out = PipelineQueries.sampleFixedK(docs, "doc_id", "lang", 25)
    val sizes = out.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val strata = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    strata.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(n, 25L), s"$lang: ${sizes.get(lang)} of $n")
    }
    // pure function of doc_id + stratum: identical sample on any layout
    val a = out.select($"doc_id").as[Long].collect().toSet
    val b = PipelineQueries.sampleFixedK(docs.repartition(13, $"doc_id"),
      "doc_id", "lang", 25).select($"doc_id").as[Long].collect().toSet
    assert(a == b)
    // rank-≤-k compiles to WindowGroupLimit: tasks keep k rows per
    // stratum before the exchange, never a full corpus sort
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("embeddingCoverage: crafted fixture hits every count including orphans") {
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de"), (5L, "de"),
      (6L, "fr")).toDF("doc_id", "lang")
    val vecs = Seq(1L, 3L, 4L, 99L).toDF("vec_id") // 99 is an orphan vector
    val out = PipelineQueries.embeddingCoverage(docs, vecs, "doc_id", "vec_id", "lang")
      .select($"lang", $"n_docs", $"n_with_embedding", $"n_orphan_vectors", $"coverage")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("en", 3L, 2L, 0L, 0.6667),
      ("de", 2L, 1L, 0L, 0.5),
      ("fr", 1L, 0L, 0L, 0.0),
      ("_orphan", 0L, 0L, 1L, 0.0)))
  }

  test("mixSample is a pure function of doc_id: identical keep set on any layout") {
    val docs = graft.Tables.documents(spark, dir)
    val a = PipelineQueries.mixSample(docs, "doc_id", "lang",
      Map("en" -> 0.35, "de" -> 0.8)).select($"doc_id").as[Long].collect().toSet
    val b = PipelineQueries.mixSample(docs.repartition(13, $"lang"), "doc_id", "lang",
      Map("en" -> 0.35, "de" -> 0.8)).select($"doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  // ---------- decontamination: planted hits, disjoint misses ----------

  test("decontaminate flags planted n-gram overlap with exact match counts") {
    val n = 4
    // train doc 1 shares one 4-gram with eval 100 AND eval 101 (same
    // gram), doc 2 shares two distinct 4-grams with eval 100, doc 3 is
    // clean, doc 4 is a too-short exact prefix (3 tokens < n)
    val shared = "alpha beta gamma delta"
    val shared2 = "epsilon zeta eta theta"
    val train = Seq(
      (1L, s"intro words $shared trailing tail"),
      (2L, s"$shared padding filler words $shared2"),
      (3L, "completely unrelated content nothing here matches at all"),
      (4L, "alpha beta gamma")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, s"$shared and also $shared2"),
      (101L, s"prefix $shared suffix")).toDF("doc_id", "text")
    val got = PipelineQueries.decontaminate(train, eval, "doc_id", "text", n)
      .select($"doc_id", $"matched_ngrams", $"eval_docs")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1: grams {shared} hit both eval docs; doc 2: {shared, shared2}
    // (shared2 only in eval 100). Window grams across the plant add the
    // boundary-spanning grams too, so assert with the real gram algebra:
    def grams(t: String) = t.split(" ").sliding(n).map(_.mkString(" ")).toSet
    val eg = Seq(100L -> grams(s"$shared and also $shared2"),
      101L -> grams(s"prefix $shared suffix"))
    def expected(text: String) = {
      val tg = grams(text)
      val hits = eg.filter { case (_, g) => (g & tg).nonEmpty }
      (hits.flatMap(_._2 & tg).distinct.size.toLong, hits.size.toLong)
    }
    val exp1 = expected(s"intro words $shared trailing tail")
    val exp2 = expected(s"$shared padding filler words $shared2")
    assert(got == Seq((1L, exp1._1, exp1._2), (2L, exp2._1, exp2._2)))
  }

  test("decontaminate passes a disjoint corpus and ignores sub-n-gram docs") {
    val n = 8
    val train = Seq(
      (1L, "one two three four five six seven"), // 7 tokens < n: no grams
      (2L, "w x y z a b c d e f g h")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "entirely different benchmark text with eight tokens minimum here yes"))
      .toDF("doc_id", "text")
    assert(PipelineQueries.decontaminate(train, eval, "doc_id", "text", n).count() == 0)
    // even an exact copy of a too-short doc cannot match
    val evalShort = Seq((200L, "one two three four five six seven")).toDF("doc_id", "text")
    assert(PipelineQueries.decontaminate(train, evalShort, "doc_id", "text", n).count() == 0)
  }

  test("token entropy: closed-form values on crafted distributions") {
    // H = ln(n) − Σ c·ln(c)/n: all-same tokens → 0; k distinct uniform
    // tokens → ln(k); a 2:1:1 split → ln(4) − (2·ln 2)/4
    val docs = Seq(
      (1L, "a a a a"),
      (2L, "a b c d"),
      (3L, "a a b c")).toDF("doc_id", "text")
    val got = TextQueries.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(got(0) == ((1L, 4L, 0.0)))
    assert(got(1) == ((2L, 4L, r4(math.log(4)))))
    assert(got(2) == ((3L, 4L, r4(math.log(4) - 2 * math.log(2) / 4))))
  }

  test("token entropy: 200 seeded random docs match a reference fold") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum", "gold")
    val docs = (1L to 200L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    def refEntropy(text: String): Double = {
      val counts = text.split(" ", -1).groupBy(identity).map(_._2.length)
      val n = counts.sum.toDouble
      val h = math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
      math.rint(h * 10000) / 10000
    }
    val got = TextQueries.tokenEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"token_entropy").as[(Long, Double)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refEntropy(text), s"doc $id: '$text'")
    }
  }

  test("curation funnel keep == conjunction of its independently-computed stages") {
    val docs = graft.Tables.documents(spark, dir)
    val rates = Map("en" -> 0.35, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.8)
    val funnel = PipelineQueries.curationFunnel(
        docs, "doc_id", "text", "lang", rates, 8, 2.8, 0.5)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val qual = TextQueries.qualityScore(docs, "doc_id", "text")
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val ent = TextQueries.tokenEntropy(docs, "doc_id", "text")
      .select($"doc_id", $"token_entropy").as[(Long, Double)].collect().toMap
    val rep = PipelineQueries.repeatedNgrams(docs, "doc_id", "text", 8)
      .select($"doc_id", $"repeated_ratio").as[(Long, Double)].collect().toMap
    val sampled = PipelineQueries.mixSample(docs, "doc_id", "lang", rates)
      .select($"doc_id").as[Long].collect().toSet
    val clf = PipelineQueries.qualityClassifier(docs, "doc_id", "text")
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    val ids = docs.select($"doc_id").as[Long].collect()
    assert(ids.nonEmpty)
    ids.foreach { id =>
      val expected = qual(id) && clf(id) > 0 && ent(id) >= 2.8 &&
        rep.getOrElse(id, 0.0) <= 0.5 && sampled(id)
      assert(funnel(id) == expected, s"doc $id")
    }
  }

  test("repeated-ngrams: planted boilerplate scores, unique docs score zero") {
    val boiler = "common header block repeated across many documents verbatim"
    val docs = Seq(
      (1L, s"$boiler unique tail one"),  // shares the boilerplate grams
      (2L, s"$boiler unique tail two"),  // with doc 1
      (3L, "entirely distinct text carrying no shared eight gram content here"))
      .toDF("doc_id", "text")
    val got = PipelineQueries.repeatedNgrams(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // docs 1/2: 11 tokens → 4 distinct 8-grams; every gram not touching
    // the final differing token ("one"/"two") is shared → 3 of 4
    // repeated. doc 3: 10 tokens → 3 grams, none shared.
    assert(got.map(x => (x._1, x._2)).toSeq == Seq((1L, 4L), (2L, 4L), (3L, 3L)))
    assert(got(0)._3 == 3L && got(1)._3 == 3L && got(2)._3 == 0L)
    assert(got(0)._4 == 0.75 && got(2)._4 == 0.0)
  }

  // ---------- block dedup: corpus-wide keep-first semantics ----------

  test("blockDedup drops later copies corpus-wide and rebuilds text in block order") {
    val blockA = (1 to 16).map(i => s"a$i").mkString(" ")
    val blockC = (1 to 16).map(i => s"c$i").mkString(" ")
    val blockD = (1 to 16).map(i => s"d$i").mkString(" ")
    val tail4 = "p1 p2 p3 p4"
    val docs = Seq(
      (1L, s"$blockA $blockC"), // first occurrence of A and C
      (2L, s"$blockA $blockD"), // A already seen in doc 1 → dropped
      (3L, s"$blockD $blockD"), // both copies post-date doc 2's D → doc empties
      (4L, "x y z"), // shorter than one block → single short block, kept
      (5L, s"$blockA $tail4")) // partial tail block survives alone
      .toDF("doc_id", "text")
    val got = PipelineQueries.blockDedup(docs, 16)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, s"$blockA $blockC")))
    assert(got(2L) == ((2L, 2L, 1L, blockD)))
    assert(got(3L) == ((3L, 2L, 0L, "")))
    assert(got(4L) == ((4L, 1L, 1L, "x y z")))
    assert(got(5L) == ((5L, 2L, 1L, tail4)))
  }

  test("blockDedup conserves tokens: kept blocks partition the corpus's distinct blocks") {
    val docs = graft.Tables.documents(spark, dir)
    val out = PipelineQueries.blockDedup(docs, 16).cache()
    // every document row comes back, kept ≤ total, and the number of
    // kept blocks corpus-wide equals the number of DISTINCT blocks
    // (keep-first retains exactly one copy of each)
    assert(out.count() == docs.count())
    assert(out.filter($"n_kept" > $"n_blocks").count() == 0)
    val distinctBlocks = docs
      .select($"doc_id", split($"text", " ").as("t"))
      .select(explode(transform(
        sequence(lit(0), expr("(size(t) + 15) div 16") - 1),
        j => array_join(slice($"t", j * lit(16) + 1, lit(16)), " "))).as("b"))
      .select(countDistinct($"b")).as[Long].head()
    val kept = out.select(sum($"n_kept")).as[Long].head()
    assert(kept == distinctBlocks, s"kept=$kept distinct=$distinctBlocks")
    out.unpersist()
  }

  // ---------- split leakage: cross-split near-dup guard ----------

  test("splitLeakage flags exactly the cross-split near-duplicates") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), // train (odd) — near-twin of doc 2
      (2L, base), // val (even) — leaks against doc 1
      (3L, (101 to 140).map(i => s"u$i").mkString(" ")), // train, unique
      (4L, (201 to 240).map(i => s"v$i").mkString(" ")), // val, unique
      (5L, (301 to 340).map(i => s"y$i").mkString(" ")), // train dup pair —
      (7L, (301 to 340).map(i => s"y$i").mkString(" "))) // same split: NOT leakage
      .toDF("doc_id", "text")
    val split = when($"doc_id" % 2 === 0, "val").otherwise("train")
    val got = PipelineQueries.splitLeakage(docs, split)
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "train", 1L, true)))
    assert(got(2L) == ((2L, "val", 1L, true)))
    assert(got(3L) == ((3L, "train", 0L, false)))
    assert(got(4L) == ((4L, "val", 0L, false)))
    assert(got(5L) == ((5L, "train", 0L, false)))
    assert(got(7L) == ((7L, "train", 0L, false)))
  }

  test("splitLeakage md5 split is deterministic and leak counts are pair-symmetric") {
    val docs = graft.Tables.documents(spark, dir)
    val thr = PipelineQueries.rateThreshold(0.1)
    val split = when(substring(md5($"doc_id".cast("string")), 1, 4) < lit(thr), "val")
      .otherwise("train")
    val out = PipelineQueries.splitLeakage(docs, split).cache()
    // split assignment reproduces a driver-side md5 of the same ids
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex4(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
    val ids = docs.select($"doc_id").as[Long].collect()
    val expectVal = ids.count(id => hex4(id) < thr)
    assert(out.filter($"split" === "val").count() == expectVal)
    assert(out.count() == ids.length)
    // each verified pair contributes one leak to each side → total even,
    // and the flag is exactly n_leaks > 0
    val total = out.select(sum($"n_leaks")).as[Long].head()
    assert(total % 2 == 0)
    assert(out.filter($"leaky" =!= ($"n_leaks" > 0)).count() == 0)
    out.unpersist()
  }
}
