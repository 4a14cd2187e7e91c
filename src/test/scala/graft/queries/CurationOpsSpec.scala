package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Engine-side semantics for the round-8 curation additions: the PII
  * patterns hit exactly what they should (closed-form fixtures), the
  * temperature sampler's derived thresholds match a driver-side
  * recompute and its keep rates land in binomial bounds, and the
  * semantic (SemDeDup-style) dedup obeys its greedy keep-first
  * contract: nearest-centroid assignment, smallest id per cluster
  * always kept, no two similar survivors.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---------- classifier quality filter: closed-form score ----------

  test("quality classifier: hashed unigram+bigram features score exactly") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def w(feat: String): Long = {
      val b = java.lang.Long.parseLong(md5hex(feat).take(4), 16)
      (b * 2654435761L) % 2001 - 1000
    }
    val docs = Seq((1L, "alpha beta gamma"), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = PipelineQueries.qualityClassifier(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // doc 1: 3 unigrams + 2 bigrams; doc 2: 1 unigram, no bigram
    val f1 = Seq("alpha", "beta", "gamma", "alpha beta", "beta gamma")
    assert(out(1L) == ((5L, f1.map(w).sum, f1.map(w).sum > 0)), out(1L))
    assert(out(2L) == ((1L, w("solo"), w("solo") > 0)), out(2L))
    // and repeated features count each occurrence (bag, not set)
    val rep = PipelineQueries.qualityClassifier(
      Seq((9L, "dup dup")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(rep.getLong(1) == 3L &&
      rep.getLong(2) == 2 * w("dup") + w("dup dup"))
  }

  // ---------- BPE vocab induction ----------

  test("bpeVocab: greedy merges match a hand-replay and are layout-independent") {
    // closed-form corpus: "abab" x3 + "abc" x2 + "cd"
    // round 1: (a,b) cnt 8 beats (b,a) 3, (b,c) 2, (c,d) 1
    // round 2: pairs over merged streams: (ab,ab) 3, (ab,c) 2, (c,d) 1
    val docs = Seq((1L, "abab abab abab abc abc cd")).toDF("doc_id", "text")
    val m = TextQueries.bpeVocab(docs, "text", 4)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(m(0) == ((1, "a", "b", "ab", 8L)), m(0))
    assert(m(1) == ((2, "ab", "ab", "abab", 3L)), m(1))
    assert(m(2) == ((3, "ab", "c", "abc", 2L)), m(2))
    assert(m(3) == ((4, "c", "d", "cd", 1L)), m(3))
    // layout independence: the merge table is identical however the
    // corpus is partitioned (partial-agg order must never leak into
    // the argmax — counts are exact integers, tiebreak is total)
    val real = graft.Tables.documents(spark, dir)
    val a = TextQueries.bpeVocab(real, "text", 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val b = TextQueries.bpeVocab(real.repartition(17, $"lang"), "text", 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(a == b, s"merge table depends on layout:\n$a\n$b")
  }

  // ---------- BPE encode: apply the trained merges ----------

  private def md5of(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bpeEncode: whole-text application matches a hand-replay, stream and count") {
    // same closed-form corpus as the vocab test: merges land as
    // (a,b) → (ab,ab) → (ab,c) → (c,d), so every word fuses to ONE token
    val docs = Seq((1L, "abab abab abab abc abc cd")).toDF("doc_id", "text")
    val e = TextQueries.bpeEncode(docs, "doc_id", "text", 4).collect().head
    val stream = "<abab>< ><abab>< ><abab>< ><abc>< ><abc>< ><cd>"
    assert(e.getLong(1) == 6L, e)
    assert(e.getString(2) == md5of(stream), e)
  }

  test("bpeEncode: replace() is greedy LEFT-TO-RIGHT merge application") {
    // "aaa" under merge (a,a): greedy BPE yields <aa><a>, never <a><aa>
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val e = TextQueries.bpeEncode(docs, "doc_id", "text", 1).collect().head
    assert(e.getLong(1) == 4L, e) // two tokens per word
    assert(e.getString(2) == md5of("<aa><a>< ><aa><a>"), e)
  }

  test("bpeEncodeWith: frozen vocab leaves untrained (OOV) pairs at character grain") {
    // train on doc 1 only ((a,b) dominates); apply to both docs — the
    // unseen word "zz" must stay at char grain: no (z,z) merge was
    // ever trained, so the deployed tokenizer cannot fuse it
    val train = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val all = Seq((1L, "abab abab"), (2L, "abab zz")).toDF("doc_id", "text")
    val out = TextQueries.bpeEncodeWith(train, all, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // merge 1 = (a,b): "abab" → <ab><ab> (2 tokens); "zz" → <z><z>
    assert(out(1L) == ((4L, md5of("<ab><ab>< ><ab><ab>"))), out(1L))
    assert(out(2L) == ((4L, md5of("<ab><ab>< ><z><z>"))), out(2L))
  }

  test("bpeFertility: a merged-out stratum reads 1 token/word, an OOV stratum its chars/word") {
    // training sees both strata; (a,b) then (ab,ab) win both rounds
    // ("ab" < "z" on the tie), so en fuses to one token per word while
    // xx never merges and stays at character grain
    val docs = Seq((1L, "en", "abab abab"), (2L, "xx", "zz zz"))
      .toDF("doc_id", "lang", "text")
    val out = TextQueries.bpeFertility(docs, "lang", "text", 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("en") == ((1L, 2L, 2L, 10000L)), out("en"))
    assert(out("xx") == ((1L, 2L, 4L, 20000L)), out("xx"))
  }

  test("bpeDecode: stripping the wrappers recovers every document byte-for-byte") {
    // closed form: "abab zz" under one (a,b) merge encodes to
    // <ab><ab>< ><z><z> (4 tokens) and decodes back to the original
    val docs = Seq((1L, "abab zz")).toDF("doc_id", "text")
    val r = TextQueries.bpeDecode(docs, "doc_id", "text", 1).collect().head
    assert(r.getLong(1) == 4L && r.getBoolean(3), r)
    assert(r.getString(2) == md5of("abab zz"), r)
    // and the whole real corpus roundtrips exactly — the encode chain
    // is lossless, not merely engine-reproducible
    val real = graft.Tables.documents(spark, dir)
    val flags = TextQueries.bpeDecode(real, "doc_id", "text", 8)
      .select($"roundtrip_ok").as[Boolean].collect()
    assert(flags.nonEmpty && flags.forall(identity))
  }

  test("bpeDecode: literal wrapper characters ('<', '>', '~') in the TEXT roundtrip via the escape") {
    // the r19 domain gap: the symbol stream spends '<'/'>' as wrapper
    // characters, so a crawl corpus containing them literally would
    // have corrupted the stream. The reserved-escape pass ('~'→"~e",
    // '<'→"~l", '>'→"~r" before wrapping, inverted after unwrapping)
    // must make ANY byte stream lossless — adversarial cases: wrapper
    // chars, the escape char itself, and their pairings in both orders
    val docs = Seq(
      (1L, "a<b> <tag>"), // wrapper chars mid-word and as a fake tag
      (2L, "~ ~~ ~e ~l"), // the escape char alone, doubled, and fused
      (3L, "<~> >~< ~><~"), // every pairing/order of all three
      (4L, "abab abab"), // plain text trains the merge away from specials
      (5L, "")).toDF("doc_id", "text") // empty text stays empty
    val out = TextQueries.bpeDecode(docs, "doc_id", "text", 2).collect()
    assert(out.length == 5 && out.forall(_.getBoolean(3)),
      out.map(r => s"${r.getLong(0)}:${r.getBoolean(3)}").mkString(", "))
    // and the vocab trained over the escaped stream can never emit a
    // merge symbol containing a literal wrapper character
    val m = TextQueries.bpeVocab(docs, "text", 2).collect()
    assert(m.forall(r => !r.getAs[String]("merged").contains("<") &&
      !r.getAs[String]("merged").contains(">")), m.mkString(", "))
  }

  test("bpeEncodeFromVocab: a parquet-persisted merge table reloads to the identical encoding") {
    // artifact persistence must be invisible: train once, write the
    // merge table to parquet, reload in a fresh frame, encode — every
    // row equals the direct frozen-vocab encode bit-for-bit
    val real = graft.Tables.documents(spark, dir)
    val train = real.filter($"doc_id" % 2 === 0)
    val direct = TextQueries.bpeEncodeWith(train, real, "doc_id", "text", 8)
      .orderBy($"doc_id").collect().toSeq
    val wh = graft.engine.Scratch.dir("graft_bpe_spec")
    TextQueries.bpeVocab(train, "text", 8)
      .coalesce(1).write.mode("overwrite").parquet(s"$wh/vocab")
    val reloaded = TextQueries.bpeEncodeFromVocab(
      spark.read.parquet(s"$wh/vocab"), real, "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    assert(reloaded == direct)
  }

  test("token-true packing: pack-over-encoded matches a driver replay of the contract") {
    // the pack contract over REAL token counts: docs concatenate in
    // doc_id order, every doc tiles its 1..n_tokens exactly across the
    // sequences it touches, cuts land every ctx tokens — verified
    // bit-for-bit against a sequential driver-side replay
    val enc = TextQueries.bpeEncode(
      graft.Tables.documents(spark, dir), "doc_id", "text", 4)
    val counts = enc.orderBy($"doc_id")
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect()
    val ctx = 64L
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int)]
    var start = 0L
    for ((id, n) <- counts) {
      if (n >= 1)
        for (sq <- (start / ctx) to ((start + n - 1) / ctx))
          expect += ((id, sq,
            (math.max(sq * ctx - start, 0L) + 1L).toInt,
            math.min((sq + 1L) * ctx - start, n).toInt))
      start += n
    }
    val got = PipelineQueries.sequencePack(enc, "doc_id", col("n_tokens"), ctx)
      .orderBy($"doc_id", $"seq_id").as[(Long, Long, Int, Int)].collect().toSeq
    assert(got.size == expect.size && got == expect.toSeq,
      s"pack-over-encoded diverged: got ${got.size} spans, expected ${expect.size}")
  }

  // ---------- Gopher rules: planted-fixture metrics ----------

  test("Gopher rules: planted repetition and symbols hit exactly the right gates") {
    val line = (1 to 8).map(i => s"w$i").mkString(" ") // one 8-token "line"
    val docs = Seq(
      // 4 identical lines → dup_line_q = 7500 (3 of 4 blocks duplicate),
      // dup_para_q = 0 (32 tokens = one paragraph block)
      (1L, Seq.fill(4)(line).flatMap(_.split(" ")).mkString(" ")),
      // "x y" repeated 20 times: the bigram "y x" covers 19×3 chars of
      // 79 → top2_q floor((57*10000)/79)=7215; all 40 tokens in 2 words
      (2L, Seq.fill(20)("x y").mkString(" ")),
      // symbol-heavy: 24 words, 5 '#' → sym_ratio_q = 50000/24 = 2083
      (3L, ((1 to 19).map(i => s"tok$i") ++ Seq.fill(5)("#")).mkString(" ")),
      // clean 100-word doc: passes every gate (length matters — a
      // unique 4-gram covers >16% of a very short doc by itself)
      (4L, (1 to 100).map(i => s"word$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextQueries.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("dup_line_q") == 7500L, out(1L))
    assert(out(1L).getAs[Long]("dup_para_q") == 0L)
    assert(!out(1L).getAs[Boolean]("pass")) // dup_line_q >= 3000
    val d2 = out(2L)
    assert(d2.getAs[Long]("top2_q") > 2000L, d2) // repetitive bigram cut
    assert(!d2.getAs[Boolean]("pass"))
    val d3 = out(3L)
    assert(d3.getAs[Long]("sym_ratio_q") > 1000L, d3)
    assert(!d3.getAs[Boolean]("pass"))
    assert(out(4L).getAs[Boolean]("pass"), out(4L))
  }

  test("Gopher rules compose with the curation funnel as a doc-grain conjunct") {
    // the composition shape a pipeline runs: funnel keep ∧ gopher pass,
    // one doc-grain join — gopher adds no corpus exchange of its own
    val docs = graft.Tables.documents(spark, dir)
    val funnel = PipelineQueries.curationFunnel(docs, "doc_id", "text",
      "lang", Map("en" -> 0.5), 8, 0.0, 1.0)
      .select($"doc_id", $"keep")
    val gated = funnel.join(
      TextQueries.gopherRules(docs, "doc_id", "text")
        .select($"doc_id", $"pass"), Seq("doc_id"))
      .select($"doc_id", ($"keep" && $"pass").as("keep"))
    val n = docs.count()
    assert(gated.count() == n) // every doc gets a decision
    val kept = gated.filter($"keep").count()
    val funnelKept = funnel.filter($"keep").count()
    assert(kept <= funnelKept) // gopher only tightens the gate
    assert(kept > 0) // and is non-degenerate on the corpus
  }

  // ---------- PII patterns: closed-form redaction ----------

  test("PII patterns redact emails, IPs and phones and nothing else") {
    val fixtures = Seq(
      ("reach a.b-c%x@foo-bar.org.", "reach <EMAIL>."),
      ("at 10.0.254.9, then 1.2.3.4.", "at <IP>, then <IP>."),
      ("call +1 555 0100 now", "call <PHONE> now"),
      // negative guards: 3 octets are not an IP, a bare number is not a
      // phone (no '+'), a TLD-less '@' is no email. (A 5-octet dotted
      // run DOES contain an embedded 4-octet match after the first dot
      // — both engines agree, so no parity hazard, just not testable as
      // a negative here.)
      ("v1.2.3 build 555 0100 at x@y", "v1.2.3 build 555 0100 at x@y"),
      ("", ""))
    val got = fixtures.toDF("t", "want")
      .select($"want", regexp_replace(regexp_replace(regexp_replace($"t",
        TextQueries.EmailPat, "<EMAIL>"),
        TextQueries.IpPat, "<IP>"),
        TextQueries.PhonePat, "<PHONE>").as("got"))
      .as[(String, String)].collect()
    got.foreach { case (want, g) => assert(g == want) }
  }

  test("q_text_pii_redact finds exactly the planted PII per document") {
    val out = graft.SparkEntry.queries("q_text_pii_redact")(spark, dir)
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones")
      .as[(Long, Int, Int, Int)].collect()
    assert(out.length == 500)
    // one planted email/IP/phone per doc; the synthetic corpus text
    // itself contains none, so every count is exactly 1
    out.foreach { case (id, e, i, p) =>
      assert(e == 1 && i == 1 && p == 1, s"doc $id counts ($e,$i,$p)")
    }
  }

  // ---------- temperature sampling ----------

  test("mixTemperature thresholds equal the closed-form sqrt(n_min/n_s) rates") {
    val docs = graft.Tables.documents(spark, dir)
    val counts = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val nMin = counts.values.min
    val out = PipelineQueries.mixTemperature(docs, "doc_id", "lang")
    val thrs = out.select($"lang", $"thr").distinct().as[(String, String)].collect().toMap
    assert(thrs.keySet == counts.keySet) // every stratum sampled, none lost
    for ((lang, n) <- counts) {
      val want = f"${math.min(
        math.floor(math.sqrt(nMin.toDouble) / math.sqrt(n.toDouble) * 65536).toLong,
        65535L)}%04x"
      assert(thrs(lang) == want, s"$lang thr ${thrs(lang)} want $want")
    }
    // smallest stratum: rate saturates at 65535/65536 — at most the
    // 'ffff'-keyed sliver may drop
    val minLang = counts.minBy(_._2)._1
    val keptMin = out.filter($"lang" === minLang).count()
    assert(keptMin >= (counts(minLang) * 65535L) / 65536)
  }

  test("mixTemperature keep rates land within 4-sigma binomial bounds") {
    val n = 20000L
    val corpus = spark.range(n).select($"id".as("doc_id"),
      when($"id" % 5 === 0, "small").otherwise("big").as("stratum"))
    val kept = PipelineQueries.mixTemperature(corpus, "doc_id", "stratum")
      .groupBy($"stratum").count().as[(String, Long)].collect().toMap
    val sizes = Map("small" -> n / 5, "big" -> (n - n / 5))
    for ((s, ns) <- sizes) {
      val rate = math.min(
        math.floor(math.sqrt(sizes.values.min.toDouble) / math.sqrt(ns.toDouble) * 65536) / 65536,
        65535.0 / 65536)
      val sigma = math.sqrt(rate * (1 - rate) / ns)
      val tol = 4 * sigma + 1.0 / 65536
      val got = kept(s).toDouble / ns
      assert(math.abs(got - rate) <= tol, s"$s keep rate $got vs $rate (tol $tol)")
    }
  }

  // ---------- URL canonicalization ----------

  test("canonicalUrl collapses aliases and leaves distinct pages apart") {
    val fixtures = Seq(
      // scheme/host case, www alias, fragment, utm params all collapse
      ("HTTPS://WWW.Site.COM/Docs/1?utm_source=a&utm_id=2", "https://site.com/Docs/1"),
      ("http://site.com/Docs/1#sec-3",                      "https://site.com/Docs/1"),
      ("https://site.com/Docs/1/",                          "https://site.com/Docs/1"),
      // non-tracking params survive, trailing utm after them is dropped
      ("https://site.com/p?ref=keep&utm_medium=email",      "https://site.com/p?ref=keep"),
      // a LEADING utm param takes its '?' with it — the orphaned
      // remainder re-anchors on '?' so param position can't split aliases
      ("https://site.com/p?utm_a=1&page=2",                 "https://site.com/p?page=2"),
      ("https://site.com/p?utm_a=1&utm_b=2&page=2",         "https://site.com/p?page=2"),
      // path case and non-utm query are significant — no collapse
      ("https://site.com/docs/1",                           "https://site.com/docs/1"),
      ("https://site.com/Docs/1?page=2",                    "https://site.com/Docs/1?page=2"),
      // bare host: root slash strips to the naked origin
      ("https://www.site.com/",                             "https://site.com"))
    val got = fixtures.toDF("url", "want")
      .select($"want", DedupQueries.canonicalUrl($"url").as("got"))
      .as[(String, String)].collect()
    got.foreach { case (want, g) => assert(g == want) }
  }

  test("canonicalUrl and PII redaction are idempotent over the corpus") {
    // canonical output has a lowercase www-free host, no fragment, no
    // utm params, no trailing slash — a second pass must change nothing
    val urls = graft.SparkEntry.queries("q_dedup_url")(spark, dir)
      .select($"canonical_url")
      .withColumn("again", DedupQueries.canonicalUrl($"canonical_url"))
      .filter($"again" =!= $"canonical_url")
    assert(urls.count() == 0)
    // redacted text contains only <EMAIL>/<IP>/<PHONE> placeholders,
    // none of which match any PII pattern — re-redaction is identity
    val redact: org.apache.spark.sql.Column => org.apache.spark.sql.Column = t =>
      regexp_replace(regexp_replace(regexp_replace(t,
        TextQueries.EmailPat, "<EMAIL>"),
        TextQueries.IpPat, "<IP>"),
        TextQueries.PhonePat, "<PHONE>")
    val docs = graft.Tables.documents(spark, dir)
      .select(concat($"text", lit(" a.b@c.io at 1.2.3.4 call +1 555 0000")).as("t"))
      .select(redact($"t").as("r1"))
      .withColumn("r2", redact($"r1"))
      .filter($"r2" =!= $"r1")
    assert(docs.count() == 0)
  }

  test("q_dedup_url keeps exactly the min doc_id per canonical URL") {
    val out = graft.SparkEntry.queries("q_dedup_url")(spark, dir)
      .select($"doc_id", $"canonical_url", $"keep", $"n_aliases")
      .as[(Long, String, Boolean, Long)].collect()
    assert(out.length == 500)
    val byCanon = out.groupBy(_._2)
    // the planted URLs really do alias at this SF (the op has work to do)
    assert(byCanon.exists(_._2.length > 1))
    for ((_, members) <- byCanon) {
      assert(members.forall(_._4 == members.length)) // n_aliases consistent
      val keepers = members.filter(_._3).map(_._1)
      assert(keepers.toList == List(members.map(_._1).min)) // exactly the min kept
    }
  }

  // ---------- semantic dedup: greedy keep-first contract ----------

  test("q_dedup_semantic assigns by nearest centroid and drops greedily") {
    val out = graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .select($"vec_id", $"cluster", $"cos_centroid", $"keep")
      .as[(Long, Int, Double, Boolean)].collect()
    assert(out.length == 500)
    assert(out.exists(!_._4) && out.exists(_._4)) // both outcomes occur

    // driver-side recompute on the quantized vectors (500 × 64 ints)
    val vecs = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => round(x * 100, 0).cast("long")).as("q"))
      .as[(Long, Array[Long])].collect().toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def similar(a: Long, b: Long): Boolean = {
      val d = dot(vecs(a), vecs(b))
      d > 0 && d * d * 100 >= 9 * dot(vecs(a), vecs(a)) * dot(vecs(b), vecs(b))
    }

    // assignment: the reported cluster maximizes cosine over all
    // centroids (centroid = per-label integer sum, labels from source)
    val labels = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    // toSeq before transpose: a Set of columns would collapse duplicate
    // values inside a dimension and corrupt the centroid sums
    val cents = labels.groupBy(_._2).map { case (l, m) =>
      l -> m.keys.toSeq.map(vecs).transpose.map(_.sum).toArray }
    def cos(q: Array[Long], c: Array[Long]): Double =
      dot(q, c) / math.sqrt(dot(q, q).toDouble * dot(c, c).toDouble)
    out.foreach { case (id, cl, _, _) =>
      val best = cents.map { case (l, c) => (cos(vecs(id), c), l) }
        .maxBy { case (s, l) => (s, -l) }._2
      assert(cl == best, s"vec $id assigned $cl, nearest centroid $best")
    }

    val byCluster = out.groupBy(_._2)
    for ((_, members) <- byCluster) {
      val ids = members.map(_._1).sorted
      val keepOf = members.map(m => m._1 -> m._4).toMap
      // smallest id can never be a 'b' side — always kept
      assert(keepOf(ids.min))
      // greedy contract both ways
      for (id <- ids) {
        val hasSmallerDup = ids.filter(_ < id).exists(similar(_, id))
        assert(keepOf(id) == !hasSmallerDup, s"vec $id keep=${keepOf(id)}")
      }
      // no two survivors in a cluster are similar
      val kept = ids.filter(keepOf)
      for (i <- kept.indices; j <- (i + 1) until kept.length)
        assert(!similar(kept(i), kept(j)))
    }
  }
}
