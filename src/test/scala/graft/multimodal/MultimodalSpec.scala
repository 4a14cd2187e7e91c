package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", "abcd".getBytes("UTF-8"), 32, 24, 8000, 1),
    MediaRow(2L, "audio", Array.tabulate(300)(i => (i % 256).toByte), 0, 0, 16000, 1),
    MediaRow(3L, "video", Array.fill(100)(0x40.toByte), 64, 48, 0, 100)
  ).toDS()

  test("featurize: schema, batch shape, and real byte math") {
    val feats = featurize(media, batchSize = 2).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    // fixed-width vector: mean, std + 8 histogram buckets
    assert(feats.forall(_.features.length == 10))
    // constant payload → std 0, single hist bucket == 1.0
    val const = feats(2)
    assert(const.features(0) == 0x40.toFloat && const.features(1) == 0f)
    assert(math.abs(const.features(2 + (0x40 * 8 / 256)) - 1f) < 1e-6)
    // "abcd" mean = (97+98+99+100)/4
    assert(math.abs(feats(0).features(0) - 98.5f) < 1e-4)
    assert(feats(0).n_bytes == 4)
    // histogram is a probability distribution
    feats.foreach(f => assert(math.abs(f.features.drop(2).sum - 1f) < 1e-5))
  }

  test("featurizeExact moments determine featurize's float vector") {
    val f = featurize(media).collect().map(r => r.media_id -> r).toMap
    val m = featurizeExact(media).collect().sortBy(_.media_id)
    assert(m.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    m.foreach { mm =>
      val ff = f(mm.media_id)
      assert(mm.n_bytes == ff.n_bytes)
      val n = math.max(mm.n_bytes, 1)
      val mean = (mm.byte_sum.toDouble / n).toFloat
      assert(mean == ff.features(0))
      val std = math.sqrt(
        math.max(mm.byte_sumsq.toDouble / n - mean * mean, 0)).toFloat
      assert(std == ff.features(1))
      assert(mm.hist.sum == mm.n_bytes)
      mm.hist.zipWithIndex.foreach { case (h, b) =>
        assert(h.toFloat / n == ff.features(2 + b))
      }
    }
  }

  test("featurize is deterministic across runs and partitionings") {
    val a = featurize(media.repartition(1)).collect().sortBy(_.media_id).map(_.features.toSeq).toSeq
    val b = featurize(media.repartition(3)).collect().sortBy(_.media_id).map(_.features.toSeq).toSeq
    assert(a == b)
  }

  test("resize plan preserves aspect and never upscales") {
    val df = resizePlan(media.toDF(), maxSide = 32)
      .select($"media_id", $"width", $"height", $"out_width", $"out_height")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    df.foreach { case (_, w, h, ow, oh) =>
      if (w > 0 && h > 0) {
        assert(math.max(ow, oh) <= 32 && math.min(ow, oh) >= 1)
        assert(ow <= w && oh <= h) // never upscale
      }
    }
    // 64x48 → 32x24 exactly
    assert(df.find(_._1 == 3L).map(r => (r._4, r._5)).contains((32, 24)))
  }

  test("frame sampling strides over video frames only") {
    val rows = frameSample(media.toDF(), stride = 30)
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect()
    assert(rows.forall(_._1 == 3L))
    assert(rows.map(_._2).sorted.toSeq == Seq(0, 30, 60, 90))
  }

  test("dHash: monotone remap is hamming-0, a scratch flips at most 2 gradients, distinct payloads split") {
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val bright = text.map(c => (c + 1).toChar) // strictly monotone byte remap
    val mid = text.length / 2
    val scratch = text.substring(0, mid - 1) + "~" + text.substring(mid)
    val other = text.reverse
    def rows = Seq(
      (1L, "image", text.getBytes("UTF-8")),
      (2L, "image", bright.getBytes("UTF-8")),
      (3L, "image", scratch.getBytes("UTF-8")),
      (4L, "image", other.getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    val h = dHashWords(rows).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    def hamming(a: Long, b: Long): Int =
      h(a).zip(h(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    assert(hamming(1L, 2L) == 0) // gradient bits survive the remap; md5 would not
    assert(hamming(1L, 3L) <= 2) // one overlaid byte touches ≤ 2 sampled gradients
    assert(hamming(1L, 4L) > 6) // reversal scrambles gradients past any near-dup bar
    // determinism across partitionings (kernel is partition-local)
    val h2 = dHashWords(rows.repartition(3)).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(h == h2)
  }

  test("clipFilter gates by exact integer cosine; the threshold boundary is bit-exact") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (1L, Seq(3L, 4L), Seq(3L, 4L)),   // cos 1 → pass
      (2L, Seq(1L, 0L), Seq(0L, 1L)),   // cos 0 → fail (dot not > 0)
      (3L, Seq(1L, 2L), Seq(-1L, -2L)), // cos −1 → fail
      // dot 175, |a|²=|b|²=625: cos = 175/625 = 0.28 EXACTLY → pass (≥)
      (4L, Seq(7L, 24L), Seq(25L, 0L)))
      .toDF("media_id", "iq", "tq")
    val out = Multimodal.clipFilter(rows, "media_id", "iq", "tq", 28)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true), out)
  }

  test("clipFilter composes funnel-style with media dedup on the media_id grain") {
    // the LAION-style curation order: alignment gate FIRST (cheapest,
    // scan-local), dedup the survivors — both ops keyed by media_id, so
    // the gate's output feeds the dedup unchanged
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val paired = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("media_id"),
        expr("transform(embedding, x -> cast(round(x * 100, 0) as long))").as("iq"))
      .withColumn("tq", expr("transform(iq, (x, i) -> if(i < media_id % 48, -x, x))"))
    val gate = Multimodal.clipFilter(paired, "media_id", "iq", "tq", 28)
      .filter(col("clip_pass")).select("media_id")
    val media = mediaFromDocuments(graft.Tables.documents(spark, dir))
    val survivors = media.join(gate, Seq("media_id"), "left_semi")
    val keeps = survivors
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("media_id")).as("keep_id"))
    val nGate = gate.count(); val nSurv = survivors.count(); val nKeep = keeps.count()
    assert(nGate > 0 && nGate < 500, s"degenerate gate: $nGate of 500 pass")
    assert(nSurv > 0 && nSurv <= nGate, s"$nSurv survivors vs $nGate gate passes")
    assert(nKeep > 0 && nKeep <= nSurv)
    // every dedup keep passed the gate (the conjuncts share the grain)
    assert(keeps.join(gate.withColumnRenamed("media_id", "keep_id"),
      Seq("keep_id"), "left_anti").count() == 0)
  }
}
