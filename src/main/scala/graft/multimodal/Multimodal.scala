package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (builder brief): media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as distributed
  * per-partition batch operators.
  *
  * The actual codec call is STUBBED ([[MediaDecoder.Stub]]) — the
  * container has no image/audio libraries — but everything Spark-side is
  * real and tested: the schema, the binary payload flow, the
  * partition-local batch shape (bounded memory per task), and the typed
  * feature output. Swapping in a real decoder is a one-class change.
  *
  * Scale notes:
  *  - Payloads never hit the driver; [[featurize]] is
  *    `mapPartitions` with an explicit batch size, so peak task memory is
  *    `batchSize × payload` regardless of partition size.
  *  - Feature extraction emits fixed-width vectors — downstream ANN
  *    (SimilarityQueries) consumes them directly.
  *  - On a real cluster, media tables should be stored with small row
  *    groups (payload-heavy) and metadata in separate columns so
  *    metadata-only queries never read payload bytes (columnar pruning).
  */
object Multimodal {

  /** One media row: payload + typed metadata (schema contract). */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int, // image/video
      height: Int,
      sample_rate: Int, // audio
      n_frames: Int) // video

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float])

  /** Decoder seam. `decode` turns payload bytes into a raw sample/pixel
    * buffer; real implementations (JPEG/PNG/PCM/frame extraction) plug in
    * here. */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): Array[Byte]
  }

  object MediaDecoder {
    /** STUB: identity "decode" — stands in for the codec (no media libs
      * in this environment). Deterministic, so tests are stable. */
    object Stub extends MediaDecoder {
      def decode(kind: String, payload: Array[Byte]): Array[Byte] = payload
    }
  }

  /** Derive a deterministic media table from `documents` (the testdata
    * has no binary fixtures): payload = utf8 bytes of text, metadata
    * derived from doc_id/n_chars. This is fixture synthesis, not a stub —
    * the operators downstream treat payload as opaque bytes. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (lit(16) + col("doc_id") % 64).cast("int").as("width"),
      (lit(16) + col("doc_id") % 48).cast("int").as("height"),
      element_at(array(lit(8000), lit(16000), lit(44100)),
        (col("doc_id") % 3 + 1).cast("int")).as("sample_rate"),
      (col("n_chars") % 240 + 1).cast("int").as("n_frames"))

  /** Distributed feature extraction: decode (stub) then compute a
    * fixed-width feature vector from the raw buffer (byte-moment + coarse
    * histogram — real math over real bytes). Runs partition-local in
    * bounded batches. */
  def featurize(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = MediaDecoder.Stub,
      batchSize: Int = 64,
      nBuckets: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => // bounded batch shape
        batch.iterator.map { m =>
          val raw = decoder.decode(m.kind, m.payload)
          val hist = new Array[Float](nBuckets)
          var sum = 0.0; var sumSq = 0.0
          var i = 0
          while (i < raw.length) {
            val v = raw(i) & 0xff
            hist(v * nBuckets / 256) += 1f
            sum += v; sumSq += v.toDouble * v
            i += 1
          }
          val n = math.max(raw.length, 1)
          val mean = (sum / n).toFloat
          val std = math.sqrt(math.max(sumSq / n - mean * mean, 0)).toFloat
          val normHist = hist.map(_ / n)
          MediaFeatures(m.media_id, m.kind, raw.length,
            Array(mean, std) ++ normHist)
        }
      }
    }
  }

  /** Integer-exact feature moments: the oracle-checkable face of
    * [[featurize]]. Same decode seam, same partition-local batch shape,
    * but the outputs are exact 64-bit integers — byte sum, byte sum of
    * squares and the raw 8-bucket histogram COUNTS — so a SQL engine can
    * reproduce them bit-for-bit over the same payloads (mean/std/normalized
    * histogram are derived views: mean = sum/n, var = sumsq/n − mean²).
    * This is what lets `q_media_features` hash-check against DuckDB while
    * the float vector stays pinned in MultimodalSpec. */
  final case class MediaMoments(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      byte_sum: Long,
      byte_sumsq: Long,
      hist: Array[Long])

  def featurizeExact(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = MediaDecoder.Stub,
      batchSize: Int = 64,
      nBuckets: Int = 8): Dataset[MediaMoments] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => // bounded batch shape
        batch.iterator.map { m =>
          val raw = decoder.decode(m.kind, m.payload)
          val hist = new Array[Long](nBuckets)
          var sum = 0L
          var sumSq = 0L
          var i = 0
          while (i < raw.length) {
            val v = raw(i) & 0xff
            hist(v * nBuckets / 256) += 1L
            sum += v
            sumSq += v.toLong * v
            i += 1
          }
          MediaMoments(m.media_id, m.kind, raw.length, sum, sumSq, hist)
        }
      }
    }
  }

  /** dHash-64 perceptual hash over the DECODED sample buffer, packed as
    * 4×16-bit words (the LSH band grain): 65 evenly spaced samples —
    * the byte-buffer analog of dHash's 9×8 thumbnail — and 64 gradient
    * bits (`bit i = sample(i+1) > sample(i)`). Gradient bits are
    * invariant under any MONOTONE intensity map (the re-encode /
    * brightness-shift class of near-duplicate), and a local overlay
    * ("scratch") flips at most 2 sampled gradients — so near-dup media
    * cluster at small hamming distance while distinct payloads sit near
    * the random-expectation 32. Positions are sampled at
    * `(i·(L−1)) div 64`: scan-local integer math, no codec. On this
    * corpus the stub decode yields the utf8 text, where byte index ==
    * char index (ASCII), so the DuckDB oracle's substr/ascii
    * formulation is bit-identical.
    *
    * Scale: one kernel pass, no shuffle; downstream banding reuses
    * [[graft.queries.DedupQueries]]' capped bucket-join (the MaxBucket
    * chain idiom — already adversarially tested on the LSH path). */
  def dHashWords(
      media: DataFrame,
      decoder: MediaDecoder = MediaDecoder.Stub): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val buf = decoder.decode(kind, payload)
          val n = buf.length
          val words = new Array[Int](4)
          if (n > 0) {
            var prev = buf(0) & 0xff
            var i = 1
            while (i <= 64) {
              val cur = buf(((i.toLong * (n - 1)) / 64).toInt) & 0xff
              if (cur > prev) words((i - 1) / 16) |= 1 << ((i - 1) % 16)
              prev = cur
              i += 1
            }
          }
          (id, words(0), words(1), words(2), words(3))
        }
      }.toDF("media_id", "w0", "w1", "w2", "w3")
  }

  /** Resize plan (metadata op): target box with aspect preserved —
    * integer math only, the pixel resample itself happens inside the
    * decoder seam on a real deployment. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    val scaleNum = least(longSide, lit(maxSide)) // scaled = dim*num/den
    def fit(dim: org.apache.spark.sql.Column) = // 0-dim rows (audio) pass through
      when(longSide > 0, (dim * scaleNum / longSide).cast("int")).otherwise(dim)
    media.withColumn("out_width", fit(col("width")))
      .withColumn("out_height", fit(col("height")))
  }

  /** Frame sampling for video rows: every `stride`-th frame index —
    * generated scan-local (explode of a sequence), no shuffle. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Cross-modal ALIGNMENT filter (the LAION curation stage): score each
    * image/caption pair by the cosine of its two embeddings and gate
    * pairs below the threshold — the signal that cuts mismatched
    * alt-text, watermark boilerplate and scraped noise before a
    * multimodal training run.
    *
    * The pair is ONE ROW (`imgCol`, `txtCol` are paired by key upstream
    * — a contrastive-encoder pipeline emits them together), so scoring
    * is a pure projection: the codegen'd integer dot
    * ([[graft.functions.DotI64]]) three times (dot, |img|², |txt|²) and
    * an integer threshold compare — cos ≥ t/100 (for dot > 0) ⇔
    * dot²·100² ≥ t²·|img|²·|txt|² over ×100-quantized vectors, so both
    * engines gate identical rows with zero float comparisons. ZERO
    * exchanges at any corpus size (PlanSpec-pinned); composes
    * funnel-style with the media dedup ops (MultimodalSpec).
    *
    * The gate multiplies three Longs, so it widens to decimal(38,0):
    * plain Long arithmetic silently WRAPS in (non-ANSI) Spark while
    * DuckDB raises on BIGINT overflow — a silent-wrong vs loud-fail
    * divergence for a large d or coarse quantization. The decimal form
    * is exact for |dot|, ni, nt < ~1e17, far beyond any realizable
    * embedding (d=4096 at ×1000 quantization peaks near 4e12); the
    * oracle widens identically via HUGEINT. */
  def clipFilter(paired: DataFrame, idCol: String, imgCol: String,
      txtCol: String, cosThresholdPct: Int): DataFrame = {
    val t2 = cosThresholdPct.toLong * cosThresholdPct
    paired
      .select(col(idCol),
        expr(s"dot_i64($imgCol, $txtCol)").as("dot"),
        expr(s"dot_i64($imgCol, $imgCol)").as("ni"),
        expr(s"dot_i64($txtCol, $txtCol)").as("nt"))
      .withColumn("clip_pass",
        col("dot") > 0 &&
          expr("cast(dot as decimal(38,0)) * dot * 10000") >=
            expr(s"cast(ni as decimal(38,0)) * nt * $t2"))
  }
}
