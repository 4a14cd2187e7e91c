package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Query-registry surface for the multimodal operators (see
  * [[graft.multimodal.Multimodal]] for the engine pieces + scale notes).
  * Every query here hash-checks against a DuckDB oracle — including the
  * decode+featurize path, whose oracle face is the integer-exact moment
  * kernel ([[Multimodal.featurizeExact]]); the float feature vector the
  * moments determine stays pinned in MultimodalSpec.
  */
object MultimodalQueries {

  val qs: Seq[Q] = Seq(

    // ---- media catalog: binary payload + typed metadata schema
    Q.sql(
      "q_media_catalog",
      """SELECT doc_id AS media_id,
        |       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |       md5(text) AS content_md5,
        |       CAST(16 + doc_id % 64 AS INT) AS width,
        |       CAST(16 + doc_id % 48 AS INT) AS height,
        |       [8000, 16000, 44100][CAST(doc_id % 3 + 1 AS INT)] AS sample_rate,
        |       CAST(n_chars % 240 + 1 AS INT) AS n_frames
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      // md5(payload) IS md5(text): payload = cast(text as binary) = the
      // utf8 bytes md5(string) hashes — so the catalog needs no second
      // documents scan and no join back for the text column
      Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .select(
          col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("content_md5"),
          col("width"), col("height"),
          col("sample_rate").cast("int").as("sample_rate"), col("n_frames"))
    },

    // ---- resize plan: aspect-preserving integer box fit
    Q.sql(
      "q_media_resize_plan",
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(16 + doc_id % 64 AS INT) AS width,
        |         CAST(16 + doc_id % 48 AS INT) AS height
        |  FROM documents)
        |SELECT media_id, width, height,
        |       CAST(width  * least(greatest(width, height), 32) // greatest(width, height) AS INT) AS out_width,
        |       CAST(height * least(greatest(width, height), 32) // greatest(width, height) AS INT) AS out_height
        |FROM m""".stripMargin
    ) { (s, dir) =>
      Multimodal.resizePlan(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)), maxSide = 32)
        .select("media_id", "width", "height", "out_width", "out_height")
    },

    // ---- frame sampling: every 25th frame of each video
    Q.sql(
      "q_media_frame_sample",
      """SELECT doc_id AS media_id,
        |       CAST(n_chars % 240 + 1 AS INT) AS n_frames,
        |       CAST(unnest(generate_series(0, CAST(n_chars % 240 AS INT), 25)) AS INT) AS frame_idx
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin
    ) { (s, dir) =>
      Multimodal.frameSample(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)), stride = 25)
    },

    // ---- binary-payload exact dedup (frame/image dedup primitive):
    // md5 over the OPAQUE BYTES — the hash is computed on the binary
    // column, never a decoded/string form, so it works for any codec
    Q.sql(
      "q_media_dedup_exact",
      """SELECT md5(text) AS payload_md5,
        |       min(doc_id) AS keep_media_id,
        |       count(*) AS n_copies,
        |       CAST(min(octet_length(CAST(text AS BLOB))) AS INT) AS n_bytes
        |FROM documents GROUP BY 1""".stripMargin
      // (DuckDB 1.0's md5 is VARCHAR-only; payload IS the utf8 bytes of
      // text, so md5(text) hashes the identical byte sequence)
    ) { (s, dir) =>
      Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .groupBy(md5(col("payload")).as("payload_md5"))
        .agg(min(col("media_id")).as("keep_media_id"),
          count(lit(1)).as("n_copies"),
          min(length(col("payload"))).as("n_bytes"))
    },

    // ---- perceptual-hash near-dup (dHash-64 + banded hamming join):
    // catches the transform classes exact md5 dedup misses — a MONOTONE
    // intensity remap ("re-encode/brightness", hamming 0) and a local
    // overlay ("scratch", hamming ≤ 2) — planted deterministically by
    // [[plantedMedia]] in BOTH engines. Candidates come from exact
    // matches on the hash's four 16-bit words (an LSH band join through
    // DedupQueries.pairsFromBands, inheriting its MaxBucket chain cap —
    // nothing all-pairs), then one hash-join verifies hamming ≤ 6.
    Q.sql(
      "q_media_dedup_phash", {
        val sample =
          "list_transform(range(0, 65), i -> ascii(substr(text, CAST(1 + (i * (length(text) - 1)) // 64 AS INT), 1)))"
        s"""WITH m AS (
           |  SELECT doc_id AS media_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000,
           |         translate(text, ' abcdefghijklmnopqrstuvwxyz', '!bcdefghijklmnopqrstuvwxyz{')
           |  FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 2000000,
           |         substr(text, 1, length(text)//2 - 1) || '~' || substr(text, length(text)//2 + 1)
           |  FROM documents WHERE doc_id % 7 = 0),
           |s AS (SELECT media_id, $sample AS sm FROM m),
           |h AS (
           |  SELECT media_id,
           |         list_transform(range(0, 4), w ->
           |           CAST(list_sum(list_transform(range(0, 16), j ->
           |             CASE WHEN sm[16*w + j + 2] > sm[16*w + j + 1] THEN (1 << j) ELSE 0 END)) AS INT)) AS words
           |  FROM s),
           |b AS (
           |  SELECT media_id, CAST(t.w AS INT) AS band_no, words[CAST(t.w AS INT) + 1] AS word
           |  FROM h, range(0, 4) t(w)),
           |bandsz AS (SELECT band_no, word, count(*) AS bsz FROM b GROUP BY 1, 2),
           |cand AS (
           |  SELECT media_a, media_b FROM (
           |    SELECT x.media_id AS media_a, y.media_id AS media_b
           |    FROM b x JOIN b y ON x.band_no = y.band_no AND x.word = y.word AND x.media_id < y.media_id
           |    JOIN bandsz z ON z.band_no = x.band_no AND z.word = x.word
           |    WHERE z.bsz <= 64
           |    UNION ALL
           |    SELECT media_a, media_b FROM (
           |      SELECT c.media_id AS media_a,
           |             lead(c.media_id) OVER (PARTITION BY c.band_no, c.word ORDER BY c.media_id) AS media_b
           |      FROM b c JOIN bandsz z2 ON z2.band_no = c.band_no AND z2.word = c.word
           |      WHERE z2.bsz > 64)
           |    WHERE media_b IS NOT NULL)
           |  GROUP BY 1, 2)
           |SELECT c.media_a, c.media_b,
           |       CAST(bit_count(xor(ha.words[1], hb.words[1])) + bit_count(xor(ha.words[2], hb.words[2]))
           |          + bit_count(xor(ha.words[3], hb.words[3])) + bit_count(xor(ha.words[4], hb.words[4])) AS INT) AS hamming
           |FROM cand c JOIN h ha ON c.media_a = ha.media_id JOIN h hb ON c.media_b = hb.media_id
           |WHERE hamming <= 6""".stripMargin
      }
    ) { (s, dir) =>
      val media = plantedMedia(Tables.documents(s, dir))
        .select(col("media_id"), lit("image").as("kind"),
          col("text").cast("binary").as("payload"))
      val h = Multimodal.dHashWords(media)
      val bands = h.select(col("media_id").as("doc_id"),
          explode(array((0 to 3).map(w => struct(
            lit(w).as("band_idx"),
            col(s"w$w").cast("string").as("band_key"))): _*)).as("b"))
        .select(col("doc_id"), col("b.band_idx"), col("b.band_key"))
      val pairs = DedupQueries.pairsFromBands(bands)
      def side(tag: String) = h.select(
        col("media_id").as(s"${tag}_id") +: (0 to 3).map(w =>
          col(s"w$w").as(s"$tag$w")): _*)
      val hamming = (0 to 3).map(w =>
        bit_count(col(s"a$w").bitwiseXOR(col(s"b$w")))).reduce(_ + _)
      pairs
        .join(side("a"), col("doc_a") === col("a_id"))
        .join(side("b"), col("doc_b") === col("b_id"))
        .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
          hamming.cast("int").as("hamming"))
        .filter(col("hamming") <= 6)
    },

    // ---- decode + feature extraction (mapPartitions, stub decoder):
    // not SQL-expressible → rows-only; values asserted in MultimodalSpec
    Q.sql(
      "q_media_features",
      // the stub decode is identity and the corpus is ASCII (byte index ==
      // char index — same contract the dHash oracle uses), so DuckDB can
      // recompute the kernel's moments from ascii(substr(...)); empty
      // payloads coalesce to 0 exactly like the kernel's empty loop
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |         list_transform(generate_series(1, length(text)),
        |                        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS codes
        |  FROM documents)
        |SELECT media_id, kind,
        |       CAST(len(codes) AS INT) AS n_bytes,
        |       CAST(coalesce(list_sum(codes), 0) AS BIGINT) AS byte_sum,
        |       CAST(coalesce(list_sum(list_transform(codes, x -> x * x)), 0) AS BIGINT) AS byte_sumsq,
        |""".stripMargin +
        (0 to 7).map(b =>
          s"       CAST(len(list_filter(codes, x -> x // 32 = $b)) AS BIGINT) AS hist_$b")
          .mkString(",\n") +
        "\nFROM m"
    ) { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .as[Multimodal.MediaRow]
      Multimodal.featurizeExact(media).toDF()
        .select(Seq(col("media_id"), col("kind"), col("n_bytes"),
          col("byte_sum"), col("byte_sumsq")) ++
          // the driver's compare sorts/hashes SCALAR columns; the
          // histogram ships as 8 bigints, not an array column
          (0 to 7).map(b => element_at(col("hist"), b + 1).as(s"hist_$b")): _*)
    },

    // ---- cross-modal alignment filter (the LAION CLIP-score gate):
    // paired image/caption embeddings scored by the integer-exact
    // cosine, gated at 0.28 — scan-local, zero exchanges. The corpus
    // has no caption embeddings, so BOTH engines synthesize the pair
    // deterministically from the embeddings table: image = the ×100-
    // quantized vector, caption = the same vector with its first
    // (vec_id % 48) coordinates sign-flipped — norm-preserving, so the
    // cosine sweeps ~1 → ~−0.5 smoothly across rows and the 0.28 gate
    // splits the corpus non-degenerately. The OPERATOR treats the two
    // columns as opaque paired vectors (Multimodal.clipFilter).
    Q.sql(
      "q_media_clip_filter",
      """WITH e AS (
        |  SELECT vec_id AS media_id,
        |         list_transform(embedding, x -> CAST(round(x * 100) AS BIGINT)) AS iq
        |  FROM embeddings),
        |p AS (
        |  SELECT media_id, iq,
        |         list_transform(generate_series(1, len(iq)),
        |           i -> CASE WHEN i <= media_id % 48 THEN -iq[i] ELSE iq[i] END) AS tq
        |  FROM e),
        |s AS (
        |  SELECT media_id,
        |         CAST(list_sum(list_transform(generate_series(1, len(iq)),
        |              i -> iq[i] * tq[i])) AS BIGINT) AS dot,
        |         CAST(list_sum(list_transform(iq, x -> x * x)) AS BIGINT) AS ni,
        |         CAST(list_sum(list_transform(tq, x -> x * x)) AS BIGINT) AS nt
        |  FROM p)
        |SELECT media_id, dot, ni, nt,
        |       (dot > 0 AND dot::HUGEINT * dot * 10000 >= ni::HUGEINT * nt * 784) AS clip_pass
        |FROM s""".stripMargin
    ) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      // fixture construction is fully native/codegen (r21): quantize_i64
      // + neg_prefix_i64 replace the interpreted transform() lambdas the
      // r20 ClipProbe attributed 94% of the 64× board time to — same
      // per-element math (spec-pinned), identical rows/hash
      val paired = Tables.embeddings(s, dir)
        .select(col("vec_id").as("media_id"),
          DedupQueries.quantize(col("embedding")).as("iq"))
        .withColumn("tq", expr("neg_prefix_i64(iq, media_id % 48)"))
      Multimodal.clipFilter(paired, "media_id", "iq", "tq", 28)
    }
  )

  /** Deterministic near-duplicate media variants planted from
    * `documents` — the corpus has no binary fixtures, so both engines
    * synthesize the SAME payloads (see the `m` CTE of the phash
    * oracle): every doc's original, plus for doc_id % 5 == 0 a
    * "re-encoded" copy under a strictly MONOTONE byte remap (each char
    * of the corpus alphabet shifted +1 — every dHash gradient
    * preserved, md5 changed), and for doc_id % 7 == 0 a "scratched"
    * copy with one high byte overlaid mid-payload (≤ 2 sampled
    * gradients flip). Exact dedup sees three distinct payloads;
    * perceptual dedup reunites them. Emits (media_id, text). */
  private def plantedMedia(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id").as("media_id"), col("text"))
    val bright = base.filter(col("media_id") % 5 === 0)
      .select((col("media_id") + 1000000L).as("media_id"),
        translate(col("text"),
          " abcdefghijklmnopqrstuvwxyz", "!bcdefghijklmnopqrstuvwxyz{").as("text"))
    val scratch = base.filter(col("media_id") % 7 === 0)
      .select((col("media_id") + 2000000L).as("media_id"),
        expr("concat(substr(text, 1, cast(length(text)/2 as int) - 1), '~', " +
          "substr(text, cast(length(text)/2 as int) + 1))").as("text"))
    base.unionByName(bright).unionByName(scratch)
  }
}
