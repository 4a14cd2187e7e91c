package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Query-registry surface for the multimodal operators (see
  * [[graft.multimodal.Multimodal]] for the engine pieces + scale notes).
  * Metadata/sampling ops are SQL-expressible → DuckDB oracles; the
  * decode+featurize path is not (mapPartitions) → rows-only check, with
  * semantics covered by MultimodalSpec.
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
      Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .join(Tables.documents(s, dir).select(col("doc_id").as("media_id"), col("text")), "media_id")
        .select(
          col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          md5(col("text")).as("content_md5"),
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

    // ---- decode + feature extraction (mapPartitions, stub decoder):
    // not SQL-expressible → rows-only; values asserted in MultimodalSpec
    Q.rowsOnly("q_media_features") { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .as[Multimodal.MediaRow]
      Multimodal.featurize(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("features"), 1), 3).as("byte_mean"),
          round(element_at(col("features"), 2), 3).as("byte_std"))
    }
  )
}
