package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data deduplication operators over `documents`/`embeddings`
  * (builder brief; generalizes the reference's exact `record_hash` dedup,
  * `stg_accounts.sql:33-46` + `int_*_current`).
  *
  * Engine-portable determinism: every hash family is built from `md5`
  * (identical hex in Spark and DuckDB); embedding math is quantized to
  * integers so dot products are exact in both engines — no float
  * summation-order hazards in the oracle compare.
  *
  * Scale notes:
  *  - All shingle/signature computation is per-row column expressions —
  *    scan-local, whole-stage-codegen'd, zero shuffles.
  *  - MinHash LSH: the candidate-pair self-join shuffles on
  *    (band_idx, band_key) — exactly the LSH bucket key, so skew is
  *    bounded by bucket size, and the O(n²) all-pairs compare never happens.
  *  - Jaccard/cosine verification joins run only within blocking buckets
  *    (lang × length-bucket / label) — the standard blocked-verification
  *    pattern; bucket cardinality controls cost at 100 TB.
  */
object DedupQueries {

  private val MinhashK = 8 // signature rows
  private val Bands = 4 // bands of r = K/Bands rows

  /** Word n-gram shingles (n=3), whole text when too short. */
  private def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array(concat_ws(" ", toks)))

  private val shinglesSql =
    """CASE WHEN len(t) >= 3 THEN
      |       list_transform(generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' '))
      |     ELSE [array_to_string(t, ' ')] END""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- exact dedup: content-hash groups, keep lowest doc_id
    Q.sql(
      "q_dedup_exact",
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
    },

    // ---- MinHash + LSH banding: candidate near-dup pairs
    Q.sql(
      "q_dedup_minhash_lsh", {
        val sigs = (0 until MinhashK).map(i =>
          s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        val bandKeys = (0 until Bands).map { b =>
          val r = MinhashK / Bands
          val parts = (0 until r).map(j => s"sig[${b * r + j + 1}]").mkString(" || '|' || ")
          s"md5($parts)"
        }
        s"""WITH sh AS (
           |  SELECT doc_id, $shinglesSql AS sh
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
           |sig AS (SELECT doc_id, [${sigs.mkString(",\n  ")}] AS sig FROM sh),
           |bands AS (
           |  SELECT doc_id,
           |         unnest([${(0 until Bands).mkString(", ")}]) AS band_idx,
           |         unnest([${bandKeys.mkString(",\n  ")}]) AS band_key
           |  FROM sig)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |FROM bands a JOIN bands b
           |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           | AND a.doc_id < b.doc_id
           |GROUP BY 1, 2""".stripMargin
      }
    ) { (s, dir) =>
      val toks = split(col("text"), " ")
      val withSh = Tables.documents(s, dir)
        .select(col("doc_id"), shingles(toks).as("sh"))
      val sigs = (0 until MinhashK).map(i =>
        array_min(transform(col("sh"), sh => md5(concat(lit(s"$i|"), sh)))))
      val r = MinhashK / Bands
      val bandKeys = (0 until Bands).map { b =>
        md5(concat_ws("|", (0 until r).map(j => sigs(b * r + j)): _*))
      }
      val bands = withSh
        .select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
      val a = bands.as("a"); val b = bands.as("b")
      a.join(b,
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(lit(1)).select("doc_a", "doc_b")
    },

    // ---- SimHash: 16-bit token-majority fingerprint per doc
    Q.sql(
      "q_dedup_simhash", {
        // bit j of md5(tok): hex char at j/4 (1-based), bit j%4 within it
        def bitSql(j: Int) = {
          val cpos = j / 4 + 1; val bpos = j % 4
          s"((strpos('0123456789abcdef', substr(md5(tok), $cpos, 1)) - 1) >> $bpos) & 1"
        }
        val bits = (0 until 16).map { j =>
          s"CASE WHEN 2 * len(list_filter(t, tok -> (${bitSql(j)}) = 1)) > len(t) THEN ${1 << j} ELSE 0 END"
        }
        s"""SELECT doc_id, CAST(${bits.mkString(" + ")} AS INT) AS simhash16
           |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""".stripMargin
      }
    ) { (s, dir) =>
      val toks = split(col("text"), " ")
      def bit(tok: Column, j: Int): Column = {
        val digit = instr(lit("0123456789abcdef"), substring(md5(tok), j / 4 + 1, 1)) - 1
        shiftright(digit, j % 4).bitwiseAND(1)
      }
      val simhash = (0 until 16).map { j =>
        when(lit(2) * size(filter(toks, tok => bit(tok, j) === 1)) > size(toks), 1 << j)
          .otherwise(0)
      }.reduce(_ + _)
      Tables.documents(s, dir)
        .select(col("doc_id"), simhash.cast("int").as("simhash16"))
    },

    // ---- n-gram Jaccard verification over blocked candidate pairs
    Q.sql(
      "q_dedup_ngram_jaccard",
      """WITH d AS (
        |  SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS len_bkt,
        |         list_distinct(CASE WHEN len(t) >= 2 THEN
        |             list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
        |           ELSE t END) AS sh
        |  FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS t FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
        |         len(a.sh) + len(b.sh) AS sz
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.len_bkt = b.len_bkt AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       round(CAST(inter AS DOUBLE) / (sz - inter), 4) AS jaccard
        |FROM pairs WHERE inter * 10 >= (sz - inter)""".stripMargin
    ) { (s, dir) =>
      val toks = split(col("text"), " ")
      val bigrams = array_distinct(
        when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
          .otherwise(toks))
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        floor(col("n_chars") / 50).cast("int").as("len_bkt"),
        bigrams.as("sh"))
      val a = d.as("a"); val b = d.as("b")
      val inter = size(array_intersect(col("a.sh"), col("b.sh")))
      val sz = size(col("a.sh")) + size(col("b.sh"))
      a.join(b,
          col("a.lang") === col("b.lang") && col("a.len_bkt") === col("b.len_bkt") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          inter.as("inter"), sz.as("sz"))
        // integer-exact threshold: jaccard >= 0.1 ⇔ 10·inter >= union
        .filter(col("inter") * 10 >= col("sz") - col("inter"))
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") / (col("sz") - col("inter")), 4).as("jaccard"))
    },

    // ---- embedding-cosine near-dup within label blocks (IVF-style),
    // integer-quantized so the threshold compare is exact in both engines
    Q.sql(
      "q_dedup_embedding_cosine",
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(round(x * 100) AS BIGINT)) AS q
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, q,
        |             list_sum(list_transform(q, x -> x * x)) AS nsq FROM e),
        |pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         list_sum(list_transform(generate_series(1, len(a.q)),
        |                  i -> a.q[i] * b.q[i])) AS dot,
        |         a.nsq AS na, b.nsq AS nb
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b,
        |       round(dot / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 4) AS cos_sim
        |FROM pairs
        |WHERE dot > 0 AND dot * dot * 100 >= 9 * na * nb""".stripMargin
    ) { (s, dir) =>
      val q = transform(col("embedding"),
        x => round(x * 100, 0).cast("long"))
      val e = Tables.embeddings(s, dir).select(
        col("vec_id"), col("label"), q.as("q"))
        .withColumn("nsq", aggregate(
          transform(col("q"), x => x * x), lit(0L), (acc, x) => acc + x))
      val a = e.as("a"); val b = e.as("b")
      val dot = aggregate(
        zip_with(col("a.q"), col("b.q"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          dot.as("dot"), col("a.nsq").as("na"), col("b.nsq").as("nb"))
        // cos >= 0.3 ⇔ dot² · 100 >= 9 · |a|²·|b|² (dot > 0), all integer
        // (synthetic embeddings are near-orthogonal; real near-dup
        // pipelines would use ~0.9 — the algebra is threshold-agnostic)
        .filter(col("dot") > 0 && col("dot") * col("dot") * 100 >= lit(9) * col("na") * col("nb"))
        .select(col("vec_a"), col("vec_b"),
          round(col("dot") / sqrt(col("na").cast("double") * col("nb").cast("double")), 4).as("cos_sim"))
    }
  )
}
