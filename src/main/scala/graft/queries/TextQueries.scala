package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar string functions (SURVEY.md §2.8) + the text-analysis operators
  * a training-data pipeline needs: token counting, quality scoring,
  * language-ID heuristic, document fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen, no
  * UDFs) — at 100 TB they run scan-local with zero shuffles except the
  * final write. Documents text is single-space-separated lowercase
  * tokens (verified), so `split(text, ' ')` matches DuckDB
  * `string_split` exactly.
  */
object TextQueries {

  /** Common stopword markers per language for the lang-ID heuristic. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "und", "das"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"))

  /** BM25 parameters (standard Okapi defaults) + the fixed query-term
    * set / result size for q_text_bm25_topk. k1+1 is computed at
    * RUNTIME on both sides (`(1.2 + 1)` in the SQL, `lit(1.2)+lit(1.0)`
    * in the plan) so the two engines add the same parsed doubles rather
    * than comparing against a pre-folded Scala literal. */
  private[queries] val BM25Terms = Seq("spark", "merge", "window")
  private[queries] val BM25K1 = 1.2
  private[queries] val BM25B = 0.75
  private[queries] val BM25TopK = 20

  /** BPE pair-statistics top-k and bigram-LM worst-document list size. */
  private[queries] val BpeTopK = 30
  private[queries] val BpeMerges = 16

  /** DuckDB replay of [[bpeVocab]]'s training loop: the 16 greedy merge
    * rounds unrolled as materialized CTE stages (w0 → p_i count → m_i
    * argmax → w_i rewrite). MATERIALIZED is load-bearing: DuckDB inlines
    * plain CTEs, and a 16-deep chain re-evaluates w0's parquet scan
    * exponentially ("too many open files"). The rewrite uses the same
    * wrapped-symbol string replace as the Spark side, so merge tables
    * are identical. Shared by the vocab, encode and token-true packing
    * oracles (PipelineQueries composes these stages too). */
  private[queries] def bpeTrainStages(where: String = ""): Seq[String] = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT regexp_replace(${bpeEscSql("w")}, '(.)', '<\\1>', 'g') AS s, count(*) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents $where)
         |  GROUP BY 1)""".stripMargin
    w0 +: (1 to BpeMerges).flatMap { i =>
      Seq(
        s"""p$i AS (
           |  SELECT pr.l AS l, pr.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(substr(s, 2, length(s) - 2), '><') AS sy, freq
           |        FROM w${i - 1}),
           |       UNNEST(list_transform(generate_series(1, len(sy) - 1),
           |              i -> {'l': sy[i], 'r': sy[i + 1]})) AS u(pr)
           |  GROUP BY 1, 2)""".stripMargin,
        s"m$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1)",
        s"""w$i AS MATERIALIZED (
           |  SELECT replace(s, '<' || m.l || '><' || m.r || '>',
           |                 '<' || m.l || m.r || '>') AS s, freq
           |  FROM w${i - 1}, m$i m)""".stripMargin)
    }
  }

  /** e0..e16: the trained merges m1..m16 APPLIED to every document's
    * whole-text wrapped symbol stream, in merge order — the oracle twin
    * of [[bpeEncode]]'s replace chain. */
  private[queries] def bpeEncodeStages: Seq[String] = {
    val e0 =
      s"""e0 AS MATERIALIZED (
         |  SELECT doc_id, regexp_replace(${bpeEscSql("text")}, '(.)', '<\\1>', 'g') AS s
         |  FROM documents)""".stripMargin
    e0 +: (1 to BpeMerges).map { i =>
      s"""e$i AS MATERIALIZED (
         |  SELECT doc_id, replace(s, '<' || m.l || '><' || m.r || '>',
         |                 '<' || m.l || m.r || '>') AS s
         |  FROM e${i - 1}, m$i m)""".stripMargin
    }.toSeq
  }

  /** BPE token count of an encoded stream `s`: wrapped symbols minus
    * wrapped spaces ('< >' rides along un-mergeable — see bpeEncode).
    * DuckDB dialect; the Spark twin lives in [[bpeEncode]]. */
  private[queries] val bpeTokensSql: String =
    "(length(s) - length(replace(s, '<', ''))) - " +
      "(length(s) - length(replace(s, '< >', ''))) // 3"

  private def bpeVocabOracleSql: String = {
    val union = (1 to BpeMerges)
      .map(i => s"SELECT $i AS it, l, r, l || r AS merged, cnt FROM m$i")
      .mkString("\nUNION ALL\n")
    "WITH " + bpeTrainStages().mkString(",\n") +
      "\nSELECT CAST(it AS INT) AS it, l, r, merged, cnt FROM (" + union +
      ") ORDER BY it"
  }

  private def bpeEncodeOracleSql: String =
    "WITH " + (bpeTrainStages() ++ bpeEncodeStages).mkString(",\n") +
      s"""
         |SELECT doc_id,
         |       CAST($bpeTokensSql AS BIGINT) AS n_tokens,
         |       md5(s) AS enc_md5
         |FROM e$BpeMerges""".stripMargin

  private def bpeEncodeFrozenOracleSql: String =
    "WITH " +
      (bpeTrainStages("WHERE doc_id % 2 = 0") ++ bpeEncodeStages)
        .mkString(",\n") +
      s"""
         |SELECT doc_id,
         |       CAST($bpeTokensSql AS BIGINT) AS n_tokens,
         |       md5(s) AS enc_md5
         |FROM e$BpeMerges""".stripMargin

  /** Decode oracle: strip the symbol wrappers off the fully encoded
    * stream and compare against the original text — the DuckDB twin of
    * [[bpeDecode]]'s two-replace detokenization. */
  private def bpeDecodeOracleSql: String =
    "WITH " + (bpeTrainStages() ++ bpeEncodeStages).mkString(",\n") +
      s"""
         |SELECT e.doc_id,
         |       CAST($bpeTokensSql AS BIGINT) AS n_tokens,
         |       md5($bpeUnwrapExpr) AS dec_md5,
         |       $bpeUnwrapExpr = d.text AS roundtrip_ok
         |FROM e$BpeMerges e JOIN documents d USING (doc_id)""".stripMargin
  private[queries] val LmTopN = 50

  /** RAG chunking grid (q_text_chunk_windows): window W tokens, stride
    * S < W so consecutive chunks overlap by W−S tokens. Sized to the
    * corpus (10–99 tokens/doc, median 56 → ~3 chunks/doc). */
  private[queries] val ChunkW = 24
  private[queries] val ChunkStride = 16

  /** PII patterns, written in the dialect subset RE2 (DuckDB) and
    * java.util.regex (Spark) interpret identically. */
  private[queries] val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[queries] val IpPat    = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  private[queries] val PhonePat = """\+\d{1,2} \d{3} \d{4}"""

  /** Gopher word-count band, fixture-tuned: the paper's 50..100k floor
    * would cut most of the short synthetic docs; 20 keeps the gate
    * non-degenerate while still cutting the short tail. */
  val GopherMinWords = 20L
  val GopherMaxWords = 100000L

  val qs: Seq[Q] = Seq(

    // ---- scalar string functions over customer (trim/lower/nullif/…;
    // reference: stg_accounts.sql:14-31)
    Q.sql(
      "q_string_funcs",
      """SELECT c_custkey,
        |       lower(c_name) AS lname, upper(c_name) AS uname,
        |       substr(c_name, 1, 8) AS name8,
        |       CAST(length(c_name) AS INT) AS name_len,
        |       replace(c_name, '#', '_') AS name_us,
        |       nullif(trim(c_mktsegment), 'BUILDING') AS seg_nb,
        |       concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS id10,
        |       CAST(strpos(c_name, '#') AS INT) AS hash_pos
        |FROM customer""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"), upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("name8"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_name"), "#", "_").as("name_us"),
        nullif(trim(col("c_mktsegment")), lit("BUILDING")).as("seg_nb"),
        concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("seg_nat"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("id10"),
        instr(col("c_name"), "#").as("hash_pos"))
    },

    // ---- record_hash content hashing (reference: stg_accounts.sql:33-46)
    // Dates formatted explicitly — cast-to-string differs across engines
    // (SURVEY §7.4 risk 3). Doubles cast directly: both engines print
    // shortest-roundtrip decimal in this value range (verified).
    Q.sql(
      "q_record_hash",
      """SELECT o_orderkey,
        |       md5(concat_ws('|',
        |         coalesce(CAST(o_orderkey AS VARCHAR), ''),
        |         coalesce(o_orderstatus, ''),
        |         coalesce(CAST(o_totalprice AS VARCHAR), ''),
        |         coalesce(strftime(o_orderdate, '%Y-%m-%d'), ''),
        |         coalesce(o_orderpriority, ''))) AS record_hash
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        md5(concat_ws("|",
          coalesce(col("o_orderkey").cast("string"), lit("")),
          coalesce(col("o_orderstatus"), lit("")),
          coalesce(col("o_totalprice").cast("string"), lit("")),
          coalesce(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("")),
          coalesce(col("o_orderpriority"), lit("")))).as("record_hash"))
    },

    // ---- token counting + quality scoring (length/stopword/type-token)
    Q.sql(
      "q_text_stats",
      """SELECT doc_id, lang,
        |       CAST(length(text) AS INT) AS n_chars_calc,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens,
        |       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |             / len(string_split(text, ' ')), 4) AS ttr,
        |       CAST(len(list_filter(string_split(text, ' '),
        |            t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stop,
        |       round(CAST(len(list_filter(string_split(text, ' '),
        |            t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |             / len(string_split(text, ' ')), 4) AS stop_ratio
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      val toks = split(col("text"), " ")
      val stops = Seq("the", "a", "of", "and", "to").map(lit)
      val nStop = size(filter(toks, t => t.isInCollection(Seq("the", "a", "of", "and", "to"))))
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        length(col("text")).as("n_chars_calc"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_uniq_tokens"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4).as("ttr"),
        nStop.as("n_stop"),
        round(nStop.cast("double") / size(toks), 4).as("stop_ratio"))
    },

    // ---- language-ID heuristic: stopword-marker scores + argmax
    // (real multilingual discrimination exercised in LangIdSpec; this
    // corpus is synthetic English-vocab text so scores skew 'en')
    Q.sql(
      "q_text_langid", {
        val scoreCols = langMarkers.map { case (l, ms) =>
          val in = ms.map(m => s"'$m'").mkString(", ")
          s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($in))) AS INT) AS ${l}_score"
        }.mkString(",\n       ")
        s"""WITH scored AS (
           |  SELECT doc_id, lang,
           |       $scoreCols
           |  FROM documents)
           |SELECT doc_id, lang, en_score, de_score, fr_score, es_score,
           |       CASE WHEN en_score >= de_score AND en_score >= fr_score AND en_score >= es_score THEN 'en'
           |            WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
           |            WHEN fr_score >= es_score THEN 'fr'
           |            ELSE 'es' END AS predicted_lang
           |FROM scored""".stripMargin
      }
    ) { (s, dir) =>
      val toks = split(col("text"), " ")
      val scored = Tables.documents(s, dir).select(
        Seq(col("doc_id"), col("lang")) ++ langMarkers.map { case (l, ms) =>
          size(filter(toks, t => t.isInCollection(ms))).as(s"${l}_score")
        }: _*)
      scored.withColumn("predicted_lang",
        when(col("en_score") >= col("de_score") && col("en_score") >= col("fr_score") &&
          col("en_score") >= col("es_score"), "en")
          .when(col("de_score") >= col("fr_score") && col("de_score") >= col("es_score"), "de")
          .when(col("fr_score") >= col("es_score"), "fr")
          .otherwise("es"))
    },

    // ---- composite quality score: the filter signal a training-data
    // pipeline thresholds on (length band + stopword band + lexical
    // diversity), integer-weighted so the score is exact in both engines
    Q.sql(
      "q_text_quality",
      """WITH f AS (
        |  SELECT doc_id,
        |         len(string_split(text, ' ')) AS n_tok,
        |         len(list_filter(string_split(text, ' '),
        |             t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
        |         len(list_distinct(string_split(text, ' '))) AS n_uniq
        |  FROM documents)
        |SELECT doc_id,
        |       CAST((CASE WHEN n_tok BETWEEN 20 AND 200 THEN 2
        |                  WHEN n_tok >= 10 THEN 1 ELSE 0 END)
        |          + (CASE WHEN n_stop * 100 BETWEEN 2 * n_tok AND 40 * n_tok THEN 2 ELSE 0 END)
        |          + (CASE WHEN n_uniq * 2 > n_tok THEN 1 ELSE 0 END) AS INT) AS quality_score,
        |       (CASE WHEN n_tok BETWEEN 20 AND 200 THEN 2
        |             WHEN n_tok >= 10 THEN 1 ELSE 0 END)
        |          + (CASE WHEN n_stop * 100 BETWEEN 2 * n_tok AND 40 * n_tok THEN 2 ELSE 0 END)
        |          + (CASE WHEN n_uniq * 2 > n_tok THEN 1 ELSE 0 END) >= 4 AS keep
        |FROM f""".stripMargin
    ) { (s, dir) => qualityScore(Tables.documents(s, dir), "doc_id", "text") },

    // ---- BPE-ish regex tokenization: word / number / symbol pieces
    // (whitespace token counts live in q_text_stats; this is the
    // regex-segmentation face of token counting from the brief)
    Q.sql(
      "q_text_tokenize_regex",
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_word_tokens,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_num_tokens
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      def n(pat: String) = size(regexp_extract_all(col("text"), lit(pat), lit(0)))
      Tables.documents(s, dir).select(
        col("doc_id"),
        n("[a-z]+|[0-9]+|[^a-z0-9 ]").as("n_bpe_tokens"),
        n("[a-z]+").as("n_word_tokens"),
        n("[0-9]+").as("n_num_tokens"))
    },

    // ---- regex transform surface: replace-all + first-group extraction
    // (PII-scrub / normalization shapes in a text pipeline)
    Q.sql(
      "q_text_regexp_funcs",
      """SELECT doc_id,
        |       regexp_replace(text, '[0-9]+', '#', 'g') AS masked,
        |       regexp_extract(text, '([a-z]{4,})', 1) AS first_long_word,
        |       regexp_matches(text, '[0-9]') AS has_digit
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        regexp_replace(col("text"), "[0-9]+", "#").as("masked"),
        regexp_extract(col("text"), "([a-z]{4,})", 1).as("first_long_word"),
        col("text").rlike("[0-9]").as("has_digit"))
    },

    // ---- fuzzy matching: edit distance against a canonical form
    // (entity-resolution primitive; candidate pairs would come from
    // blocking/LSH exactly as in DedupQueries)
    Q.sql(
      "q_text_levenshtein",
      """SELECT c_custkey,
        |       CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS dist_canonical,
        |       CAST(levenshtein(lower(c_mktsegment), 'building') AS INT) AS dist_segment
        |FROM customer""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000000")).as("dist_canonical"),
        levenshtein(lower(col("c_mktsegment")), lit("building")).as("dist_segment"))
    },

    // ---- TF-IDF term weighting: the standard text-pipeline feature.
    // Two shuffles (term-frequency grain, then document-frequency
    // vocabulary grain); the vocab join is hint-free — broadcast when the
    // vocabulary fits, shuffle at web-corpus scale.
    Q.sql(
      "q_text_tfidf",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT t.doc_id, t.term, t.tf,
        |       round(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 4) AS tfidf
        |FROM tf t JOIN dfreq d USING (term) CROSS JOIN n""".stripMargin
    ) { (s, dir) => tfidf(Tables.documents(s, dir), "doc_id", "text") },

    // ---- document fingerprint: min-hash over word 5-gram shingles
    // (winnowing-style content fingerprint; equal fingerprints ⇒ shared
    // rare shingle, near-dup signal)
    Q.sql(
      "q_text_fingerprint",
      """SELECT doc_id,
        |       CASE WHEN len(string_split(text, ' ')) >= 5 THEN
        |         list_min(list_transform(
        |           generate_series(1, len(string_split(text, ' ')) - 4),
        |           i -> md5(array_to_string(string_split(text, ' ')[i:i+4], ' '))))
        |       ELSE md5(text) END AS fingerprint
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // md5-per-shingle is the hot loop — a typed kernel digests each
      // 5-gram once and keeps the running min hex (string order = the
      // oracle's list_min over varchar); the interpreted HOF form
      // measured ~4× slower at sf0.1.
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hexChars = "0123456789abcdef".toCharArray
          def hex(bs: Array[Byte]): String = {
            val out = new Array[Char](bs.length * 2)
            var i = 0
            while (i < bs.length) {
              val v = bs(i) & 0xff
              out(2 * i) = hexChars(v >> 4); out(2 * i + 1) = hexChars(v & 15)
              i += 1
            }
            new String(out)
          }
          it.map { case (id, text) =>
            val t = text.split(" ", -1)
            val fp =
              if (t.length >= 5) {
                var best: String = null
                var i = 0
                while (i + 5 <= t.length) {
                  val h = hex(md.digest(t.slice(i, i + 5).mkString(" ").getBytes("UTF-8")))
                  if (best == null || h < best) best = h
                  i += 1
                }
                best
              } else hex(md.digest(text.getBytes("UTF-8")))
            (id, fp)
          }
        }.toDF("doc_id", "fingerprint")
    },

    // ---- token-distribution Shannon entropy: the perplexity-proxy
    // quality signal (low entropy = repetitive/boilerplate text, the
    // band a curation pipeline cuts below). H = ln(n) − Σ c·ln(c) / n
    // over per-document token counts — exact integer counts into one
    // ln-sum, rounded AFTER the fold. ONE exchange: the explicit
    // repartition on doc_id satisfies both the (doc_id, term) count and
    // the per-doc rollup (hash on a key subset clusters the full key —
    // same shape as waterfallDelta).
    Q.sql(
      "q_text_token_entropy",
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       round(ln(CAST(sum(c) AS DOUBLE))
        |             - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 4) AS token_entropy
        |FROM tf GROUP BY 1""".stripMargin
    ) { (s, dir) => tokenEntropy(Tables.documents(s, dir), "doc_id", "text") },

    // ---- Gopher repetition-rule battery (Rae et al. quality
    // heuristics): dup line/paragraph fractions (fixed-width token
    // blocks stand in for lines — the corpus has no newlines),
    // top-2/3/4-gram char coverage, symbol-to-word, mean word length.
    // All ratios quantize-before-divide so the gates are integer-exact.
    Q.sql(
      "q_text_gopher_rules",
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
         |b AS (SELECT doc_id, text, t,
         |  list_transform(generate_series(0, (len(t)+7)//8 - 1),
         |                 i -> array_to_string(t[i*8+1:i*8+8], ' ')) AS ls,
         |  list_transform(generate_series(0, (len(t)+31)//32 - 1),
         |                 i -> array_to_string(t[i*32+1:i*32+32], ' ')) AS ps,
         |  CASE WHEN len(t) >= 2 THEN list_transform(generate_series(1, len(t)-1),
         |    i -> array_to_string(t[i:i+1], ' ')) ELSE []::VARCHAR[] END AS g2,
         |  CASE WHEN len(t) >= 3 THEN list_transform(generate_series(1, len(t)-2),
         |    i -> array_to_string(t[i:i+2], ' ')) ELSE []::VARCHAR[] END AS g3,
         |  CASE WHEN len(t) >= 4 THEN list_transform(generate_series(1, len(t)-3),
         |    i -> array_to_string(t[i:i+3], ' ')) ELSE []::VARCHAR[] END AS g4
         |  FROM d),
         |m AS (SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_words,
         |  (CAST(length(replace(text, ' ', '')) AS BIGINT) * 10000) // len(t) AS mean_word_len_q,
         |  (((length(text) - length(replace(text, '#', ''))) +
         |    (length(text) - length(replace(text, '...', ''))) // 3)
         |   * CAST(10000 AS BIGINT)) // len(t) AS sym_ratio_q,
         |  ((CAST(len(ls) AS BIGINT) - len(list_distinct(ls))) * 10000) // len(ls) AS dup_line_q,
         |  ((CAST(len(ps) AS BIGINT) - len(list_distinct(ps))) * 10000) // len(ps) AS dup_para_q,
         |  (coalesce(list_max(list_transform(list_distinct(g2),
         |     g -> CAST(len(list_filter(g2, x -> x = g)) AS BIGINT) * length(g))), 0)
         |   * 10000) // greatest(length(text), 1) AS top2_q,
         |  (coalesce(list_max(list_transform(list_distinct(g3),
         |     g -> CAST(len(list_filter(g3, x -> x = g)) AS BIGINT) * length(g))), 0)
         |   * 10000) // greatest(length(text), 1) AS top3_q,
         |  (coalesce(list_max(list_transform(list_distinct(g4),
         |     g -> CAST(len(list_filter(g4, x -> x = g)) AS BIGINT) * length(g))), 0)
         |   * 10000) // greatest(length(text), 1) AS top4_q
         |  FROM b)
         |SELECT doc_id, n_words, mean_word_len_q, sym_ratio_q,
         |       dup_line_q, dup_para_q, top2_q, top3_q, top4_q,
         |       (n_words BETWEEN $GopherMinWords AND $GopherMaxWords
         |        AND mean_word_len_q BETWEEN 30000 AND 100000
         |        AND sym_ratio_q <= 1000
         |        AND dup_line_q < 3000 AND dup_para_q < 3000
         |        AND top2_q < 2000 AND top3_q < 1800 AND top4_q < 1600) AS pass
         |FROM m""".stripMargin
    ) { (s, dir) => gopherRules(Tables.documents(s, dir), "doc_id", "text") },

    // ---- PII detection + redaction (emails / IPv4 / phone numbers).
    // The corpus is synthetic, so PII is planted deterministically from
    // doc_id with IDENTICAL concat expressions in both engines; the
    // patterns use the RE2 ∩ java.util.regex dialect (no backrefs, no
    // lookaround, ASCII \b) so match sets agree. Counts are taken before
    // redaction; the redacted text is md5'd — a bit-exact cross-engine
    // check of every replacement, not just the counts. Scale shape:
    // per-row column expressions only — scan-local, zero shuffles, and
    // the regex work stays inside whole-stage codegen.
    Q.sql(
      "q_text_pii_redact",
      s"""WITH aug AS (
         |  SELECT doc_id,
         |         concat(text, ' Contact user', CAST(doc_id AS VARCHAR),
         |                '@example.com or +1 555 ',
         |                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
         |                ' from 10.', CAST(doc_id % 200 AS VARCHAR), '.',
         |                CAST((doc_id * 7) % 200 AS VARCHAR), '.',
         |                CAST(doc_id % 250 AS VARCHAR), '.') AS t
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t, '$EmailPat')) AS INT) AS n_emails,
         |       CAST(len(regexp_extract_all(t, '$IpPat')) AS INT) AS n_ips,
         |       CAST(len(regexp_extract_all(t, '$PhonePat')) AS INT) AS n_phones,
         |       md5(regexp_replace(regexp_replace(regexp_replace(t,
         |           '$EmailPat', '<EMAIL>', 'g'),
         |           '$IpPat', '<IP>', 'g'),
         |           '$PhonePat', '<PHONE>', 'g')) AS red_md5
         |FROM aug""".stripMargin
    ) { (s, dir) =>
      val aug = concat(col("text"), lit(" Contact user"),
        col("doc_id").cast("string"), lit("@example.com or +1 555 "),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 200).cast("string"), lit("."),
        ((col("doc_id") * 7) % 200).cast("string"), lit("."),
        (col("doc_id") % 250).cast("string"), lit("."))
      Tables.documents(s, dir)
        .select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(EmailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(IpPat), lit(0))).as("n_ips"),
          size(regexp_extract_all(col("t"), lit(PhonePat), lit(0))).as("n_phones"),
          md5(regexp_replace(
            regexp_replace(
              regexp_replace(col("t"), EmailPat, "<EMAIL>"),
              IpPat, "<IP>"),
            PhonePat, "<PHONE>")).as("red_md5"))
    },

    // ---- BM25 lexical relevance (Robertson/Spärck Jones; the standard
    // keyword-retrieval scorer a RAG / curation pipeline ranks with
    // before any embedding pass). Fixed literal query terms; k1=1.2,
    // b=0.75, idf = ln(1 + (N − df + ½)/(df + ½)) (the Lucene form —
    // always positive). Plan shape: the isin prune lands directly on the
    // exploded tokens, so only query-term postings survive the scan;
    // per-term df and the corpus (N, avgdl) scalars are broadcast; the
    // one real shuffle is the per-doc score rollup, and the global top-k
    // is TakeOrderedAndProject (map-side partial top-k — no single-
    // partition window over the corpus at 100 TB). The rnk window runs
    // AFTER the limit, over k rows.
    Q.sql(
      "q_text_bm25_topk",
      bm25OracleSql
    ) { (s, dir) =>
      bm25TopKFrame(bm25(Tables.documents(s, dir), "doc_id", "text", BM25Terms))
    },

    // ---- incremental BM25 corpus statistics as an engine model: df,
    // N, and total length are ADDITIVE over an append-only corpus (each
    // document is counted by exactly one batch behind the high-water
    // mark), so the stats table accumulates delta-only — a new crawl
    // batch tokenizes ONLY itself, while scoring replays the identical
    // BM25 arithmetic against the accumulated (df, N, Σdl) and must
    // hash-match the one-shot batch answer against the SAME oracle.
    // The state is the real posting-stats table (full vocabulary, one
    // row per term per batch, folded by read-side sum); at 100 TB it is
    // the side table every search stack maintains next to the index.
    Q.sql(
      "q_text_bm25_incremental",
      bm25OracleSql
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val b = docs.agg(min(col("doc_id")), max(col("doc_id"))).first()
      val mid = (b.getLong(0) + b.getLong(1)) / 2
      val wh = graft.engine.Scratch.dir("graft_incbm25")
      def build(src: DataFrame): Unit = {
        val rpt = new graft.engine.Engine(s, wh, Map("docs" -> src),
          graft.text.IncrementalBm25.models("docs")).build()
        require(rpt.ok, rpt.results.mkString("; "))
      }
      build(docs.filter(col("doc_id") <= mid))
      build(docs)
      val state = graft.engine.ParquetReadCache.read(s, s"$wh/bm25_stats")
      val dfreq = graft.text.IncrementalBm25.termDf(state)
        .filter(col("term").isin(BM25Terms: _*))
      val stats = graft.text.IncrementalBm25.corpusStats(state)
      bm25TopKFrame(bm25Score(docs, BM25Terms, dfreq, stats))
    },

    // ---- BPE merge statistics: corpus-wide adjacent character-pair
    // counts within words — the decision table of the FIRST byte-pair-
    // encoding merge (Sennrich et al.), i.e. one step of tokenizer
    // VOCABULARY INDUCTION over the training corpus (iterating = apply
    // the top merge and re-count, a driver-paced loop over this same
    // query shape). Integer-exact end to end. Plan: pair extraction is
    // a scan-local transform over each word (no shuffle until the
    // count), one groupBy(pair) count with map-side partial aggregation
    // (the pair alphabet is tiny relative to the corpus, so partials
    // collapse hard), and the global top-k is orderBy+limit =
    // TakeOrderedAndProject; the rnk window runs AFTER the limit over
    // k rows. At 100 TB this is exactly a word-count: one well-combined
    // exchange.
    Q.sql(
      "q_text_bpe_pairs",
      s"""WITH words AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |prs AS (
         |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
         |                i -> substring(w, i, 2))) AS pair
         |  FROM words WHERE len(w) >= 2),
         |cnt AS (SELECT pair, count(*) AS cnt FROM prs GROUP BY 1),
         |top AS (SELECT pair, cnt FROM cnt ORDER BY cnt DESC, pair LIMIT $BpeTopK)
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rnk,
         |       pair, cnt
         |FROM top""".stripMargin
    ) { (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
      val prs = words.select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      val top = prs.groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(BpeTopK)
      top.select(
        row_number().over(Window.orderBy(col("cnt").desc, col("pair")))
          .cast("int").as("rnk"),
        col("pair"), col("cnt"))
    },

    // ---- full BPE vocabulary induction: the 16-round tokenizer-
    // training loop (greedy merge table), oracle = the same rounds
    // unrolled as materialized DuckDB CTE stages
    Q.sql(
      "q_text_bpe_vocab",
      bpeVocabOracleSql
    ) { (s, dir) => bpeVocab(Tables.documents(s, dir), "text", BpeMerges) },

    // ---- BPE ENCODE: apply the trained merge table to the corpus —
    // per-doc token counts + an md5 fingerprint of the full encoded
    // symbol stream, so the hash check pins every token boundary. The
    // oracle replays the identical 16-stage training chain and then the
    // identical 16-replace application per document.
    Q.sql(
      "q_text_bpe_encode",
      bpeEncodeOracleSql
    ) { (s, dir) =>
      bpeEncode(Tables.documents(s, dir), "doc_id", "text", BpeMerges)
    },

    // ---- FROZEN-vocab encoding: train the merge table on HALF the
    // corpus (the shipped-tokenizer reality — deployed text was mostly
    // never in the training set), tokenize ALL of it with the frozen
    // table; untrained pairs stay at character grain (exact OOV
    // behavior, spec-pinned). At 100 TB this is the incremental
    // tokenize shape: train once, encode every arriving batch with the
    // same literals — zero exchanges per batch.
    Q.sql(
      "q_text_bpe_encode_frozen",
      bpeEncodeFrozenOracleSql
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      bpeEncodeWith(docs.filter(col("doc_id") % 2 === 0), docs,
        "doc_id", "text", BpeMerges)
    },

    // ---- tokenizer FERTILITY per language (tokens-per-word): the
    // multilingual vocab-health diagnostic — a language whose fertility
    // stays near its chars-per-word was never learned by the merge
    // table (its documents cost proportionally more context budget), so
    // pipelines trend this per-language before committing a tokenizer.
    // Integer-exact: fertility = (Σ tokens × 10000) div Σ words over
    // exact integer sums. Plan: the encode is the zero-exchange
    // projection; ONE lang-grain exchange aggregates (|langs| rows out)
    Q.sql(
      "q_text_bpe_fertility",
      "WITH " + (bpeTrainStages() ++ bpeEncodeStages).mkString(",\n") +
        s""",
           |f AS (SELECT d.lang,
           |             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
           |             CAST($bpeTokensSql AS BIGINT) AS n_tokens
           |      FROM e$BpeMerges JOIN documents d USING (doc_id))
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_words) AS BIGINT) AS n_words,
           |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |       (CAST(sum(n_tokens) AS BIGINT) * 10000)
           |         // CAST(sum(n_words) AS BIGINT) AS fertility_q
           |FROM f GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      bpeFertility(Tables.documents(s, dir), "lang", "text", BpeMerges)
    },

    // ---- BPE DECODE: roundtrip detokenization — train, encode, strip
    // the symbol wrappers back off, and prove per document that the
    // decoded bytes equal the original text. Both engines compute
    // roundtrip_ok against the raw corpus independently, so the check
    // pins the encode chain LOSSLESS, not merely reproducible. This
    // closes the tokenizer lifecycle: train (q_text_bpe_vocab) →
    // encode (q_text_bpe_encode / _frozen / _incremental) → decode.
    Q.sql(
      "q_text_bpe_decode",
      bpeDecodeOracleSql
    ) { (s, dir) =>
      bpeDecode(Tables.documents(s, dir), "doc_id", "text", BpeMerges)
    },

    // ---- INCREMENTAL tokenization under a PERSISTED vocab: the merge
    // table trains once on the even half (the shipped tokenizer's
    // training corpus, same as q_text_bpe_encode_frozen), is written to
    // the artifact store as parquet, and each arriving shard (here the
    // even shard, then the odd shard) tokenizes in its OWN pass from
    // the RELOADED artifact — the loader-shard reality at 100 TB, where
    // shards tokenize across sessions/machines and must agree
    // bit-for-bit with a one-shot pass. Oracle = the frozen-vocab
    // oracle verbatim: persistence must be invisible to the result.
    Q.sql(
      "q_text_bpe_encode_incremental",
      bpeEncodeFrozenOracleSql
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val wh = graft.engine.Scratch.dir("graft_bpe_vocab")
      bpeVocab(docs.filter(col("doc_id") % 2 === 0), "text", BpeMerges)
        .coalesce(1).write.mode("overwrite").parquet(s"$wh/bpe_vocab")
      val vocab = graft.engine.ParquetReadCache.read(s, s"$wh/bpe_vocab")
      bpeEncodeFromVocab(vocab, docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text")
        .union(bpeEncodeFromVocab(vocab, docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text"))
    },

    // ---- bigram language-model scoring: the CCNet-style perplexity
    // quality filter — train bigram MLE counts on the corpus itself,
    // score each document by its average negative log-likelihood
    // −Σ tf·ln(c(w1w2)/c(w1·))/n, and surface the most-surprising
    // documents (high nll = text unlike the corpus: boilerplate,
    // gibberish, wrong-language residue — the band a curation pass
    // inspects or cuts). Training corpus ≡ scoring corpus, so every
    // scored bigram has count ≥ 1 and no smoothing is needed — the
    // probability ratio is a division of exact integer counts, giving
    // both engines identical operand bits into ln. Plan: bigram
    // extraction is scan-local (transform over the split array — no
    // positional self-join); the model is two groupBy counts; scoring
    // re-joins doc bigram tfs against the model on the bigram key (the
    // join IS hash-partitioned on the same key the counts just
    // shuffled on); global top-N via orderBy+limit with the rounded
    // score as the ordering key (the bm25 idiom — round(…,6) absorbs
    // summation-order epsilon before it can flip ranks).
    Q.sql(
      "q_text_lm_score",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |         unnest(list_transform(generate_series(1, len(a) - 1),
         |                i -> concat(a[i], ' ', a[i + 1]))) AS pr
         |  FROM toks WHERE len(a) >= 2),
         |bgs AS (
         |  SELECT doc_id, split_part(pr, ' ', 1) AS w1,
         |         split_part(pr, ' ', 2) AS w2 FROM bg),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bgs GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bgs GROUP BY 1),
         |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bgs GROUP BY 1, 2, 3),
         |nll AS (
         |  SELECT t.doc_id, sum(t.tf) AS n_bigrams,
         |         -sum(t.tf * ln(CAST(c12.c12 AS DOUBLE) / c1.c1)) / sum(t.tf) AS s
         |  FROM tf t JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
         |  GROUP BY 1),
         |top AS (
         |  SELECT doc_id, n_bigrams, s FROM nll
         |  ORDER BY round(s, 6) DESC, doc_id LIMIT $LmTopN)
         |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |       round(s, 4) AS nll
         |FROM top""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("a"))
      val bgs = toks.filter(size(col("a")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"))
          .as("pr"))
        .select(col("doc_id"),
          substring_index(col("pr"), " ", 1).as("w1"),
          substring_index(col("pr"), " ", -1).as("w2"))
      val c12 = bgs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = bgs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val tf = bgs.groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf"))
      val nll = tf.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          (-sum(col("tf") * log(col("c12").cast("double") / col("c1"))) /
            sum(col("tf"))).as("s"))
      nll.orderBy(round(col("s"), 6).desc, col("doc_id")).limit(LmTopN)
        .select(col("doc_id"), col("n_bigrams"), round(col("s"), 4).as("nll"))
    },

    // ---- RAG/context chunking: fixed token-window chunks with overlap
    // (window W, stride S < W) — the document splitter every
    // retrieval/embedding pipeline runs BEFORE vectorization (each
    // chunk becomes one embedding row; the overlap keeps boundary
    // sentences retrievable from both sides). Chunk grid per doc:
    // starts 1 + i·S for i = 0 .. (n ≤ W ? 0 : ⌈(n−W)/S⌉), integer
    // arithmetic on both engines; the last chunk clamps at the doc end
    // (both slice primitives clamp identically) so every token is
    // covered and no chunk is empty. Scale shape: split + explode +
    // slice are all scan-local generators inside whole-stage codegen —
    // ZERO exchanges at any corpus size; output rows ≈ n_tokens/S per
    // doc, the embarrassingly-parallel shape chunking has at 100 TB.
    Q.sql(
      "q_text_chunk_windows",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |         len(string_split(text, ' ')) AS n
         |  FROM documents)
         |SELECT doc_id, CAST(i AS INT) AS chunk_id,
         |       CAST(1 + i * $ChunkStride AS INT) AS tok_start,
         |       CAST(len(list_slice(t, 1 + i * $ChunkStride,
         |            least(i * $ChunkStride + $ChunkW, n))) AS INT) AS n_tokens,
         |       array_to_string(list_slice(t, 1 + i * $ChunkStride,
         |            least(i * $ChunkStride + $ChunkW, n)), ' ') AS chunk_text
         |FROM toks, UNNEST(generate_series(0,
         |     CASE WHEN n <= $ChunkW THEN 0
         |          ELSE (n - $ChunkW + $ChunkStride - 1) // $ChunkStride
         |     END)) AS u(i)""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .withColumn("n", size(col("t")))
      toks
        .select(col("doc_id"), col("t"), col("n"),
          explode(expr(
            s"sequence(0, CASE WHEN n <= $ChunkW THEN 0 " +
              s"ELSE (n - $ChunkW + $ChunkStride - 1) div $ChunkStride END)"))
            .as("i"))
        .select(col("doc_id"), col("i").cast("int").as("chunk_id"),
          (lit(1) + col("i") * ChunkStride).cast("int").as("tok_start"),
          expr(s"slice(t, 1 + i * $ChunkStride, $ChunkW)").as("ct"))
        .select(col("doc_id"), col("chunk_id"), col("tok_start"),
          size(col("ct")).as("n_tokens"),
          array_join(col("ct"), " ").as("chunk_text"))
    },

    // ---- RAG chunk retrieval end-to-end: the composition the chunker
    // exists for — score CHUNKS against each query (idf-weighted
    // distinct-term overlap: the BM25 idf numerator with tf and length
    // normalization dropped, i.e. the set-overlap retrieval kernel),
    // then MAX-POOL chunk scores to the document ("a doc is as relevant
    // as its best passage" — the late-chunking rank rule every
    // chunk-grain RAG store applies before handing docs to the
    // generator), top-10 docs per query. Queries = the corpus's 5
    // lowest-doc_id documents' distinct terms (self-retrieval
    // excluded). Determinism: idf weights are integer-quantized
    // (round(ln(N/df)·1e6) as BIGINT — identical operand bits into ln
    // on both engines, integer sums exact in ANY summation order) and
    // ties break (score DESC, doc_id ASC). Scale shape: the chunk/term
    // generators are scan-local, and BOTH term-set distincts are too —
    // each generator row is one whole doc/chunk, so per-group distinct
    // is array_distinct inside the scan, never a (key, tok)-grain
    // exchange (r17: this removed the plan's two distinct exchanges;
    // the only shuffle left is the tok-grain df aggregate). The
    // ~250-row query-term×idf table broadcasts onto the chunk-term
    // stream, so scored rows = matches only; the per-query window ranks
    // ≤ |docs| rows and WindowGroupLimit keeps k per task.
    Q.sql(
      "q_rag_chunk_retrieval",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |dterm AS (
         |  SELECT DISTINCT doc_id, tok FROM toks, UNNEST(t) AS u(tok)),
         |df AS (SELECT tok, count(*) AS df FROM dterm GROUP BY tok),
         |nd AS (SELECT count(*) AS n FROM documents),
         |qd AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5),
         |qw AS (
         |  SELECT dterm.doc_id AS query_id, dterm.tok,
         |         CAST(round(ln((SELECT n FROM nd) * 1.0 / df) * 1000000)
         |              AS BIGINT) AS w
         |  FROM dterm JOIN qd ON dterm.doc_id = qd.doc_id
         |  JOIN df ON dterm.tok = df.tok),
         |chunks AS (
         |  SELECT doc_id, i AS chunk_id,
         |         list_slice(t, 1 + i * $ChunkStride,
         |              least(i * $ChunkStride + $ChunkW, len(t))) AS ct
         |  FROM toks, UNNEST(generate_series(0,
         |       CASE WHEN len(t) <= $ChunkW THEN 0
         |            ELSE (len(t) - $ChunkW + $ChunkStride - 1) // $ChunkStride
         |       END)) AS u(i)),
         |cterm AS (
         |  SELECT DISTINCT doc_id, chunk_id, tok
         |  FROM chunks, UNNEST(ct) AS u(tok)),
         |cs AS (
         |  SELECT query_id, doc_id, chunk_id, sum(w) AS s
         |  FROM cterm JOIN qw USING (tok) WHERE doc_id <> query_id
         |  GROUP BY query_id, doc_id, chunk_id),
         |ds AS (SELECT query_id, doc_id, CAST(max(s) AS BIGINT) AS score
         |       FROM cs GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, CAST(rnk AS INT) AS rnk, score FROM (
         |  SELECT query_id, doc_id, score,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY score DESC, doc_id) AS rnk
         |  FROM ds) r WHERE rnk <= 10""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      // per-doc distinct terms are a SCAN-LOCAL array_distinct (each row
      // is one whole doc), not a (doc_id, tok)-grain distinct exchange —
      // the same set, zero shuffles at any corpus size
      val dterm = toks
        .select(col("doc_id"), explode(array_distinct(col("t"))).as("tok"))
      val dfreq = dterm.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      // corpus size rides the plan as a broadcast 1-row agg (the
      // in-plan scalar idiom) — a .count() here was the query's last
      // construction-time pre-job; n ≤ 2^53 converts to double exactly,
      // so n·1.0/df has identical operand bits to the pre-collected form
      val nd = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
      val qd = toks.select(col("doc_id")).orderBy(col("doc_id")).limit(5)
        .withColumnRenamed("doc_id", "query_id")
      val qw = dterm
        .join(broadcast(qd), col("doc_id") === col("query_id"))
        .join(dfreq, Seq("tok"))
        .crossJoin(broadcast(nd))
        .select(col("query_id"), col("tok"),
          round(log(col("n") * lit(1.0) / col("df")) * 1000000, 0)
            .cast("long").as("w"))
      val chunks = toks
        .select(col("doc_id"),
          explode(expr(
            s"sequence(0, CASE WHEN size(t) <= $ChunkW THEN 0 " +
              s"ELSE (size(t) - $ChunkW + $ChunkStride - 1) div $ChunkStride END)"))
            .as("chunk_id"),
          col("t"))
        .select(col("doc_id"), col("chunk_id"),
          expr(s"slice(t, 1 + chunk_id * $ChunkStride, $ChunkW)").as("ct"))
      // same trick at chunk grain: each row is one whole chunk, so the
      // per-chunk distinct is array_distinct — the second distinct
      // exchange disappears too
      val cterm = chunks
        .select(col("doc_id"), col("chunk_id"),
          explode(array_distinct(col("ct"))).as("tok"))
      val cs = cterm.join(broadcast(qw), Seq("tok"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("doc_id"), col("chunk_id"))
        .agg(sum(col("w")).as("s"))
      val ds = cs.groupBy(col("query_id"), col("doc_id"))
        .agg(max(col("s")).as("score"))
      ds.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rnk") <= 10)
        .select(col("query_id"), col("doc_id"),
          col("rnk").cast("int").as("rnk"), col("score"))
    },

    // ---- Zipf law fit (corpus-health diagnostic): least-squares slope
    // of ln(freq) on ln(rank) over the top-100 vocabulary ranks — a
    // healthy natural-language corpus sits near slope −1 (Zipf 1949);
    // bot spam, boilerplate floods and template corpora bend it, so the
    // slope is the single-number canary a crawl-intake pipeline trends.
    // Determinism: quantize BEFORE summation — x=round(ln(rank)·1e6),
    // y=round(ln(freq)·1e6) as BIGINTs (identical ln operand bits both
    // engines), so Σx/Σy/Σxy/Σxx are EXACT integer sums in any order;
    // the slope is then ONE double division of exact integers, and both
    // engines emit the same round(·1e6) BIGINT. Ranks tie-break
    // (count DESC, token ASC). Magnitudes: x ≤ 4.6e6, y ≤ ~2e7,
    // Σxy ≤ 1e16, R·Σxy ≤ 1e18 — inside int64. Scale shape: one
    // vocab-grain count exchange; the rank window runs over the top-R
    // rows only (WindowGroupLimit-able k=100 slice after a count sort);
    // the fit itself aggregates 100 rows.
    Q.sql(
      "q_text_zipf_fit",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |uni AS (
         |  SELECT u.w, count(*) AS c
         |  FROM toks, UNNEST(t) AS u(w) GROUP BY 1),
         |ranked AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
         |  FROM uni QUALIFY r <= 100),
         |q AS (
         |  SELECT CAST(round(ln(r * 1.0) * 1000000) AS BIGINT) AS x,
         |         CAST(round(ln(c * 1.0) * 1000000) AS BIGINT) AS y
         |  FROM ranked),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx
         |      FROM q)
         |SELECT n AS n_ranks,
         |       CAST(round((n * sxy - sx * sy) * 1000000.0
         |                  / (n * sxx - sx * sx)) AS BIGINT) AS zipf_slope_q
         |FROM s""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(split(col("text"), " ").as("t"))
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val ranked = uni
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("c").desc, col("w"))))
        .filter(col("r") <= 100)
      val q = ranked.select(
        round(log(col("r") * 1.0) * 1000000, 0).cast("long").as("x"),
        round(log(col("c") * 1.0) * 1000000, 0).cast("long").as("y"))
      q.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n").as("n_ranks"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) * 1000000.0
            / (col("n") * col("sxx") - col("sx") * col("sx")), 0)
            .cast("long").as("zipf_slope_q"))
    },

    // ---- PMI collocation mining (Church & Hanks 1990): pointwise
    // mutual information over adjacent-token bigrams — the corpus
    // statistic that separates real collocations from frequency
    // accidents, used for tokenizer-merge candidates and phrase
    // detection in training-data prep. PMI = ln p(w1,w2) − ln p(w1)
    // − ln p(w2), computed as three separately-quantized ln terms with
    // IDENTICAL operand shapes on both engines (count·1.0/total — the
    // idf idiom), so the subtraction chain is bit-exact and the
    // round(·1e6) BIGINT hash-compares. min-count floor c12 ≥ 3 bounds
    // the output to repeated pairs. Scale shape: the bigram generator
    // is scan-local (transform over each doc's array, explode emits
    // bare structs); ONE bigram-grain exchange with map-side combine +
    // one vocab-grain exchange; the two unigram joins are vocab-sized
    // (AQE picks broadcast when it fits); corpus totals are two scalar
    // aggregates.
    Q.sql(
      "q_text_pmi_bigrams",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |uni AS (
         |  SELECT u.w, count(*) AS c
         |  FROM toks, UNNEST(t) AS u(w) GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM uni),
         |big AS (
         |  SELECT t[i] AS w1, t[i + 1] AS w2
         |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
         |  WHERE len(t) >= 2),
         |pc AS (SELECT w1, w2, count(*) AS pair_count FROM big GROUP BY 1, 2),
         |nb AS (SELECT count(*) AS b FROM big)
         |SELECT w1, w2, pair_count,
         |       CAST(round((ln(pair_count * 1.0 / (SELECT b FROM nb))
         |                   - ln(u1.c * 1.0 / (SELECT tt FROM tot))
         |                   - ln(u2.c * 1.0 / (SELECT tt FROM tot)))
         |                  * 1000000) AS BIGINT) AS pmi_q
         |FROM pc JOIN uni u1 ON pc.w1 = u1.w JOIN uni u2 ON pc.w2 = u2.w
         |WHERE pair_count >= 3""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(split(col("text"), " ").as("t"))
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val big = toks.filter(size(col("t")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(t) - 1),
            | i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"""
            .stripMargin)).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      // corpus totals ride the plan as broadcast 1-row aggregates (no
      // driver-side pre-jobs — one Spark job end-to-end)
      val tot = uni.agg(sum(col("c")).cast("long").as("tt"))
      val nb = big.agg(count(lit(1)).as("b"))
      val pc = big.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("pair_count"))
        .filter(col("pair_count") >= 3)
      pc.crossJoin(broadcast(nb)).crossJoin(broadcast(tot))
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), Seq("w1"))
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), Seq("w2"))
        .select(col("w1"), col("w2"), col("pair_count"),
          round((log(col("pair_count") * 1.0 / col("b"))
            - log(col("c1") * 1.0 / col("tt"))
            - log(col("c2") * 1.0 / col("tt"))) * 1000000, 0)
            .cast("long").as("pmi_q"))
    }
  )

  /** Full BPE vocabulary induction — the tokenizer-training loop that
    * q_text_bpe_pairs' one-merge decision table feeds: `merges` greedy
    * rounds, each (1) counting adjacent symbol pairs over the DISTINCT
    * word table weighted by word frequency — ONE exchange, (2) picking
    * the argmax pair deterministically (count desc, then (l, r) lex —
    * a 1-row TakeOrdered collect: loop CONTROL, not data movement),
    * (3) rewriting every word's symbol stream scan-locally.
    *
    * Symbol streams are wrapped strings (`<s><y><m>`), so the rewrite
    * is a plain string `replace('<l><r>' → '<lr>')` — both engines
    * replace left-to-right non-overlapping, which IS greedy BPE merge
    * order, and wrapped symbols never share boundary characters (the
    * reason for per-symbol brackets rather than a separator).
    *
    * Scale: the loop state is the distinct-word table (|vocab| rows,
    * corpus-independent after the initial word count — the standard
    * BPE-training compression), localCheckpoint'd ONCE after the word
    * count; each round's rewrite then rides as a LAZY replace projection
    * over that checkpoint (Catalyst collapses the stack into one
    * projection per round's job), so a round costs exactly ONE Spark job
    * — the argmax TakeOrdered — instead of the previous two (argmax +
    * a per-round checkpoint materialization: 2·merges jobs of pure
    * fixed overhead per training, measured ~2.2 s of the BPE rows'
    * bench build phase). Replaying ≤ merges string replaces over the
    * |vocab|-row state inside each round's scan is microseconds-scale
    * work; lineage depth stays ≤ merges projections. The merge table
    * returned is the model artifact (16 rows). Fails loudly if the
    * corpus exhausts mergeable pairs. */
  def bpeVocab(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val base = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(regexp_replace(bpeEscCol(col("w")), "(.)", "<$1>").as("s"))
      .agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    // SIZE-GATED driver-side training (the union-find gate idiom): the
    // loop state is the distinct-word frequency table — the standard
    // in-memory BPE trainer state, Heaps-law-bounded (vocabulary grows
    // sublinearly in corpus size; every published BPE trainer holds it
    // in memory). Under the gate (1M words ≈ 150 MB at ~150 B/row,
    // inside the default 1g maxResultSize), the whole `merges`-round
    // loop runs on the driver: ONE collect job instead of one argmax
    // TakeOrdered job PER ROUND — `merges`+1 jobs of pure fixed
    // overhead become 1 (measured ~1.5 s of every BPE bench row's build
    // phase). Arithmetic and ordering are bit-identical to the
    // distributed loop below: pair counts are exact long sums, the
    // argmax tie order (cnt DESC, l ASC, r ASC) compares strings as
    // unsigned UTF-8 bytes — exactly Spark's StringType binary order —
    // and the rewrite is Java's literal left-to-right non-overlapping
    // String.replace, the same semantics as the SQL replace(). Above
    // the gate the distributed loop runs unchanged.
    val headRows = base.select(col("s"), col("freq"))
      .as[(String, Long)].head(BpeDriverGate + 1)
    if (headRows.length <= BpeDriverGate)
      return bpeTrainDriver(s, headRows, merges)
    var words = base
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (it <- 1 to merges) {
      val top = words
        .select(split(expr("substring(s, 2, length(s) - 2)"), "><").as("sy"),
          col("freq"))
        .filter(size(col("sy")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(sy) - 1), " +
            "i -> struct(element_at(sy, i) as l, element_at(sy, i + 1) as r))"))
          .as("pr"), col("freq"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"bpeVocab: corpus exhausted mergeable pairs at round $it of $merges")
      val (l, r, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += ((it, l, r, l + r, cnt))
      words = words.select(
        call_function("replace", col("s"),
          lit(s"<$l><$r>"), lit(s"<$l$r>")).as("s"),
        col("freq"))
    }
    out.toSeq.toDF("it", "l", "r", "merged", "cnt")
  }

  /** Driver-size gate for [[bpeVocab]]'s in-memory trainer: max
    * distinct-word rows collected (~150 MB at ~150 B/row — inside the
    * default driver maxResultSize with headroom). */
  private val BpeDriverGate = 1000000

  /** Strict-weak UTF-8 binary order — Spark StringType's sort order
    * (UTF8String compares unsigned bytes), reproduced for the driver
    * trainer's tie-breaking so its argmax is bit-identical to the
    * distributed `orderBy(l, r)`. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The in-memory BPE training loop over the collected (wrapped word,
    * freq) table — semantics documented at the call site in [[bpeVocab]]. */
  private def bpeTrainDriver(s: org.apache.spark.sql.SparkSession,
      collected: Array[(String, Long)], merges: Int): DataFrame = {
    import s.implicits._
    var words = collected
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (it <- 1 to merges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, f) =>
        // skip the empty word (a doubled/leading space tokenizes to ""
        // and wraps to "" — the distributed loop's size>=2 filter drops
        // it the same way); strip the outer wrapper, split on the
        // symbol boundary (merged symbols never contain '<'/'>' — the
        // escape pass guarantees it)
        if (w.length >= 2) {
          val sy = w.substring(1, w.length - 1).split("><", -1)
          var i = 0
          while (i < sy.length - 1) {
            val k = (sy(i), sy(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + f)
            i += 1
          }
        }
      }
      require(counts.nonEmpty,
        s"bpeVocab: corpus exhausted mergeable pairs at round $it of $merges")
      var best: ((String, String), Long) = null
      counts.foreach { e =>
        if (best == null || e._2 > best._2 ||
            (e._2 == best._2 && (utf8Less(e._1._1, best._1._1) ||
              (e._1._1 == best._1._1 && utf8Less(e._1._2, best._1._2)))))
          best = e
      }
      val ((l, r), cnt) = best
      out += ((it, l, r, l + r, cnt))
      val from = s"<$l><$r>"
      val to = s"<$l$r>"
      words = words.map { case (w, f) => (w.replace(from, to), f) }
    }
    out.toSeq.toDF("it", "l", "r", "merged", "cnt")
  }

  /** Corpus TOKENIZATION with the trained merge table — the second half
    * of the tokenizer lifecycle [[bpeVocab]] starts (training without
    * application feeds nothing): train the `merges`-round table, then
    * encode every document SCAN-LOCALLY as a chain of `merges` string
    * replaces in merge order. `replace()` substitutes left-to-right
    * non-overlapping, which IS greedy BPE merge application, so the
    * chain reproduces the exact token stream a real tokenizer emits for
    * this merge table.
    *
    * The WHOLE text is wrapped per character, so spaces ride along as
    * the '< >' symbol; no trained merge can touch one (training splits
    * on spaces, so no merge symbol contains a space), which makes
    * whole-text encoding ≡ word-by-word encoding with zero
    * explode/join — one projection over the scan.
    *
    * Output per document: the BPE token count (symbols minus wrapped
    * spaces) and the md5 of the fully encoded symbol stream — a
    * bit-exact fingerprint the oracle replays, so the check pins every
    * token boundary, not just the counts.
    *
    * Scale: training state is the distinct-word table (see bpeVocab);
    * the 16-row merge table is collected as LOOP CONTROL and inlined
    * into the encode plan as literals, so the returned frame's plan is
    * scan → project — ZERO exchanges (PlanSpec-pinned), embarrassingly
    * parallel at 100 TB and pipelineable into whatever consumes the
    * token counts (token-true sequence packing below). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame =
    bpeEncodeWith(docs, docs, idCol, textCol, merges)

  /** The FROZEN-VOCAB form of [[bpeEncode]] — the production tokenizer
    * reality: the merge table trains ONCE on `trainDocs` and is then
    * applied unchanged to whatever `docs` arrive (most deployed text
    * was never in the training set). A word whose pairs were never
    * trained stays at character grain — exact OOV behavior, pinned in
    * CurationOpsSpec. Same scale shape as bpeEncode: training is
    * bounded loop control over trainDocs' distinct-word table, the
    * encode is a zero-exchange projection over `docs`. */
  def bpeEncodeWith(trainDocs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, merges: Int): DataFrame =
    docs.select(col(idCol), bpeEncodedCol(trainDocs, textCol, merges).as("s"))
      .select(col(idCol), bpeTokenCount.as("n_tokens"), md5(col("s")).as("enc_md5"))

  /** Train on `trainDocs`, return the encode COLUMN (the 16-replace
    * chain over the wrapped `textCol`) — the composable form fertility
    * and any other encoded-corpus consumer builds on. Training runs
    * eagerly here (bounded loop control); the returned Column is pure
    * projection work. */
  private[queries] def bpeEncodedCol(trainDocs: DataFrame, textCol: String,
      merges: Int): Column =
    bpeChainCol(collectMerges(bpeVocab(trainDocs, textCol, merges)), textCol)

  /** Collect a merge-table frame (the [[bpeVocab]] output, live or
    * reloaded from a persisted artifact) in merge order — bounded loop
    * control, `merges` rows, never data-sized. */
  private[queries] def collectMerges(vocab: DataFrame): Seq[(String, String, String)] =
    vocab.orderBy(col("it")).collect().toSeq.map(r =>
      (r.getAs[String]("l"), r.getAs[String]("r"), r.getAs[String]("merged")))

  /** Reserved-escape pass that makes the wrapper alphabet safe for ANY
    * corpus: the symbol-stream encoding spends '<' and '>' as wrapper
    * characters, so a text containing them literally would corrupt the
    * stream (a real crawl corpus contains both; the driver testdata's
    * [a-z0-9 ] alphabet never does, which is why every board hash is
    * unchanged by this pass — the three replaces are no-ops there).
    * Standard escape-char scheme: '~' → "~e", '<' → "~l", '>' → "~r",
    * applied left-to-right BEFORE wrapping, inverted (reverse order)
    * AFTER unwrapping in [[bpeDecode]]. A literal '<' therefore costs
    * two base symbols (byte-fallback-style), and trained merge symbols
    * can never contain a literal wrapper character — the invariant the
    * whole replace-chain encoding rests on, now corpus-independent.
    * CurationOpsSpec pins the adversarial roundtrip. */
  private def bpeEscCol(c: Column): Column =
    call_function("replace",
      call_function("replace",
        call_function("replace", c, lit("~"), lit("~e")),
        lit("<"), lit("~l")),
      lit(">"), lit("~r"))

  /** DuckDB twin of [[bpeEscCol]] (same left-to-right order). */
  private[queries] def bpeEscSql(c: String): String =
    s"replace(replace(replace($c, '~', '~e'), '<', '~l'), '>', '~r')"

  /** Unwrap + unescape: strip the symbol wrappers, then invert
    * [[bpeEscCol]] in reverse order — rebuilds the original byte stream
    * for any corpus. */
  // def, not val: the oracle-SQL builders interpolate this during the
  // registry's object init, which runs BEFORE later-declared vals
  // (a val here interpolates as "null" into the SQL)
  private def bpeUnwrapExpr: String =
    "replace(replace(replace(replace(replace(s," +
      " '<', ''), '>', ''), '~r', '>'), '~l', '<'), '~e', '~')"

  /** The encode COLUMN for a collected merge table: escape, wrap every
    * char, then one replace() per merge in merge order (replace
    * substitutes left-to-right non-overlapping = greedy BPE
    * application). Pure projection work — the literals inline into
    * whole-stage codegen. */
  private def bpeChainCol(table: Seq[(String, String, String)],
      textCol: String): Column = {
    val wrapped = regexp_replace(bpeEscCol(col(textCol)), "(.)", "<$1>")
    table.foldLeft(wrapped) { case (c, (l, r, m)) =>
      call_function("replace", c, lit(s"<$l><$r>"), lit(s"<$m>"))
    }
  }

  /** Encode `docs` with an already-trained merge-table FRAME — the
    * persisted-artifact path: a tokenizer trains once ([[bpeVocab]]),
    * its merge table lands in the artifact store as parquet, and every
    * later session/shard reloads that table and tokenizes its batch
    * with the identical literals. Same zero-exchange scan → project
    * shape as [[bpeEncode]]; the artifact read is `merges` rows of
    * loop control, so a 100 TB corpus tokenizes embarrassingly
    * parallel across as many independent passes as its shards. */
  def bpeEncodeFromVocab(vocab: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        bpeChainCol(collectMerges(vocab), textCol).as("s"))
      .select(col(idCol), bpeTokenCount.as("n_tokens"),
        md5(col("s")).as("enc_md5"))

  /** Roundtrip DETOKENIZATION — the inverse a data loader applies when
    * auditing packed samples: encode with the trained merge table, then
    * strip the symbol wrappers (every merged symbol is the
    * concatenation of the characters it covers, so deleting '<' and
    * '>' rebuilds the original byte stream). `roundtrip_ok` pins
    * losslessness per document ON BOTH ENGINES independently — an
    * encode chain that dropped or reordered a boundary would flip the
    * flag, not just shift a hash. Corpora containing literal '<', '>'
    * or '~' roundtrip too: [[bpeEscCol]] reserves an escape before
    * wrapping and the unwrap here inverts it in reverse order
    * (CurationOpsSpec pins the adversarial case). Plan: scan →
    * project, ZERO exchanges, same as the encode it inverts. */
  def bpeDecode(docs: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame =
    docs.select(col(idCol), col(textCol).as("orig"),
        bpeEncodedCol(docs, textCol, merges).as("s"))
      .select(col(idCol), bpeTokenCount.as("n_tokens"),
        expr(bpeUnwrapExpr).as("decoded"),
        col("orig"))
      .select(col(idCol), col("n_tokens"),
        md5(col("decoded")).as("dec_md5"),
        (col("decoded") === col("orig")).as("roundtrip_ok"))

  /** Token count of an encoded stream column `s` (symbols minus wrapped
    * spaces) — the Spark twin of [[bpeTokensSql]]. */
  private[queries] def bpeTokenCount: Column =
    (expr("length(s) - length(replace(s, '<', ''))") -
      expr("(length(s) - length(replace(s, '< >', ''))) div 3")).cast("long")

  /** Tokenizer FERTILITY per language stratum (tokens-per-word ×10000,
    * integer-exact over exact sums) — the multilingual vocab-health
    * diagnostic: a stratum whose fertility stays near its
    * chars-per-word never made it into the merge table, and its
    * documents cost proportionally more context budget. Plan: encode is
    * the zero-exchange projection, then ONE `langCol`-grain aggregate
    * (|strata| rows out). */
  def bpeFertility(docs: DataFrame, langCol: String, textCol: String,
      merges: Int): DataFrame =
    docs.select(col(langCol).as("lang"),
        size(split(col(textCol), " ")).cast("long").as("n_words"),
        bpeEncodedCol(docs, textCol, merges).as("s"))
      .select(col("lang"), col("n_words"), bpeTokenCount.as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("fertility_q", expr("(n_tokens * 10000) div n_words"))

  /** Token-distribution Shannon entropy over any `(id, text)` frame —
    * see the q_text_token_entropy doc for the plan shape (one doc_id
    * exchange serves both aggregates). Output: id, n_tokens,
    * token_entropy (rounded, so downstream thresholds compare equal
    * across engines). Reused by PipelineQueries.curationFunnel. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // SCAN-LOCAL kernel (the simhash-kernel idiom): the entropy is a
    // PER-DOCUMENT quantity — term counts never need to leave the row —
    // yet the previous formulation exploded every token of the corpus
    // into a doc_id exchange and ran a two-level aggregate over it: a
    // corpus-sized shuffle (every token crossing the wire) for in-row
    // math. One typed pass replaces both exchanges: count terms in a
    // per-row hash map, fold Σ c·ln(c) with the same IEEE double ops,
    // round exactly like Spark's round() (BigDecimal HALF_UP). The
    // summation ORDER differs from the old hash-aggregate's (itself
    // partition-order-dependent); both engines round to 4 decimals,
    // which is the cross-order contract the oracle already relies on.
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val counts = new java.util.HashMap[String, Long]()
          var n = 0L
          text.split(" ", -1).foreach { t =>
            counts.merge(t, 1L, (a, b) => a + b)
            n += 1
          }
          var s2 = 0.0
          val vs = counts.values().iterator()
          while (vs.hasNext) {
            val c = vs.next().toDouble
            s2 += c * math.log(c)
          }
          val h = math.log(n.toDouble) - s2 / n
          (id, n, java.math.BigDecimal.valueOf(h)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
        }
      }.toDF(idCol, "n_tokens", "token_entropy")
  }

  /** Gopher repetition-rule battery (Rae et al. 2021 §A1.1 quality
    * heuristics) over any `(id, text)` frame: duplicate-line and
    * duplicate-paragraph fractions, top-2/3/4-gram character coverage,
    * symbol-to-word ratio, mean word length, word count — with the
    * corpus's fixed-width token blocks standing in for lines/paragraphs
    * (the synthetic text has no newline structure; same stand-in as
    * blockDedup). Every ratio is integer-quantized BEFORE dividing
    * (×10000 `div` denominator) so the per-rule gates and the composite
    * `pass` flag are exact on any engine.
    *
    * The top-n-gram metric is the deterministic max-cover variant:
    * max over distinct n-grams of count(g) × charlen(g), as a fraction
    * of total characters — no most-frequent tiebreak to replay.
    *
    * Scale shape: ENTIRELY scan-local (array expressions over the
    * per-row token array — zero exchanges, PlanSpec-pinned); the
    * per-doc n-gram mode is O(distinct-grams × grams) inside the row,
    * bounded by document length, never corpus-sized. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      lineTokens: Int = 8, paraTokens: Int = 32): DataFrame = {
    def blocks(k: Int) =
      s"transform(sequence(0, (size(t) + ${k - 1}) div $k - 1), " +
        s"i -> array_join(slice(t, i * $k + 1, $k), ' '))"
    def grams(n: Int) =
      s"case when size(t) >= $n then transform(sequence(1, size(t) - ${n - 1}), " +
        s"i -> array_join(slice(t, i, $n), ' ')) " +
        "else cast(array() as array<string>) end"
    def dupQ(c: String) =
      s"((cast(size($c) as bigint) - size(array_distinct($c))) * 10000) div size($c)"
    // max-cover via sorted-run fold, O(g log g) not O(distinct × g):
    // equal grams are adjacent after array_sort, so the best run's
    // (length × charlen) equals max over distinct grams of count × len
    // — same value as the oracle's list_max(list_transform(...)) form,
    // measured 2.5× faster on the per-doc mode (the op's hot loop).
    // The '' sentinel is safe: a first element always restarts run at
    // acc.run + 1 = 1 whether or not it equals the sentinel.
    def coverQ(c: String) =
      s"(aggregate(array_sort($c), " +
        "named_struct('prev', '', 'run', cast(0 as bigint), 'best', cast(0 as bigint)), " +
        "(acc, x) -> named_struct(" +
        "'prev', x, " +
        "'run', if(x = acc.prev, acc.run + 1, cast(1 as bigint)), " +
        "'best', greatest(acc.best, " +
        "if(x = acc.prev, acc.run + 1, cast(1 as bigint)) * length(x))), " +
        // greatest(…, 1): an empty document must yield coverage 0 on
        // BOTH engines — Spark's div returns NULL on a 0 denominator
        // while DuckDB's // raises; the numerator is 0 for empty text,
        // so clamping the denominator keeps the quotient exactly 0.
        "acc -> acc.best) * 10000) div greatest(length(text), 1)"
    val symQ =
      "(((length(text) - length(replace(text, '#', ''))) + " +
        "(length(text) - length(replace(text, '...', ''))) div 3) " +
        "* cast(10000 as bigint)) div size(t)"
    docs
      .select(col(idCol), col(textCol).as("text"))
      .withColumn("t", split(col("text"), " "))
      .withColumn("ls", expr(blocks(lineTokens)))
      .withColumn("ps", expr(blocks(paraTokens)))
      .withColumn("g2", expr(grams(2)))
      .withColumn("g3", expr(grams(3)))
      .withColumn("g4", expr(grams(4)))
      .select(
        col(idCol),
        expr("cast(size(t) as bigint)").as("n_words"),
        expr("(cast(length(replace(text, ' ', '')) as bigint) * 10000) div size(t)")
          .as("mean_word_len_q"),
        expr(symQ).as("sym_ratio_q"),
        expr(dupQ("ls")).as("dup_line_q"),
        expr(dupQ("ps")).as("dup_para_q"),
        expr(coverQ("g2")).as("top2_q"),
        expr(coverQ("g3")).as("top3_q"),
        expr(coverQ("g4")).as("top4_q"))
      .withColumn("pass",
        col("n_words").between(GopherMinWords, GopherMaxWords) &&
          col("mean_word_len_q").between(30000L, 100000L) &&
          col("sym_ratio_q") <= 1000L &&
          col("dup_line_q") < 3000L && col("dup_para_q") < 3000L &&
          col("top2_q") < 2000L && col("top3_q") < 1800L &&
          col("top4_q") < 1600L)
  }

  /** Composite quality score over any `(id, text)` frame — the filter
    * signal a training-data pipeline thresholds on (length band +
    * stopword band + lexical diversity), integer-weighted so the score is
    * exact in both engines. Reused by q_text_quality (synthetic
    * documents) and the reference churn-feedback real-text fixture
    * (`/root/reference/data/churn_events.csv` `feedback_text`,
    * `README.md:37-41`). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val f = docs.select(
      col(idCol),
      size(toks).as("n_tok"),
      size(filter(toks, t => t.isInCollection(Seq("the", "a", "of", "and", "to")))).as("n_stop"),
      size(array_distinct(toks)).as("n_uniq"))
    val score =
      when(col("n_tok").between(20, 200), 2).when(col("n_tok") >= 10, 1).otherwise(0) +
        when((col("n_stop") * 100).between(col("n_tok") * 2, col("n_tok") * 40), 2).otherwise(0) +
        when(col("n_uniq") * 2 > col("n_tok"), 1).otherwise(0)
    f.select(col(idCol), score.cast("int").as("quality_score"), (score >= 4).as("keep"))
  }

  /** BM25 document scores for `terms` over any `(id, text)` frame —
    * returns `(doc_id, score)` for every document sharing at least one
    * query term. Plan shape (the 100 TB contract): the term prune sits
    * ON the exploded tokens so only query-term postings leave the scan;
    * `df` (≤ |terms| rows) and the corpus `(N, avgdl)` scalars are
    * broadcast; document length joins by doc_id (shuffle, AQE-sized);
    * one rollup shuffle produces the scores. Callers pick their own
    * top-k strategy (global TakeOrdered, per-partition bounded, …). */
  /** The BM25 top-k oracle — shared VERBATIM by the batch and
    * incremental queries (both must produce the same corpus-level
    * ranking, so both hash-check against the same DuckDB SQL). Lazy:
    * referenced from `qs` above its declaration (object-body init
    * order — the urlDedupOracleSql lesson). */
  private lazy val bm25OracleSql: String = {
    val terms = BM25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH stats AS (
       |  SELECT count(*) AS n,
       |         avg(len(string_split(text, ' '))) AS avgdl
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |qtoks AS (SELECT * FROM toks WHERE term IN ($terms)),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM qtoks GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtoks GROUP BY 1),
       |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |scored AS (
       |  SELECT t.doc_id,
       |         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
       |             * t.tf * ($BM25K1 + 1)
       |             / (t.tf + $BM25K1 * (1 - $BM25B + $BM25B * dl.dl / s.avgdl))) AS score
       |  FROM tf t JOIN dfreq d USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN stats s GROUP BY 1),
       |top AS (
       |  SELECT doc_id, score FROM scored
       |  ORDER BY round(score, 6) DESC, doc_id LIMIT $BM25TopK)
       |SELECT doc_id,
       |       CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS INT) AS rnk,
       |       round(score, 4) AS bm25
       |FROM top""".stripMargin
  }

  /** Shared final cut for the BM25 queries: global top-k (TakeOrdered)
    * then the k-row rnk window, rounding the ordering key first so
    * summation-order epsilon can't flip ranks. */
  private def bm25TopKFrame(scored: DataFrame): DataFrame = {
    val top = scored
      .orderBy(round(col("score"), 6).desc, col("doc_id")).limit(BM25TopK)
    top.select(col("doc_id"),
      row_number().over(Window.orderBy(round(col("score"), 6).desc,
        col("doc_id"))).cast("int").as("rnk"),
      round(col("score"), 4).as("bm25"))
  }

  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val qtoks = toks.filter(col("term").isin(terms: _*))
    val dfreq = qtoks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val stats = d.agg(count(lit(1)).as("n"),
      avg(size(split(col("text"), " "))).as("avgdl"))
    bm25Score(d, terms, dfreq, stats)
  }

  /** The BM25 scoring stage with EXTERNALLY-supplied corpus statistics:
    * `dfreq` = `(term, df: long)` for (at least) the query terms,
    * `stats` = one row `(n: long, avgdl: double)`. Split out so the
    * incremental form ([[graft.text.IncrementalBm25]]) can replay the
    * IDENTICAL arithmetic against accumulated stats — `df`/`n` are
    * exact longs and `avgdl` is the same exact-integer-sum ÷ count
    * division in both paths, so scores bit-match the batch form (and
    * therefore the shared DuckDB oracle). Document-side work (tf, dl)
    * is always computed from the scan. */
  def bm25Score(d: DataFrame, terms: Seq[String],
      dfreq: DataFrame, stats: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val qtoks = toks.filter(col("term").isin(terms: _*))
    val tf = qtoks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = d.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    // operand shapes and associativity mirror the oracle SQL exactly —
    // double ops are deterministic given identical operand bits
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val w = idf * col("tf") * (lit(BM25K1) + lit(1.0)) /
      (col("tf") + lit(BM25K1) *
        (lit(1.0) - lit(BM25B) + lit(BM25B) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id")).agg(sum(w).as("score"))
  }

  /** TF-IDF term weighting over any `(id, text)` frame. Two shuffles
    * (term-frequency grain, then document-frequency vocabulary grain);
    * the vocab join is hint-free — broadcast when the vocabulary fits,
    * shuffle at web-corpus scale. Output columns: doc_id, term, tf, tfidf. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 4).as("tfidf"))
  }
}
