package graft.queries

import org.apache.spark.sql.DataFrame
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

  /** PII patterns, written in the dialect subset RE2 (DuckDB) and
    * java.util.regex (Spark) interpret identically. */
  private[queries] val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[queries] val IpPat    = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  private[queries] val PhonePat = """\+\d{1,2} \d{3} \d{4}"""

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
    }
  )

  /** Token-distribution Shannon entropy over any `(id, text)` frame —
    * see the q_text_token_entropy doc for the plan shape (one doc_id
    * exchange serves both aggregates). Output: id, n_tokens,
    * token_entropy (rounded, so downstream thresholds compare equal
    * across engines). Reused by PipelineQueries.curationFunnel. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .repartition(col(idCol))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
    tf.groupBy(col(idCol)).agg(
      sum(col("c")).as("n_tokens"),
      round(log(sum(col("c")).cast("double"))
        - sum(col("c") * log(col("c").cast("double"))) / sum(col("c")), 4)
        .as("token_entropy"))
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
