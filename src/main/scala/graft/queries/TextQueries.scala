package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** Text-analysis inventory over `documents`: language ID, quality scoring,
  * token counting (whitespace + BPE-ish regex), document fingerprinting.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q50 — language-ID heuristic: lexicon-hit argmax per doc, aggregated. */
  def q50_lang_id: Q = (s, dir) => {
    TextAnalysis.languageId(s, Tables.documents(s, dir))
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
           sum("hits").cast("long").as("total_hits"))
      .orderBy("pred_lang")
  }

  /** q51 — quality metrics aggregated per source. */
  def q51_quality: Q = (s, dir) => {
    TextAnalysis.qualityMetrics(Tables.documents(s, dir))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_tokens"), 4).as("avg_tokens"),
        round(avg("mean_tok_len"), 4).as("avg_tok_len"),
        round(avg("stopword_ratio"), 4).as("avg_stop_ratio"))
      .orderBy("source")
  }

  /** q52 — token counting per lang: whitespace tokens and BPE-ish regex
    * tokens (`[a-zA-Z]+|[0-9]+|single symbol`).
    */
  def q52_token_count: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("lang"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("ws_toks"),
        TextFunctions.bpeishTokenCount(col("text")).cast("long").as("bpe_toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum("ws_toks").cast("long").as("sum_ws_toks"),
           sum("bpe_toks").cast("long").as("sum_bpe_toks"))
      .orderBy("lang")
  }

  /** q53 — rolling-hash fingerprints on the FINALIZED polyhash
    * ([[TextAnalysis.fingerprintFinalized]]): fingerprint frequency
    * table, fully oracle-checked. Until round 15 this query declared
    * the xxhash64 form ([[TextAnalysis.fingerprint]], rows-only by
    * necessity — DuckDB cannot replay xxhash64); the q228-beside-q71
    * convention now applies: the declared gate form rides the
    * SQL-replayable finalized polyhash (a BETTER 1-perm MinHash than
    * q85's raw polyhash, whose near-monotone order biases the min
    * toward lexicographically-small shingles), while the xxhash64
    * production form stays spec-tested (TextAnalysisSpec).
    */
  def q53_fingerprint: Q = (s, dir) => {
    TextAnalysis.fingerprintFinalized(Tables.documents(s, dir))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("fingerprint"))
      .limit(50)
  }

  /** q85 — deterministic rolling-hash fingerprints (poly-hash twin of q53,
    * fully oracle-checked): fingerprint frequency table.
    */
  def q85_fingerprint_det: Q = (s, dir) => {
    TextAnalysis.fingerprintDeterministic(Tables.documents(s, dir))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("fingerprint"))
      .limit(50)
  }

  /** q86 — deterministic 16-bit SimHash (poly-hash twin of q44's 64-bit
    * xxhash fingerprint): per-fingerprint census, fully oracle-checked.
    */
  def q86_simhash_det: Q = (s, dir) => {
    TextAnalysis.simhash16Deterministic(Tables.documents(s, dir))
      .groupBy("simhash16")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("simhash16"))
      .limit(50)
  }

  /** q173 — Flesch reading-ease ([[TextAnalysis.readability]]): per-doc
    * word/sentence/vowel-group counts and the rounded score — the classic
    * readability quality gate, all regexp kernels map-side (PlanSpec-free:
    * no exchange to pin). The oracle reproduces the three counts with the
    * identical regexes and the identical double-literal formula.
    */
  def q173_readability: Q = (s, dir) => {
    TextAnalysis.readability(
      graft.operators.Dedup.spread(Tables.documents(s, dir)), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q197 — winnowing overlap pairs ([[TextAnalysis.winnowOverlapPairs]]):
    * MOSS document fingerprinting — per-window minimum of the positional
    * 3-gram polynomial hashes (window 8, leftmost tie), then documents
    * sharing ≥ 2 distinct selected fingerprints with the shared count.
    * The winnowing guarantee (any shared run of ≥ 10 tokens selects ≥ 1
    * common fingerprint) is what q85's whole-document min-hash cannot
    * give. Fingerprints on > 50 documents are boilerplate and drop whole
    * (`graft.capBuckets` observable) — the defined-approximation cap per
    * the q108/q130 convention, re-derived in the oracle.
    */
  def q197_winnow_overlap: Q = (s, dir) => {
    TextAnalysis.winnowOverlapPairs(Tables.documents(s, dir),
        k = 3, w = 8, minShared = 2, maxDocsPerFingerprint = 50)
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
  }

  /** q215 — language-ID confusion audit: the q50 heuristic's predictions
    * cross-tabulated against the labeled `lang` column — per (true,
    * predicted) cell the count and the within-truth recall share; the
    * evaluation twin q50's aggregate census cannot express (it never
    * sees the labels). Exact counts; shares are exact-integer-double
    * divisions (round 6).
    */
  def q215_langid_confusion: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    TextAnalysis.languageId(s, docs)
      .join(docs.select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("true_lang")))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        (round(col("n").cast("double") / col("row_total").cast("double"), 6)
          + lit(0.0)).as("share"))
      .orderBy("true_lang", "pred_lang")
  }

  /** q216 — cross-slice winnowing overlap
    * ([[TextAnalysis.winnowOverlapBetween]]): new docs (doc_id % 7 = 0,
    * the q105 slice convention) screened against the standing rest —
    * which arrivals share ≥ 2 winnowed fingerprints with an existing
    * document. Union-population boilerplate cap (50), re-derived in the
    * oracle.
    */
  def q216_winnow_between: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    TextAnalysis.winnowOverlapBetween(
        docs.filter(col("doc_id") % 7 === 0),
        docs.filter(col("doc_id") % 7 =!= 0),
        k = 3, w = 8, minShared = 2, maxDocsPerFingerprint = 50)
      .orderBy(col("n_shared").desc, col("doc_new"), col("doc_old"))
  }

  val all: Map[String, Q] = Map(
    "q85_fingerprint_det" -> q85_fingerprint_det,
    "q216_winnow_between" -> q216_winnow_between,
    "q215_langid_confusion" -> q215_langid_confusion,
    "q197_winnow_overlap" -> q197_winnow_overlap,
    "q86_simhash_det" -> q86_simhash_det,
    "q50_lang_id" -> q50_lang_id,
    "q51_quality" -> q51_quality,
    "q52_token_count" -> q52_token_count,
    "q53_fingerprint" -> q53_fingerprint,
    "q173_readability" -> q173_readability)

  private val lexValues = TextAnalysis.Lexicons
    .map { case (l, t) => s"('$l', '$t')" }.mkString(", ")

  val oracle: Map[String, String] = Map(
    // the q50 prediction chain joined back to the labels; shares are
    // exact-integer-double divisions over window row totals
    "q215_langid_confusion" -> raw"""
      WITH lex(lex_lang, lex_tok) AS (VALUES $lexValues),
      toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS tok
        FROM documents),
      hits AS (
        SELECT doc_id, lex_lang, count(1) AS hits
        FROM toks JOIN lex ON tok = lex_tok
        GROUP BY 1, 2),
      best AS (
        SELECT doc_id, lex_lang AS pred_lang, hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lex_lang ASC) AS rn
        FROM hits),
      labeled AS (
        SELECT d.doc_id, d.lang AS true_lang,
               coalesce(b.pred_lang, 'unknown') AS pred_lang
        FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id),
      cells AS (SELECT true_lang, pred_lang, count(1) AS n
                FROM labeled GROUP BY 1, 2)
      SELECT true_lang, pred_lang, n,
             round(CAST(n AS DOUBLE) /
               CAST(sum(n) OVER (PARTITION BY true_lang) AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS share
      FROM cells ORDER BY 1, 2""",
    // the q197 winnow chain computed per slice, union-population cap,
    // new×old join only
    "q216_winnow_between" -> raw"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
        FROM documents),
      grams AS (
        SELECT doc_id, i,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(array_to_string(tk[i+1:i+3], ' '), '.'),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM toks, unnest(range(0, CASE WHEN len(tk) >= 3
                                        THEN len(tk) - 3 + 1 ELSE 0 END)) t(i)),
      wmin AS (
        SELECT doc_id, i,
               min((h << 33) + i) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel
        FROM grams),
      selected AS (
        SELECT DISTINCT doc_id, sel >> 33 AS fingerprint, doc_id % 7 = 0 AS is_new
        FROM wmin WHERE i >= 7),
      capped AS (SELECT * FROM selected
                 QUALIFY count(*) OVER (PARTITION BY fingerprint) <= 50),
      pairs AS (
        SELECT n.doc_id AS doc_new, o.doc_id AS doc_old, count(1) AS n_shared
        FROM capped n JOIN capped o
          ON n.fingerprint = o.fingerprint AND n.is_new AND NOT o.is_new
             AND n.doc_id <> o.doc_id
        GROUP BY 1, 2)
      SELECT doc_new, doc_old, n_shared FROM pairs WHERE n_shared >= 2
      ORDER BY n_shared DESC, doc_new, doc_old""",
    // positional 3-gram polynomial hashes (the q85 fold), encoded
    // (h << 33) + pos, per-window min over ROWS 7 PRECEDING..CURRENT on
    // complete windows only, distinct selected values per doc, then the
    // fingerprint-value self-join with the 50-doc boilerplate cap
    "q197_winnow_overlap" -> raw"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
        FROM documents),
      grams AS (
        SELECT doc_id, i,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(array_to_string(tk[i+1:i+3], ' '), '.'),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM toks, unnest(range(0, CASE WHEN len(tk) >= 3
                                        THEN len(tk) - 3 + 1 ELSE 0 END)) t(i)),
      wmin AS (
        SELECT doc_id, i,
               min((h << 33) + i) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel
        FROM grams),
      selected AS (
        SELECT DISTINCT doc_id, sel >> 33 AS fingerprint
        FROM wmin WHERE i >= 7),
      capped AS (SELECT * FROM selected
                 QUALIFY count(*) OVER (PARTITION BY fingerprint) <= 50),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(1) AS n_shared
        FROM capped a JOIN capped b
          ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 2
      ORDER BY n_shared DESC, doc_a, doc_b""",
    "q173_readability" -> raw"""
      WITH c AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS INTEGER) AS n_words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INTEGER) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INTEGER) AS n_syllables
        FROM documents)
      SELECT doc_id, n_words, n_sentences, n_syllables,
             CASE WHEN n_words > 0 THEN
               round(CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences)
                 - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words), 4)
             END AS flesch
      FROM c ORDER BY doc_id""",
    "q85_fingerprint_det" -> raw"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
        FROM documents),
      sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(0, greatest(len(tk) - 4, 0) + 1),
                 i -> array_to_string(tk[i+1:i+4], ' ')))) AS shingle
        FROM toks),
      hashed AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(shingle, '.'),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM sh),
      fp AS (SELECT doc_id, min(h) AS fingerprint FROM hashed GROUP BY 1)
      SELECT fingerprint, count(1) AS n FROM fp GROUP BY 1
      ORDER BY 2 DESC, 1 LIMIT 50""",
    // the q85 shingle/polyhash replay with the affine finalizer
    // ((h·961748927 + 12345) mod 1e9+7) applied per shingle BEFORE the
    // min — the engine's Kmv.finalized convention; h < 1e9+7 keeps the
    // product under 2^63 in BIGINT
    "q53_fingerprint" -> raw"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
        FROM documents),
      sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(0, greatest(len(tk) - 4, 0) + 1),
                 i -> array_to_string(tk[i+1:i+4], ' ')))) AS shingle
        FROM toks),
      hashed AS (
        SELECT doc_id,
               (list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(regexp_extract_all(shingle, '.'),
                    c -> CAST(unicode(c) AS BIGINT))),
                  (a, b) -> (a * 31 + b) % 1000000007)
                * 961748927 + 12345) % 1000000007 AS h
        FROM sh),
      fp AS (SELECT doc_id, min(h) AS fingerprint FROM hashed GROUP BY 1)
      SELECT fingerprint, count(1) AS n FROM fp GROUP BY 1
      ORDER BY 2 DESC, 1 LIMIT 50""",
    "q86_simhash_det" -> raw"""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS tok
        FROM documents),
      hashed AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(tok, '.'),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM toks),
      votes AS (
        SELECT doc_id,
               {votes}
        FROM hashed GROUP BY 1),
      fp AS (
        SELECT doc_id, CAST({bits} AS BIGINT) AS simhash16
        FROM votes)
      SELECT simhash16, count(1) AS n FROM fp GROUP BY 1
      ORDER BY 2 DESC, 1 LIMIT 50"""
        .replace("{votes}", (0 until 16).map(b =>
          s"sum(((h >> $b) & 1) * 2 - 1) AS v$b").mkString(",\n               "))
        .replace("{bits}", (0 until 16).map(b =>
          s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")),
    "q50_lang_id" -> raw"""
      WITH lex(lex_lang, lex_tok) AS (VALUES $lexValues),
      toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS tok
        FROM documents),
      hits AS (
        SELECT doc_id, lex_lang, count(1) AS hits
        FROM toks JOIN lex ON tok = lex_tok
        GROUP BY 1, 2),
      best AS (
        SELECT doc_id, lex_lang AS pred_lang, hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lex_lang ASC) AS rn
        FROM hits),
      labeled AS (
        SELECT d.doc_id,
               coalesce(b.pred_lang, 'unknown') AS pred_lang,
               coalesce(b.hits, 0) AS hits
        FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id)
      SELECT pred_lang, count(1) AS n_docs, CAST(sum(hits) AS BIGINT) AS total_hits
      FROM labeled GROUP BY 1 ORDER BY 1""",
    "q51_quality" -> raw"""
      WITH m AS (
        SELECT source,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
        FROM documents),
      per_doc AS (
        SELECT source,
               len(tk) AS n_tokens,
               list_sum(list_transform(tk, t -> length(t))) * 1.0 / greatest(len(tk), 1)
                 AS mean_tok_len,
               len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                 / greatest(len(tk), 1) AS stopword_ratio
        FROM m)
      SELECT source, count(1) AS n_docs,
             round(avg(n_tokens), 4) AS avg_tokens,
             round(avg(mean_tok_len), 4) AS avg_tok_len,
             round(avg(stopword_ratio), 4) AS avg_stop_ratio
      FROM per_doc GROUP BY 1 ORDER BY 1""",
    "q52_token_count" -> raw"""
      SELECT lang, count(1) AS n_docs,
             CAST(sum(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')))
                  AS BIGINT) AS sum_ws_toks,
             CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')))
                  AS BIGINT) AS sum_bpe_toks
      FROM documents GROUP BY 1 ORDER BY 1""")
}
