package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AnnotationPipeline._

/** The reference pipeline as oracle-checkable queries over `documents`:
  * F1 filter → dictionary annotate (U1 mock) → X1 explode → P1/P2 projection
  * → sink-mode shaping (flat / nested / split-by-field) → F2 anti-join.
  *
  * The dictionary tagger is intentionally expressible in ANSI SQL so the
  * WHOLE pipeline — not just relational fragments — hash-checks against
  * DuckDB.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private val termListSql =
    DefaultTerms.sorted.map(t => s"('$t')").mkString("(VALUES ", ", ", ") t(term)")

  /** q29 — F1 null/short-text filter (MIN_TEXT_LEN=5,
    * `ingester/annotations_indexer.py:66,244-248`).
    */
  def q29_doc_filter: Q = (s, dir) => {
    filterValidText(Tables.documents(s, dir))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           min("n_chars").as("min_chars"),
           max("n_chars").as("max_chars"))
      .orderBy("lang")
  }

  /** q30 — the flagship flat-mode pipeline: one record per annotation with
    * composite key, deterministic per-doc running ann_id, and the meta/nlp
    * field split (FIXTURES.md B4). Underscore column names stand in for the
    * reference's literal `meta.`/`nlp.` dotted names (kept dotted in
    * `AnnotationPipeline.projectFlat`; dots are hostile to the oracle's
    * column-name matching).
    */
  def q30_annotations: Q = (s, dir) => {
    val docs = filterValidText(Tables.documents(s, dir))
    val anns = withAnnId(annotateDictionary(docs))
    anns.select(
      annotationKey().as("ann_key"),
      col("doc_id").as("meta_doc_id"),
      col("lang").as("meta_lang"),
      col("ann_id").as("nlp_id"),
      col("term").as("nlp_term"),
      col("ann_start").as("nlp_start"),
      col("ann_end").as("nlp_end"),
      col("source_value").as("nlp_source_value"))
      .orderBy("meta_doc_id", "nlp_id")
  }

  /** q31 — aggregation over the annotation stream: per-term document
    * frequency and mean match offset.
    */
  def q31_annotation_agg: Q = (s, dir) => {
    val docs = filterValidText(Tables.documents(s, dir))
    annotateDictionary(docs)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_anns"),
           countDistinct("doc_id").as("n_docs"),
           round(avg("ann_start"), 4).as("avg_start"))
      .orderBy("term")
  }

  /** q32 — K4 split-by-field sink routing with P5 name normalization:
    * annotations per normalized target partition (split field = source).
    */
  def q32_split_sink: Q = (s, dir) => {
    val docs = filterValidText(Tables.documents(s, dir))
    val anns = annotateDictionary(docs)
    withPartitionKey(anns, "source", "anns")
      .groupBy("sink_index")
      .agg(count(lit(1)).as("n"))
      .orderBy("sink_index")
  }

  /** q33 — F2 already-processed anti-join: a simulated prior run covered
    * doc_id % 3 == 0; count the remaining work per lang. The distributed
    * replacement for the reference's per-doc ES count RPC
    * (`ingester/annotations_indexer.py:80-101`).
    */
  def q33_processed_antijoin: Q = (s, dir) => {
    val docs = filterValidText(Tables.documents(s, dir))
    val sink = withAnnId(annotateDictionary(docs.filter(col("doc_id") % 3 === 0)))
      .select(col("doc_id").as("meta_doc_id"))
    filterAlreadyProcessed(docs, sink)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pending"))
      .orderBy("lang")
  }

  /** q140 — F2 at scale: bloom-REROUTED already-processed anti-join
    * ([[graft.operators.AnnotationPipeline.filterAlreadyProcessedBloom]]).
    * Same processed set as q33 (a prior run covered doc_id % 3 == 0), but
    * the probe side is split map-side by a `might_contain` test against a
    * bloom filter built over the processed ids: bloom-negative docs bypass
    * the anti-join shuffle entirely, only the bloom-positive sliver joins.
    * AQE's runtime filters structurally can't do this for anti-joins (the
    * rows failing the filter are the KEPT rows), which is why the reroute
    * is an explicit operator. The oracle is the plain NOT EXISTS anti-join
    * — cross-engine proof the reroute is exactness-preserving. The bloom
    * here is deliberately small (4096 items @ 5% fpp) so false positives
    * actually flow through the exact-confirm branch at test scale.
    */
  def q140_bloom_antijoin: Q = (s, dir) => {
    val docs = filterValidText(Tables.documents(s, dir))
    val sink = withAnnId(annotateDictionary(docs.filter(col("doc_id") % 3 === 0)))
      .select(col("doc_id").as("meta_doc_id"))
    filterAlreadyProcessedBloom(docs, sink, expectedItems = 4096L, fpp = 0.05)
      .groupBy("source")
      .agg(count(lit(1)).as("n_pending"), min("doc_id").as("first_pending"))
      .orderBy("source")
  }

  /** q34 — nested-object sink mode (K6/X2 inverse,
    * `ingester/annotations_indexer.py:166-200`): per-doc annotations array
    * rebuilt with collect_list. Nested arrays don't hash-compare across
    * engines → checked structurally here (array size) with the full nested
    * shape covered in ScalaTest.
    */
  def q34_nested_mode: Q = (s, dir) => {
    val docs = filterValidText(Tables.documents(s, dir))
    val anns = withAnnId(annotateDictionary(docs))
    projectNested(anns, Seq("doc_id", "lang"), Seq("term", "ann_start", "ann_end"))
      .select(col("_id").as("nested_key"),
              col("`meta.doc_id`").as("meta_doc_id"),
              size(col("annotations")).cast("long").as("n_annotations"))
      .orderBy("meta_doc_id")
  }

  val all: Map[String, Q] = Map(
    "q29_doc_filter" -> q29_doc_filter,
    "q30_annotations" -> q30_annotations,
    "q31_annotation_agg" -> q31_annotation_agg,
    "q32_split_sink" -> q32_split_sink,
    "q33_processed_antijoin" -> q33_processed_antijoin,
    "q140_bloom_antijoin" -> q140_bloom_antijoin,
    "q34_nested_mode" -> q34_nested_mode)

  /** DuckDB twins. The tagger: CROSS JOIN the sorted term list, keep terms
    * occurring in the text (strpos, 1-based → 0-based), ann_id = row_number
    * per doc ordered by (term, start).
    */
  private val annsCte = raw"""
      anns AS (
        SELECT doc_id, lang, source, term,
               CAST(strpos(text, term) - 1 AS BIGINT) AS ann_start,
               CAST(strpos(text, term) - 1 + length(term) AS BIGINT) AS ann_end,
               substr(text, strpos(text, term), length(term)) AS source_value,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY term, strpos(text, term)) - 1 AS BIGINT) AS ann_id
        FROM valid_docs CROSS JOIN $termListSql
        WHERE strpos(text, term) > 0)"""

  private val validDocsCte = """
      valid_docs AS (
        SELECT * FROM documents WHERE text IS NOT NULL AND length(text) >= 5)"""

  val oracle: Map[String, String] = Map(
    "q29_doc_filter" -> raw"""
      WITH $validDocsCte
      SELECT lang, count(1) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM valid_docs GROUP BY 1 ORDER BY 1""",
    "q30_annotations" -> raw"""
      WITH $validDocsCte, $annsCte
      SELECT 'doc-' || doc_id || '-ann-' || ann_id AS ann_key,
             doc_id AS meta_doc_id, lang AS meta_lang,
             ann_id AS nlp_id, term AS nlp_term,
             ann_start AS nlp_start, ann_end AS nlp_end,
             source_value AS nlp_source_value
      FROM anns ORDER BY meta_doc_id, nlp_id""",
    "q31_annotation_agg" -> raw"""
      WITH $validDocsCte, $annsCte
      SELECT term, count(1) AS n_anns, count(DISTINCT doc_id) AS n_docs,
             round(avg(ann_start), 4) AS avg_start
      FROM anns GROUP BY 1 ORDER BY 1""",
    "q32_split_sink" -> raw"""
      WITH $validDocsCte, $annsCte
      SELECT 'anns-' || regexp_replace(regexp_replace(
               regexp_replace(lower(source), '[#\\/*?"<>|\s]', '_', 'g'),
               '^[._+-]+', ''), '[._+-]+$$', '') AS sink_index,
             count(1) AS n
      FROM anns GROUP BY 1 ORDER BY 1""",
    "q33_processed_antijoin" -> raw"""
      WITH $validDocsCte,
      sink AS (SELECT DISTINCT doc_id FROM valid_docs WHERE doc_id % 3 = 0
               AND EXISTS (SELECT 1 FROM $termListSql
                           WHERE strpos(valid_docs.text, t.term) > 0))
      SELECT lang, count(1) AS n_pending
      FROM valid_docs d
      WHERE NOT EXISTS (SELECT 1 FROM sink WHERE sink.doc_id = d.doc_id)
      GROUP BY 1 ORDER BY 1""",
    "q140_bloom_antijoin" -> raw"""
      WITH $validDocsCte,
      sink AS (SELECT DISTINCT doc_id FROM valid_docs WHERE doc_id % 3 = 0
               AND EXISTS (SELECT 1 FROM $termListSql
                           WHERE strpos(valid_docs.text, t.term) > 0))
      SELECT source, count(1) AS n_pending, min(doc_id) AS first_pending
      FROM valid_docs d
      WHERE NOT EXISTS (SELECT 1 FROM sink WHERE sink.doc_id = d.doc_id)
      GROUP BY 1 ORDER BY 1""",
    "q34_nested_mode" -> raw"""
      WITH $validDocsCte, $annsCte
      SELECT 'doc_' || doc_id || '_annotations' AS nested_key,
             doc_id AS meta_doc_id, count(1) AS n_annotations
      FROM anns GROUP BY 1, 2 ORDER BY meta_doc_id""")
}
