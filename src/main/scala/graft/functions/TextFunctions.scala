package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions used across the pipeline.
  *
  * Everything here is built from `org.apache.spark.sql.functions` built-ins so
  * the expressions stay inside whole-stage codegen — no Scala UDFs in hot
  * paths. Semantics derived from the reference:
  *   - index-name normalization: `ingester/es_common.py:116-131`
  *   - tokenization feeds the dedup/text-analysis extensions (BASELINE.json).
  */
object TextFunctions {

  /** P5 — index/partition-name normalization
    * (reference `ingester/es_common.py:116-131`): lowercase, replace
    * `# \ / * ? " < > |` and whitespace with `_`, strip leading and trailing
    * `.` `_` `-` `+`. Replacement runs before stripping (unlike the
    * reference) so the function is idempotent — a leading space would
    * otherwise become a leading `_` that a second pass strips
    * (property-tested in PropertySpec). Replacement is PER CHARACTER (no
    * `+` run-collapsing): the reference's chained `str.replace` calls turn
    * "a  b" into "a__b", and an index name computed here must match one
    * the reference ingester actually created.
    */
  def normalizeIndexName(c: Column): Column = {
    val replaced = regexp_replace(lower(c), "[#\\\\/*?\"<>|\\s]", "_")
    regexp_replace(regexp_replace(replaced, "^[._+-]+", ""), "[._+-]+$", "")
  }

  /** Whitespace tokenization: split on runs of whitespace, drop empties.
    * Mirror of the DuckDB-oracle expression
    * `list_filter(string_split_regex(text,'\s+'), t -> t <> '')`.
    */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** Word k-shingles: sliding windows of k consecutive tokens joined by a
    * single space. Returns the DISTINCT shingle set (dedup semantics — a
    * repeated shingle counts once for Jaccard). Backed by the native
    * `WordNgrams` kernel: the composable higher-order-function form
    * re-tokenizes per window after lambda inlining (see NgramKernels).
    */
  def shingles(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(WordNgrams(
      org.apache.spark.sql.GraftBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(k), distinct = true))

  /** The pre-kernel composable form of `shingles` — kept as the semantic
    * specification the native kernel is property-tested against
    * (NgramKernelSpec), not used in hot paths.
    */
  def shinglesComposed(c: Column, k: Int): Column = {
    val toks = tokens(c)
    val n    = size(toks)
    array_distinct(
      transform(
        sequence(lit(0), greatest(n - lit(k), lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))
      )
    )
  }

  /** Word n-grams WITH duplicates (frequency semantics — unlike `shingles`,
    * which is the distinct set for Jaccard): sliding windows of k consecutive
    * tokens joined by one space; empty array when the document has < k
    * tokens. Native kernel, same rationale as `shingles`.
    */
  def ngrams(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(WordNgrams(
      org.apache.spark.sql.GraftBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(k), distinct = false))

  /** Composable specification form of `ngrams` (test reference only). */
  def ngramsComposed(c: Column, k: Int): Column = {
    val toks = tokens(c)
    val n    = size(toks)
    when(n < k, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), n - lit(k)),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** BPE-ish regex token count: alphabetic runs, digit runs, or single
    * non-space symbols — a deterministic approximation of subword token
    * counting that both Spark and the DuckDB oracle can evaluate with the
    * same simple regex.
    */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeishPattern), lit(0)))

  /** Punctuation ratio: fraction of characters that are `.,!?;:'"()-`.
    * Computed with `translate` (codegen'd, and identically available in the
    * DuckDB oracle).
    */
  def punctRatio(c: Column): Column = {
    val removed = length(c) - length(translate(c, ".,!?;:'\"()-", ""))
    // NULL text propagates NULL (the when() condition is null → fall to
    // the null branch, like every other expression here), and only a
    // genuinely EMPTY string maps to 0.0 — a null-text row must not
    // masquerade as a punctuation-free document to a quality gate
    when(c.isNull, lit(null).cast("double"))
      .when(length(c) > 0, removed.cast("double") / length(c).cast("double"))
      .otherwise(lit(0.0))
  }
}
