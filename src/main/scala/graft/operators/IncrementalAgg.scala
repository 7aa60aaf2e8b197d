package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Mergeable per-source corpus statistics ("data card") maintained
  * incrementally across ingest batches.
  *
  * The reference re-runs its whole pipeline per date-interval batch and
  * has no cross-batch statistics at all (`ingester/__main__.py` drives one
  * interval at a time; nothing aggregates across intervals). At 100 TB the
  * missing piece is exactly this: corpus-wide counts you can update from a
  * new batch WITHOUT rescanning history. Algebraic counters (count, sum)
  * merge by addition; the one non-algebraic statistic a data card needs —
  * distinct vocabulary — is carried as a DataSketches HLL sketch
  * (`hll_sketch_agg`), whose union is exact over the sketch state: merging
  * per-batch sketches yields bit-for-bit the same estimate as one pass
  * over the full corpus (asserted in IncrementalSpec). Each partial row is
  * O(2^lgK) bytes per source, so a 1000-executor ingest stores KB-sized
  * state per batch and the merge is a broadcast-sized aggregation no
  * matter how many TB the history holds.
  *
  * Single pass per slice: `posexplode_outer` keeps zero-token documents
  * (pos NULL) and marks each document's first token row (pos 0), so doc
  * counts, char sums, and the token sketch come out of ONE scan + ONE
  * shuffle on `source` — no self-join of a doc-level and a token-level
  * aggregate.
  */
object IncrementalAgg {

  /** Per-source mergeable partial state for one corpus slice:
    * `(source, n_docs, n_chars, words_sketch)`.
    */
  def datacardPartials(docs: DataFrame, lgK: Int = 12): DataFrame =
    docs
      .select(col("source"), col("n_chars"),
        posexplode_outer(TextFunctions.tokens(col("text"))).as(Seq("__pos", "__tok")))
      .groupBy("source")
      .agg(
        sum(when(col("__pos").isNull || col("__pos") === 0, 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("__pos").isNull || col("__pos") === 0, col("n_chars"))
          .otherwise(0L)).cast("long").as("n_chars"),
        hll_sketch_agg(col("__tok"), lit(lgK)).as("words_sketch"))

  /** Merge any number of partial states: counters add, sketches union.
    * Associative and commutative — batch order never changes the result.
    */
  def mergePartials(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy("source")
      .agg(
        sum("n_docs").cast("long").as("n_docs"),
        sum("n_chars").cast("long").as("n_chars"),
        hll_union_agg(col("words_sketch")).as("words_sketch"))

  /** Resolve the carried sketch into the human-facing estimate column. */
  def finalizeCard(partials: DataFrame): DataFrame =
    partials.select(col("source"), col("n_docs"), col("n_chars"),
      hll_sketch_estimate(col("words_sketch")).as("distinct_words_est"))
}
