package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage: score candidate pairs by
  * summing per-field log-likelihood weights — `log₂(m/u)` when the field
  * agrees (m = P(agree | match), u = P(agree | non-match)), `log₂((1−m)/
  * (1−u))` when it disagrees. The classic survey-statistics scorer behind
  * every production entity-resolution stack, and the natural layer above
  * this library's blocking operators (SNM q160, LSH q43, prefix q90).
  *
  * Determinism contract: the weights are computed ONCE on the driver from
  * the declared (m, u) probabilities and enter the plan as double
  * literals — the oracle interpolates the very same literals into its
  * SQL, so no transcendental function is ever evaluated cross-engine and
  * the score is a sum of identical constants in identical order.
  *
  * Scale shape: candidate generation is a within-block self-join (one
  * shuffle on the block key, Σ block² pair volume — the LSH-bucket cost
  * model; blocking keys are chosen to bound block size), scoring is
  * map-side codegen over the joined row. No cross-block pair is ever
  * materialized.
  */
object Linkage {

  /** A field comparison rule with its match/non-match agreement rates. */
  final case class FieldRule(
      name: String,
      agree: (Column, Column) => Column,
      m: Double,
      u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1 for a discriminating field, got m=$m u=$u")
    private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    def wAgree: Double = r4(math.log(m / u) / math.log(2.0))
    def wDisagree: Double = r4(math.log((1 - m) / (1 - u)) / math.log(2.0))
  }

  /** Within-block candidate pairs (`id_a < id_b`), all non-block columns
    * carried twice under `a_` / `b_` prefixes for the scorer.
    */
  def candidatePairs(df: DataFrame, idCol: String, blockCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(c => c == idCol || blockCols.contains(c)).toSeq
    def side(p: String) = df.select(
      (col(idCol).as(s"${p}_id") +: blockCols.map(col)) ++
        payload.map(c => col(c).as(s"${p}_$c")): _*)
    side("a").join(side("b"), blockCols)
      .filter(col("a_id") < col("b_id"))
  }

  /** [[candidatePairs]] under the engine's bucket-cap guard: blocks with
    * more than `maxBlockSize` members are DROPPED before the self-join
    * (the [[Dedup]] cap convention — a block that big means the blocking
    * key is non-discriminative there and its pairs would be mostly noise
    * anyway; at 100× one hot block otherwise turns the stage quadratic).
    * Cold blocks are untouched, so their pairs are bit-identical to the
    * open form (LinkageSpec pins both properties); the drop is visible on
    * the `graft.capBuckets` observe channel, the no-silent-caps
    * convention. The TPC-H-shaped queries (q163/q176) keep the open form:
    * their (nation, segment) blocks are bounded by construction, which is
    * exactly the "blocking keys are chosen to bound block size" contract —
    * this guard is for corpora where that contract can break.
    */
  def candidatePairsCapped(
      df: DataFrame, idCol: String, blockCols: Seq[String],
      maxBlockSize: Int): DataFrame = {
    require(maxBlockSize > 1, s"need maxBlockSize > 1: $maxBlockSize")
    // null-key rows can never pair (null never equi-joins) in EITHER
    // form — exclude them up front so the cap accounting never counts
    // rows into a pseudo-block (concat_ws silently SKIPS nulls, which
    // would merge ("en", null) and (null, "en"))
    val joinable = df.filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
    // one composite key column (unit-separator joined, so ("ab","c") and
    // ("a","bc") stay distinct blocks); the window count shuffles once
    val keyed = joinable.withColumn("__blk",
      concat_ws("\u0001", blockCols.map(c => col(c).cast("string")): _*))
    val capped = Dedup.capBuckets(keyed, "__blk", maxBlockSize).drop("__blk")
    candidatePairs(capped, idCol, blockCols)
  }

  /** Score candidate pairs: Σ per-rule agree/disagree weights, summed in
    * declaration order (the cross-engine association contract).
    */
  def score(pairs: DataFrame, rules: Seq[FieldRule]): DataFrame = {
    val s = rules.map { r =>
      when(r.agree(col(s"a_${r.name}"), col(s"b_${r.name}")), lit(r.wAgree))
        .otherwise(lit(r.wDisagree))
    }.reduce(_ + _)
    pairs.withColumn("match_score", s)
  }
}
