package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{StringFunctions, StringKernels}

/** Count-Min sketch over a keyed count stream — the point-frequency member
  * of the sketch-algebra family (HLL distincts → `IncrementalAgg`/q154,
  * theta overlap → q178, Misra–Gries heavy hitters → q135): a d × w
  * counter matrix where every key increments one counter per row
  * (`col_r(k) = affine_r(polyHash(k)) mod w`), and a point estimate reads
  * back `min_r counts[r][col_r(k)]` — an OVERESTIMATE by construction
  * (collisions only ever add), within εn with probability 1 − δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Everything is relational, which is the point at 100 TB: the sketch IS
  * `groupBy (row, col) → sum` — built map-side-partial from pre-aggregated
  * key counts (vocab-sized input, not occurrence-sized), mergeable across
  * shards/snapshots by plain `sum` (the q178 partials-algebra contract),
  * d·w rows total (KBs — broadcast-sized forever). Estimates are a
  * broadcast join of the probe keys' d (row, col) coordinates against the
  * counter relation + a `min` — no corpus rescan.
  *
  * Hashing: the repo-wide deterministic [[StringFunctions.polyHash]]
  * (codegen'd Catalyst expression) composed with the q43/q84 affine-family
  * row transforms `(h·a_r + b_r) mod M` — both replayable in DuckDB SQL,
  * so the whole sketch is oracle-checkable (unlike xxhash64 sketches,
  * which get deterministic twins instead).
  */
object CountMin {

  private val Mod = StringKernels.PolyHashMod

  /** The affine row family (a_r, b_r) — the q84 minhash constant
    * convention, one pair per sketch row (depth = 4).
    */
  val RowParams: Seq[(Long, Long)] = Seq((1L, 3L), (3L, 10L), (5L, 17L), (7L, 24L))

  private def colFor(h: org.apache.spark.sql.Column, a: Long, b: Long, width: Int) =
    ((h * lit(a) + lit(b)) % lit(Mod)) % lit(width)

  /** Build the d × `width` counter relation from PRE-AGGREGATED key counts
    * (`keyCol`, `cntCol`): one row per (row, col) bucket with the summed
    * count. Input is vocab-sized; output is d·width rows.
    */
  def sketch(keyCounts: DataFrame, keyCol: String, cntCol: String,
             width: Int): DataFrame = {
    require(width > 0, s"need width > 0, got $width")
    val h = StringFunctions.polyHash(col(keyCol))
    val coords = array(RowParams.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"), colFor(h, a, b, width).as("col"))
    }: _*)
    keyCounts
      .select(explode(coords).as("__rc"), col(cntCol).as("__n"))
      .groupBy(col("__rc.r").as("r"), col("__rc.col").as("col"))
      .agg(sum("__n").as("n"))
  }

  /** Equi-join SIZE estimate from two sketches built with the same
    * `width` and row family (Alon–Matias–Szegedy inner-product form,
    * Cormode & Muthukrishnan 2005 §4.2): per sketch row the inner
    * product Σ_col a[r][col]·b[r][col], min over the d rows — an
    * OVERESTIMATE of Σ_key cntA(k)·cntB(k) by construction (collisions
    * only add cross terms), within ε·‖a‖₁‖b‖₁. The cardinality-planning
    * primitive: price a join (or a self-join's pair volume — the
    * basket-guard question) from two d·w relations WITHOUT running it or
    * rescanning either input. Products and sums run in DECIMAL(38,0)
    * (‖a‖₁‖b‖₁ headroom), one d-row min at the end.
    */
  def joinSizeEstimate(cmsA: DataFrame, cmsB: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val a = cmsA.select(col("r"), col("col"), col("n").cast(dec).as("__na"))
    val b = cmsB.select(col("r"), col("col"), col("n").cast(dec).as("__nb"))
    // the min must range over ALL d rows: a row with no overlapping cells
    // has inner product 0 (disjoint key sets), and dropping it from the
    // min — as a bare inner-join groupBy would — inflates the estimate
    // exactly when the join is smallest
    val rows = cmsA.sparkSession.range(RowParams.size)
      .select(col("id").cast("int").as("r"))
    val ip = a.join(b, Seq("r", "col"))
      .groupBy(col("r"))
      .agg(sum(col("__na") * col("__nb")).as("__ip"))
    rows.join(ip, Seq("r"), "left")
      .select(coalesce(col("__ip"), lit(0).cast(dec)).as("__ip"))
      .agg(min("__ip").cast(dec).as("join_size_estimate"))
  }

  /** Point estimates for `probes` (`keyCol` + any carried columns):
    * min over the d rows of the probed counters. `cms` must come from
    * [[sketch]] with the same `width`; it is broadcast (d·width rows).
    * Missing buckets cannot occur for keys that were in the build stream;
    * for foreign keys a missing bucket reads as 0 (true count 0 ≤ 0 —
    * the guarantee holds).
    */
  def estimate(cms: DataFrame, probes: DataFrame, keyCol: String,
               width: Int): DataFrame = {
    val h = StringFunctions.polyHash(col(keyCol))
    val coords = array(RowParams.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"), colFor(h, a, b, width).as("col"))
    }: _*)
    val carried = probes.columns.map(col)
    // sketch columns renamed so probe relations may carry r/col/n freely
    val counters = cms.select(col("r").as("__cms_r"),
      col("col").as("__cms_c"), col("n").as("__cms_n"))
    probes
      .select(carried :+ explode(coords).as("__rc"): _*)
      .join(broadcast(counters),
        col("__rc.r") === col("__cms_r") && col("__rc.col") === col("__cms_c"),
        "left")
      .groupBy(carried: _*)
      .agg(min(coalesce(col("__cms_n"), lit(0L))).as("cms_estimate"))
  }
}
