package graft.streaming

/** Shared primitives of the streaming monitors' stream ≡ batch contracts —
  * ONE definition each, so the contract can't silently drift per monitor
  * (the byteFold / symmetrized() dedup convention).
  */
private[streaming] object Emit {

  /** Full-precision event-time micros for intra-batch fold order.
    * `Timestamp.getTime` alone truncates to milliseconds, which can
    * reorder sub-millisecond-distinct events relative to the batch twins'
    * full-precision (ts, id) sorts — an order-sensitive recursion (EWMA,
    * CUSUM) would then diverge from the pinned batch result.
    */
  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000

  /** The 6-decimal HALF_UP emission rounding (matches Spark `round(x, 6)`,
    * the batch twins' output contract). Rounding happens at EMISSION only —
    * state always carries unrounded values.
    */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
