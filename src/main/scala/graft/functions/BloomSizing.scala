package graft.functions

/** Shared bloom-filter sizing: the operator-level reroute
  * ([[graft.operators.AnnotationPipeline]] `filterAlreadyProcessedBloom`)
  * and the optimizer rule ([[graft.plans.BloomAntiJoinRule]]) must size
  * their sketches IDENTICALLY or the two forms of the same anti-join
  * diverge in memory/FPP behavior.
  */
object BloomSizing {

  /** Optimal bit count for `expectedItems` at false-positive rate `fpp`:
    * ceil(−n·ln p / ln²2), floored at 64 so degenerate inputs still build
    * a valid sketch.
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }
}
