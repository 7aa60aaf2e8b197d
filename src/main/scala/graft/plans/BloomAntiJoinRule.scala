package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BloomFilterMightContain, Coalesce, EqualTo, Literal, Not, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Opt-in Catalyst optimizer rule: rewrites a single-key equi LEFT ANTI
  * join into the bloom-REROUTED form of
  * [[graft.operators.AnnotationPipeline.filterAlreadyProcessedBloom]]:
  *
  * {{{
  *   left ANTI JOIN right ON l = r
  *   ⇒ Union(
  *       Filter(NOT coalesce(might_contain(bf, xxhash64(l)), false), left),
  *       Filter(coalesce(might_contain(bf, xxhash64(l)), false), left)
  *         ANTI JOIN right ON l = r)
  *   -- bf = scalar subquery: bloom_filter_agg(xxhash64(r)) over right
  * }}}
  *
  * Spark's own `InjectRuntimeFilter` cannot touch anti-joins — a probe row
  * FAILING the build side's bloom filter is exactly the row the anti-join
  * must keep, so there is nothing to prune, and both sides shuffle in
  * full. The reroute flips the filter's role from pruning to ROUTING:
  * bloom-negative rows (definite non-members — blooms have no false
  * negatives) bypass the join entirely; only the ~fpp sliver takes the
  * shuffle. Exactness is unconditional; the spec pins rewritten ≡ plain
  * bit-for-bit, including null join keys (either branch keeps them: the
  * anti-join's null-never-matches semantics make routing irrelevant) and
  * an EMPTY build side (`bloom_filter_agg` yields a null sketch; the
  * `coalesce(…, false)` routes every row to the fresh branch, which is
  * the correct "nothing matched" answer).
  *
  * Enabled by `spark.graft.bloomAntiJoin.enabled` (default FALSE — a plan
  * rewrite that doubles the build-side execution must be a deliberate
  * choice; it pays off when the probe side dwarfs the fp sliver, the
  * 100 TB re-ingest shape). Sketch sizing via
  * `spark.graft.bloomAntiJoin.expectedItems` / `.fpp`. Register through
  * [[graft.GraftExtensions]] (session build) or
  * `spark.experimental.extraOptimizations` (live session).
  */
object BloomAntiJoinRule extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.bloomAntiJoin.enabled"
  val ExpectedItemsConf = "spark.graft.bloomAntiJoin.expectedItems"
  val FppConf = "spark.graft.bloomAntiJoin.fpp"

  /** Marks joins this rule created, so the fixed-point batch cannot
    * re-reroute the inner anti-join forever.
    */
  private val Rerouted = TreeNodeTag[Boolean]("graft.bloomRerouted")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "false").toBoolean) return plan
    val expectedItems = conf.getConfString(ExpectedItemsConf, "1000000").toLong
    val fpp = conf.getConfString(FppConf, "0.01").toDouble
    val numBits = graft.functions.BloomSizing.optimalNumBits(expectedItems, fpp)
    plan.transformUp {
      case j @ Join(left, right, LeftAnti, Some(cond), hint)
          if !alreadyRerouted(j) && deterministicPlan(left) &&
            deterministicPlan(right) && singleEquiKeys(j).isDefined =>
        val (l, r) = singleEquiKeys(j).get
        // prune the build side to the key before the sketch aggregate —
        // the subquery re-executes right's lineage, keep it narrow
        val bfAgg = new BloomFilterAggregate(new XxHash64(Seq(r)),
          Literal(expectedItems), Literal(numBits)).toAggregateExpression()
        val agg = Aggregate(Nil, Seq(Alias(bfAgg, "graft_bf")()), Project(Seq(r), right))
        val mc = Coalesce(Seq(
          BloomFilterMightContain(ScalarSubquery(agg), new XxHash64(Seq(l))),
          Literal(false)))
        val inner = Join(Filter(mc, left), right, LeftAnti, Some(cond), hint)
        inner.setTagValue(Rerouted, true)
        Union(Filter(Not(mc), left), inner)
    }
  }

  /** Loop guard: the [[Rerouted]] tag is the fast path, but TreeNodeTags
    * do NOT survive a case-class `copy` — and rules between this batch's
    * runs (e.g. InferFiltersFromConstraints) rebuild joins via copy, which
    * would let the fixed point re-reroute its own inner anti-join (probe
    * scanned 3×, a second bloom subquery). The STRUCTURAL check — a probe
    * side already filtered by a bloom membership test — survives any
    * rebuild. (A user plan hand-built in that exact shape is already
    * rerouted in the only sense that matters; skipping it is correct.)
    */
  private def alreadyRerouted(j: Join): Boolean =
    j.getTagValue(Rerouted).isDefined || (j.left match {
      case Filter(c, _) =>
        c.exists { case _: BloomFilterMightContain => true; case _ => false }
      case _ => false
    })

  /** The rewrite executes BOTH inputs twice (probe in two Union branches,
    * build in the join and the sketch subquery): a non-deterministic
    * expression anywhere below (rand() filter, uuid() projection) could
    * emit a row in both branches or neither, breaking the rewritten ≡
    * plain contract — Spark's own plan-duplicating rewrites guard the
    * same way.
    */
  private def deterministicPlan(p: LogicalPlan): Boolean =
    p.find(n => n.expressions.exists(e => !e.deterministic)).isEmpty

  /** The join shapes we reroute: exactly one `l = r` equality between bare
    * attributes, one from each side. Anything richer (casts, conjunctions,
    * non-equi residuals) is left alone — correctness first.
    */
  private def singleEquiKeys(j: Join): Option[(AttributeReference, AttributeReference)] =
    j.condition match {
      case Some(EqualTo(l: AttributeReference, r: AttributeReference))
          if j.left.outputSet.contains(l) && j.right.outputSet.contains(r) =>
        Some((l, r))
      case Some(EqualTo(r: AttributeReference, l: AttributeReference))
          if j.left.outputSet.contains(l) && j.right.outputSet.contains(r) =>
        Some((l, r))
      case _ => None
    }
}
