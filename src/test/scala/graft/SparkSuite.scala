package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per suite via lazy val). */
trait SparkSuite extends AnyFunSuite {
  // local[4, 2]: maxFailures=2 so task-retry semantics are testable
  // (EsStubSpec's stalled-scroll recovery). Deterministic task failures
  // still fail the job — they just cost one extra attempt.
  //
  // Trade-off (ADVICE r17, evaluated and accepted): retries apply to
  // EVERY suite, so a test whose task closure has non-idempotent side
  // effects could double-execute on an incidental flake. A per-suite
  // retry policy is not expressible here — maxFailures is fixed in the
  // master string of the ONE SparkContext this JVM can hold — and the
  // exposure is bounded by convention: tests that count side effects
  // assert EXACT counts (EsStubSpec's attempt counters), which a stray
  // retry fails loudly rather than passes silently, and the replay/
  // idempotence suites assert convergence, where a double execution is
  // exactly the semantics under test.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  /** transformWithState needs a multi-column-family store → RocksDB
    * provider, scoped per test: leaving it set would silently re-run
    * every later streaming test on RocksDB.
    */
  /** Spark `round(x, 6) + 0.0` twin for hand-computed expectations —
    * BigDecimal HALF_UP, NOT Similarity.duckRound6 (float-multiply based,
    * intentionally different semantics).
    */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
