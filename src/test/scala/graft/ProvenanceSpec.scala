package graft

import graft.operators.Provenance

/** [[graft.operators.Provenance.ingestManifest]] effect contract: the
  * legacy nanos conf it needs for pre-round-10 event files is SCOPED to
  * the call — the manifest materializes inside the saved/restored window,
  * so the operator does not permanently change parquet timestamp decoding
  * for the whole session (the round-13 ADVICE finding).
  */
class ProvenanceSpec extends SparkSuite {

  private val confKey = "spark.sql.legacy.parquet.nanosAsLong"

  test("ingestManifest restores a pre-set nanosAsLong value") {
    spark.conf.set(confKey, "false")
    try {
      val m = Provenance.ingestManifest(spark, sfDir,
        Seq(("orders", "o_orderkey"), ("events", "event_id")))
      assert(m.count() > 0)
      assert(spark.conf.get(confKey) == "false",
        "operator must restore the caller's conf value")
    } finally spark.conf.unset(confKey)
  }

  test("ingestManifest leaves an unset nanosAsLong at its default") {
    spark.conf.unset(confKey)
    val m = Provenance.ingestManifest(spark, sfDir,
      Seq(("nation", "n_nationkey")))
    assert(m.count() == 1)
    // a registered SQLConf never reads as absent — unset means default
    // ("false"); the operator must not leave its "true" behind
    assert(spark.conf.get(confKey) == "false",
      "operator must not leave the legacy conf enabled")
  }
}
