package graft

/** Smoke over the full declared inventory: every SparkEntry query runs at
  * sf0.001 and the ones that should produce rows do. (Value-level
  * correctness is the driver's DuckDB oracle + tools/check_oracle.py.)
  */
class QueriesSpec extends SparkSuite {

  // Queries that legitimately may return zero rows at the smallest SF.
  private val mayBeEmpty = Set("q42_jaccard_pairs", "q43_minhash_lsh", "q44_simhash")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }
}
