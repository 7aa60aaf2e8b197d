package graft

import org.apache.spark.sql.functions._

import graft.functions.{StringFunctions, StringKernels}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler kernel semantics, pinned to values probed from the oracle
  * engine (DuckDB 1.0 jaro_winkler_similarity) — these literals ARE the
  * contract the q74 oracle hash-match depends on.
  */
class StringSimSpec extends SparkSuite {

  private def jw(a: String, b: String): Double =
    StringKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches oracle-engine values on probed cases") {
    val cases = Seq(
      ("martha", "marhta") -> 0.9611111111111111,   // boost applies
      ("abcdxxxxxx", "abcdyyyyyy") -> 0.6,          // jaro ≤ 0.7 → no boost
      ("dwayne", "duane") -> 0.8400000000000001,
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("crate", "trace") -> 0.7333333333333334,     // boost-eligible, prefix 0
      ("prefixmatch", "prefixxxxxx") -> 0.6969696969696969,
      ("abcxyz", "bcaxyz") -> 0.9444444444444445,   // odd mismatches → int halving
      ("aaaaaaaaab", "baaaaaaaaa") -> 0.9333333333333332,
      ("a", "") -> 0.0,
      ("", "") -> 0.0,                              // oracle engine: 0, not 1
      ("a", "a") -> 1.0,
      ("ab", "ba") -> 0.0,                          // window 0 → no matches
      ("abcde", "abcde") -> 1.0,
      ("x", "y") -> 0.0)
    for (((a, b), expected) <- cases)
      assert(jw(a, b) === expected, s"jw($a, $b)")
  }

  test("symmetric and bounded") {
    val strs = Seq("", "a", "ab", "abc", "martha", "marhta", "xyzzy", "zyxxy")
    for (a <- strs; b <- strs) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0)
      assert(v === jw(b, a), s"symmetry($a, $b)")
    }
  }

  test("SQL registration and codegen evaluation") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS jw").collect()
    assert(rows.head.getDouble(0) === 0.9611111111111111)
    // null propagation
    val n = spark.sql("SELECT graft_jaro_winkler(NULL, 'x') AS jw").collect()
    assert(n.head.isNullAt(0))
  }

  test("column API over a DataFrame stays codegen-compatible") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("ab", "ba")).toDF("a", "b")
      .select(StringFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.9611111111111111, 0.0))
  }

  test("analysis-time type check rejects non-strings") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_jaro_winkler(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("non-BMP strings score byte-for-byte like the oracle engine") {
    // DuckDB's jaro_winkler_similarity walks UTF-8 BYTES; probed values:
    //   jaro_winkler_similarity('a\uD83D\uDE00', 'ab') = 0.5666666666666667
    //   jaro_winkler_similarity('\uD83D\uDE00x', 'x\uD83D\uDE00') = 0.8666666666666667
    // A UTF-16 char walk scores the first 0.6667 (2 "chars" vs 5 bytes).
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.functions.StringKernels.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("a\uD83D\uDE00", "ab") - 0.5666666666666667) < 1e-12)
    assert(math.abs(jw("\uD83D\uDE00x", "x\uD83D\uDE00") - 0.8666666666666667) < 1e-12)
    assert(jw("a\uD83D\uDE00", "a\uD83D\uDE00") == 1.0)
  }
}
