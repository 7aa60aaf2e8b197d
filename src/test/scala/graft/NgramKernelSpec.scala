package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks._

import graft.functions.TextFunctions

/** The native WordNgrams kernel must be semantically IDENTICAL to the
  * composable higher-order-function form it replaced (shinglesComposed /
  * ngramsComposed) for every non-empty document. The ONE intentional
  * divergence: zero-token text yields [] (matching the DuckDB oracle,
  * whose array_to_string([], ' ') is NULL and drops out of list_distinct),
  * where the composed form yields [""] — an empty-string shingle would
  * join empty documents to each other in q42/q65.
  */
class NgramKernelSpec extends SparkSuite {
  import spark.implicits._

  private val texts = Table("text",
    "one", "one two", "one two three", "one two three four",
    "a a a a a", "  leading and   multiple   spaces ", "tab\tsep\nnewline",
    "x y x y x y", "repeat repeat repeat repeat",
    "the quick brown fox jumps over the lazy dog")

  test("native shingles == composed shingles for k in 1..5") {
    for (k <- 1 to 5) {
      forAll(texts) { t =>
        val df = Seq(t).toDF("text").select(
          TextFunctions.shingles(col("text"), k).as("native"),
          TextFunctions.shinglesComposed(col("text"), k).as("composed"))
        val r = df.collect().head
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k text='$t'")
      }
    }
  }

  test("native ngrams == composed ngrams for k in 1..5") {
    for (k <- 1 to 5) {
      forAll(texts) { t =>
        val df = Seq(t).toDF("text").select(
          TextFunctions.ngrams(col("text"), k).as("native"),
          TextFunctions.ngramsComposed(col("text"), k).as("composed"))
        val r = df.collect().head
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k text='$t'")
      }
    }
  }

  test("degenerate cases pinned") {
    val r = Seq(("", "a b", "  \t "))
      .toDF("empty", "short", "blank").select(
        TextFunctions.shingles(col("empty"), 3).as("s_empty"),
        TextFunctions.ngrams(col("empty"), 2).as("n_empty"),
        TextFunctions.shingles(col("short"), 3).as("s_short"),
        TextFunctions.shingles(col("blank"), 3).as("s_blank"))
      .collect().head
    assert(r.getSeq[String](0) == Seq())         // zero tokens → empty set (oracle parity)
    assert(r.getSeq[String](1) == Seq())         // ngrams: none
    assert(r.getSeq[String](2) == Seq("a b"))    // truncated to available tokens
    assert(r.getSeq[String](3) == Seq())         // whitespace-only → empty set
  }

  test("null text propagates null") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.shingles(col("text"), 3)).collect().head
    assert(r.isNullAt(0))
  }
}
