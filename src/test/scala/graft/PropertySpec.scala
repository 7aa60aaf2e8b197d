package graft

import java.time.LocalDate

import scala.util.Random

import graft.functions.TextFunctions

/** Property-style tests (SURVEY.md §5.4) over seeded random samples:
  * normalization idempotence, shingle cardinality, B1 segment coverage with
  * half-open windows. (Plain seeded sampling — the scalatest/scalacheck
  * bridge artifact isn't on the offline classpath.)
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val rng = new Random(42)

  test("P5 normalization is idempotent on arbitrary strings") {
    val alphabet = "abcXYZ019#\\/*?\"<>| ._-+"
    val samples = Seq.fill(60)(
      (0 until rng.nextInt(20)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = samples.toDF("x")
    val once = df.select(TextFunctions.normalizeIndexName($"x").as("n"))
    val twice = once.select(TextFunctions.normalizeIndexName($"n").as("n"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("shingle count: distinct k-shingles of n tokens is in [1, n-k+1]") {
    val cases = Seq.fill(40) {
      val n = 1 + rng.nextInt(12)
      val k = 1 + rng.nextInt(4)
      (Seq.fill(n)(Seq("a", "b", "c", "d")(rng.nextInt(4))).mkString(" "), n, k)
    }
    cases.foreach { case (text, n, k) =>
      val got = Seq(text).toDF("t")
        .select(TextFunctions.shingles($"t", k).as("s")).as[Seq[String]].head()
      val expectMax = math.max(n - k + 1, 1)
      assert(got.nonEmpty && got.size <= expectMax,
        s"text='$text' k=$k → ${got.size} shingles, max $expectMax")
    }
  }

  test("mergeAnnotationArrays is idempotent and order-insensitive (D1/X2)") {
    import graft.operators.AnnotationPipeline.mergeAnnotationArrays
    val samples = Seq.fill(30) {
      def arr() = Seq.fill(rng.nextInt(6))((rng.nextInt(4).toLong, s"t${rng.nextInt(4)}"))
      (arr(), arr())
    }
    val df = samples.toDF("a", "b")
    val ab = df.select(mergeAnnotationArrays($"a", $"b").as("m")).as[Seq[(Long, String)]].collect()
    val ba = df.select(mergeAnnotationArrays($"b", $"a").as("m")).as[Seq[(Long, String)]].collect()
    val again = df.select(
      mergeAnnotationArrays(mergeAnnotationArrays($"a", $"b"), $"b").as("m"))
      .as[Seq[(Long, String)]].collect()
    assert(ab.toSeq == ba.toSeq, "merge must be order-insensitive")
    assert(ab.toSeq == again.toSeq, "re-merging the same batch must be a no-op")
    ab.foreach(m => assert(m == m.distinct.sorted, "output sorted and distinct"))
  }

  /** B1 half-open segments: every date in [start, end) belongs to exactly one
    * segment (the reference's inclusive boundaries double-assign boundary
    * dates — `annotations_indexer.py:847-857`; this encodes the fix).
    */
  test("half-open date segments cover [start, end) exactly once") {
    Seq.fill(50)((1 + rng.nextInt(60), 1 + rng.nextInt(200))).foreach {
      case (interval, span) =>
        val start = LocalDate.of(2020, 1, 1)
        val end = start.plusDays(span.toLong)
        val segments = Iterator.iterate(start)(_.plusDays(interval.toLong))
          .takeWhile(_.isBefore(end))
          .map(s => (s, Seq(s.plusDays(interval.toLong), end).minBy(_.toEpochDay)))
          .toSeq
        (0 until span).foreach { d =>
          val day = start.plusDays(d.toLong)
          val owners = segments.count { case (s, e) => !day.isBefore(s) && day.isBefore(e) }
          assert(owners == 1, s"interval=$interval span=$span day=$day covered $owners times")
        }
        assert(segments.forall { case (s, e) => !s.isBefore(start) && !e.isAfter(end) })
    }
  }
}
