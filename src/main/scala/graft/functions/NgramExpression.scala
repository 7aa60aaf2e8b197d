package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram kernel.
  *
  * The composable form — `transform(sequence(0, n-k), i -> concat_ws(' ',
  * slice(tokens(text), i+1, k)))` — re-evaluates the `tokens(text)`
  * split/filter pipeline once PER WINDOW inside the higher-order lambda
  * (CollapseProject inlines the token expression into the lambda body; a
  * 54-token document tokenizes ~54 times). This kernel tokenizes once and
  * emits all windows in one loop; shingle-heavy operators (Jaccard, MinHash,
  * fingerprints, contamination) sit on it.
  *
  * Semantics are IDENTICAL to the composed form (property-tested in
  * NgramKernelSpec against the dataflow implementation):
  *   - tokens = regex-split on `\s+`, empties dropped (Java regex, the same
  *     engine Spark's `split` uses);
  *   - distinct=true (shingles): windows at 0..max(n−k, 0) — short docs
  *     yield one truncated window; zero tokens yield the EMPTY set (the
  *     DuckDB oracle's `array_to_string([], ' ')` is NULL and drops out of
  *     `list_distinct`, so an empty-string shingle must not exist — it
  *     would join empty documents to each other in q42/q65); duplicates
  *     removed, first-occurrence order;
  *   - distinct=false (ngrams): windows at 0..n−k, empty result when n < k.
  */
object NgramKernels {
  private val WS: Pattern = Pattern.compile("\\s+")

  def ngrams(text: UTF8String, k: Int, distinct: Boolean): GenericArrayData = {
    val toks0 = WS.split(text.toString, -1)
    // drop empties (leading whitespace yields a leading "")
    var nTok = 0
    val toks = new Array[String](toks0.length)
    var i = 0
    while (i < toks0.length) {
      if (!toks0(i).isEmpty) { toks(nTok) = toks0(i); nTok += 1 }
      i += 1
    }
    if (nTok == 0) return new GenericArrayData(new Array[Any](0))
    val lastStart = if (distinct) math.max(nTok - k, 0) else nTok - k
    if (lastStart < 0) return new GenericArrayData(new Array[Any](0))
    val sb = new java.lang.StringBuilder
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var s = 0
      while (s <= lastStart) {
        sb.setLength(0)
        val end = math.min(s + k, nTok)
        var j = s
        while (j < end) { if (j > s) sb.append(' '); sb.append(toks(j)); j += 1 }
        seen.add(UTF8String.fromString(sb.toString))
        s += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](lastStart + 1)
      var s = 0
      while (s <= lastStart) {
        sb.setLength(0)
        var j = s
        while (j < s + k) { if (j > s) sb.append(' '); sb.append(toks(j)); j += 1 }
        out(s) = UTF8String.fromString(sb.toString)
        s += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** word_ngrams(text, k [, distinct]) → array<string>, fused single pass.
  *
  * `kExpr` is a real tree child (not constructor-captured state), so the
  * analyzer resolves it and a non-literal/invalid k surfaces as a clean
  * TypeCheckFailure rather than an exception mid-analysis.
  */
case class WordNgrams(left: Expression, right: Expression, distinct: Boolean)
  extends BinaryExpression {

  private def kExpr: Expression = right

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalStateException(s"unvalidated k: $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs a string column and a positive int literal k: $msg")
    left.dataType match {
      case StringType | NullType =>
        if (!kExpr.foldable) fail(s"k is not a literal (${kExpr.sql})")
        else kExpr.eval(InternalRow.empty) match {
          case i: Int if i >= 1 => TypeCheckResult.TypeCheckSuccess
          case l: Long if l >= 1 && l <= Int.MaxValue => TypeCheckResult.TypeCheckSuccess
          case other => fail(s"got k = $other")
        }
      case other => fail(s"got text type $other")
    }
  }

  override protected def nullSafeEval(text: Any, kVal: Any): Any =
    NgramKernels.ngrams(text.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.NgramKernels.ngrams($t, $k, $distinct);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
