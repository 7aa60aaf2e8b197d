package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity kernels (fuzzy matching / entity-resolution
  * surface). Spark ships `levenshtein` but no Jaro-Winkler; this adds it as
  * a codegen'd Catalyst expression rather than a Scala UDF so the fuzzy-join
  * hot path stays inside whole-stage codegen.
  *
  * Semantics pinned to the reference implementations used by the DuckDB
  * oracle (probed empirically, see StringSimSpec):
  *   - either input empty → 0.0 (even for two empty strings);
  *   - match window = max(len)/2 − 1, floored at 0;
  *   - transpositions use INTEGER halving (t = mismatches / 2);
  *   - Winkler prefix boost (+0.1·prefix·(1−jaro), prefix ≤ 4) applies only
  *     when jaro > 0.7.
  */
object StringKernels {

  /** Polynomial string hash, h = fold((h·31 + codepoint) mod 1e9+7):
    * SQL-expressible (the oracle computes the identical fold with
    * list_reduce over unicode() codepoints), which xxhash64 is not — the
    * deterministic-minhash pipeline is built on it. Iterates CODEPOINTS,
    * not UTF-16 units, to match the oracle's unicode(); callers must keep
    * newlines out of hashed strings (the oracle's '.' regex skips them —
    * shingles are space-joined tokens, so this holds by construction).
    */
  val PolyHashMod = 1000000007L

  def polyHash(u: UTF8String): Long = {
    val s = u.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % PolyHashMod
      i += Character.charCount(cp)
    }
    h
  }

  /** Operates on UTF-8 BYTES, not UTF-16 chars: the oracle engine's
    * `jaro_winkler_similarity` is byte-based (probe: 'a😀' vs 'ab' scores
    * 0.5667 = the 5-byte read, not the 2-codepoint 0.6667), and [[polyHash]]
    * next door learned the same lesson with codepoints — the unit of
    * iteration must match the oracle's or every non-ASCII string diverges.
    * Identical to the previous char-based walk on ASCII; also skips the
    * String conversion entirely.
    */
  def jaroWinkler(aU: UTF8String, bU: UTF8String): Double = {
    val la = aU.numBytes
    val lb = bU.numBytes
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && bU.getByte(j) == aU.getByte(i)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (aU.getByte(i) != bU.getByte(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2 // integer halving, matching the oracle engine
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && aU.getByte(prefix) == bU.getByte(prefix)) prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }
}

/** jaro_winkler(string, string) → double in [0, 1]. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // NullType: a NULL literal argument is legal (result is null)
      case (StringType | NullType, StringType | NullType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two strings, got ${left.dataType} and ${right.dataType}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** poly_hash(string) → bigint in [0, 1e9+7). */
case class PolyHash(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"poly_hash needs a string, got $other")
    }

  override protected def nullSafeEval(s: Any): Any =
    StringKernels.polyHash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringKernels.polyHash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object StringFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))
  def polyHash(s: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(s)))
}
