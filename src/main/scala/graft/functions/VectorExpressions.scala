package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector / fingerprint hot paths.
  *
  * Why not `zip_with` + `aggregate` (the composable form, kept in
  * `Similarity` scaladoc for reference)? Those build an intermediate array
  * object per row per evaluation; at 100 TB the similarity scan is the
  * inner loop of every ANN/near-dup job, so it gets a fused, allocation-free
  * kernel instead. Each expression implements `doGenCode` that emits a call
  * to a static primitive loop — the expression stays inside whole-stage
  * codegen (no UDF boundary, no serialization).
  *
  * Numerics: accumulation is sequential left-to-right in double, the same
  * IEEE order as the `aggregate()` fold and the DuckDB oracle's
  * `list_cosine_similarity` on DOUBLE[] — oracle hashes match.
  */
object VectorKernels {

  // mismatched lengths FAIL (DuckDB's list_cosine_similarity errors the
  // same way): a silent min-length prefix similarity looks plausible and
  // can clear a dedup threshold between unrelated documents — a corrupted
  // 512-dim row against 768-dim embeddings must surface, not merge
  private def checkLen(fn: String, a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb)
      throw new IllegalArgumentException(
        s"graft $fn: vector lengths differ ($na vs $nb)")
    na
  }

  /** cosine(a, b) over numeric ArrayData (float or double elements).
    * A zero-norm side yields NaN (0/0) by design — callers that rank must
    * treat NaN as unselectable (see Similarity.mmrRerank).
    */
  def cosine(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = checkLen("cosine_sim", a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
    } else {
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = checkLen("dot_product", a, b)
    var d = 0.0; var i = 0
    if (isFloat) { while (i < n) { d += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 } }
    else { while (i < n) { d += a.getDouble(i) * b.getDouble(i); i += 1 } }
    d
  }

  /** 64-bit SimHash over an array of string tokens: each token's xxhash64
    * bit pattern votes ±1 per bit; fingerprint = sign bits. NULL elements
    * are SKIPPED — without the isNullAt check the vote depended on the
    * array's physical representation (GenericArrayData hands the hash a
    * null → seed 42; UnsafeArrayData hands it a zero-length UTF8String),
    * so the same logical array could fingerprint differently between
    * interpreted and codegen plans.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) { i += 1 }
      else {
      val t = tokens.getUTF8String(i)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        t, StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}

/** Shared analysis-time validation: both inputs must be arrays of the SAME
  * float/double element type — wrong-typed SQL input (e.g. array<int> from
  * `graft_dot(array(1,2), ...)`) must fail analysis, not mis-read 4-byte
  * packed data as 8-byte strides at runtime.
  */
private[functions] object VectorTypeCheck {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def binary(fn: String, left: Expression, right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if (a == FloatType || a == DoubleType) && a == b =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn needs two arrays of the same float/double type, " +
            s"got ${left.dataType} and ${right.dataType}")
    }
}

/** cosine_sim(array<float|double>, array<float|double>) → double. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorTypeCheck.binary("cosine_sim", left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.cosine($a, $b, $isFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot_product(array<float|double>, array<float|double>) → double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorTypeCheck.binary("dot_product", left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.dot($a, $b, $isFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** simhash64(array<string>) → bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }

  override protected def nullSafeEval(tokens: Any): Any =
    VectorKernels.simhash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points. */
object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
