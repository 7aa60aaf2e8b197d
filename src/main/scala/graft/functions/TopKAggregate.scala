package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-capped min-heap of (ord, payload) pairs —
  * the smallest retained pair sits at the root and is evicted first.
  * Ties on `ord` break toward the SMALLER payload winning retention, which
  * makes the result deterministic for distinct payloads.
  */
final class TopKBuffer(val k: Int) {
  // binary min-heap by (ord asc, payload desc): root = weakest element
  val ords = new Array[Double](k)
  val pays = new Array[Long](k)
  var n = 0

  // TOTAL order via Double.compare (NaN greatest, -0.0 < 0.0 — Spark's own
  // sort semantics): primitive < / == both answer false for NaN, so a NaN
  // admitted while filling could sit at the root, never sift, and block
  // eviction of genuinely smaller elements — making the result depend on
  // arrival order
  @inline private def weaker(o1: Double, p1: Long, o2: Double, p2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c < 0 || (c == 0 && p1 > p2)
  }

  private def swap(i: Int, j: Int): Unit = {
    val to = ords(i); ords(i) = ords(j); ords(j) = to
    val tp = pays(i); pays(i) = pays(j); pays(j) = tp
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && weaker(ords(i), pays(i), ords((i - 1) / 2), pays((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && weaker(ords(l), pays(l), ords(m), pays(m))) m = l
      if (r < n && weaker(ords(r), pays(r), ords(m), pays(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def insert(ord: Double, pay: Long): Unit = {
    if (n < k) {
      ords(n) = ord; pays(n) = pay; n += 1; siftUp(n - 1)
    } else if (weaker(ords(0), pays(0), ord, pay)) {
      ords(0) = ord; pays(0) = pay; siftDown()
    }
  }

  /** Descending (ord desc, payload asc) — rank 1 first. Same total order
    * as [[weaker]] (Double.compare), so NaN ranks FIRST, consistent with
    * the heap's admission rule.
    */
  def sorted: Array[(Double, Long)] =
    (0 until n).map(i => (ords(i), pays(i))).toArray
      .sortWith { case ((o1, p1), (o2, p2)) =>
        val c = java.lang.Double.compare(o1, o2)
        c > 0 || (c == 0 && p1 < p2)
      }
}

/** graft_topk(ord double, payload bigint, k) → array<struct<ord,payload>>:
  * the k largest (ord, payload) pairs per group, rank 1 first.
  *
  * A TypedImperativeAggregate so Catalyst runs it with PARTIAL/FINAL phases:
  * each map task reduces its slice to ≤ k pairs per group BEFORE the
  * shuffle — the wire cost of "top 10 per group" over 100 TB is k rows per
  * group per partition, not the whole table (the window row_number()
  * formulation shuffles and sorts every row). ≡ SURVEY §2.2's
  * TypedImperativeAggregate slot.
  */
case class TopKAgg(
    ordExpr: Expression,
    payExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalStateException(s"unvalidated k: $other")
  }

  override def children: Seq[Expression] = Seq(ordExpr, payExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(
      s"graft_topk needs (double, bigint, positive int literal): $msg")
    (ordExpr.dataType, payExpr.dataType) match {
      case (DoubleType, LongType) =>
        if (!kExpr.foldable) fail(s"k is not a literal (${kExpr.sql})")
        else kExpr.eval(InternalRow.empty) match {
          case i: Int if i > 0 => TypeCheckResult.TypeCheckSuccess
          // bound BEFORE the runtime l.toInt: 2^32 truncates to 0 (zero-
          // length heap → AIOOBE mid-query), 2^31 wraps negative
          case l: Long if l > 0 && l <= Int.MaxValue => TypeCheckResult.TypeCheckSuccess
          case other => fail(s"got k = $other")
        }
      case (o, p) => fail(s"got ($o, $p)")
    }
  }

  override def dataType: DataType = ArrayType(new StructType()
    .add("ord", DoubleType, nullable = false)
    .add("payload", LongType, nullable = false), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordExpr.eval(input)
    val p = payExpr.eval(input)
    if (o != null && p != null) buf.insert(o.asInstanceOf[Double], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.ords(i), other.pays(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (o, p) =>
      InternalRow(o, p): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeDouble(buf.ords(i)); out.writeLong(buf.pays(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ordExpr = newChildren(0), payExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKFunctions {
  /** Column API: top-k (ord, payload) pairs per group, rank 1 first. */
  def topK(ord: Column, payload: Column, k: Int): Column =
    GraftBridge.column(TopKAgg(
      GraftBridge.expression(ord),
      GraftBridge.expression(payload),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())
}
