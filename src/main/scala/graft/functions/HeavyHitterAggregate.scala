package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries k-counter summary (Misra & Gries 1982; mergeable form per
  * Agarwal et al., "Mergeable Summaries", PODS 2012). At most `k` counters
  * live at any time; every retained count is a LOWER bound on the item's
  * true frequency, under-counting by at most N/(k+1) over N updates — so
  * any item with true frequency > N/(k+1) is GUARANTEED present (the
  * heavy-hitter superset property the exact-recount tail relies on).
  */
final class MgBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Classic per-item update: increment if tracked, adopt if a slot is
    * free, otherwise decrement every counter (amortized O(1) — each
    * decrement is paid for by a previous increment).
    */
  def add(item: String): Unit =
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (it, c) =>
          if (c == 1L) dead += it else counts.update(it, c - 1)
        }
        dead.foreach(counts.remove)
    }

  /** Mergeable-summaries combine: sum counts, then if over k counters
    * subtract the (k+1)-th largest count from all and drop the non-
    * positive — preserves the N/(k+1) error bound of the union.
    */
  def mergeFrom(other: MgBuffer): Unit = {
    other.counts.foreach { case (it, c) =>
      counts.update(it, counts.getOrElse(it, 0L) + c)
    }
    if (counts.size > k) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (it, c) =>
        if (c - kth <= 0L) dead += it else counts.update(it, c - kth)
      }
      dead.foreach(counts.remove)
    }
  }
}

/** graft_heavy_hitters(item string, k) → array<struct<item,lower_count>>:
  * the Misra–Gries candidate summary per group, (lower_count desc, item
  * asc) order. A TypedImperativeAggregate, so Catalyst partial-aggregates
  * it MAP-SIDE: each task reduces its slice to ≤ k counters before the
  * shuffle — "which tokens exceed share f of 100 TB" costs k counters per
  * partition on the wire instead of a corpus-wide token shuffle.
  *
  * The retained counts are lower bounds (approximate, merge-order-
  * dependent); the DETERMINISTIC production composition is
  * [[graft.operators.Corpus.heavyHitters]]: sketch → candidate superset →
  * exact recount of the ≤ k candidates → threshold filter. For any
  * threshold share > 1/(k+1) the guarantee makes that final set exact
  * regardless of partitioning, which is what the q135 oracle checks.
  */
case class MgHeavyHitters(
    itemExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalStateException(s"unvalidated k: $other")
  }

  override def children: Seq[Expression] = Seq(itemExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters needs (string, positive int literal): $msg")
    itemExpr.dataType match {
      case StringType =>
        if (!kExpr.foldable) fail(s"k is not a literal (${kExpr.sql})")
        else kExpr.eval(InternalRow.empty) match {
          case i: Int if i > 0 => TypeCheckResult.TypeCheckSuccess
          case l: Long if l > 0 && l <= Int.MaxValue => TypeCheckResult.TypeCheckSuccess
          case other => fail(s"got k = $other")
        }
      case o => fail(s"got item type $o")
    }
  }

  override def dataType: DataType = ArrayType(new StructType()
    .add("item", StringType, nullable = false)
    .add("lower_count", LongType, nullable = false), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = itemExpr.eval(input)
    // .toString COPIES out of the reused UTF8String scan buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    val rows: Array[Any] = buf.counts.toArray
      .sortBy { case (it, c) => (-c, it) }
      .map { case (it, c) => InternalRow(UTF8String.fromString(it), c): Any }
    new GenericArrayData(rows)
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF throws on items above
  // 64 KB of modified UTF-8, and a single unbroken token (a base64 blob,
  // minified JS) can exceed that — the sketch must survive it
  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (it, c) =>
      val bytes = it.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgHeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgHeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0), kExpr = newChildren(1))
}

object HeavyHitterFunctions {
  /** Column API: the Misra–Gries candidate summary for `item`, ≤ k rows. */
  def mgHeavyHitters(item: Column, k: Int): Column =
    GraftBridge.column(MgHeavyHitters(
      GraftBridge.expression(item),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())
}
