package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; the
  * weighted/mergeable formulation of Agarwal et al. 2013): per
  * aggregation state at most `k` (item, count) counters. The counts
  * are LOWER BOUNDS on true frequencies with error ≤ n/(k+1) — every
  * item whose true frequency exceeds n/(k+1) is guaranteed present.
  * The deterministic, bounded-state answer to "the heavy hitters per
  * group" when the per-group vocabulary is too large to count — the
  * top-k sibling of [[graft.operators.Profiling.countMinSketch]]
  * (which answers point lookups, not enumeration).
  *
  * Scale contract: the buffer never exceeds k counters, so map-side
  * partial aggregation ships ≤k rows per group per task no matter how
  * many distinct values a partition saw — the same O(k)-state promise
  * as [[TopKByScore]], where a naive `groupBy(group, value).count`
  * followed by a rank window would exchange the full per-group
  * vocabulary. When the TOTAL distinct count per group is ≤ k no
  * counter is ever evicted and the summary is EXACT (counts equal the
  * true frequencies) regardless of partitioning or merge order —
  * the regime the DuckDB oracle pins (the headVocab convention);
  * beyond it the summary is order-dependent like every MG instance,
  * and correctness is the bound above (property-spec-pinned).
  */
object FreqItemsExpression {

  /** `freqItems(value, k)`: aggregate a string column into
    * `array<struct<item string, cnt bigint>>`, sorted cnt-descending
    * (ties by ascending item for determinism).
    */
  def freqItems(value: Column, k: Int): Column =
    ExpressionUtils.column(MisraGriesFreqItems(
      ExpressionUtils.expression(value), k).toAggregateExpression())
}

case class MisraGriesFreqItems(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freqItems requires a string item, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    // UTF8String may alias a reused row buffer; toString copies
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    b.foreach((item, c) => a.add(item, c)); a
  }

  override def eval(buf: MGBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })

  override def serialize(buf: MGBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MGBuffer =
    MGBuffer.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesFreqItems =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesFreqItems =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** ≤k counters; weighted add doubles as the merge primitive. */
final class MGBuffer(k: Int) {
  private val m = scala.collection.mutable.HashMap.empty[String, Long]

  /** Insert `c` occurrences of `item`. If that grows the map past k,
    * subtract the (k+1)-th-largest count — with size k+1 that is the
    * minimum — from every counter and drop the non-positive ones
    * (at least the minimum itself dies, restoring size ≤ k). Each
    * subtraction event removes ≥ d·(k+1) total weight, so the sum of
    * all subtractions is ≤ n/(k+1): the classic error bound.
    */
  def add(item: String, c: Long): Unit = {
    m.update(item, m.getOrElse(item, 0L) + c)
    if (m.size > k) {
      val d = m.valuesIterator.min
      // equivalent to "subtract d everywhere, drop ≤0": everything
      // with cnt ≤ d dies (the minimum itself always does, restoring
      // size ≤ k), survivors carry cnt − d
      m.filterInPlace((_, cnt) => cnt > d)
      m.mapValuesInPlace((_, cnt) => cnt - d)
    }
  }

  def foreach(f: (String, Long) => Unit): Unit =
    m.foreach { case (item, c) => f(item, c) }

  def sortedDesc: Array[(String, Long)] =
    m.toArray.sortBy { case (item, c) => (-c, item) }

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (item, c) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }
}

object MGBuffer {
  def deserialize(bytes: Array[Byte], k: Int): MGBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new MGBuffer(k)
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong()
      buf.add(new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
    }
    buf
  }
}
