package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Largest-Triangle-Three-Buckets selection (Steinarsson 2013) — THE
  * standard dashboard downsampling: keep the `buckets` visually most
  * important points of a series (first and last always; per middle
  * bucket, the point forming the largest triangle with the previously
  * SELECTED point and the next bucket's average). Sequential by
  * construction (each pick depends on the previous), so it runs as a
  * per-key fold over the sorted sample array — the
  * [[EwmaExpression]] pattern.
  *
  * Engine-replayable arithmetic: bucket membership is pure integer
  * division (`(i−1)·(B−2) / (n−2)` for middle index i), bucket
  * averages go through the exact-decimal chain (x̄ = round6(Σe / cnt)
  * with exact long sums; ȳ = round6(double(Σ round12(v)) / cnt) with
  * unscaled-long decimal sums — order-independent), and the triangle
  * area is plain IEEE double arithmetic on identical operands, so the
  * oracle's unrolled per-bucket argmax stages reproduce every
  * selection bit-for-bit. Ties break toward the lowest index.
  */
object LttbExpression {

  /** `lttbSelect(items, buckets)`: items is a SORTED
    * `array<struct<e: long, v: double>>`; returns the selected
    * 0-based indices (ascending). n ≤ buckets returns every index.
    */
  def lttbSelect(items: Column, buckets: Int): Column =
    ExpressionUtils.column(LttbSelect(
      ExpressionUtils.expression(items), buckets))

  /** Middle-index → middle-bucket map (0-based bucket of B−2). */
  def bucketOf(i: Int, n: Int, buckets: Int): Int =
    ((i - 1).toLong * (buckets - 2) / (n - 2)).toInt

  /** [[bucketOf]] for per-entity counts past Int range (the bounded
    * streaming pass's hot-entity case). Exact while
    * (i−1)·(B−2) fits a long — i.e. any realistic B for n ≤ 2⁶³⁄B.
    */
  def bucketOf(i: Long, n: Long, buckets: Int): Int =
    ((i - 1L) * (buckets - 2) / (n - 2L)).toInt

  /** Bucket anchor x̄ = round6(Σe / cnt) over `es[lo..hi]` — exact
    * long sum, shared by the array fold and [[graft.operators
    * .TimeSeries.lttb]]'s bounded streaming pass.
    */
  def xbarOf(es: Array[Long], lo: Int, hi: Int): Double = {
    var s = 0L; var j = lo
    while (j <= hi) { s += es(j); j += 1 }
    DecimalRound.fastRound(s.toDouble / (hi - lo + 1), 6)
  }

  /** Bucket anchor ȳ = round6(double(Σ round12(v)) / cnt) over
    * `vs[lo..hi]`: long unscaled-sum fast path; on overflow
    * (|v| ≳ 9.2e6 at scale 12 — routine for byte/packet counters)
    * fall back to an exact BigInteger accumulator, which is what the
    * oracle's DECIMAL(38,12) sum computes — same value, no exception.
    */
  def ybarOf(vs: Array[Double], lo: Int, hi: Int): Double = {
    val cnt = hi - lo + 1
    var s = 0L; var j = lo; var overflowed = false
    while (j <= hi && !overflowed) {
      try { s = Math.addExact(s, DecimalRound.unscaledAt(vs(j), 12)); j += 1 }
      catch { case _: ArithmeticException => overflowed = true }
    }
    val sum12 =
      if (!overflowed) new java.math.BigDecimal(
        java.math.BigInteger.valueOf(s), 12)
      else {
        var acc = java.math.BigInteger.ZERO
        var i2 = lo
        while (i2 <= hi) {
          acc = acc.add(java.math.BigDecimal.valueOf(
            DecimalRound.slowRound(vs(i2), 12))
            .setScale(12, java.math.RoundingMode.HALF_UP)
            .unscaledValue())
          i2 += 1
        }
        new java.math.BigDecimal(acc, 12)
      }
    DecimalRound.fastRound(sum12.doubleValue() / cnt, 6)
  }

  /** Index in `[lo, hi]` maximizing the triangle with the previous
    * pick `(ax, ay)` and the next anchor `(nx, ny)` — plain IEEE
    * double area, lowest-index ties. Shared with the streaming pass.
    */
  def argmaxTriangle(es: Array[Long], vs: Array[Double], lo: Int,
      hi: Int, ax: Double, ay: Double, nx: Double, ny: Double): Int = {
    var best = lo; var bestArea = -1.0
    var j = lo
    while (j <= hi) {
      val area = Math.abs(
        (ax - nx) * (vs(j) - ay) - (ax - es(j).toDouble) * (ny - ay))
      if (area > bestArea) { bestArea = area; best = j }
      j += 1
    }
    best
  }

  def select(items: ArrayData, buckets: Int): Array[Int] = {
    val n = items.numElements()
    if (n <= buckets) return Array.tabulate(n)(identity)
    val es = new Array[Long](n)
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = items.getStruct(i, 2)
      es(i) = row.getLong(0); vs(i) = row.getDouble(1)
      i += 1
    }
    val mid = buckets - 2
    // per middle bucket: [lo, hi] index ranges from the shared map
    val lo = new Array[Int](mid); val hi = new Array[Int](mid)
    java.util.Arrays.fill(lo, Int.MaxValue)
    i = 1
    while (i <= n - 2) {
      val b = bucketOf(i, n, buckets)
      if (i < lo(b)) lo(b) = i
      if (i > hi(b)) hi(b) = i
      i += 1
    }
    // bucket anchors: (x̄, ȳ) of the NEXT bucket via the exact-decimal
    // chain; the final middle bucket anchors on the last point
    val out = new Array[Int](buckets)
    out(0) = 0
    var prev = 0
    var b = 0
    while (b < mid) {
      val (nx, ny) =
        if (b == mid - 1) (es(n - 1).toDouble, vs(n - 1))
        else (xbarOf(es, lo(b + 1), hi(b + 1)),
          ybarOf(vs, lo(b + 1), hi(b + 1)))
      val best = argmaxTriangle(es, vs, lo(b), hi(b),
        es(prev).toDouble, vs(prev), nx, ny)
      out(b + 1) = best
      prev = best
      b += 1
    }
    out(buckets - 1) = n - 1
    out
  }
}

/** See [[LttbExpression]]. `array<struct<bigint, double>> -> array<int>`. */
case class LttbSelect(child: org.apache.spark.sql.catalyst.expressions.Expression,
    buckets: Int) extends UnaryExpression {

  require(buckets >= 3, "lttb needs at least 3 buckets")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(a, b)), _)
          if a.dataType == LongType && b.dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "lttb_select requires array<struct<bigint, double>>, got " +
          other.catalogString)
    }

  override def nullable: Boolean = child.nullable

  protected override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      LttbExpression.select(v.asInstanceOf[ArrayData], buckets))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sel = ctx.freshName("sel")
      s"""
         |int[] $sel = graft.functions.LttbExpression.select($c, $buckets);
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($sel);
       """.stripMargin
    })

  override def prettyName: String = "lttb_select"

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = c)
}
