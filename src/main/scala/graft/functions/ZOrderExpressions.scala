package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen Morton (Z-order) key expressions.
  *
  * The Column-algebra formulation of bit interleaving is a correctness
  * trap at codegen time: the magic-numbers ladder references its
  * accumulator twice per rung, so the expression TREE doubles per rung
  * (2^5 copies of the input), and `CollapseProject` then inlines the
  * whole interleave into every leaf of any downstream expression that
  * consumes the key — the round-trip test's extract-and-compare filter
  * expanded to a 15k-line generated method that overflowed Janino.
  * A native expression binds each rung to a Java local, so the
  * generated code is a constant ~14 statements no matter how the key
  * is consumed. Interpreted eval shares the same static compute
  * methods, so both paths are bit-identical.
  */
object ZOrderExpressions {

  /** Interleave the low `bits` bits of x (even positions) and y (odd). */
  def mortonInterleave(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(MortonInterleave(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** Recover lane 0 (x, even bits) or lane 1 (y, odd bits) of a key. */
  def mortonExtract(z: Column, lane: Int): Column =
    ColumnBridge.column(MortonExtract(ColumnBridge.expression(z), lane))

  /** Spread the low `bits` bits of v to even bit positions:
    * 0b...dcba -> 0b...0d0c0b0a. Shared by eval and the generated code.
    */
  def spread(v: Long, bits: Int): Long = {
    var x = v & ((1L << bits) - 1L)
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long, bits: Int): Long =
    spread(x, bits) + (spread(y, bits) << 1)

  /** Compact the even bits of v: inverse of [[spread]]. */
  def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  def extract(z: Long, lane: Int): Long = compact(z >>> lane)
}

/** `morton_interleave(x, y, bits)`: 2-D Z-order key as a long.
  * Semantics pinned bit-for-bit to the arithmetic formulation the
  * DuckDB oracle replays (sum of shifted bit terms); the even/odd
  * lanes are disjoint so the ladder's or-accumulation equals that sum.
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"morton_interleave requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderExpressions.interleave(
      x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"${ev.value} = graft.functions.ZOrderExpressions.interleave($x, $y, $bits);"
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `morton_extract(z, lane)`: one coordinate back out of a Z-order key. */
case class MortonExtract(child: Expression, lane: Int)
    extends UnaryExpression {

  require(lane == 0 || lane == 1, "lane must be 0 (x) or 1 (y)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"morton_extract requires bigint, got ${t.catalogString}")
  }

  override def nullSafeEval(z: Any): Any =
    ZOrderExpressions.extract(z.asInstanceOf[Long], lane)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, z => {
      s"${ev.value} = graft.functions.ZOrderExpressions.extract($z, $lane);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
