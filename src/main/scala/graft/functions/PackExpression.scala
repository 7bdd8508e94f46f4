package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Sequence packing (SURVEY §2.10 extension): assign an ORDERED list
  * of item weights (token counts) to consecutive fixed-capacity bins —
  * the packing step that turns a curated corpus into training context
  * windows. Next-fit, the deterministic streaming rule: a bin closes
  * the moment an item does not fit; an oversized item occupies a bin
  * alone. One linear fold per list, fused into codegen — the
  * `aggregate()` HOF formulation evaluates an interpreted lambda per
  * element with an array-building accumulator (quadratic copying).
  */
object PackExpression {

  /** `nextFitPack(weights, capacity)`: array<long> of bin ids (0-based,
    * monotone non-decreasing), same length as `weights`. Null or
    * non-positive weights count as weight 1 (a document never vanishes
    * from the pack — the curation gates upstream own dropping).
    */
  def nextFitPack(weights: Column, capacity: Long): Column =
    ColumnBridge.column(NextFitPack(ColumnBridge.expression(weights),
      capacity))
}

case class NextFitPack(child: Expression, capacity: Long)
    extends UnaryExpression {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"next_fit_pack requires array<bigint|int>, got ${t.catalogString}")
  }

  private def isInt: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    new GenericArrayData(NextFitPack.compute(
      Array.tabulate(arr.numElements()) { i =>
        if (arr.isNullAt(i)) 1L
        else if (isInt) arr.getInt(i).toLong else arr.getLong(i)
      }, capacity))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val get = if (isInt) s"(long) $arr.getInt($i)" else s"$arr.getLong($i)"
      s"""
         |long[] $w = new long[$arr.numElements()];
         |for (int $i = 0; $i < $w.length; $i++) {
         |  $w[$i] = $arr.isNullAt($i) ? 1L : ($get);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.NextFitPack.compute($w, ${capacity}L));
       """.stripMargin
    })

  override def prettyName: String = "next_fit_pack"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NextFitPack {
  /** Shared by interpreted and codegen paths — the single definition
    * of the packing rule.
    */
  def compute(weights: Array[Long], capacity: Long): Array[Long] = {
    val bins = new Array[Long](weights.length)
    var bin = 0L
    var fill = 0L
    var i = 0
    while (i < weights.length) {
      val w = math.max(weights(i), 1L)
      if (fill > 0 && fill + w > capacity) { bin += 1; fill = 0L }
      bins(i) = bin
      fill += w
      i += 1
    }
    bins
  }
}
