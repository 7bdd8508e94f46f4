package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch — the
  * map-side prefilter of the scale-path decontamination pipeline
  * (SURVEY §2.10). Mirrors the shape of Spark's own runtime row-level
  * filtering (`BloomFilterMightContain`, which is `private[sql]` and
  * expects the sketch as a plan-time subquery): the sketch travels as
  * a serialized reference object inside the task closure — broadcast
  * once per executor, never inlined into the plan as a literal — and
  * the probe compiles into the scan's codegen stage, so a 100 TB corpus
  * pays one hash-and-test per value with zero exchange before the
  * filter.
  *
  * False positives pass (by construction of the sketch); false
  * negatives cannot occur. Callers that need exact semantics re-verify
  * the survivors against the real set — see
  * `Dedup.contaminationReportBloom`.
  */
object BloomExpression {

  /** `might_contain(col)`: true iff the sketch MAY contain the value.
    * String values probe by their UTF-8 bytes (identical to how
    * `DataFrameStatFunctions.bloomFilter` inserted them); longs by
    * value.
    */
  def mightContain(c: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bloom))
}

case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires string or bigint, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    // UTF8String.getBytes probes without materializing a java.lang.String:
    // BloomFilter hashes the UTF-8 bytes either way
    case StringType => bloom.mightContainBinary(
      v.asInstanceOf[UTF8String].getBytes)
    case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
    case _ => null
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev,
        c => s"$bf.mightContainBinary($c.getBytes())")
      case _ => defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
    }
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
