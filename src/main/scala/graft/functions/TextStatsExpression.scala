package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics (SURVEY §7.3b). The composable
  * formulation in [[graft.operators.TextOps]] re-evaluates the
  * tokenizer once per derived statistic (interpreted higher-order
  * lambdas, ~6 passes per row in q_doc_stats) and blocks whole-stage
  * codegen. This expression computes every counter in ONE scan of the
  * string and returns a struct; ratio columns become cheap codegen'd
  * arithmetic over its fields.
  *
  * Tokenization contract (must match TextOps.tokens and the DuckDB
  * oracles): tokens are maximal runs of non-`\s` characters where `\s`
  * is the ASCII regex class [ \t\n\x0B\f\r]; word chars are
  * [A-Za-z0-9_]; punct count = characters outside [A-Za-z0-9_\s];
  * bpe-ish count = word-char runs + individual punct chars; lengths
  * count Unicode code points (Spark `length` semantics).
  */
object TextStatsExpression {

  val statsType: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_bpeish", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false)))

  def textStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text), stopwords))
}

case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TextStatsExpression.statsType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires string, got ${t.catalogString}")
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val row = TextStats.compute(v.asInstanceOf[UTF8String].toString, stopSet)
    InternalRow(row(0), row(1), row(2), row(3), row(4), row(5))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val set = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, str => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.TextStats.compute($str.toString(), $set);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[] {
         |    $arr[0], $arr[1], $arr[2], $arr[3], $arr[4], $arr[5]});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextStats {
  private def isSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
      cp == '\r'
  private def isWord(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= '0' && cp <= '9') || cp == '_'

  /** One pass over the string; shared by interpreted eval and codegen.
    * Returns {n_chars, n_tokens, sum_tok_len, n_punct, n_bpeish,
    * n_stopwords} — all code-point counts.
    */
  def compute(s: String, stop: java.util.HashSet[String]): Array[Long] = {
    var nChars = 0L; var nTokens = 0L; var sumTokLen = 0L
    var nPunct = 0L; var nBpeish = 0L; var nStop = 0L
    var i = 0
    var tokenStart = -1       // char index where current token began
    var inWordRun = false
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val cw = Character.charCount(cp)
      nChars += 1
      if (isSpace(cp)) {
        if (tokenStart >= 0) {
          nTokens += 1
          if (stop.contains(s.substring(tokenStart, i))) nStop += 1
          tokenStart = -1
        }
        inWordRun = false
      } else {
        sumTokLen += 1
        if (tokenStart < 0) tokenStart = i
        if (isWord(cp)) {
          if (!inWordRun) { nBpeish += 1; inWordRun = true }
        } else {
          nPunct += 1
          nBpeish += 1     // each punct char is its own bpe-ish token
          inWordRun = false
        }
      }
      i += cw
    }
    if (tokenStart >= 0) {
      nTokens += 1
      if (stop.contains(s.substring(tokenStart, len))) nStop += 1
    }
    Array(nChars, nTokens, sumTokLen, nPunct, nBpeish, nStop)
  }
}
