package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID (SURVEY §2.10). The composable formulation —
  * `array_max` over per-profile `stopwordRatio` chains — re-tokenizes
  * the text once per language with interpreted higher-order lambdas
  * (~25× slower under forced evaluation). This expression tokenizes
  * ONCE and scores every profile in the same pass, with the profile
  * word sets attached as reference objects.
  *
  * Scoring contract (must match `TextOps.langScore` and the DuckDB
  * oracle): non-zh profiles score `tokens ∈ profile / tokens` over the
  * `\s`-run tokenizer; the "zh" profile scores
  * `contained profile chars / profile size`. Winner = max score, ties
  * to the lexicographically largest language; all-zero ⇒ "und".
  */
object LangIdExpression {
  def langId(text: Column, profiles: Map[String, Seq[String]]): Column =
    ColumnBridge.column(expr(ColumnBridge.expression(text), profiles))

  /** The single place the lang-ascending profile normalization lives —
    * the tie-break contract depends on it, so every construction path
    * (Column API, SQL registration) must go through here.
    */
  def expr(child: Expression,
      profiles: Map[String, Seq[String]]): Expression =
    LangIdExpr(child,
      profiles.toSeq.sortBy(_._1).map { case (l, ws) => (l, ws.toVector) })
}

case class LangIdExpr(child: Expression,
    profiles: Seq[(String, Seq[String])]) extends UnaryExpression {

  require(profiles.nonEmpty, "langId requires at least one profile")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires string, got ${t.catalogString}")
  }

  @transient private lazy val compiled: Array[LangIdProfile] =
    LangIdProfiles.build(profiles)

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      LangIdProfiles.compute(v.asInstanceOf[UTF8String].toString, compiled))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("langProfiles", compiled,
      "graft.functions.LangIdProfile[]")
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.LangIdProfiles.compute($str.toString(), $ps));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One compiled profile: hash set for token membership (non-zh) or
  * the raw word list for containment scoring (zh). Top-level class so
  * generated Java can name its array type directly.
  */
final class LangIdProfile(val lang: String, val containment: Boolean,
    val set: java.util.HashSet[String], val words: Array[String])
    extends Serializable

object LangIdProfiles {
  /** `profiles` must be sorted ascending by language — the tie-break
    * (largest language wins) relies on iteration order.
    */
  def build(profiles: Seq[(String, Seq[String])]): Array[LangIdProfile] =
    profiles.map { case (l, ws) =>
      val set = new java.util.HashSet[String]()
      ws.foreach(set.add)
      new LangIdProfile(l, l == "zh", set, ws.toArray)
    }.toArray

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  def compute(s: String, ps: Array[LangIdProfile]): String = {
    // single tokenizer pass scoring every set-based profile
    var nTokens = 0
    val hits = new Array[Int](ps.length)
    val len = s.length
    var i = 0
    var tokenStart = -1
    while (i <= len) {
      if (i == len || isSpace(s.charAt(i))) {
        if (tokenStart >= 0) {
          val tok = s.substring(tokenStart, i)
          nTokens += 1
          var p = 0
          while (p < ps.length) {
            if (!ps(p).containment && ps(p).set.contains(tok)) hits(p) += 1
            p += 1
          }
          tokenStart = -1
        }
      } else if (tokenStart < 0) tokenStart = i
      i += 1
    }
    var bestScore = 0.0
    var bestLang: String = null
    var p = 0
    while (p < ps.length) {
      val pr = ps(p)
      val score =
        if (pr.containment) {
          var h = 0; var w = 0
          while (w < pr.words.length) {
            if (s.contains(pr.words(w))) h += 1
            w += 1
          }
          h.toDouble / pr.words.length
        } else if (nTokens == 0) 0.0
        else hits(p).toDouble / nTokens
      // profiles are lang-ascending, so >= leaves the largest language
      // holding a tied score — identical to max over (score, lang)
      if (bestLang == null || score >= bestScore) {
        bestScore = score; bestLang = pr.lang
      }
      p += 1
    }
    if (bestScore > 0) bestLang else "und"
  }
}
