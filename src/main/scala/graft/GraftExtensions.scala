package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions._

/** SQL surface for the custom Catalyst expressions (SURVEY §2.8): an
  * extensions installer so `spark.sql("SELECT graft_cosine(a, b) ...")`
  * works anywhere the Column API does — the standard way a library
  * ships engine extensions:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * `GraftExtensions.install(spark)` registers the same functions on an
  * already-running session.
  *
  * Literal-typed parameters (hash counts, plane counts, shingle k) are
  * extracted at resolution time and validated — a non-literal argument
  * fails analysis, not execution.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftExtensions.info(name, usage), builder))
    }
    // whole-plan tier: the binned range-join rewrite (inert until
    // spark.graft.rangeJoin.binWidth is set)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // and its overlap-join sibling (inert until
    // spark.graft.overlapJoin.binWidth is set); runs after the range
    // rule, whose __graft taint it respects
    ext.injectOptimizerRule(_ => graft.plans.IntervalOverlapRewrite)
    // bit-identical Round fast path (on by default;
    // spark.graft.fastRound.enabled=false to disable)
    ext.injectOptimizerRule(_ => graft.plans.FastRoundRewrite)
  }
}

object GraftExtensions {

  /** Register every graft SQL function on a live session. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      ColumnBridge.registerFunction(spark, FunctionIdentifier(name),
        info(name, usage), builder)
    }

  private def info(name: String, usage: String): ExpressionInfo =
    // the full 11-arg constructor — the 5-arg shorthand is deprecated
    new ExpressionInfo("graft.functions", null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def expect(args: Seq[Expression], n: Int, name: String): Unit =
    require(args.length == n,
      s"$name expects $n arguments, got ${args.length}")

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got ${other.sql}")
  }

  /** (name, usage, builder) for every exposed function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", "cosine similarity of two float/double arrays",
      (args: Seq[Expression]) => { expect(args, 2, "graft_cosine")
        CosineSimilarity(args(0), args(1)) }),
    ("graft_minhash", "minhash signature: (shingle array, numHashes)",
      (args: Seq[Expression]) => { expect(args, 2, "graft_minhash")
        MinHashSignature(args(0), intLit(args(1), "numHashes")) }),
    ("graft_simhash64", "64-bit simhash of a token array",
      (args: Seq[Expression]) => { expect(args, 1, "graft_simhash64")
        SimHash64(args(0)) }),
    ("graft_shingles", "word k-grams: (text, k)",
      (args: Seq[Expression]) => { expect(args, 2, "graft_shingles")
        Shingles(args(0), intLit(args(1), "k")) }),
    ("graft_lsh_bucket",
      "hyperplane LSH bucket: (vector, planes[, planeOffset])",
      (args: Seq[Expression]) => args.length match {
        case 2 => RademacherLsh(args(0), intLit(args(1), "planes"))
        case 3 => RademacherLsh(args(0), intLit(args(1), "planes"),
          intLit(args(2), "planeOffset"))
        case n => throw new IllegalArgumentException(
          s"graft_lsh_bucket expects 2 or 3 arguments, got $n")
      }),
    ("graft_nfc_normalize", "Unicode NFC canonical normalization",
      (args: Seq[Expression]) => { expect(args, 1, "graft_nfc_normalize")
        NfcNormalize(args(0)) }),
    ("graft_pq_sq_dist",
      "exact decimal(28,12) squared L2 of two float/double arrays " +
        "(the PQ distance kernel)",
      (args: Seq[Expression]) => { expect(args, 2, "graft_pq_sq_dist")
        PqSqDist(args(0), args(1)) }),
    ("graft_pq_dot",
      "exact decimal(28,12) dot product of two float/double arrays " +
        "(the cosine kernel over pre-normalized vectors)",
      (args: Seq[Expression]) => { expect(args, 2, "graft_pq_dot")
        PqDot(args(0), args(1)) }),
    ("graft_text_stats",
      "single-pass text statistics struct (english stopword profile)",
      (args: Seq[Expression]) => { expect(args, 1, "graft_text_stats")
        TextStats(args(0), graft.operators.TextOps.langProfiles("en")) }),
    ("graft_lang_id", "language-ID over the built-in profiles",
      (args: Seq[Expression]) => { expect(args, 1, "graft_lang_id")
        LangIdExpression.expr(args(0),
          graft.operators.TextOps.langProfiles) }),
    ("graft_cdc_starts",
      "content-defined chunk start positions: (text, window, divisor)",
      (args: Seq[Expression]) => { expect(args, 3, "graft_cdc_starts")
        CdcStarts(args(0), intLit(args(1), "window"),
          intLit(args(2), "divisor")) }),
    ("graft_random_projection",
      "JL +-1 projection to array<float>: (vector, dimIn, dimOut)",
      (args: Seq[Expression]) => { expect(args, 3, "graft_random_projection")
        RandomProjection(args(0), intLit(args(1), "dimIn"),
          intLit(args(2), "dimOut")) }),
    ("graft_freq_items",
      "Misra-Gries frequent-items aggregate on <=k counters: " +
        "(value, k) -> array<struct<item string, cnt bigint>>",
      (args: Seq[Expression]) => { expect(args, 2, "graft_freq_items")
        MisraGriesFreqItems(args(0), intLit(args(1), "k")) }),
    ("graft_phrase_merge",
      "frozen-phrase-table merge fold over a token array: " +
        "(tokens, 'a b,c d' pair list) -> array<string>",
      (args: Seq[Expression]) => { expect(args, 2, "graft_phrase_merge")
        val spec = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            "graft_phrase_merge phrase table must be a string literal " +
              s"like 'new york,machine learning', got ${other.sql}")
        }
        val phrases = spec.split(",").toSeq.map(_.trim.split("\\s+"))
          .map { p =>
            require(p.length == 2,
              s"each phrase must be two tokens, got '${p.mkString(" ")}'")
            (p(0), p(1))
          }
        PhraseMerge(args(0), phrases.toArray) })
  )
}
