package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused codegen expressions for the text-dedup hot path (SURVEY
  * §7.3b). The built-in formulation (`transform`/`aggregate` lambdas)
  * evaluates interpreted per element × per permutation; these fuse the
  * whole signature computation into one loop per row: hash each element
  * once (XXH64), then derive all permutations with multiply-shift
  * universal hashing. At 100 TB this is the difference between
  * signature computation at scan speed and it dominating the job.
  */
object TextExpressions {

  /** `minhash_signature(shingles, n)`: array<long> of n permutation
    * minima over the shingle set.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(shingles), numHashes))

  /** `simhash64(tokens)`: 64-bit SimHash of the token multiset. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** `shingles(text, k)`: word k-grams in one fused pass. */
  def shingles(text: Column, k: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(text), k))

  /** `nfc_normalize(text)`: Unicode NFC canonical composition. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}

/** `string -> string`: Unicode NFC canonical normalization (composed
  * forms — 'e' + COMBINING ACUTE → 'é'). The curation prerequisite
  * for any text dedup/fingerprint: visually identical strings with
  * different codepoint sequences must hash identically, or a crawl
  * mixing composed and decomposed producers defeats exact dedup. Both
  * the JDK (`java.text.Normalizer`) and DuckDB (`nfc_normalize`)
  * implement the same Unicode conformance clause, so the operator
  * oracles exactly. Skips the (cheap, allocation-free) fast path when
  * the string is already NFC — the overwhelmingly common case for
  * web text.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      NfcNormalize.nfc(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NfcNormalize.nfc($str.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}

/** `string -> array<string>`: whitespace-tokenize and emit k-token
  * shingles joined by single spaces, in one pass. Fewer than k tokens
  * ⇒ one shingle of all tokens (the whole normalized text), matching
  * the composable TextOps semantics. The transform/slice/concat_ws
  * formulation evaluated interpreted lambdas per window and dominated
  * the near-dup pipeline (~0.8 ms/doc); this is a linear scan.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Shingles.compute(v.asInstanceOf[UTF8String].toString, k)
        .map(UTF8String.fromString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $out =
         |  graft.functions.Shingles.computeUtf8($str.toString(), $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Shingles {
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  def compute(s: String, k: Int): Array[String] = {
    // collect token boundaries in one scan
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0; var inTok = false
    while (i < s.length) {
      if (isSpace(s.charAt(i))) {
        if (inTok) { ends.add(i); inTok = false }
      } else if (!inTok) { starts.add(i); inTok = true }
      i += 1
    }
    if (inTok) ends.add(s.length)
    val n = starts.size()
    val sb = new java.lang.StringBuilder()
    if (n == 0) return Array("")
    if (n < k) {
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(s, starts.get(t), ends.get(t)); t += 1
      }
      return Array(sb.toString)
    }
    val out = new Array[String](n - k + 1)
    var w = 0
    while (w <= n - k) {
      sb.setLength(0)
      var t = w
      while (t < w + k) {
        if (t > w) sb.append(' ')
        sb.append(s, starts.get(t), ends.get(t)); t += 1
      }
      out(w) = sb.toString
      w += 1
    }
    out
  }

  def computeUtf8(s: String, k: Int): Array[UTF8String] =
    compute(s, k).map(UTF8String.fromString)
}

object HashCoefficients {
  /** splitmix64 — the one copy of the mixing constants; deterministic
    * coefficients/directions for MinHash permutations and LSH planes
    * are derived from it on every executor.
    */
  def splitmix64(seed0: Long): Long = {
    var z = seed0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def multipliers(n: Int): Array[Long] =
    Array.tabulate(n)(i => splitmix64(2L * i) | 1L) // odd => bijective
  def addends(n: Int): Array[Long] =
    Array.tabulate(n)(i => splitmix64(2L * i + 1))
}

/** `array<string> -> array<long>`: MinHash signature. Each element is
  * hashed once with XXH64; permutation i is `h * A(i) + B(i)` (odd
  * multiplier ⇒ bijection on Z/2^64), minimum taken per permutation.
  * Null elements are skipped; an empty/all-null array yields
  * Long.MaxValue sentinels (matches "no shingles" semantics).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val mulCoef = HashCoefficients.multipliers(numHashes)
  @transient private lazy val addCoef = HashCoefficients.addends(numHashes)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < numHashes) {
          val g = h * mulCoef(j) + addCoef(j)
          if (g < sig(j)) sig(j) = g
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mul = ctx.addReferenceObj("mulCoef", mulCoef, "long[]")
    val add = ctx.addReferenceObj("addCoef", addCoef, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val g = ctx.freshName("g"); val n = ctx.freshName("n")
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($arr.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $g = $h * $mul[$j] + $add[$j];
         |      if ($g < $sig[$j]) $sig[$j] = $g;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `array<string> -> long`: 64-bit SimHash. Token hash once via XXH64;
  * each of the 64 bit planes accumulates ±1; sign of the plane total
  * sets the output bit. Null tokens skipped.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val planes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          planes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (planes(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planes = ctx.freshName("planes"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int[] $planes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($arr.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $planes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($planes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
