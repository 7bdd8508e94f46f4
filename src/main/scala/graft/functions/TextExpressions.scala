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

  /** `cdc_starts(text, window, divisor)`: content-defined chunk start
    * positions (1-based, leading 1 included) in one fused pass — md5
    * per window position in a tight loop with a reused digest, where
    * the built-in formulation pays an interpreted
    * conv(substring(md5(substr)))-chain per (row, position) (measured
    * 56 s for the sf0.1 corpus; the kernel is bounded by raw md5
    * throughput).
    */
  def cdcStarts(text: Column, window: Int, divisor: Int): Column =
    ColumnBridge.column(CdcStarts(ColumnBridge.expression(text),
      window, divisor))

  /** `cdc_chunk_rows(text, window, divisor)`: the fully fused chunk
    * table — boundary scan + per-chunk md5 in one pass.
    */
  def cdcChunkRows(text: Column, window: Int, divisor: Int): Column =
    ColumnBridge.column(CdcChunkRows(ColumnBridge.expression(text),
      window, divisor))

  /** `bpe_encode(word)` against a frozen merges list: BPE subword
    * tokens of one word, greedy left-to-right per merge in rank
    * order.
    */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(word),
      merges.toArray))

  /** `phrase_merge(tokens)` against a frozen phrase table: (a, b) →
    * `a_b`, greedy leftmost per merge in list order — see
    * [[PhraseMerge]].
    */
  def phraseMerge(toks: Column, phrases: Seq[(String, String)]): Column =
    ColumnBridge.column(PhraseMerge(ColumnBridge.expression(toks),
      phrases.toArray))
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

/** `string -> array<int>`: content-defined chunk starts — 1, plus
  * every character position i ∈ [2, n−window+1] where the leading 32
  * md5 bits of the window's UTF-8 bytes are ≡ 0 mod `divisor`.
  * Bit-identical to the built-in
  * `conv(substring(md5(text.substr(i, window)), 1, 8), 16, 10) %
  * divisor === 0` scan (differential spec-pinned): positions count
  * CHARACTERS (the `substr` contract), hashing covers the
  * corresponding UTF-8 byte span, computed here over one char-offset
  * table and a reused digest instead of an interpreted
  * expression-chain per position.
  */
case class CdcStarts(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")
  require(divisor > 0, "divisor must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_starts requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    CdcStarts.starts(v.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = graft.functions.CdcStarts.starts(
         |  $str, $window, $divisor);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CdcStarts {
  /** Char-start byte offsets (index c → byte offset of char c; the
    * n-th entry is the total byte length), so multi-byte text hashes
    * the same byte spans substr() would produce.
    */
  private def charOffsets(bytes: Array[Byte], n: Int): Array[Int] = {
    val offs = new Array[Int](n + 1)
    var b = 0; var c = 0
    while (c < n) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(n) = bytes.length
    offs
  }

  private def startPositions(bytes: Array[Byte], offs: Array[Int],
      n: Int, window: Int, divisor: Int): Array[Int] = {
    val last = n - window + 1
    if (last < 2) return Array(1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new scala.collection.mutable.ArrayBuffer[Int](16)
    out += 1
    var i = 2
    while (i <= last) {
      val from = offs(i - 1)
      md.update(bytes, from, offs(i - 1 + window) - from)
      val d = md.digest()
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (v % divisor == 0) out += i
      i += 1
    }
    out.toArray
  }

  def starts(s: UTF8String, window: Int, divisor: Int): ArrayData = {
    val bytes = s.getBytes
    val n = s.numChars()
    new GenericArrayData(
      startPositions(bytes, charOffsets(bytes, n), n, window, divisor))
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** The whole chunk table for one document: (chunk_no, start,
    * chunk_len, chunk_md5) rows — boundary scan AND per-chunk md5 in
    * the same pass over the same offset table (one digest reused).
    */
  def chunks(s: UTF8String, window: Int, divisor: Int): ArrayData = {
    val bytes = s.getBytes
    val n = s.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val offs = charOffsets(bytes, n)
    val st = startPositions(bytes, offs, n, window, divisor)
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = new Array[Any](st.length)
    var k = 0
    while (k < st.length) {
      val start = st(k)
      val end = if (k + 1 < st.length) st(k + 1) else n + 1
      val fromB = offs(start - 1)
      md.update(bytes, fromB, offs(end - 1) - fromB)
      val d = md.digest()
      val hex = new Array[Char](32)
      var h = 0
      while (h < 16) {
        hex(2 * h) = HEX((d(h) >> 4) & 0xf)
        hex(2 * h + 1) = HEX(d(h) & 0xf)
        h += 1
      }
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(
        k, start, end - start, UTF8String.fromString(new String(hex)))
      k += 1
    }
    new GenericArrayData(rows)
  }
}

/** `string -> array<struct<chunk_no:int, start:int, chunk_len:int,
  * chunk_md5:string>>`: the fully fused CDC chunk table —
  * [[CdcStarts]]'s boundary scan plus the per-chunk md5 in one pass
  * (the composed starts+substr+md5 formulation re-evaluates the
  * boundary scan wherever the starts array is referenced and pays an
  * interpreted md5/substr per chunk; differential spec pins
  * bit-equality). Empty string → empty array.
  */
case class CdcChunkRows(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")
  require(divisor > 0, "divisor must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_no", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("chunk_len", IntegerType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    CdcStarts.chunks(v.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = graft.functions.CdcStarts.chunks(
         |  $str, $window, $divisor);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `string -> array<string>`: BPE-encode one WORD against a frozen
  * merges list (rank order = list order): symbols start as the word's
  * codepoints plus the `</w>` end marker; each merge (a, b) rewrites
  * all leftmost-non-overlapping adjacent (a, b) occurrences to the
  * fused symbol `ab` — the canonical greedy fold every reference BPE
  * implementation uses. Merges with a == b are rejected at
  * construction: excluding self-pairs makes one merge's application
  * ORDER-FREE across the word (no overlap chains), which is what lets
  * the oracle replay each merge as an index-local list rewrite. The
  * merges array is a reference object (one copy per plan, the
  * [[CentroidTopIds]] policy); the per-word fold is a tight JVM loop
  * where the equivalent HOF chain would nest 3 self-references per
  * stage (differential spec pins the equivalence on the corpus
  * vocabulary).
  */
case class BpeEncode(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "merges must be non-empty")
  require(merges.forall { case (a, b) => a != b },
    "self-merges (a == b) are not supported (order-free application)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    BpeEncode.encode(v.asInstanceOf[UTF8String].toString, merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges,
      "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = graft.functions.BpeEncode.encode(
         |  $str.toString(), (scala.Tuple2[]) $m);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncode {
  val EndMarker = "</w>"

  def encode(word: String, merges: Array[(String, String)]): ArrayData = {
    // codepoint symbols + end marker
    var syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    syms.add(EndMarker)
    var mi = 0
    while (mi < merges.length && syms.size > 1) {
      val a = merges(mi)._1; val b = merges(mi)._2; val ab = a + b
      val next = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          next.add(ab); j += 2
        } else { next.add(syms.get(j)); j += 1 }
      }
      syms = next
      mi += 1
    }
    val out = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) {
      out(k) = UTF8String.fromString(syms.get(k)); k += 1
    }
    new GenericArrayData(out)
  }
}

/** Frozen-phrase-table serving fold: apply each (a, b) → `a_b` merge
  * in list order, greedy leftmost-non-overlapping per merge — the
  * word2phrase serving kernel. One native loop; the per-merge HOF
  * formulation ([[graft.operators.TextOps.applyPhraseMerge]],
  * differentially spec-pinned) references its input three times per
  * merge, so folding k merges as nested lambdas builds a 3^k
  * expression tree — 6 phrases already exceed the analyzer's
  * iteration budget. Phrase list rides as a reference object.
  */
case class PhraseMerge(child: Expression, phrases: Array[(String, String)])
    extends UnaryExpression {

  require(phrases.nonEmpty, "phrases must be non-empty")
  require(phrases.forall { case (a, b) => a != b },
    "self-merges (a == b) are not order-free")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"phrase_merge requires array<string>, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PhraseMerge.merge(v.asInstanceOf[ArrayData], phrases)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("phraseTable", phrases, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val tmp = ctx.freshName("merged")
      s"""
         |Object $tmp = graft.functions.PhraseMerge.merge(
         |  $arr, (scala.Tuple2[]) $p);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PhraseMerge {
  def merge(toks: ArrayData, phrases: Array[(String, String)]): Any = {
    val n = toks.numElements()
    var syms = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      syms.add(toks.getUTF8String(i).toString)
      i += 1
    }
    var mi = 0
    while (mi < phrases.length && syms.size > 1) {
      val a = phrases(mi)._1; val b = phrases(mi)._2
      val ab = a + "_" + b
      val next = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          next.add(ab); j += 2
        } else { next.add(syms.get(j)); j += 1 }
      }
      syms = next
      mi += 1
    }
    val out = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) {
      out(k) = UTF8String.fromString(syms.get(k)); k += 1
    }
    new GenericArrayData(out)
  }
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
