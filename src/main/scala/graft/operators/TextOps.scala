package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY §2.10): tokenization, token/char statistics, quality
  * scoring, language identification, document fingerprinting.
  *
  * Everything is pure Catalyst column expressions (split / higher-order
  * array functions / regexp), so the whole surface stays inside
  * whole-stage codegen and scales embarrassingly-parallel: no shuffle,
  * no UDF, no driver involvement — at 100 TB these run at scan
  * throughput.
  */
object TextOps {

  /** Whitespace tokenizer. `split` with a regex delimiter; trailing
    * empty strings removed so `"a b " → [a, b]`.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-budget estimate: word tokens plus punctuation
    * marks counted separately (`\w+` runs and single non-space
    * non-word chars), the shape a byte-pair tokenizer's pre-tokenizer
    * uses. Pure regexp — no tokenizer library needed for budgeting.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Punctuation character ratio over total characters (0 when empty). */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[A-Za-z0-9_\\s]+", ""))
    when(length(text) === 0, 0.0)
      .otherwise(punct.cast("double") / length(text))
  }

  /** Ratio of tokens that appear in `stopwords` (0 when no tokens). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double")
        / size(toks))
  }

  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
  }

  /** Composite quality score in [0,1]: length band + stopword presence
    * + low punctuation + sane mean token length. The weights are the
    * usual heuristic-filter shape (C4/Gopher-style rules) expressed as
    * one codegen'd expression.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text)
    val lengthOk = when(nTok.between(50, 100000), 1.0)
      .when(nTok.between(10, 49), 0.5).otherwise(0.0)
    val swOk = when(stopwordRatio(text, stopwords) > 0.05, 1.0)
      .otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val mtl = meanTokenLength(text)
    val mtlOk = when(mtl.between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lengthOk + swOk + punctOk + mtlOk) / 4.0, 4)
  }

  /** Per-language stopword profiles for the language-ID heuristic.
    * Small closed-class word lists — the standard cheap signal.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it",
      "was", "for", "with", "are", "this", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von",
      "mit", "ein", "eine", "zu", "den", "auf", "für"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en",
      "un", "una", "es", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "que", "dans",
      "un", "une", "du", "pour", "sur", "pas"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这",
      "中", "大", "来", "上", "国", "个"))

  /** Score of one language profile against a text: fraction of tokens
    * that are members of that profile (zh falls back to character
    * containment since it doesn't whitespace-tokenize).
    */
  def langScore(text: Column, lang: String): Column =
    if (lang == "zh") {
      val hits = langProfiles(lang)
        .map(w => when(text.contains(w), 1).otherwise(0))
        .reduce(_ + _)
      hits.cast("double") / langProfiles(lang).size
    } else stopwordRatio(text, langProfiles(lang))

  /** Language-ID: argmax over profile scores; "und" (undetermined) when
    * every score is 0. Fused single-pass codegen expression
    * ([[graft.functions.LangIdExpression]]); [[langIdBuiltin]] is the
    * composable reference formulation kept for differential testing.
    */
  def langId(text: Column): Column =
    graft.functions.LangIdExpression.langId(text, langProfiles)

  /** Reference langId via composable built-ins — interpreted HOF chain
    * re-tokenizing per profile; used as the differential check for the
    * fused expression.
    */
  def langIdBuiltin(text: Column): Column = {
    val scored = langProfiles.keys.toSeq.sorted.map(l =>
      struct(langScore(text, l).as("score"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise("und")
  }

  /** C4-style text normalization: control characters → space,
    * whitespace runs collapsed, trimmed. Pure codegen'd regexp — the
    * cleaning pass runs at scan throughput; engine-portable semantics
    * (ASCII control class, `\s` runs) so it oracles exactly.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\p{Cntrl}]", " "), "\\s+", " "))

  /** Unicode NFC canonical normalization — the dedup prerequisite for
    * crawls mixing composed and decomposed producers (visually equal
    * strings must hash equal). Fused codegen expression with an
    * already-normalized fast path; Unicode-conformant on both engines
    * so it oracles exactly ([[graft.functions.NfcNormalize]]).
    */
  def normalizeNfc(text: Column): Column =
    graft.functions.TextExpressions.nfcNormalize(text)

  /** k-shingles (word n-grams): the standard unit for near-dup
    * detection. Fused single-pass codegen expression
    * ([[graft.functions.Shingles]]) — the composable
    * transform/slice/concat_ws form ran interpreted per window.
    */
  def shingles(text: Column, k: Int): Column =
    graft.functions.TextExpressions.shingles(text, k)

  /** PII patterns used by [[redactPii]]/[[piiCounts]], applied in this
    * order (email before phone/IP so the user\@host digits aren't
    * re-matched). Each regex restricts itself to constructs with
    * identical semantics in Java regex and RE2 (no lookaround, no
    * backreferences), so redaction is engine-portable and
    * oracle-checkable.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>")

  /** PII redaction: emails, IPv4s, SSN-shaped and phone-shaped digit
    * runs replaced by typed placeholder tags. A chain of codegen'd
    * `regexp_replace` passes — map-side only, runs at scan throughput;
    * the standard pre-training scrub step.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** Luhn sum of a digit string — position 1 = RIGHTMOST digit,
    * odd positions taken as-is, even positions doubled with the
    * classic 9-subtraction. Pure integer HOF arithmetic, identical
    * in any engine (no `luhn_check` builtin dependency, so the
    * oracle replays it digit for digit).
    */
  def luhnSum(digits: Column): Column =
    aggregate(sequence(lit(1), length(digits)), lit(0L), (acc, i) => {
      val d = (ascii(substring(reverse(digits), i, lit(1))) - 48)
        .cast("long")
      acc + when(i % 2 === 1, d)
        .otherwise(d * 2 - when(d * 2 > 9, 9L).otherwise(0L))
    })

  /** Payment-card redaction with Luhn validation — the precision fix
    * plain regex scrubbing can't provide: a 13–19-digit run is only a
    * card if its Luhn checksum validates (regex-only redaction
    * obliterates order ids, EANs and tracking numbers; Luhn-gated
    * redaction leaves them intact). Candidates come from one
    * `regexp_extract_all`, validation is [[luhnSum]] % 10 == 0, and
    * each valid candidate is replaced everywhere with word
    * boundaries. All row-local codegen HOFs — scan throughput, no
    * UDF, engine-replayable.
    */
  def redactCards(text: Column): Column = {
    val cands = array_distinct(regexp_extract_all(text,
      lit("\\b\\d{13,19}\\b"), lit(0)))
    val valid = filter(cands, c => luhnSum(c) % 10 === 0)
    aggregate(valid, text, (acc, c) =>
      regexp_replace(acc, concat(lit("\\b"), c, lit("\\b")),
        lit("<CARD>")))
  }

  /** Per-category PII hit counts (email, ip, ssn, phone) as a struct —
    * the audit side of [[redactPii]]: corpus-level PII density reports
    * aggregate these without materializing redacted text.
    * Counted on the progressively-redacted text so categories don't
    * double-count the same span (mirrors the replace chain exactly).
    */
  def piiCounts(text: Column): Column = {
    val tags = Seq("email", "ip", "ssn", "phone")
    val (cols, _) = piiPatterns.zip(tags).foldLeft(
        (Seq.empty[Column], text)) {
      case ((acc, cur), ((re, tag), name)) =>
        (acc :+ regexp_count(cur, lit(re)).as(s"n_$name"),
          regexp_replace(cur, re, tag))
    }
    struct(cols: _*)
  }

  /** Gopher-style repetition statistics over word n-grams: duplicate
    * token fraction, the most frequent n-gram's occurrence count, and
    * the fraction of tokens covered by repeats of that n-gram. All
    * row-local array expressions (no shuffle, embarrassingly parallel
    * map work at any scale). The mode count is a sort + longest-equal-
    * run fold — O(n log n) per document; the obvious
    * distinct×filter form is O(n²) in interpreted HOFs and was
    * measurably the bench's hottest query before the rewrite.
    *
    * NOTE for gating: `top_ngram_frac` saturates on short documents
    * (a 1-token doc scores 1.0 by construction) — apply repetition
    * thresholds only above a minimum `n_tokens`, the way Gopher's
    * repetition rules carry length preconditions.
    */
  def repetitionStats(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val ngrams = shingles(text, n)
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"))
    val topCnt = aggregate(array_sort(ngrams), zero,
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val dupFrac = when(size(toks) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
    struct(
      size(toks).cast("long").as("n_tokens"),
      round(dupFrac, 4).as("dup_token_frac"),
      topCnt.cast("long").as("top_ngram_count"),
      round(when(size(toks) === 0, 0.0).otherwise(
        least(lit(1.0),
          (topCnt * n).cast("double") / size(toks))), 4)
        .as("top_ngram_frac"))
  }

  /** All http(s) URLs in a text — RE2/Java-portable pattern, codegen'd
    * regexp scan (C4-style URL surface for blocklist filtering).
    */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^\\s]+"), lit(0))

  /** Lower-cased host of one URL ('' when the pattern misses). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^https?://([^/:?#\\s]+)", 1))

  /** Distinct lower-cased hosts referenced by a text, sorted. */
  def hostsOf(text: Column): Column =
    array_sort(array_distinct(transform(extractUrls(text), urlHost(_))))

  /** True when any referenced host is on the blocklist — the C4-style
    * domain filter; row-local, scan throughput, no shuffle.
    */
  def hasBlockedHost(text: Column, blocklist: Seq[String]): Column = {
    val bl = array(blocklist.map(d => lit(d.toLowerCase)): _*)
    exists(hostsOf(text), h => array_contains(bl, h))
  }

  /** URL canonicalization for URL-level exact dedup (the C4
    * one-page-one-document rule): strips the fragment, the scheme, a
    * leading `www.`, common click-tracking params (`utm_*`, `fbclid`,
    * `gclid`) with query-separator repair, empty `?`/`&` tails, and
    * one trailing slash. A chain of codegen'd `regexp_replace` passes
    * restricted to constructs with identical Java-regex/RE2 semantics
    * (no lookaround, no backreferences in patterns), so the result is
    * engine-portable and oracle-checkable. Path case is preserved
    * (paths are case-sensitive; hosts arrive lowercase from any sane
    * crawler — lowercase the host upstream if yours do not).
    */
  def canonicalizeUrl(u: Column): Column = {
    val track = "(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*"
    val noFrag = regexp_replace(u, "#.*", "")
    val noScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    // order matters: strip '&'-prefixed tracking params FIRST (the
    // scan continues right at a following '&', so runs of them go in
    // one pass), so at most ONE '?'-headed tracking param can remain —
    // then drop it keeping the '?' when real params follow, or
    // entirely when it ends the string. No repair pass rewrites
    // separators, so a literal '&' in a PATH (RFC-3986-legal,
    // "/a&b") is never promoted to '?'.
    val noMid = regexp_replace(noWww, "&" + track, "")
    val noHeadMore = regexp_replace(noMid, "\\?" + track + "&", "?")
    val noHeadEnd = regexp_replace(noHeadMore, "\\?" + track + "$", "")
    val noTail = regexp_replace(noHeadEnd, "[?&]+$", "")
    regexp_replace(noTail, "/$", "")
  }

  /** Linear quality-classifier score over the fused
    * [[graft.functions.TextStatsExpression]] struct — the
    * fasttext-shaped document-quality scorer of CCNet/GPT-3-era
    * curation pipelines, with transparent dimensionless features and
    * hand-set default weights (swap in trained ones; the plan is
    * identical: one map-side expression at scan throughput). The
    * sigmoid is omitted on purpose: `exp()` differs across engines in
    * the last bits, and any threshold on sigmoid(score) is the same
    * row set as the equivalent threshold on the linear score.
    */
  def qualityModelScore(st: Column, wStop: Double = 2.0,
      wPunct: Double = -3.0, wTokLen: Double = 0.15,
      wLen: Double = 0.5, bias: Double = -1.0): Column = {
    val nTok = st.getField("n_tokens")
    val sw = when(nTok === 0, 0.0)
      .otherwise(st.getField("n_stopwords").cast("double") / nTok)
    val punct = when(st.getField("n_chars") === 0, 0.0)
      .otherwise(st.getField("n_punct").cast("double") /
        st.getField("n_chars"))
    val mtl = when(nTok === 0, 0.0)
      .otherwise(st.getField("sum_tok_len").cast("double") / nTok)
    lit(wStop) * sw + lit(wPunct) * punct + lit(wTokLen) * mtl +
      lit(wLen) * (nTok / lit(1000.0)) + lit(bias)
  }

  /** Document fingerprint (winnowing-style): hash every k-shingle,
    * keep the `keep` smallest hashes as the document's signature.
    * Robust to local edits; signature comparison is a set
    * intersection. md5 hex as the shingle hash — same winnowing
    * semantics as a 64-bit rolling hash (any uniform deterministic
    * hash works; min-selection only needs a total order, and
    * fixed-width lowercase hex sorts identically everywhere), but
    * ANSI-expressible, so the whole operator is oracle-checkable
    * against an independent engine.
    */
  def fingerprint(text: Column, k: Int, keep: Int): Column =
    slice(array_sort(array_distinct(
      transform(shingles(text, k), s => md5(s)))), 1, keep)

  /** Corpus-wide heavy hitters: the `topN` word k-grams by DOCUMENT
    * frequency (distinct per doc, so a single spammy document can't
    * promote its own boilerplate) — the survey step behind boilerplate
    * line removal and stop-gram lists.
    *
    * Scale shape: explode is map-side; the count is a partial+final
    * hash aggregate (the exchange carries one (gram, partial-count)
    * row per distinct gram per partition, not per occurrence); the
    * top-N is `TakeOrderedAndProject` — per-partition bounded heaps,
    * N rows to the driver — never a global sort. Ties break gram-
    * ascending, making the output a deterministic total order.
    */
  def topNgrams(docs: DataFrame, textCol: String, k: Int,
      topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    docs.select(explode(array_distinct(shingles(col(textCol), k)))
        .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("gram").asc)
      .limit(topN)
  }

  /** RAKE keyword extraction (Rose 2010) corpus-wide: candidate
    * phrases are maximal stopword-delimited token runs; each word
    * scores deg(w)/freq(w) with deg = Σ phrase-length over the word's
    * occurrences (longer co-occurrence context ⇒ higher score), and a
    * phrase scores the sum of its words' scores. The cheap
    * keyphrase-surfacing pass of a corpus-curation pipeline — no
    * model, no IDF table, one vocabulary-sized artifact.
    *
    * Determinism: word scores round to DECIMAL(28,9) before the
    * phrase sum (the pageRank round-then-decimal convention), so the
    * phrase score is reduce-order-independent and engine-replayable.
    * Word statistics count ALL phrase occurrences (classic RAKE);
    * `minOcc` only prunes the output.
    *
    * Plan shape: one doc-keyed window pass marks stopword boundaries
    * and numbers phrases (running sum), phrases aggregate per (doc,
    * run), word stats are ONE vocabulary-sized aggregate, and the
    * scoring join explodes only the ≥`minOcc` DISTINCT phrase texts —
    * never the per-occurrence stream. Over-long runs are dropped by a
    * run-length window BEFORE the phrase aggregate (same doc-hash
    * distribution, no extra exchange), so a document with no
    * stopwords at all — CJK text, code, a minified blob — bounds
    * every collected array at `maxWords` instead of materializing the
    * whole document as one phrase row and discarding it after.
    * Output: (phrase, n_words, n_occurrences, score).
    */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], minOcc: Long = 5L,
      maxWords: Int = 6): DataFrame = {
    require(stopwords.nonEmpty, "rake needs a stopword list")
    require(maxWords >= 1, "maxWords must be >= 1")
    val sw = array(stopwords.map(lit): _*)
    val toks = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__doc")).orderBy(col("pos"))
    // run length BEFORE collecting: HashPartitioning(__doc) already
    // satisfies the (__doc, __pid) clustered distribution, so this
    // window adds a sort but no exchange — and caps collect_list at
    // maxWords elements even for stopword-free documents
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__doc"), col("__pid"))
    val phrases = toks
      .withColumn("__b",
        when(array_contains(sw, col("token")), 1L).otherwise(0L))
      .withColumn("__pid", sum(col("__b")).over(w))
      .filter(col("__b") === 0L)
      .withColumn("__rl", count(lit(1)).over(wRun))
      .filter(col("__rl") <= maxWords)
      .groupBy(col("__doc"), col("__pid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token")))),
        x => x.getField("token")).as("__words"))
    val wordScores = phrases
      .select(explode(col("__words")).as("word"),
        size(col("__words")).cast("long").as("__len"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("word"),
        round(col("__deg").cast("double") / col("__freq").cast("double"),
          9).cast("decimal(28,9)").as("__wscore"))
    val distinctPhrases = phrases
      .select(array_join(col("__words"), " ").as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minOcc)
    distinctPhrases
      .select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("word"))
      .join(wordScores, "word")
      .groupBy(col("phrase"), col("n_occurrences"))
      .agg(count(lit(1)).as("n_words"), sum(col("__wscore")).as("__ps"))
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        round(col("__ps").cast("double"), 6).as("score"))
  }

  /** Overlapping token-window chunking — the training-data layout step
    * that slices each document into fixed-size windows with stride
    * overlap so no span longer than (size − stride) is lost at a chunk
    * boundary. Returns one row per (doc, chunk_no) with the chunk's
    * text and its token span.
    *
    * Chunk i covers tokens [i·stride, i·stride + size); the last chunk
    * may be short; an empty document yields no chunks. Where
    * [[Sampling.packByCapacity]] PACKS whole documents into context
    * windows, this SPLITS over-long documents — the two compose into
    * the standard long-doc → chunk → pack pipeline.
    *
    * Plan shape: tokenize once, `posexplode(sequence(...))` over the
    * per-doc chunk count, `slice` + `concat_ws` per chunk — all
    * map-side Generate + codegen'd array ops, no shuffle, no UDF. The
    * fan-out multiplies rows by ≈ len/stride, which Spark sizes
    * correctly because Generate output feeds the next stage without
    * materializing.
    */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val toks = tokens(col(textCol))
    // ceil((len - size)/stride) + 1 extra windows past the first;
    // clamp at 0 so a short (len <= size) non-empty doc is ONE chunk
    val nChunks = when(size_(toks) === 0, 0L).otherwise(
      greatest(ceil((size_(toks).cast("double") - size) / stride)
        .cast("long"), lit(0L)) + 1L)
    docs
      .select(col(idCol), toks.as("_toks"), nChunks.as("_n"))
      // guard the sequence: Spark's sequence(0, -1) auto-steps DOWN
      // (yielding [0, -1]), so an empty doc must produce null (which
      // posexplode drops), not a descending range
      .select(col(idCol), col("_toks"),
        posexplode(when(col("_n") > 0,
          sequence(lit(0L), col("_n") - 1L))))
      .select(col(idCol), col("pos").as("chunk_no"),
        (col("pos") * stride + 1).as("tok_start"),
        concat_ws(" ",
          slice(col("_toks"), (col("pos") * stride + 1).cast("int"),
            lit(size))).as("chunk"))
  }

  /** GPT-2-shaped pre-tokenization classes: letter runs, digit runs,
    * and single other-symbol marks — the split a byte-pair tokenizer
    * applies BEFORE merges, and the basis for honest token-budget
    * accounting per content class (a digit-heavy table and a prose
    * paragraph of equal length cost very different token budgets).
    * Returns a struct (n_tokens, n_word, n_num, n_punct).
    *
    * One `regexp_extract_all` pass + two array filters, all row-local
    * codegen — scan throughput. The alternation is anchored-class
    * regex only (no lookarounds, no unicode properties), so any RE2/
    * PCRE-family engine tokenizes identically.
    */
  def preTokenize(text: Column): Column = {
    val toks = regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    val nWord = size_(filter(toks, t => t.rlike("^[A-Za-z]")))
    val nNum = size_(filter(toks, t => t.rlike("^[0-9]")))
    struct(
      size_(toks).cast("long").as("n_tokens"),
      nWord.cast("long").as("n_word"),
      nNum.cast("long").as("n_num"),
      (size_(toks) - nWord - nNum).cast("long").as("n_punct"))
  }

  /** Per-document lexical diversity: type-token ratio and Simpson
    * diversity (1 − Σ(cᵢ/n)²) over whitespace tokens — the repetition
    * /templating quality signals that, unlike Shannon entropy, are
    * PURE RATIONAL arithmetic: token counts are exact integers and
    * each output is one IEEE division (correctly rounded everywhere),
    * so the scores hash-compare across engines — no `ln`/`pow` libm
    * variance.
    *
    * Returns (id, n_tokens, n_distinct_tokens, ttr, simpson); empty
    * documents yield (0, 0, null, null).
    *
    * Plan shape: explode → (doc, token) partial+final count → one
    * (doc) aggregate; both exchanges carry counts, not text. Left
    * join back to the id spine keeps token-less documents. (The
    * row-local HOF alternative is O(tokens²) per doc; this stays
    * linear and the aggregates combine map-side.)
    */
  def lexicalDiversity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val perToken = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("_c"))
    val perDoc = perToken
      .groupBy(col(idCol))
      .agg(
        sum(col("_c")).as("_n"),
        count(lit(1)).as("_d"),
        sum(col("_c") * col("_c")).as("_sq"))
      .select(col(idCol),
        col("_n").as("n_tokens"),
        col("_d").as("n_distinct_tokens"),
        round(col("_d").cast("double") / col("_n").cast("double"), 9)
          .as("ttr"),
        round(lit(1.0) - col("_sq").cast("double") /
          (col("_n") * col("_n")).cast("double"), 9).as("simpson"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_distinct_tokens"))
  }

  /** CCNet-style unigram-LM surprisal per document: the mean negative
    * log-probability of a document's tokens under the corpus's own
    * unigram model — the standard LLM-curation quality scorer
    * (low = ordinary prose; very high = gibberish/rare-token soup;
    * very low = boilerplate). With p(t) = c_t / N over corpus token
    * counts,
    *
    *   surprisal(doc) = −(1/n) Σ_i ln p(t_i)
    *                  = ln N − Σ_t tf_t·ln c_t / n
    *
    * No smoothing needed: scoring the corpus against itself means
    * every scored token has c_t ≥ 1.
    *
    * Plan shape — the CCNet head-vocab shape, NOT a token-keyed
    * window: explode → (doc, token) partial+final count; corpus
    * counts c_t come from a SECOND two-level aggregate over the tf
    * rows (map-side combine caps the hot token's shuffle volume at
    * one partial row per task — a window partition keyed on the
    * token could not be split, so at web scale "the" would land on
    * ONE task; AQE skew handling applies to joins, not window
    * exchanges); the top-`headVocab` counts (ties broken by token,
    * deterministic) BROADCAST back onto the tf stream as the head
    * vocabulary, and tokens outside the head — the Zipf long tail,
    * overwhelmingly hapax at web scale — take the floor count 1
    * (ln 1 = 0). With `headVocab` ≥ |vocab| the floor never fires
    * and the score is exact, which is how the sf-scale oracle pins
    * it; at 100 TB the head table stays `headVocab` rows forever,
    * the same scale-free trick as [[dsirLogWeights]]'s bucket table.
    * N folds in as a 1-row broadcast. Only (id, token, count) ever
    * shuffles — never text. Output: (idCol, n_tokens, surprisal),
    * rounded to 6dp so the score is portable across engines (a
    * per-doc Σ of doubles is summation-order-sensitive in the last
    * ulps; 6dp is the EWMA/quality-model precedent).
    */
  def surprisal(docs: DataFrame, idCol: String, textCol: String,
      headVocab: Int = DefaultHeadVocab): DataFrame = {
    require(headVocab > 0, "headVocab must be positive")
    // N derives exactly from tf (Σ _tf = Σ size(tokens(text)) — both
    // count token instances; null/empty docs contribute nothing to
    // either form), replacing what was a THIRD full corpus tokenize
    // (r11). No localCheckpoint here, unlike the bigram sibling:
    // measured A/B showed Spark's ReuseExchange already dedupes the
    // (doc, token) aggregate exchange across this plan's subtrees,
    // so materialization only added I/O.
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("_tf"))
    val head = tf.groupBy(col("_tok")).agg(sum(col("_tf")).as("_c"))
      .orderBy(col("_c").desc, col("_tok").asc)
      .limit(headVocab)
    val n = tf.agg(sum(col("_tf")).cast("double").as("__n"))
    tf.join(broadcast(head), Seq("_tok"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        sum(col("_tf").cast("double") *
          log(coalesce(col("_c"), lit(1L)).cast("double"))).as("_s"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("n_tokens"),
        round(log(col("__n")) - col("_s") / col("n_tokens").cast("double"),
          6).as("surprisal"))
  }

  /** Bigram conditional surprisal: mean −ln p̂(cur | prev) over a
    * document's adjacent token pairs under the corpus's own bigram
    * model with add-1 smoothing over the corpus vocabulary,
    *
    *   p̂(cur | prev) = (c(prev,cur) + 1) / (c(prev,·) + V).
    *
    * The word-ORDER-aware quality signal [[surprisal]] cannot see: a
    * bag-of-common-words document in scrambled order scores ordinary
    * under the unigram model but highly surprising here — the KenLM
    * direction real curation pipelines take past unigram scoring.
    * Documents with fewer than 2 tokens produce no row.
    *
    * Plan shape: row-local zip into (prev, cur) pairs → one
    * (doc, prev, cur) count exchange; corpus pair counts come from a
    * second two-level aggregate over the tf rows and context counts
    * from a third over THOSE (each bounded, map-side-combined — no
    * window keyed on a skewed token, same rationale as
    * [[surprisal]]); the top-`headVocab` pairs and contexts BROADCAST
    * back as head tables with tail floors c_pair→0 and
    * c_prev→max(0, c_pair) — the context floor is raised to any KNOWN
    * pair count because c_prev ≥ c_pair always holds in the true
    * counts, keeping p̂ = (c_pair+1)/(c_prev+V) a probability even
    * when a head pair's diffuse context misses the context head
    * (add-1 smoothing then prices fully-unseen pairs at 1/(c_prev+V);
    * exact whenever the heads cover the corpus, which is how the
    * oracle pins it). V is a 1-row broadcast. Only ids, token pairs
    * and counts shuffle. 6dp-rounded like its unigram sibling.
    */
  def surprisalBigram(docs: DataFrame, idCol: String, textCol: String,
      headVocab: Int = DefaultHeadVocab,
      pinInstances: Boolean = true): DataFrame = {
    require(headVocab > 0, "headVocab must be positive")
    val toks = tokens(col(textCol))
    // ONE tokenize pass serves the whole chain (r11, the r10 scale
    // artifact's weak 10x-Zipf row): zip every token with its
    // successor — arrays_zip null-pads the shorter successor slice,
    // so the last token of each doc rides with _cur = null. The
    // exploded instance table then yields BOTH the bigram tf rows
    // (filter _cur IS NOT NULL) and the exact corpus vocabulary
    // (count_distinct(_prev): every token occurs exactly once as
    // _prev, including 1-token docs), replacing a second full-corpus
    // tokenize. Reuse across the plan's many consumers (r11 closed
    // four corpus passes per action down to one; ADVICE r11 then
    // flagged the EAGER checkpoints doing that work at
    // plan-construction time, failing on executor loss, and pinning
    // |corpus tokens| rows unconditionally):
    //  - tf and pairCounts carry NO checkpoint — each roots an
    //    exchange, and ReuseExchange dedupes the identical shuffle
    //    under every consumer (head broadcasts + final join) within
    //    the one action, with full lineage for executor-loss recovery.
    //    (A LAZY Dataset.localCheckpoint would not help here: under
    //    AQE, toRdd at wrap time already materializes the upstream
    //    stages, so "lazy" still ran the corpus passes at call time.)
    //  - inst is narrow (no exchange), so its two consumers (tf's
    //    shuffle map and the vocabulary count) cannot share an
    //    exchange; a lazy localCheckpoint pins it after first
    //    compute — zero jobs at construction because the checkpoint
    //    plan has no stages to materialize. That pin is the storage
    //    trade: |corpus tokens| rows of short strings — on
    //    storage-starved executors pass pinInstances=false and pay a
    //    second tokenize pass (the vocabulary count) instead.
    val instBase = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(arrays_zip(
        toks.as("_prev"),
        slice(toks, lit(2), greatest(size_(toks) - 1, lit(0)))
          .as("_cur"))).as("_z"))
      .select(col(idCol), col("_z._prev").as("_prev"),
        col("_z._cur").as("_cur"))
    val inst =
      if (pinInstances) instBase.localCheckpoint(false) else instBase
    val tf = inst
      .filter(col("_cur").isNotNull)
      .groupBy(col(idCol), col("_prev"), col("_cur"))
      .agg(count(lit(1)).as("_tf"))
    val pairCounts = tf.groupBy(col("_prev"), col("_cur"))
      .agg(sum(col("_tf")).as("_cpair"))
    val pairHead = pairCounts
      .orderBy(col("_cpair").desc, col("_prev").asc, col("_cur").asc)
      .limit(headVocab)
    // context counts derive from the already-bounded pair counts, not
    // a third pass over the corpus
    val prevHead = pairCounts.groupBy(col("_prev"))
      .agg(sum(col("_cpair")).as("_cprev"))
      .orderBy(col("_cprev").desc, col("_prev").asc)
      .limit(headVocab)
    val vocab = inst
      .agg(count_distinct(col("_prev")).cast("double").as("__v"))
    // floor coherence: a pair can sit in pairHead while its context
    // misses prevHead (many diffuse contexts can all outrank a
    // concentrated one). Flooring cprev to 0 under a REAL cpair
    // would price p̂ = (cpair+1)/V — possibly > 1, i.e. negative
    // surprisal. cprev ≥ cpair always holds in the true counts, so
    // the floored context is raised to the known pair count: the
    // estimator stays a probability and the exact case is unchanged
    // (heads covering the corpus ⇒ greatest(cprev, cpair) = cprev).
    val cpair = coalesce(col("_cpair"), lit(0L))
    val cprev = greatest(coalesce(col("_cprev"), lit(0L)), cpair)
    tf.join(broadcast(pairHead), Seq("_prev", "_cur"), "left")
      .join(broadcast(prevHead), Seq("_prev"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_bigrams"),
        sum(col("_tf").cast("double") *
          (log(cprev.cast("double") + col("__v")) -
            log(cpair.cast("double") + 1.0)))
          .as("_s"))
      .select(col(idCol), col("n_bigrams"),
        round(col("_s") / col("n_bigrams").cast("double"), 6)
          .as("surprisal2"))
  }

  /** PMI collocation mining: the top-`k` adjacent token pairs by
    * pointwise mutual information,
    *
    *   pmi(a,b) = ln( c(a,b)·N / (c(a,·)·c(·,b)) ),
    *
    * margins and N taken over the pair table itself — the
    * multiword-expression detector ("new york", "machine learning")
    * tokenizer and phrase-vocabulary pipelines run before merging
    * tokens. `minCount` gates hapax pairs (PMI is maximal for
    * singletons — the classic artifact), `k` bounds the output.
    *
    * Plan shape: row-local zip into pairs → ONE (prev, cur) count
    * exchange (map-side combined); margins are second-level
    * aggregates OVER THE PAIR TABLE (never a re-scan of the corpus)
    * joined back as AQE-splittable equi-joins — the hot-token margin
    * is a join key, not a window partition (the tfidf rationale); N
    * folds in as a 1-row broadcast; the top-k is orderBy+limit, which
    * plans TakeOrderedAndProject — bounded per-partition heaps, no
    * full sort shuffle (plan-pinned). 6dp-rounded like the surprisal
    * family; ties broken by (prev, cur) so the cut is total-ordered
    * and engine-replayable.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 50): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(k >= 1, "k must be >= 1")
    val toks = tokens(col(textCol))
    val pairs = when(size_(toks) >= 2,
      zip_with(slice(toks, lit(1), size_(toks) - 1),
        slice(toks, lit(2), size_(toks) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur"))))
    val pc = docs
      .select(explode(pairs).as("_p"))
      .select(col("_p.prev").as("prev"), col("_p.cur").as("cur"))
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c_pair"))
    val n = pc.agg(sum(col("c_pair")).cast("double").as("__n"))
    val mPrev = pc.groupBy(col("prev")).agg(sum(col("c_pair")).as("_cprev"))
    val mCur = pc.groupBy(col("cur")).agg(sum(col("c_pair")).as("_ccur"))
    pc.filter(col("c_pair") >= minCount)
      .join(mPrev, "prev").join(mCur, "cur")
      .crossJoin(broadcast(n))
      .select(col("prev"), col("cur"), col("c_pair"),
        round(log(col("c_pair").cast("double") * col("__n") /
          (col("_cprev").cast("double") * col("_ccur").cast("double"))),
          6).as("pmi"))
      .orderBy(desc("pmi"), asc("prev"), asc("cur"))
      .limit(k)
  }

  /** BM25 top-k retrieval (Robertson/Lucene idf variant): score every
    * candidate document per query,
    *
    *   score(q,d) = Σ_{t∈q∩d} idf(t) · tf·(k1+1) /
    *                (tf + k1·(1 − b + b·|d|/avgdl)),
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (always ≥ 0),
    *
    * and keep each query's `k` best — the ranked-retrieval arm of the
    * [[invertedIndex]] family (eval-set decontamination lookups,
    * nearest-neighbor text search before embedding rerank).
    *
    * Plan shape: candidates are a token equi-join of the distinct
    * query terms against the (doc, token, tf) postings — hot tokens
    * are join keys (AQE-splittable), never window partitions; df and
    * doc-length ride along via co-keyed joins; N/avgdl fold in as a
    * 1-row broadcast. Per-term scores round to 12dp and sum as
    * DECIMAL(38,12) (reduce-order-independent — the engine's exact-
    * sum kernel), the query top-k is the bounded
    * [[graft.functions.VectorExpressions.topKByScore]] aggregate (≤k
    * rows per query per map task — never a rank window over all
    * candidates). 6dp scores; ties break by ascending doc id. Output:
    * (query_id, rank, doc_id, score).
    *
    * `maxDfFraction` is the retrieval-engine scale knob: query terms
    * whose df exceeds that corpus fraction are dropped from CANDIDATE
    * GENERATION (df itself still counts the full corpus). A web-scale
    * head token appears in ~every document, so its postings ARE the
    * corpus — candidate volume explodes while its idf,
    * ln(1 + (N−df+0.5)/(df+0.5)), is already ≈ 0: the classic
    * stopword/df-ceiling prune (measured on the Zipf axis: 10× corpus
    * + head-token queries went 3.8–8.9× superlinear unpruned).
    * Default 1.0 = pure exact BM25; the pruned variant is exactly
    * replayable too — the oracle applies the same gate.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10,
      maxDfFraction: Double = 1.0): DataFrame =
    bm25SearchTopK(bm25Index(docs, idCol, textCol), queries, qidCol,
      qtextCol, k1, b, k, maxDfFraction)

  /** The FROZEN index artifacts behind [[bm25TopK]] — postings
    * (did, tok, tf), doc lengths, document frequencies, and the 1-row
    * corpus stats. Production builds these once per corpus version
    * (optionally checkpointed/persisted) and serves every query batch
    * from them — the PQ-codebook/IVF-index convention applied to text
    * retrieval; the streaming spec scores query micro-batches against
    * exactly this split.
    */
  final case class Bm25Index(postings: DataFrame, docLen: DataFrame,
      docFreq: DataFrame, stats: DataFrame)

  def bm25Index(docs: DataFrame, idCol: String,
      textCol: String): Bm25Index = {
    val tf = docs
      .select(col(idCol).as("_did"),
        explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col("_did"), col("_tok"))
      .agg(count(lit(1)).as("_tf"))
    val dl = docs.select(col(idCol).as("_did"),
      tokenCount(col(textCol)).cast("long").as("_dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("__n"),
      sum(col("_dl")).cast("double").as("__tot"))
    val dft = tf.groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
    Bm25Index(tf, dl, dft, stats)
  }

  /** [[bm25TopK]] against a pre-built (possibly memoized)
    * [[Bm25Index]].
    */
  def bm25SearchTopK(index: Bm25Index, queries: DataFrame,
      qidCol: String, qtextCol: String, k1: Double = 1.2,
      b: Double = 0.75, k: Int = 10,
      maxDfFraction: Double = 1.0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxDfFraction > 0 && maxDfFraction <= 1.0,
      "maxDfFraction must be in (0,1]")
    val (tf, dl, dft, stats) =
      (index.postings, index.docLen, index.docFreq, index.stats)
    val qterms = queries
      .select(col(qidCol).as("_qid"),
        explode(tokens(col(qtextCol))).as("_tok"))
      .distinct()
    val idf = log(lit(1.0) +
      (col("__n") - col("_df").cast("double") + lit(0.5)) /
        (col("_df").cast("double") + lit(0.5)))
    val denom = col("_tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("_dl").cast("double") / (col("__tot") / col("__n")))
    val term = idf * (col("_tf").cast("double") * lit(k1 + 1.0)) / denom
    // the df ceiling prunes query terms BEFORE the postings join —
    // the candidate volume is what the gate exists to bound
    val dfGated =
      if (maxDfFraction >= 1.0) dft
      else dft.crossJoin(broadcast(stats))
        .filter(col("_df").cast("double") <=
          lit(maxDfFraction) * col("__n"))
        .select(col("_tok"), col("_df"))
    val scored = qterms
      .join(dfGated, "_tok")
      .join(tf, "_tok")
      .join(dl, "_did")
      .crossJoin(broadcast(stats))
      .groupBy(col("_qid"), col("_did"))
      .agg(round(sum(round(term, 12).cast("decimal(38,12)"))
        .cast("double"), 6).as("_score"))
    scored
      .groupBy(col("_qid"))
      .agg(graft.functions.VectorExpressions.topKByScore(
        col("_score"), col("_did"), k).as("__kept"))
      .select(col("_qid").as("query_id"),
        posexplode(col("__kept")).as(Seq("__p", "__e")))
      .select(col("query_id"), (col("__p") + 1).cast("long").as("rank"),
        col("__e").getField("id").as("doc_id"),
        col("__e").getField("score").as("score"))
  }

  /** One phrase merge (a, b) → `a_b` applied to a token-array column
    * — [[applyBpeMerge]]'s index-local rewrite with the word2phrase
    * joiner. Same a ≠ b precondition, same leftmost-non-overlapping
    * greedy semantics, same locality argument (and therefore the same
    * exact list_transform oracle replay).
    */
  def applyPhraseMerge(toks: Column, a: String, b: String): Column = {
    require(a != b, "self-merges are not order-free")
    filter(transform(toks, (x, i) =>
      when(x === a && get(toks, i + 1) === b, lit(a + "_" + b))
        .when(i > 0 && get(toks, i - 1) === a && x === b,
          lit(null).cast("string"))
        .otherwise(x)), y => y.isNotNull)
  }

  /** Serve a FROZEN phrase table (the word2phrase/[[pmiCollocations]]
    * train-then-serve split, the BPE convention: production ships the
    * collocation list as an artifact, not the miner): apply each
    * (a, b) → `a_b` merge in list order, greedy leftmost — chained
    * phrases resolve sequentially ("new york city" under (new,york)
    * then (york,city) yields `new_york city`, deterministic). One
    * native fold ([[graft.functions.PhraseMerge]] — the nested-HOF
    * form builds a 3^k expression tree, see there); row-local, the
    * phrase list rides as a reference object, no shuffle at all.
    * Output: (idCol, text_merged, n_tokens, n_merged).
    */
  def mergePhrases(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[(String, String)]): DataFrame = {
    require(phrases.nonEmpty, "phrases must be non-empty")
    docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        graft.functions.TextExpressions.phraseMerge(col("__t"), phrases)
          .as("__m"))
      .select(col(idCol),
        array_join(col("__m"), " ").as("text_merged"),
        size(col("__t")).cast("long").as("n_tokens"),
        (size(col("__t")) - size(col("__m"))).cast("long").as("n_merged"))
  }

  /** Unigram counts of a corpus — the FROZEN reference model for
    * [[surprisalAgainst]]: (token, c) rows, buildable once offline
    * per reference-corpus version and reused across scoring runs.
    */
  def unigramModel(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))

  /** Surprisal of documents against a FROZEN unigram model — the
    * production CCNet shape ([[surprisal]] scores a corpus against
    * itself; real pipelines train the LM on a reference corpus once
    * and score every new crawl/stream against it). Add-1 smoothing
    * over the model vocabulary gives out-of-vocabulary tokens the
    * floor probability 1/(N+V) instead of −∞:
    *
    *   surprisal_ref(doc) = −(1/n) Σ ln ((c_model(t) + 1) / (N + V)).
    *
    * The model joins as a BROADCAST (a reference LM is a head-vocab
    * table, small by construction); totals fold in as a 1-row
    * broadcast. Works identically in a foreachBatch micro-batch —
    * the frozen model makes streaming scores equal batch scores by
    * definition (spec-pinned).
    */
  def surprisalAgainst(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val totals = model.agg(sum(col("c")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("_tf"))
    tf.join(broadcast(model), Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        sum(col("_tf").cast("double") *
          log((coalesce(col("c"), lit(0L)).cast("double") + 1.0) /
            (col("__n") + col("__v")))).as("_s"))
      .select(col(idCol), col("n_tokens"),
        round(-col("_s") / col("n_tokens").cast("double"), 6)
          .as("surprisal_ref"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every RAW document by how target-like its hashed-unigram profile
    * is,
    *
    *   logw(doc) = Σ_b tf_b · (ln p̂_target(b) − ln p̂_raw(b)),
    *
    * where b is a hashed feature bucket (leading-32-bit md5 of the
    * token mod `buckets` — the engine's established portable hash) and
    * p̂ are add-1–smoothed bucket distributions (smoothing is load-
    * bearing: a raw-only bucket has zero target mass). Selecting the
    * top-weight documents approximates sampling the raw pool toward
    * the target distribution — the standard pretraining-data selection
    * method between "keep everything" and training a quality model.
    *
    * Plan shape: raw explode → (doc, bucket) count [one exchange];
    * the per-bucket log-ratio table is ≤ `buckets` rows (raw + target
    * bucket aggregates crossed with their 1-row totals) and BROADCASTs
    * onto the tf stream; one final (doc) aggregate. Text never
    * shuffles; driver holds nothing. At 100 TB the bucket table is
    * still `buckets` rows — the hashing is what makes the method
    * scale-free. Output: (idCol, n_tokens, dsir_logw), 6dp-rounded
    * for cross-engine portability like surprisal.
    */
  /** Leading-32-bit md5 of the token mod `buckets` — the engine's
    * portable feature hash, shared by the DSIR family.
    */
  private def tokenBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val tf = raw
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .select(col(idCol), tokenBucket(col("_tok"), buckets).as("_b"))
      .groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_tf"))
    // raw bucket counts derive from tf (NOT a second tokenize pass
    // over the dominant input): the tf subtree appears twice in the
    // final plan with an identical exchange, which ReuseExchange
    // collapses to one shuffle
    val rawB = tf.groupBy("_b").agg(sum(col("_tf")).as("_c"))
    val tgtB = target
      .select(explode(tokens(col(textCol))).as("_tok"))
      .select(tokenBucket(col("_tok"), buckets).as("_b"))
      .groupBy("_b").agg(count(lit(1)).as("_c"))
    val nRaw = rawB.agg(sum(col("_c")).cast("double").as("_nr"))
    val nTgt = tgtB.agg(sum(col("_c")).cast("double").as("_nt"))
    // log-ratio per bucket over RAW's support (tf keys ⊆ raw buckets);
    // target-absent buckets get the smoothed floor
    val ratio = rawB
      .join(tgtB.withColumnRenamed("_c", "_ct"), Seq("_b"), "left")
      .crossJoin(broadcast(nRaw)).crossJoin(broadcast(nTgt))
      .select(col("_b"),
        (log((coalesce(col("_ct"), lit(0L)).cast("double") + 1.0) /
            (col("_nt") + buckets)) -
          log((col("_c").cast("double") + 1.0) /
            (col("_nr") + buckets))).as("_lr"))
    tf.join(broadcast(ratio), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        round(sum(col("_tf").cast("double") * col("_lr")), 6)
          .as("dsir_logw"))
  }

  /** FROZEN DSIR artifact — the [[unigramModel]]/[[surprisalAgainst]]
    * split applied to importance resampling: build the per-bucket
    * log-ratio table ONCE from a raw-pool sample and the target
    * corpus, then score any corpus or stream against it with
    * [[dsirScoreAgainst]] (batch == streaming by construction, the
    * same argument as the frozen surprisal model). The table is
    * COMPLETE over all `buckets` rows (buckets unseen in either
    * corpus carry the doubly-smoothed floor ratio), so score-time
    * needs no out-of-model fallback — an inner broadcast join covers
    * every scored token. Always exactly `buckets` rows: broadcastable
    * at any corpus size, the property that makes DSIR scale-free.
    */
  def dsirModel(rawSample: DataFrame, target: DataFrame,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def bucketCounts(src: DataFrame, as: String): DataFrame = src
      .select(explode(tokens(col(textCol))).as("_tok"))
      .select(tokenBucket(col("_tok"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(as))
    val rawB = bucketCounts(rawSample, "_cr")
    val tgtB = bucketCounts(target, "_ct")
    // coalesce(sum, 0): an empty corpus aggregates to one null row,
    // which must read as zero mass, not null-poison every ratio
    val nRaw = rawB.agg(coalesce(sum(col("_cr")), lit(0L))
      .cast("double").as("_nr"))
    val nTgt = tgtB.agg(coalesce(sum(col("_ct")), lit(0L))
      .cast("double").as("_nt"))
    rawSample.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
      .join(rawB, Seq("bucket"), "left")
      .join(tgtB, Seq("bucket"), "left")
      .crossJoin(broadcast(nRaw)).crossJoin(broadcast(nTgt))
      .select(col("bucket"),
        (log((coalesce(col("_ct"), lit(0L)).cast("double") + 1.0) /
            (col("_nt") + buckets)) -
          log((coalesce(col("_cr"), lit(0L)).cast("double") + 1.0) /
            (col("_nr") + buckets))).as("log_ratio"))
  }

  /** Score documents against a FROZEN [[dsirModel]]. `buckets` must
    * match the model's (the hash domain is part of the artifact).
    * Output schema matches [[dsirLogWeights]]; when the model was
    * built from (raw, target) and the same `raw` is scored, the
    * weights are identical — spec-pinned. The model joins as a
    * BROADCAST; one (id, bucket, count) exchange; text never
    * shuffles. Works identically inside a foreachBatch micro-batch —
    * the frozen table makes streaming == batch by definition.
    */
  def dsirScoreAgainst(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .select(col(idCol), tokenBucket(col("_tok"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("_tf"))
    tf.join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        round(sum(col("_tf").cast("double") * col("log_ratio")), 6)
          .as("dsir_logw"))
  }

  /** Rare-token ratio against a FROZEN [[Profiling.countMinSketch]] —
    * the bounded-memory novelty/rarity scorer: the fraction of a
    * document's token occurrences whose estimated frequency in the
    * REFERENCE corpus (the sketch's build corpus) falls below
    * `rareBelow`. High ratio = the document leans on vocabulary the
    * reference rarely saw — gibberish, a new domain, or contamination
    * — without ever materializing the reference vocabulary: the
    * sketch is depth×width counters forever, where the exact
    * alternative ([[unigramModel]]) grows with the vocabulary. CMS
    * estimates never undercount, so a token flagged rare here is
    * GENUINELY rare in the reference (the one-sided error points the
    * safe way for a rarity gate).
    *
    * Plan shape: one (id, token, tf) aggregate; estimates are
    * computed once per DISTINCT token ([[Profiling.cmsEstimate]],
    * sketch broadcast) and join back on the token — an AQE-splittable
    * equi-join, never a token-keyed window (the [[tfidf]] rationale).
    * Documents with no tokens produce no row. Output: (idCol,
    * n_tokens, rare_ratio) at 6dp. Works identically in a
    * foreachBatch micro-batch — the frozen sketch makes streaming
    * scores equal batch scores (spec-pinned).
    */
  def rareTokenRatio(docs: DataFrame, idCol: String, textCol: String,
      sketch: DataFrame, depth: Int, width: Int,
      rareBelow: Long): DataFrame = {
    require(rareBelow > 0, "rareBelow must be positive")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok")).agg(count(lit(1)).as("_tf"))
    val est = graft.operators.Profiling.cmsEstimate(sketch,
      tf.select(col("_tok")), "_tok", depth, width)
    tf.join(est, Seq("_tok"))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        round(sum(when(col("cms_est") < rareBelow, col("_tf"))
            .otherwise(lit(0L))).cast("double") /
          sum(col("_tf")).cast("double"), 6).as("rare_ratio"))
  }

  /** One BPE merge (a, b) → `ab` applied to a symbol-array column —
    * the built-in-HOF reference for [[graft.functions.BpeEncode]]'s
    * fold (differential spec-pinned). Valid ONLY for a ≠ b, where
    * leftmost-non-overlapping merging is an index-LOCAL rewrite:
    * position i fuses iff (toks[i], toks[i+1]) = (a, b); position i
    * is consumed iff (toks[i−1], toks[i]) = (a, b); no overlap chain
    * can involve three positions without a = b. (That locality is
    * also what makes the oracle's list_transform replay exact.)
    */
  def applyBpeMerge(toks: Column, a: String, b: String): Column = {
    require(a != b, "self-merges are not order-free")
    filter(transform(toks, (x, i) =>
      when(x === a && get(toks, i + 1) === b, lit(a + b))
        .when(i > 0 && get(toks, i - 1) === a && x === b,
          lit(null).cast("string"))
        .otherwise(x)), y => y.isNotNull)
  }

  /** BPE merge TRAINING (Sennrich et al. 2016) — the tokenizer-build
    * half: start from codepoint symbols (+ `</w>`), repeatedly take
    * the corpus-most-frequent adjacent symbol pair (ties: count desc,
    * pair lexicographic — deterministic) and fuse it everywhere.
    * Returns the ordered merges list — the FROZEN ARTIFACT
    * [[bpeEncode]] and any other engine consume (production
    * tokenizers ship exactly this: a merges file, not the trainer).
    *
    * Distributed like Lloyd refinement: the state is the WORD-COUNT
    * table (word-vocabulary-sized — bounded by Heaps' law at web
    * scale, and what reference BPE trainers hold in memory), each
    * iteration is one pair-count aggregate plus a 1-row argmax
    * collect; the table is eagerly localCheckpoint'ed per iteration
    * so the per-merge HOF rewrite never stacks into a nested plan.
    * Self-pairs (a = b) are skipped — see [[applyBpeMerge]]; the
    * practical impact is confined to long single-char runs.
    */
  def bpeLearn(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    var words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(concat(split(col("w"), ""),
        array(lit(graft.functions.BpeEncode.EndMarker))).as("s"), col("c"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.length < numMerges && !done) {
      val top = words
        .select(col("c"), explode(zip_with(
          slice(col("s"), lit(1), greatest(size(col("s")) - 1, lit(0))),
          slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .filter(col("p.a") =!= col("p.b"))
        .groupBy(col("p")).agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("p.a").asc, col("p.b").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(1) < 2) done = true
      else {
        val p = top(0).getStruct(0)
        val (a, b) = (p.getString(0), p.getString(1))
        merges += ((a, b))
        words = words
          .select(applyBpeMerge(col("s"), a, b).as("s"), col("c"))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** BPE-encode a corpus against FROZEN `merges` — the serving half:
    * one row per (document, word position) with the word's subword
    * tokens. The encode itself runs ONCE PER DISTINCT WORD (the
    * word-cache trick every real tokenizer uses) via the fused
    * [[graft.functions.BpeEncode]] fold, and the vocab-sized result
    * BROADCASTs back onto the exploded token stream — the corpus
    * text never shuffles, and per-row work is one hash probe. Frozen
    * merges make streaming encodes equal batch encodes by
    * construction.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("word_pos", "word")))
    val vocab = words.select("word").distinct()
      .select(col("word"),
        graft.functions.TextExpressions.bpeEncode(col("word"), merges)
          .as("bpe_tokens"))
    words.join(broadcast(vocab), Seq("word"))
      .select(col(idCol), col("word_pos"), col("word"),
        col("bpe_tokens"))
  }

  /** TF-IDF over (doc, token) pairs, `tfidf = tf · ln(N/df)`, rows
    * with `tf < minTf` dropped (the reference-style noise floor).
    *
    * Document frequency comes from a second two-level aggregate over
    * the tf rows JOINED back on the token — not a token-partitioned
    * window: a window partition cannot be split, so the head token of
    * a web corpus would straggle on one task, while a join is
    * AQE-skew-splittable and the aggregate itself map-side-combines.
    * df must be exact in the output (it's a reported column), so no
    * head-vocab floor here — the join stays a shuffle on (token, id,
    * counts) rows only; text never crosses an exchange. N is a 1-row
    * broadcast. 6dp rounding as everywhere.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
      minTf: Int = 3): DataFrame = {
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.filter(col("tf") >= minTf)
      .join(dfTab, "token")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("__n") / col("df")), 6).as("tfidf"))
  }

  /** Blocked inverted index: token → sorted posting lists of doc ids,
    * the IR workhorse behind decontamination lookups and corpus
    * search. Postings for a token are BLOCKED — split across
    * `nBlocks` output rows by `doc_id mod nBlocks` — because at web
    * scale the head token's posting list ("the" ≈ every document) is
    * itself 100s-of-GB: a single (token) group would funnel one
    * reducer AND materialize an unbounded array in one row. Blocking
    * turns the hot token into `nBlocks` bounded groups (the salted-
    * aggregate trick, [[Relational]]), each emitting a
    * |postings|/nBlocks-sized array; readers union the blocks of a
    * token (order-free: membership probes don't need global order,
    * and a merge of per-block sorted runs restores it when they do).
    *
    * `df` (document frequency) rides along per row from a second
    * token-keyed aggregate over the (token, block) partials — bounded
    * input (≤ |vocab|·nBlocks rows), map-side combined, so no
    * Zipf-head straggler (aggregates combine; windows don't — same
    * rationale as [[surprisal]]).
    *
    * Output: (token, block, df, n_docs block size, postings ASC
    * array) — deterministic: block assignment is modulo, arrays are
    * `array_sort`ed. Tokens with df < `minDf` are dropped (hapax
    * noise; the Zipf tail would otherwise dominate the row count).
    *
    * Plan shape: explode → (token, block, id-set partial) hash
    * aggregate (one exchange of (token, block, id) — never text) →
    * |vocab|-bounded df aggregate joined back (AQE broadcasts while
    * it fits).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      nBlocks: Int = 64, minDf: Long = 2L): DataFrame = {
    require(nBlocks > 0, "nBlocks must be positive")
    val posting = docs
      .select(col(idCol).cast("long").as("_id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token"), pmod(col("_id"), lit(nBlocks.toLong))
        .as("block"))
      .agg(count(lit(1)).as("n_docs"),
        array_sort(collect_list(col("_id"))).as("postings"))
    val dfTab = posting.groupBy(col("token"))
      .agg(sum(col("n_docs")).as("df"))
      .filter(col("df") >= minDf)
    posting.join(dfTab, "token")
      .select(col("token"), col("block"), col("df"), col("n_docs"),
        col("postings"))
  }

  /** Hashed tf-idf document embeddings (the feature-hashing trick,
    * Weinberger et al. 2009): every document becomes a fixed `dim`-
    * dimensional L2-normalized vector WITHOUT any trained model —
    * token → bucket by the portable leading-32-md5-bit hash, bucket
    * value = Σ tf·idf of its tokens — so the text family plugs
    * straight into the embedding family (cosine near-dup, k-means,
    * SemDeDup, ANN) on corpora that ship no embeddings. Collisions
    * fold rare tokens together; that is the hashing trick's accepted
    * trade (bounded dim, no vocabulary dictionary to build, ship, or
    * grow — the property that matters at 100 TB).
    *
    * Plan shape: the [[tfidf]] aggregates (all bounded or
    * (id, token)-keyed, map-side combined — text never shuffles) →
    * one (id, bucket) decimal-sum aggregate → per-doc array assembly
    * (`dim` entries) and an array-local norm. Docs with zero tokens
    * produce no row.
    *
    * Exactness: 6dp-rounded tf-idf weights sum as DECIMAL(38,6)
    * (order-free); the norm is one correctly-rounded sqrt of a
    * 12dp-decimal sum of squares; components round to 6dp after the
    * divide. Output EXPLODED as (idCol, k, v) rows — the
    * `q_random_project` convention for engine-portable numeric-array
    * comparison.
    */
  def hashedTfidfEmbedding(docs: DataFrame, idCol: String,
      textCol: String, dim: Int = 64): DataFrame = {
    require(dim > 0, "dim must be positive")
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("_tf"))
    val dfTab = tf.groupBy(col("token")).agg(count(lit(1)).as("_df"))
    // idf pre-rounded to 6dp BEFORE the product, exactly as the
    // frozen model stores it — the two forms must share arithmetic or
    // frozen == inline could never hold bit-exactly
    val weighted = tf.join(dfTab, "token")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"),
        round(col("_tf").cast("double") *
          round(log(col("__n") / col("_df")), 6), 6).as("_w"))
    hashedEmbed(weighted, idCol, dim)
  }

  /** Frozen idf model for [[hashedTfidfEmbedding]]'s serving split:
    * the top-`headVocab` tokens by document frequency (ties token
    * asc) with their exact 6dp idf, plus the corpus size under the
    * reserved token `""` (whitespace tokenization can never produce
    * an empty token). The head-vocab trick again: the table is
    * bounded forever; tail tokens take the MAX idf ln(N/1) — the
    * value a df-1 token would have, so a hapax scores identically
    * frozen or inline whenever the head covers every df≥2 token.
    * Train once per corpus version, broadcast to score any later
    * corpus or stream ([[dsirModel]]'s contract).
    */
  def hashedIdfModel(docs: DataFrame, textCol: String,
      headVocab: Int = DefaultHeadVocab): DataFrame = {
    require(headVocab > 0, "headVocab must be positive")
    val n = docs.agg(count(lit(1)).cast("double").as("_nd"))
    val dfTab = docs
      .select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("_df"))
      .orderBy(col("_df").desc, col("token").asc)
      .limit(headVocab)
    dfTab.crossJoin(broadcast(n))
      .select(col("token"), round(log(col("_nd") / col("_df")), 6)
        .as("idf"))
      .unionByName(n.select(lit("").as("token"),
        round(col("_nd"), 6).as("idf")))
  }

  /** [[hashedTfidfEmbedding]] against a FROZEN [[hashedIdfModel]] —
    * the serving path: the model broadcasts onto the (id, token, tf)
    * stream, unseen tokens take the tail idf ln(N/1), and the rest of
    * the chain (bucket, decimal sums, norm) is shared with the inline
    * form via [[hashedEmbed]]. Equal to the inline form whenever the
    * model's head covers the corpus vocabulary and N matches
    * (spec-pinned), which is exactly the frozen==inline contract the
    * DSIR/PQ/CMS splits carry.
    */
  def hashedTfidfEmbeddingAgainst(docs: DataFrame, idCol: String,
      textCol: String, model: DataFrame, dim: Int = 64): DataFrame = {
    require(dim > 0, "dim must be positive")
    val nd = model.filter(col("token") === "")
      .select(col("idf").as("_nd"))
    val head = model.filter(col("token") =!= "")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("_tf"))
    val weighted = tf.join(broadcast(head), Seq("token"), "left")
      .crossJoin(broadcast(nd))
      .select(col(idCol), col("token"),
        round(col("_tf").cast("double") *
          coalesce(col("idf"), round(log(col("_nd")), 6)), 6).as("_w"))
    hashedEmbed(weighted, idCol, dim)
  }

  /** Shared tail of the hashed-embedding forms: (id, token, 6dp
    * weight) rows → md5 bucket → decimal bucket sums → dense array →
    * lossless-decimal norm → normalized (id, k, v) rows.
    */
  private def hashedEmbed(weighted: DataFrame, idCol: String,
      dim: Int): DataFrame = {
    val bucket = conv(substring(md5(col("token")), 1, 8), 16, 10)
      .cast("long") % dim
    val summed = weighted
      .select(col(idCol), bucket.as("_b"),
        col("_w").cast("decimal(38,6)").as("_w"))
      .groupBy(col(idCol), col("_b"))
      .agg(sum(col("_w")).cast("double").as("_v"))
    val normTab = summed.groupBy(col(idCol))
      .agg(round(sqrt(
        sum(round(col("_v") * col("_v"), 12).cast("decimal(38,12)"))
          .cast("double")), 6).as("_n"))
    val assembled = summed.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(
        struct(col("_b"), col("_v")))).as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit((dim - 1).toLong)),
          b => coalesce(try_element_at(col("_m"), b), lit(0.0)))
          .as("_vec"))
    assembled.join(normTab, idCol)
      .select(col(idCol), posexplode(col("_vec")).as(Seq("k", "_raw")),
        col("_n"))
      .select(col(idCol), col("k").cast("long").as("k"),
        when(col("_n") > 0, round(col("_raw") / col("_n"), 6))
          .otherwise(0.0).as("v"))
  }

  /** Default head-vocabulary budget for the surprisal family: 2^18
    * entries ≈ a few MB broadcast — still far past CCNet's shipped
    * LMs (and past any pruned bigram table), so the tail floor only
    * ever fires on hapax-class tokens/pairs, while BUILDING the head
    * (distributed top-k over the count table, then a driver collect
    * for the broadcast) stays cheap even when the pair vocabulary
    * runs to millions: the Zipf probe showed a 2^20 bigram head
    * spending its time sorting and shipping two 1M-row broadcasts.
    * Every sf-scale vocabulary fits entirely, keeping the oracles
    * exact.
    */
  val DefaultHeadVocab: Int = 1 << 18

  // `size` shadowed by chunkText's parameter; alias the function
  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)
}
