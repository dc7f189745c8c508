package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling (SURVEY.md §2.E2/E3 hot path).
  *
  * The composed form — `transform(sequence(...), i => concat_ws(" ",
  * slice(words, i, n)))` — evaluates interpreted and allocates a slice
  * array per shingle; profiling showed it dominates the dedup pipelines
  * (~4.6s of a 7s query at sf0.1). This expression emits all shingles
  * in one pass with a single output allocation.
  */
object NativeText {
  private val SPACE = UTF8String.fromString(" ")

  /** LCS length of two token arrays, truncated to maxTokens each —
    * the [[LcsLength]] kernel: two rolling primitive long rows,
    * O(min(m,cap)·min(n,cap)) time, zero per-cell allocation.
    */
  def lcsLen(a: ArrayData, b: ArrayData, maxTokens: Int): Long = {
    val m = math.min(a.numElements(), maxTokens)
    val n = math.min(b.numElements(), maxTokens)
    if (m == 0 || n == 0) return 0L
    val bt = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bt(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    var prev = new Array[Long](n + 1)
    var cur = new Array[Long](n + 1)
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      var jj = 0
      while (jj < n) {
        cur(jj + 1) =
          if (ai != null && bt(jj) != null && ai.equals(bt(jj)))
            prev(jj) + 1
          else math.max(prev(jj + 1), cur(jj))
        jj += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  /** Count of array elements equal to any marker (duplicates counted).
    * Marker sets are tiny (≤ a few dozen stopwords) so a linear probe
    * over a UTF8String array beats hashing — no per-row allocation.
    */
  def markerCount(words: ArrayData, markers: Array[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        var j = 0
        while (j < markers.length) {
          if (markers(j).equals(w)) { c += 1; j = markers.length }
          else j += 1
        }
      }
      i += 1
    }
    c
  }

  /** One-pass text statistics (SURVEY §2.E8/E9 hot path): the curation
    * flagship needs whitespace-token count, char/alpha counts and the
    * four per-language marker counts for EVERY document, and the
    * composed form costs ~10 regex/split passes per row (filter and
    * project each re-evaluate, and `words(c)` appears 5×). This computes
    * all of them in two scans of the string (original + lowercased)
    * with zero regex work, preserving the composed semantics exactly:
    *
    *  - out(0): `size(split(trim(c), "\\s+"))` — trim removes ASCII
    *    spaces only (Spark `trim`), split keeps leading/trailing empty
    *    segments produced by non-space whitespace (Java split, limit -1);
    *  - out(1): `length(c)` (code points);
    *  - out(2): `length(regexp_replace(c, "[^A-Za-z]", ""))`;
    *  - out(3+i): markerCount over the normalized words — runs of
    *    [a-z0-9] in `lower(c)` (UTF8String.toLowerCase, so e.g. Kelvin
    *    K lowercases to ASCII k exactly as Spark's `lower`).
    */
  def textStats(t: UTF8String, markerSets: Array[Array[UTF8String]]): ArrayData = {
    val out = new Array[Int](3 + markerSets.length)
    // --- whitespace tokens over the space-trimmed original
    val trimmed = t.trim()
    val nb = trimmed.numBytes()
    if (nb == 0) out(0) = 1
    else {
      def isWs(b: Byte): Boolean =
        b == 0x20 || (b >= 0x09 && b <= 0x0d)
      var runs = 0
      var inRun = false
      var i = 0
      while (i < nb) {
        val ws = isWs(trimmed.getByte(i))
        if (!ws && !inRun) { runs += 1; inRun = true }
        else if (ws) inRun = false
        i += 1
      }
      out(0) = runs +
        (if (isWs(trimmed.getByte(0))) 1 else 0) +
        (if (isWs(trimmed.getByte(nb - 1))) 1 else 0)
    }
    // --- code points + ASCII-alpha count over the original
    out(1) = t.numChars()
    var alpha = 0
    var i = 0
    val tn = t.numBytes()
    while (i < tn) {
      val b = t.getByte(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      i += 1
    }
    out(2) = alpha
    // --- marker counts over [a-z0-9] runs of the lowercased string
    val lower = t.toLowerCase
    val ln = lower.numBytes()
    var runStart = -1
    i = 0
    while (i <= ln) {
      val alnum = i < ln && {
        val b = lower.getByte(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      }
      if (alnum && runStart < 0) runStart = i
      else if (!alnum && runStart >= 0) {
        val runLen = i - runStart
        var s = 0
        while (s < markerSets.length) {
          val set = markerSets(s)
          var j = 0
          var matched = false
          while (j < set.length && !matched) {
            val m = set(j)
            if (m.numBytes() == runLen) {
              var k = 0
              var eq = true
              while (k < runLen && eq) {
                if (m.getByte(k) != lower.getByte(runStart + k)) eq = false
                k += 1
              }
              matched = eq
            }
            j += 1
          }
          if (matched) out(3 + s) += 1
          s += 1
        }
        runStart = -1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Shannon entropy (nats) of the codepoint distribution; ASCII fast
    * path counts bytes in a flat array, non-ASCII falls back to
    * codepoint iteration. Empty → 0. Σ c·ln(c) runs in deterministic
    * (ascending / insertion) order per input, so the value is stable
    * across partitionings; cross-engine agreement is up to 1 ulp of
    * libm ln (callers round).
    */
  def charEntropy(s: UTF8String): Double = {
    val nb = s.numBytes()
    if (nb == 0) return 0.0
    var ascii = true
    var i = 0
    while (ascii && i < nb) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val counts = new Array[Int](128)
      i = 0
      while (i < nb) { counts(s.getByte(i)) += 1; i += 1 }
      var acc = 0.0
      var c = 0
      while (c < 128) {
        if (counts(c) > 0) acc += counts(c) * math.log(counts(c).toDouble)
        c += 1
      }
      math.log(nb.toDouble) - acc / nb
    } else {
      val str = s.toString
      val m = new java.util.LinkedHashMap[Integer, Integer]()
      var j = 0
      var n = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        val prev = m.get(cp)
        m.put(cp, if (prev == null) 1 else prev + 1)
        j += Character.charCount(cp)
        n += 1
      }
      var acc = 0.0
      val it = m.values().iterator()
      while (it.hasNext) { val c = it.next().toInt; acc += c * math.log(c.toDouble) }
      math.log(n.toDouble) - acc / n
    }
  }

  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (words.isNullAt(i + j)) null
          else words.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003):
    * md5-hex each char k-gram, slide a w-hash window taking the
    * lexicographic minimum per window, return the sorted DISTINCT
    * minima. Guarantee: any substring match of length ≥ w+k−1 between
    * two docs shares at least one fingerprint. Engine-portable: md5
    * hex + lexicographic order mean nothing here is JVM-specific (the
    * MinHash portability trick). The window minimum runs as a
    * monotonic deque — O(n) total, not O(n·w).
    *
    * K-grams are CODEPOINT-based (≡ SQL substr semantics) via a byte-
    * offset walk of the UTF-8 input; docs shorter than k chars yield
    * no fingerprints, docs with fewer than w k-grams collapse to one
    * window (min of all hashes).
    */
  def winnow(t: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = t.getBytes
    // codepoint start offsets (ascii fast path falls out naturally)
    val nChars = t.numChars()
    val m = nChars - k + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      starts(ci) = bi
      val b = bytes(bi) & 0xff
      bi += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      ci += 1
    }
    starts(nChars) = bytes.length
    val md = md5Local.get()
    val hashes = new Array[String](m)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, starts(i), starts(i + k) - starts(i))
      val d = md.digest()
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HEX((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = HEX(d(j) & 0xf)
        j += 1
      }
      hashes(i) = new String(hex)
      i += 1
    }
    val out = new java.util.TreeSet[String]()
    if (m < w) {
      var best = hashes(0)
      var x = 1
      while (x < m) { if (hashes(x) < best) best = hashes(x); x += 1 }
      out.add(best)
    } else {
      // monotonic deque of candidate indices, increasing hash order
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0 // [head, tail)
      var x = 0
      while (x < m) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(x)) tail -= 1
        dq(tail) = x
        tail += 1
        if (dq(head) <= x - w) head += 1
        if (x >= w - 1) out.add(hashes(dq(head)))
        x += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(arr)
  }
}

/** word_shingles(array<string>, n) → array<string> of word n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NativeText.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeText.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** marker_count(array<string>, markers…) → int: occurrences of any
  * marker word in the array. The composed form — `size(filter(words,
  * w => w = m1 OR …))` — is a higher-order function: interpreted
  * per-element AND a whole-stage-codegen fence, so every query using
  * language ID / quality scoring lost codegen for its entire project.
  * This is the SURVEY §2.E8/E9 hot path (langScore is evaluated 5× per
  * row in the curation flagship).
  */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression {
  require(markers.nonEmpty, "marker_count needs at least one marker")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_count"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"marker_count needs array<string>, got ${other.catalogString}")
    }

  @transient private lazy val utf8Markers: Array[UTF8String] =
    markers.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    NativeText.markerCount(input.asInstanceOf[ArrayData], utf8Markers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markers", utf8Markers,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeText.markerCount($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCount =
    copy(child = newChild)
}

/** text_stats(string) → array<int> of [ws_tokens, n_chars, n_alpha,
  * marker_count(set_0), …]. One fused pass replacing the ~10 regex /
  * split evaluations the composed quality-score + language-ID pipeline
  * costs per row (filter AND project each re-evaluate; no cross-stage
  * CSE). qualityScore/langId derive from this array; the composed
  * forms remain as executable specs (equality asserted in
  * NativeExprSpec).
  */
case class TextStats(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "text_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_stats needs string, got ${other.catalogString}")
    }

  @transient private lazy val utf8Sets: Array[Array[UTF8String]] =
    markerSets.map(_.map(UTF8String.fromString).toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    NativeText.textStats(input.asInstanceOf[UTF8String], utf8Sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSets", utf8Sets,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeText.textStats($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** char_entropy(string) → double: Shannon entropy (nats) of the
  * CODEPOINT distribution — low entropy flags repetitive/boilerplate
  * text (`aaaa…`, padded tables), high entropy flags binary-ish noise;
  * both are standard corpus-quality filters. One pass over UTF-8
  * bytes, codegen'd; ln(n) − Σ cᵢ·ln(cᵢ)/n so ln is taken on exact
  * integer counts (engine-portable up to final 1-ulp, absorbed by the
  * caller's round()).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy needs string, got ${other.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    NativeText.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeText.charEntropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** winnow_fingerprints(string, k, w) → array<string>: sorted distinct
  * window-minima of md5-hex char k-grams — the MOSS document
  * fingerprint (any shared substring of length ≥ w+k−1 ⇒ a shared
  * fingerprint). Runs entirely inside the scan stage: the 100 TB
  * fingerprint extraction needs ZERO shuffles (vs the declarative
  * posexplode + window form, which shuffles the full k-gram stream on
  * doc id — that form is the executable spec in the oracle).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be ≥ 1: k=$k w=$w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NativeText.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeText.winnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** lcs_len(array<string>, array<string>, maxTokens) → bigint: longest
  * common subsequence length of two token sequences, both truncated to
  * the first `maxTokens` tokens (the eval-harness convention — LCS is
  * O(m·n) per pair, the cap is the budget; standard ROUGE tooling caps
  * the same way). The DP is imperative by nature (no HOF form exists:
  * row j depends on row j−1 AND cell j−1 of the current row), so the
  * brute-force twin lives in Round10OpsSpec rather than a composed
  * Column. Two rolling primitive rows — no per-cell allocation; null
  * tokens never match (a null is not equal to anything, the SQL rule).
  */
case class LcsLength(left: Expression, right: Expression, maxTokens: Int)
    extends BinaryExpression {
  require(maxTokens >= 1 && maxTokens <= 4096,
    s"lcs_len: maxTokens $maxTokens out of [1, 4096]")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lcs_len"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lcs_len needs two array<string>, got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeText.lcsLen(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], maxTokens)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NativeText.lcsLen($a, $b, $maxTokens);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): LcsLength = copy(left = l, right = r)
}

object TextNativeFunctions {
  def lcsLength(a: Column, b: Column, maxTokens: Int): Column =
    GraftBridge.column(LcsLength(GraftBridge.expression(a),
      GraftBridge.expression(b), maxTokens))

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(text), k, w))

  def wordShingles(words: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(words), n))

  def markerCount(words: Column, markers: Seq[String]): Column =
    GraftBridge.column(MarkerCount(GraftBridge.expression(words), markers))

  def textStats(text: Column, markerSets: Seq[Seq[String]]): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(text), markerSets))

  def charEntropy(text: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(text)))
}
