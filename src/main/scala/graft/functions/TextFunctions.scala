package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for the LLM-data-pipeline surface
  * (SURVEY.md §2.E8-E11): language ID, quality scoring, token counting,
  * shingling, fingerprinting.
  *
  * All pure `Column` expressions (higher-order array functions, regexes)
  * — codegen-eligible, shuffle-free, and exactly mirrorable in the
  * DuckDB oracle. At 100 TB these run as map-side work inside the scan
  * stage: no operator here introduces a shuffle.
  */
object TextFunctions {

  /** Canonical normalization used by every dedup/fingerprint operator:
    * lowercase, collapse every non-alphanumeric run to one space, trim.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Normalized word array. */
  def words(c: Column): Column = split(normalizeText(c), " ")

  /** Whitespace token count (reference-style quick count). */
  def wsTokenCount(c: Column): Column = size(split(trim(c), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks each count as one token — a deterministic proxy
    * for subword tokenizers, cheap enough for a 100 TB pass.
    */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles over the normalized text (distinct not applied
    * here; dedup operators decide). Empty array when fewer than n words.
    * Hot path is the native one-pass expression (plans.WordShingles);
    * [[shinglesComposed]] is the higher-order executable spec
    * (equality asserted in NativeExprSpec).
    */
  def shingles(c: Column, n: Int): Column =
    graft.plans.TextNativeFunctions.wordShingles(words(c), n)

  def shinglesComposed(c: Column, n: Int): Column = {
    val w = words(c)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "los"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "des", "et"))

  /** Count of marker stopwords for one language in the word array.
    * Hot path: the native one-pass `marker_count` expression (the
    * composed higher-order `filter` is interpreted AND fences off
    * whole-stage codegen for the whole projection — langScore runs 5×
    * per row in the curation flagship). [[langScoreComposed]] is the
    * executable spec (equality asserted in NativeExprSpec).
    */
  def langScore(c: Column, lang: String): Column =
    graft.plans.TextNativeFunctions.markerCount(words(c),
      markers.toMap.apply(lang))

  def langScoreComposed(c: Column, lang: String): Column = {
    val set = markers.toMap.apply(lang)
    size(filter(words(c), w => set.map(w === _).reduce(_ || _)))
  }

  /** One-pass text statistics array (native, codegen'd): [ws_tokens,
    * n_chars, n_alpha, en_markers, es_markers, de_markers, fr_markers].
    * The single fused scan feeds qualityScore + langId; per-projection
    * CSE evaluates equal `text_stats` subtrees once, so the curation
    * pipeline pays one string pass where the composed form paid ~10
    * regex/split evaluations (profiled 2.4s → see SURVEY §7).
    */
  def textStats(c: Column): Column =
    graft.plans.TextNativeFunctions.textStats(c, markers.map(_._2))

  /** Heuristic language ID over marker-stopword counts with a fixed
    * priority order (en > es > de > fr) on ties — deterministic, fully
    * SQL-mirrorable. A production deployment would swap in a trained
    * n-gram model behind the same column contract.
    * Hot path derives from the one-pass [[textStats]] array;
    * [[langIdComposed]] is the executable spec.
    */
  def langId(c: Column): Column = langIdFrom(textStats(c))

  def langIdFrom(stats: Column): Column = {
    val en = stats.getItem(3); val es = stats.getItem(4)
    val de = stats.getItem(5); val fr = stats.getItem(6)
    when(en >= greatest(es, de, fr), "en")
      .when(es >= greatest(de, fr), "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  def langIdComposed(c: Column): Column = {
    val en = langScore(c, "en"); val es = langScore(c, "es")
    val de = langScore(c, "de"); val fr = langScore(c, "fr")
    when(en >= greatest(es, de, fr), "en")
      .when(es >= greatest(de, fr), "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Document quality score in [0,1]: token volume (saturating at 100),
    * alphabetic density, and stopword density, weighted 0.4/0.3/0.3.
    * Hot path derives from the one-pass [[textStats]] array;
    * [[qualityScoreComposed]] is the executable spec.
    */
  def qualityScore(c: Column): Column = qualityScoreFrom(textStats(c))

  def qualityScoreFrom(stats: Column): Column = {
    val nTok = stats.getItem(0).cast("double")
    val nChars = stats.getItem(1).cast("double")
    val alphaRatio = when(nChars > 0,
      stats.getItem(2) / nChars).otherwise(0.0)
    val stopRatio = when(nTok > 0,
      stats.getItem(3).cast("double") / nTok).otherwise(0.0)
    val score = least(nTok / 100.0, lit(1.0)) * 0.4 + alphaRatio * 0.3 +
      stopRatio * 0.3
    // explicit half-up rounding — engine-independent (Spark round is
    // HALF_UP, DuckDB's HALF_EVEN; floor is identical everywhere)
    floor(score * 10000.0 + 0.5) / 10000.0
  }

  def qualityScoreComposed(c: Column): Column = {
    val nTok = wsTokenCount(c).cast("double")
    val nChars = length(c).cast("double")
    val alphaRatio = when(nChars > 0,
      length(regexp_replace(c, "[^A-Za-z]", "")) / nChars).otherwise(0.0)
    val stopRatio = when(nTok > 0,
      langScore(c, "en").cast("double") / nTok).otherwise(0.0)
    val score = least(nTok / 100.0, lit(1.0)) * 0.4 + alphaRatio * 0.3 +
      stopRatio * 0.3
    floor(score * 10000.0 + 0.5) / 10000.0
  }

  /** Content fingerprint of the normalized text (md5 — stable across
    * engines; see also plans.RollingHash for the codegen'd rolling hash).
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c).cast("binary"))

  // ------------------------------------------------------------- readability

  /** E74: sentence count — runs of sentence-final punctuation, floored
    * at 1 so ratio denominators stay live (headline-style docs have no
    * terminal punctuation at all).
    */
  def sentenceCount(c: Column): Column =
    greatest(regexp_count(c, lit("[.!?]+")), lit(1)).cast("long")

  /** E74: syllable proxy — vowel-GROUP count (the standard cheap
    * estimator: each maximal [aeiouy]+ run ≈ one syllable). Exact
    * per-row integer; the real CMU-dict counter is a lookup table
    * behind the same column contract.
    */
  def syllableCount(c: Column): Column =
    regexp_count(lower(c), lit("[aeiouy]+")).cast("long")

  /** E74: Flesch reading ease — 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). Each ratio is ONE IEEE division of exact
    * integers and the linear form evaluates in fixed literal order, so
    * the double is engine-deterministic; rounded half-up to 4dp via
    * the floor(+0.5) idiom (works for the negative scores garbage
    * text produces). NULL when there are no words.
    */
  def fleschEase(words: Column, sentences: Column,
                 syllables: Column): Column = {
    val wps = words.cast("double") / sentences
    val spw = syllables.cast("double") / words
    when(words > 0,
      floor((lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
        * 10000.0 + 0.5) / 10000.0)
  }

  /** E74: Flesch–Kincaid grade level — 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59; same determinism argument as
    * [[fleschEase]].
    */
  def fkGrade(words: Column, sentences: Column,
              syllables: Column): Column = {
    val wps = words.cast("double") / sentences
    val spw = syllables.cast("double") / words
    when(words > 0,
      floor((lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
        * 10000.0 + 0.5) / 10000.0)
  }

  // ------------------------------------------------------------- encoding QA

  /** E75: mojibake detector — the classic UTF-8-read-as-Latin-1
    * artifacts ('Ã'+continuation, 'â€'+punctuation, stray 'Â') plus
    * U+FFFD replacement chars. Syntax is plain alternation + `.`, which
    * Java regex and RE2 interpret identically over code points.
    */
  val mojibakePattern: String = "(Ã.|â€.|Â.|�)"

  /** Control characters that should never appear in clean text
    * (C0 minus \t\n\r) — the other standard encoding-damage signal.
    */
  val ctrlPattern: String = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  def mojibakeCount(c: Column): Column =
    regexp_count(c, lit(mojibakePattern)).cast("long")

  def ctrlCharCount(c: Column): Column =
    regexp_count(c, lit(ctrlPattern)).cast("long")

  // ------------------------------------------------------------- PII detection

  /** PII candidate patterns (detection, as opposed to the blind
    * replacement in the masking pass). Kept to syntax both Java regex
    * and RE2 interpret identically — ASCII classes, bounded repeats,
    * `\b` word boundaries.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val card16Pattern = "\\b\\d{16}\\b"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Luhn checksum validity for a fixed-width 16-digit string. The
    * doubling positions are known at plan time, so the whole check
    * unrolls into 16 codegen'd when-ladders — no higher-order
    * function, no UDF, and the oracle emits the identical unrolled
    * SQL (integer arithmetic only). This is the validation step that
    * separates PII DETECTION from regex masking: a random 16-digit
    * run fails Luhn 90% of the time, so validating cuts false
    * positives by an order of magnitude.
    */
  def luhn16(card: Column): Column = {
    val total = (1 to 16).map { i =>
      val d = substring(card, i, 1).cast("int")
      // position from the right r = 17 - i; double when r is even
      if ((17 - i) % 2 == 0) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
      else d
    }.reduce(_ + _)
    total % 10 === 0
  }

  /** All four IPv4 octets in [0, 255]. */
  def ipv4Valid(ip: Column): Column =
    size(filter(split(ip, "\\."), p => p.cast("int") > 255)) === 0

  /** HTML → text extraction (the crawl-curation first pass: every
    * web-derived corpus — C4, RefinedWeb, FineWeb — starts by
    * reducing markup to prose before any quality/dedup stage).
    * Fixed pipeline, every step a codegen'd regexp/replace so a
    * 100 TB crawl strips inside the scan stage with zero shuffles:
    *
    *  1. drop `<script>`/`<style>` ELEMENTS wholesale (their content
    *     is code, not prose) and `<!-- -->` comments;
    *  2. drop all remaining tags;
    *  3. decode the six entities that dominate real markup —
    *     `&nbsp; &quot; &#39; &lt; &gt;` and `&amp;` LAST, so
    *     `&amp;lt;` decodes to the literal text `&lt;` (one pass,
    *     not recursive — the standard single-decode semantics);
    *  4. collapse whitespace runs and trim.
    *
    * Patterns keep to the RE2 ∩ java.util.regex dialect (inline
    * `(?is)` flags, lazy `.*?`, no backreferences — RE2 has none),
    * so the DuckDB oracle runs the IDENTICAL pattern strings.
    */
  /** URL canonicalization (the crawl-dedup FIRST key: C4/RefinedWeb
    * dedup by normalized URL before any content pass). Two raw URLs
    * that differ only in case, default port, tracking params, param
    * order, fragment, or trailing slash are the same page:
    *
    *  1. drop the `#fragment` (client-side only);
    *  2. lowercase scheme and host (path stays case-sensitive);
    *  3. strip the scheme's default port (`:80` http, `:443` https);
    *  4. trim trailing `/` runs from the path; empty path → `/`;
    *  5. drop tracking params (`utm_*`, `gclid`, `fbclid`) and SORT
    *     the survivors — param order is transport noise.
    *
    * All steps are codegen'd regexps/array ops in the RE2 ∩ Java
    * dialect plus a binary-collation sort, so the DuckDB oracle
    * replays them exactly. Zero shuffles — canonicalization runs
    * inside the scan; the dedup groupBy downstream is the only
    * exchange.
    */
  def normalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val p0 = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val path = when(p0 === "", lit("/")).otherwise(p0)
    val params = filter(split(regexp_extract(rest, "\\?(.*)$", 1), "&"),
      p => !(p.rlike("^(utm_[a-z0-9]+|gclid|fbclid)=") || p === ""))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Outlink extraction — the web-graph construction step (PageRank /
    * harmonic-centrality quality signals, link-graph dedup): harvest
    * every `<a href=...>` target from raw markup, keep only absolute
    * http(s) links (relative hrefs need base-URL resolution — a
    * crawler concern, not an engine one). Composes with
    * [[normalizeUrl]] for the canonical outlink edge list. One
    * codegen'd `regexp_extract_all` + array filter — runs inside the
    * scan stage; patterns in the RE2 ∩ Java dialect (inline (?is),
    * no backrefs) so the oracle replays them verbatim.
    */
  def extractLinks(c: Column): Column =
    filter(
      regexp_extract_all(c,
        lit("(?is)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1)),
      h => h.rlike("(?i)^https?://"))

  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&"
    ).foldLeft(noTags) { case (acc, (ent, ch)) =>
      // literal replace (no regex metachars in the entities)
      regexp_replace(acc, ent, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** E103: Unicode script classes for the script-mix profile — each
    * is an EXPLICIT BMP codepoint range written with `\x{...}`
    * escapes, a syntax Java regex (Spark) and RE2 (the DuckDB oracle)
    * both accept with identical semantics. Named script properties
    * (`\p{IsCyrillic}` vs `\p{Cyrillic}`) spell differently per
    * engine and can disagree at Unicode-version edges — explicit
    * ranges cannot. BMP-only by construction: no surrogate-pair
    * ambiguity between code-unit and code-point regex engines.
    */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "digit" -> "0-9",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "cjk" -> "\\x{4E00}-\\x{9FFF}")

  /** Characters of `c` inside the character class `cls` (a range body
    * for a `[...]` class) — counted by stripping the complement.
    * Pure map-side column work; both engines count CODE POINTS via
    * `length`.
    */
  def charClassCount(c: Column, cls: String): Column =
    length(regexp_replace(c, s"[^$cls]", ""))
}
