package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north star:
  * BASELINE.json). All pure column expressions — codegen'd, narrow, scale
  * linearly with no shuffle; the groupBy lives in the caller when needed.
  */
object TextAnalysis {

  /** Whitespace token count. Deterministic, no UDF. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: splits on word boundaries AND intra-word
    * transitions (letter/digit runs, ASCII punctuation), approximating
    * tokenizer granularity without a vocab. Regex-only — stays in codegen.
    * Boundaries are marked by capture-group space insertion rather than
    * lookarounds, so the identical RE2-safe patterns run in a SQL oracle.
    */
  def subwordCount(text: Column): Column = {
    val punct = "[!-/:-@\\[-`{-~]" // ASCII punctuation, both regex engines
    val s1 = regexp_replace(text, raw"(\p{L})(\p{N})", "$1 $2")
    val s2 = regexp_replace(s1, raw"(\p{N})(\p{L})", "$1 $2")
    val s3 = regexp_replace(s2, "(" + punct + ")", " $1 ")
    size(filter(split(s3, "\\s+"), c => length(c) > 0))
  }

  // Ratio contract (poisoned-corpus sweep, r15): an EMPTY text makes
  // every denominator below zero, and ANSI division turns that into a
  // whole-batch abort — one empty document killed t_quality_score,
  // p_corpus_stats, p_budget_select, d_cluster_keep_best and
  // d_domain_filter. nullif() nulls the ratio instead, which is ALSO
  // the parity choice: DuckDB defines x/0.0 = NULL, so the oracles
  // already score empty text this way (NULL < threshold ⇒ rule fails
  // ⇒ 0 weight, identically on both engines).
  private def ratio(num: Column, den: Column): Column =
    num.cast("double") / nullif(den.cast("double"), lit(0.0))

  /** Characters-per-token ratio — a cheap fertility proxy. */
  def charsPerToken(text: Column): Column =
    ratio(length(text), tokenCount(text))

  /** Punctuation ratio: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    ratio(length(text) - length(regexp_replace(text, raw"\p{Punct}", "")),
      length(text))

  /** Uppercase ratio. */
  def upperRatio(text: Column): Column =
    ratio(length(text) - length(regexp_replace(text, "[A-Z]", "")),
      length(text))

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    ratio(aggregate(toks, lit(0L), (acc, w) => acc + length(w)), size(toks))
  }

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")

  /** Stopword ratio: fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val sw = typedLit(stopwords)
    ratio(size(filter(toks, t => array_contains(sw, t))), size(toks))
  }

  /** Composite quality score in [0,1] — the Gopher-rule-style heuristic
    * (length, punctuation, stopword presence), tunable weights.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(50, 100000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.3, 1.0).otherwise(0.0)
    val swOk = when(stopwordRatio(text) > 0.01, 1.0).otherwise(0.0)
    round((lenOk * 0.4 + punctOk * 0.3 + swOk * 0.3), 4)
  }

  /** [[qualityScore]] scaled to millionths with PURE INTEGER arithmetic:
    * the ratio thresholds become cross-multiplied integer compares
    * (punct/chars < 0.3 ⇔ punct*10 < chars*3; sw/toks > 0.01 ⇔
    * sw*100 > toks), so no double — and no engine-dependent `round` —
    * ever enters the value. Bit-identical across any engine pair; used
    * by the corpus-datasheet oracle (`x_corpus_report`).
    */
  def qualityMicros(text: Column): Column = {
    val nChars = length(text).cast("long")
    val nPunct = (length(text) -
      length(regexp_replace(text, raw"\p{Punct}", ""))).cast("long")
    val toks = split(lower(trim(text)), "\\s+")
    val sw = typedLit(englishStopwords)
    val nToks = size(toks).cast("long")
    val nSw = size(filter(toks, t => array_contains(sw, t))).cast("long")
    (when(length(text).between(50, 100000), 400000L).otherwise(0L) +
      when(nPunct * 10 < nChars * 3, 300000L).otherwise(0L) +
      when(nSw * 100 > nToks, 300000L).otherwise(0L)).cast("long")
  }

  /** N-gram-frequency language ID heuristic: score text against per-language
    * marker-word lists, pick the argmax (ties → first). Pure expressions; a
    * production path would broadcast-join a trigram model — same plan shape.
    */
  def langId(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is", "with", "that"),
      "de" -> Seq("der", "die", "und", "ist", "nicht", "das"),
      "es" -> Seq("el", "la", "que", "los", "una", "por"),
      "fr" -> Seq("le", "les", "des", "est", "une", "dans"))
    val toks = split(lower(trim(text)), "\\s+")
    val scores = markers.map { case (lang, ws) =>
      val swl = typedLit(ws)
      lang -> size(filter(toks, t => array_contains(swl, t)))
    }
    // argmax via chained when: pick first language whose score is maximal
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lang).otherwise(acc)
    }
  }

  /** Edit distance between two strings (built-in levenshtein) — the
    * verification metric for fuzzy dedup on short fields (titles, names).
    */
  def editDistance(a: Column, b: Column): Column = levenshtein(a, b)

  /** Normalized edit similarity in [0,1]. */
  def editSimilarity(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") /
      greatest(length(a), length(b), lit(1)).cast("double")

  /** Phonetic blocking key (soundex of the first token) — groups
    * sound-alike values for fuzzy-dedup candidate generation.
    */
  def phoneticKey(text: Column): Column =
    soundex(element_at(split(trim(text), "\\s+"), 1))

  /** Word-set fingerprint (the OpenRefine "fingerprint" keying): lowercase,
    * strip punctuation, dedupe+sort tokens, hash. Stable doc identity for
    * fuzzy exact-dedup.
    */
  def fingerprint(text: Column): Column = {
    val toks = array_sort(array_distinct(
      filter(split(lower(regexp_replace(text, raw"[^\p{L}\p{N}\s]", " ")), "\\s+"),
        t => length(t) > 0)))
    // No tokens (null/empty/whitespace text) -> NULL, not md5('') —
    // concat_ws would silently hash every contentless doc to the SAME
    // key, fusing them into one dedup cluster (poisoned-corpus sweep).
    // nullif on the known empty digest rather than when(size(toks)>0, …):
    // the guard form evaluates the whole tokenizer pipeline TWICE per row
    // (no CSE inside conditional branches). concat_ws('') occurs exactly
    // when the array is empty or null — every kept token is non-empty.
    nullif(md5(concat_ws(" ", toks)),
      lit("d41d8cd98f00b204e9800998ecf8427e"))
  }

  /** Rolling-hash document fingerprint: polynomial hash over tokens, each
    * token itself a polynomial hash of its character codepoints, mod a
    * large prime (keeps the accumulator in range under ANSI arithmetic).
    * Order-sensitive (unlike [[fingerprint]]); detects exact reorderings.
    * Engine-portable by construction — pure integer arithmetic over
    * codepoints, reproducible in any SQL engine with list folds.
    */
  def rollingHash(text: Column): Column = {
    def wordHash(w: Column): Column =
      aggregate(transform(split(w, ""), c => ascii(c).cast("long")),
        lit(0L), (a, c) => pmod(a * lit(131L) + c, lit(1000000007L)))
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, w) => pmod(acc * lit(31L) + wordHash(w), lit(1000000007L)))
  }

  /** Character n-gram shingles (for MinHash / Jaccard) — single-pass native
    * expression (same re-evaluation hazard as word shingles).
    */
  def charShingles(text: Column, n: Int): Column =
    graft.exprs.HashExprs.char_shingles(text, n)

  /** Word n-gram shingles — a single-pass native expression
    * ([[graft.exprs.HashExprs.WordShingles]]): the `transform(sequence(...))`
    * formulation re-runs the tokenizer regex once per shingle index
    * (O(len·shingles) per row — measured 1000× slower at sf0.1).
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.exprs.HashExprs.word_shingles(text, n)

  /** ASCII-regex tokenization (lowercase, alnum runs) — the oracle-portable
    * tokenizer for per-document STATISTICS where the engine and a SQL
    * oracle must agree token-for-token. Materialize the result into a
    * column (`withColumn`) before feeding higher-order functions: lambda
    * bodies re-evaluate referenced subtrees per element.
    */
  def asciiTokens(text: Column): Column =
    filter(split(lower(regexp_replace(text, "[^a-zA-Z0-9]+", " ")), " "),
      t => t =!= "")

  /** Sentence count: runs of terminal punctuation, floored at 1 so the
    * readability ratios below never divide by zero on fragment documents.
    */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))

  /** Heuristic syllable count over an [[asciiTokens]] array: vowel-group
    * runs (`[aeiouy]+`) per token, floored at 1 per token (an all-consonant
    * or numeric token still costs one syllable, as in standard Flesch
    * implementations). Pure scan-stage expressions; the vowel-group regex
    * is RE2-safe so a SQL oracle computes the identical count.
    */
  def syllableCount(tokens: Column): Column =
    aggregate(tokens, lit(0),
      (acc, t) => acc +
        greatest(size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))), lit(1)))

  /** Flesch Reading Ease: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words) — the classic document-readability quality
    * signal (filter rubric: &lt;30 is graduate-level prose, &gt;90 is
    * grade-school). Null for empty documents. The arithmetic is plain
    * IEEE-double ops in a fixed order, so a SQL oracle reproduces it
    * bit-for-bit.
    */
  def fleschReadingEase(nWords: Column, nSents: Column, nSylls: Column): Column =
    when(nWords > 0,
      round(lit(206.835)
        - lit(1.015) * (nWords.cast("double") / nSents.cast("double"))
        - lit(84.6) * (nSylls.cast("double") / nWords.cast("double")), 6))

  /** Flesch–Kincaid grade level: 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59. Null for empty documents. */
  def fkGradeLevel(nWords: Column, nSents: Column, nSylls: Column): Column =
    when(nWords > 0,
      round(lit(0.39) * (nWords.cast("double") / nSents.cast("double"))
        + lit(11.8) * (nSylls.cast("double") / nWords.cast("double"))
        - lit(15.59), 6))

  /** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003 — the MOSS algorithm): normalize to lowercase
    * alphanumerics, hash every char `k`-gram with an exact small-range
    * polynomial (base-31 over code points — NO modulus: max value for
    * k ≤ 9 stays far under 2⁶³, so every engine computes it bit-exactly),
    * then keep the MINIMUM hash of each sliding window of `w` consecutive
    * k-grams. Guarantees a shared fingerprint for any match of length
    * ≥ w+k−1 while storing ~2/(w+1) of the hashes — the classic
    * sublinear document signature for plagiarism/near-dup detection.
    * Returns the SORTED DISTINCT selected hashes (array<long>).
    *
    * Pure scan-stage expressions (no shuffle, no UDF); k is unrolled at
    * plan time so the polynomial is a flat codegen expression.
    */
  def winnowGramHashes(text: Column, k: Int = 5): Column = {
    require(k >= 1 && k <= 9, "k-gram hash is exact only for k <= 9")
    val norm = regexp_replace(lower(text), "[^a-z0-9]+", "")
    val m = length(norm) - lit(k - 1) // k-gram count (may be <= 0)
    val gramHash: Column => Column = i =>
      (1 until k).foldLeft(ascii(norm.substr(i, lit(1))).cast("long")) {
        (acc, j) => acc * 31 + ascii(norm.substr(i + lit(j), lit(1))).cast("long")
      }
    when(m >= 1, transform(sequence(lit(1), m), gramHash))
      .otherwise(array().cast("array<long>"))
  }

  /** Window-minimum selection over a MATERIALIZED k-gram hash array (see
    * [[winnowGramHashes]]; materialize between the two steps — a lambda
    * referencing the hash subtree would re-evaluate it per window).
    * Documents with fewer than `w` grams contribute their single minimum;
    * empty hash arrays select nothing.
    */
  def winnowSelect(hashes: Column, w: Int = 4): Column = {
    val m = size(hashes)
    when(m >= w,
        array_sort(array_distinct(transform(sequence(lit(1), m - lit(w - 1)),
          j => array_min(slice(hashes, j, lit(w)))))))
      .otherwise(when(m >= 1, array(array_min(hashes)))
        .otherwise(array().cast("array<long>")))
  }

  /** Winnowing fingerprints in one native pass — semantically identical to
    * `winnowSelect(winnowGramHashes(text, k), w)` but O(m·k) per row via
    * [[graft.exprs.HashExprs.WinnowFps]]. The column pair above is kept as
    * the readable spec of the algorithm; USE THIS in operators: the column
    * formulation's lambda subtrees re-evaluate per element (no codegen, no
    * CSE in higher-order functions), which goes O(m²) per document the
    * moment an optimizer rule collapses the staging projections.
    */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.exprs.HashExprs.winnow_fps(text, k, w)

  /** POSITIONAL word n-grams over a materialized token array: one entry
    * per start position 1..len−n+1, WITH multiplicity (unlike
    * [[wordShingles]], which is a distinct set) — the building block for
    * span-level dedup and corpus n-gram statistics. Empty array for docs
    * shorter than n (`sequence(1, 0)` would EXPAND descending, hence the
    * guard). Pure scan-stage expressions.
    */
  def positionalNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Fraction of duplicated word n-grams in a document — the Gopher-rule
    * repetition signal for training-data quality filtering (public
    * technique: Rae et al. 2021 §A1.1 "repetition" filters): documents
    * whose n-grams repeat heavily (boilerplate, keyword stuffing, decoding
    * loops) score near 1 and are dropped before training. `toks` must be a
    * MATERIALIZED token-array column (see [[asciiTokens]]).
    *
    * Pure codegen-able column expressions over the row — no shuffle; at
    * 100 TB this runs in the scan stage like the other quality signals.
    */
  /** PII redaction for training corpora: emails → `<EMAIL>`, IPv4 → `<IP>`,
    * phone-like digit runs → `<PHONE>`, applied in that order (emails/IPs
    * are redacted before the looser phone pattern can eat their digits).
    * Patterns are RE2-safe (no lookarounds/backrefs) so a SQL oracle
    * applies the identical semantics. Pure codegen'd regexp_replace chain —
    * scan-stage work, like the other text signals.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d -]{7,}\\d", "<PHONE>")
  }

  /** Special-token scrub — training-data poisoning defense: user/web text
    * must not contain the control tokens the tokenizer maps to reserved
    * ids (`<|endoftext|>`-style markers, `<s>`/`</s>`, chat-template
    * brackets, `<pad>`/`<unk>`/`<mask>`) — a document that embeds them
    * literally can truncate context or inject turns at training time.
    * [[specialTokenCount]] is the audit signal; [[scrubSpecialTokens]]
    * removes them. One RE2-safe alternation, scan-stage codegen.
    */
  private val specialTokenRe =
    "<\\|[a-zA-Z0-9_]+\\|>|</?s>|\\[INST\\]|\\[/INST\\]|<pad>|<unk>|<mask>"

  def specialTokenCount(text: Column): Column =
    regexp_count(text, lit(specialTokenRe))

  def scrubSpecialTokens(text: Column): Column =
    regexp_replace(text, specialTokenRe, "")

  /** URL canonicalization — the FIRST dedup key of any web-crawl pipeline
    * (two crawls of the same page differ in case, default ports, tracking
    * params, fragments and query order long before their text differs).
    * Applies the standard normalizations: drop the fragment, lowercase
    * scheme+authority only (paths are case-sensitive), strip default
    * ports (:443 https / :80 http), drop `utm_*` tracking params, sort
    * the remaining query params. Every step is a portable
    * regexp/array transformation — no URL parser — so a SQL oracle can
    * apply bit-identical semantics. Pure scan-stage codegen, no shuffle.
    */
  def normalizeUrl(url: Column): Column = {
    val base = regexp_replace(url, "#.*", "") // fragment
    val query = regexp_extract(base, "\\?(.*)$", 1)
    val path = regexp_replace(base, "\\?.*$", "")
    val head = regexp_extract(path, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    val rest = path.substr(length(head) + lit(1), lit(1 << 24))
    val headNorm = regexp_replace(
      regexp_replace(lower(head), "^(https://[^/:]+):443$", "$1"),
      "^(http://[^/:]+):80$", "$1")
    val params = array_sort(filter(split(query, "&"),
      p => !p.startsWith("utm_") && p =!= ""))
    concat(headNorm, rest,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** HTML → text extraction — the WARC→WET step every web-crawl corpus
    * starts with (CommonCrawl WET, C4 §2.1, RefinedWeb §3.1): drop
    * script/style subtrees whole, strip remaining tags, unescape the
    * core entities (amp LAST, per spec, so `&amp;lt;` yields the
    * literal `&lt;`), collapse whitespace. Pure scan-stage
    * regexp/replace chain — RE2-safe (lazy block matches, no
    * lookaround), so the identical chain runs in DuckDB; no HTML parser
    * dependency, which is the point at 100 TB: tag stripping is a
    * per-row codegen'd expression, not a library call.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  def dupNgramFraction(toks: Column, n: Int): Column = {
    val total = greatest(size(toks) - n, lit(0)) + 1
    val grams = transform(sequence(lit(1), total),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    when(size(toks) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(grams)).cast("double") / total.cast("double"))
  }
}
