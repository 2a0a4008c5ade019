package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond-reference surface; see SURVEY.md §7 step 10).
  *
  * Everything here is built from `org.apache.spark.sql.functions` only —
  * fully whole-stage-codegen'd, no UDFs — so the operators run at scan
  * speed and push down/prune like any native expression.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword pre-tokenization: letter runs, digit runs, single
    * punctuation marks (the GPT-2 pre-tokenizer shape, lowercased). */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def subwordCount(text: Column): Column = size(subwordTokens(text))

  /** Ratio helpers; all return double in [0,1], 0 for empty text. */
  private def ratio(part: Column, whole: Column): Column =
    when(whole > 0, part.cast("double") / whole.cast("double")).otherwise(lit(0.0))

  def alphaRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^A-Za-z]", "")), length(text))

  def digitRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^0-9]", "")), length(text))

  def punctRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")), length(text))

  def whitespaceRatio(text: Column): Column =
    ratio(length(text) - length(regexp_replace(text, "\\s", "")), length(text))

  /** Mean word length per Gopher's per-word definition: total non-whitespace
    * characters / token count (Σ len(token) = len(text stripped of \s), since
    * tokens are exactly the \S+ runs). Robust to repeated spaces, newlines
    * and \r\n — unlike a separator-count proxy. */
  def meanWordLength(text: Column): Column =
    when(tokenCount(text) > 0,
      length(regexp_replace(text, "\\s", "")).cast("double") / tokenCount(text))
      .otherwise(lit(0.0))

  /** Small embedded stopword lists (public, common function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "de", "que", "en", "por", "una"))

  private def stopwordPattern(lang: String): String =
    "\\b(" + stopwords(lang).mkString("|") + ")\\b"

  def stopwordCount(text: Column, lang: String = "en"): Column =
    size(regexp_extract_all(lower(text), lit(stopwordPattern(lang)), lit(0)))

  def stopwordRatio(text: Column, lang: String = "en"): Column =
    ratio(stopwordCount(text, lang), tokenCount(text))

  /** Heuristic n-gram/stopword language ID over {en,de,fr,es,zh}: CJK
    * characters dominate → zh, otherwise argmax of stopword hits with `en`
    * as the tie-break default. Deterministic, codegen'd. */
  def langId(text: Column): Column = {
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val scores = Seq("en", "de", "fr", "es").map(l => l -> stopwordCount(text, l))
    val best = scores.foldLeft((lit("en"), lit(0))) { case ((bl, bs), (l, s)) =>
      (when(s > bs, lit(l)).otherwise(bl), greatest(s, bs))
    }
    // "zh" only when CJK characters actually dominate (≥ 25% of the
    // text): a single quoted CJK word in an English article must not
    // reroute the whole document (integer compare, mirrored verbatim in
    // the oracle)
    when(cjk * 4 > length(text), lit("zh")).otherwise(best._1)
  }

  /** Composite quality score in [0,1]: favors mid-length documents with
    * high alpha ratio, moderate punctuation and sane word lengths
    * (Gopher/C4-style filters, re-expressed as a scalar score). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val alpha = alphaRatio(text)
    val wl = meanWordLength(text)
    val wlScore = when(wl.between(3.0, 10.0), 1.0).otherwise(0.5)
    val punct = punctRatio(text)
    val punctScore = when(punct < 0.1, 1.0).otherwise(lit(1.0) - punct)
    // floor(x*1e6 + 0.5)/1e6 instead of round(): identical IEEE semantics
    // in every engine (Spark's round goes through BigDecimal HALF_UP,
    // DuckDB's through C rounding — they can disagree on doubles)
    floor((lenScore * 0.3 + alpha * 0.4 + wlScore * 0.2 + punctScore * 0.1) * 1e6 + 0.5) / 1e6
  }

  /** Whitespace-normalized lowercase form used for fingerprinting/dedup. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text (stable across
    * engines — DuckDB md5 produces the identical hex). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** 64-bit polynomial rolling hash of the normalized text (Rabin-Karp
    * base-31), as a cheap orderable fingerprint. */
  def rollingFingerprint(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) None
      else {
        var h = 1125899906842597L
        var i = 0
        while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
        Some(h)
      })
    f(normalized(text))
  }

  // ------------------------------- repetition signals (Gopher-style)

  /** Non-empty lines of the raw text ('\n' or '\r\n' separated,
    * trimmed): crawled web text is frequently CRLF, and a trailing '\r'
    * left on every line would defeat the endsWith-punctuation gates
    * (C4) and the ellipsis checks. */
  private def lines(text: Column): Column =
    filter(transform(split(text, "\r?\n", -1), l => trim(l)), l => length(l) > 0)

  /** Fraction of lines that are repeats of an earlier line (Gopher
    * `duplicate_line_fraction`): 1 - distinct/total, 0 for no lines. */
  def dupLineFrac(text: Column): Column = {
    val ls = lines(text)
    ratio(size(ls) - size(array_distinct(ls)), size(ls))
  }

  /** Non-empty paragraphs: blank-line-separated chunks, trimmed. A chunk
    * may span lines (single newlines stay inside it). */
  private def paragraphs(text: Column): Column =
    filter(transform(split(text, "\r?\n\r?\n", -1), p => trim(p)), p => length(p) > 0)

  /** Fraction of paragraphs that repeat an earlier paragraph (Gopher
    * `duplicate_paragraph_fraction`). */
  def dupParagraphFrac(text: Column): Column = {
    val ps = paragraphs(text)
    ratio(size(ps) - size(array_distinct(ps)), size(ps))
  }

  /** Fraction of line CHARACTERS belonging to repeated copies (every
    * occurrence beyond a line's first counts its characters). A single
    * O(chars) pass with a per-row hash count — the earlier array-lambda
    * form was O(distinct × total) per row, which a 10k-line document turns
    * into 10⁸ comparisons inside one expression. Line splitting/trimming
    * matches [[lines]] exactly (ASCII-space trim, like Spark's `trim` and
    * the DuckDB oracle's). */
  def dupLineCharFrac(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) 0.0
      else {
        val counts = scala.collection.mutable.HashMap.empty[String, Int]
        var total = 0L
        var dup = 0L
        var from = 0
        while (from <= s.length) {
          val nl = s.indexOf('\n', from)
          val end = if (nl < 0) s.length else nl
          // space-only trim (Spark `trim` semantics; String.trim would
          // also strip tabs and diverge from the lambda tier/oracle)
          var b = from
          var e = end
          while (b < e && s.charAt(b) == ' ') b += 1
          while (e > b && s.charAt(e - 1) == ' ') e -= 1
          if (e > b) {
            val line = s.substring(b, e)
            total += line.length
            val seen = counts.getOrElse(line, 0)
            if (seen >= 1) dup += line.length
            counts(line) = seen + 1
          }
          from = end + 1
        }
        if (total == 0L) 0.0 else dup.toDouble / total
      })
    f(text)
  }

  /** Max share of document characters covered by one repeated word
    * `n`-gram: max over n-grams of occurrences × gram length, divided by
    * the normalized document length (a max-coverage variant of Gopher's
    * `top_ngram_char_fraction`, deterministic with no tie-break rule
    * needed). A DataFrame op, not a scalar column: the per-(doc, gram)
    * count is a distributed hash aggregate, so a pathological document
    * doesn't square inside one expression. Output: (id, top_frac). */
  def topNgramCharCoverage(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val toks = tokens(normalized(col(textCol)))
    val grams = df.select(col(idCol).as("id"),
        length(normalized(col(textCol))).as("doc_len"), toks.as("tk"))
      .select(col("id"), col("doc_len"),
        explode_outer(when(size(col("tk")) >= n,
          transform(sequence(lit(0), size(col("tk")) - n),
            i => concat_ws(" ", slice(col("tk"), i + 1, lit(n)))))
          .otherwise(array())).as("gram")) // explode_outer: short docs keep a null-gram row → top_frac 0
    grams.groupBy(col("id"), col("doc_len"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(max(col("cnt") * length(col("gram"))).as("cov"),
        first(col("doc_len")).as("doc_len"))
      .select(col("id"),
        when(col("doc_len") > 0, coalesce(col("cov"), lit(0L)).cast("double") / col("doc_len"))
          .otherwise(lit(0.0)).as("top_frac"))
  }

  // --------------------- document quality filters (Gopher Table A1 / C4)

  private def occurrences(text: Column, s: String): Column =
    (length(text) - length(call_function("replace", text, lit(s), lit("")))) / s.length

  /** Occurrences of '#' or an ellipsis ('…' or '...') per word — Gopher's
    * symbol-to-word ratio (threshold ≤ 0.1). 0 for wordless text. */
  def symbolToWordRatio(text: Column): Column =
    ratio(occurrences(text, "#") + occurrences(text, "…") +
      occurrences(text, "..."), tokenCount(text))

  /** Fraction of (non-empty, trimmed) lines starting with a bullet
    * character (•, ‣, ●, -, *) — Gopher threshold ≤ 0.9. */
  def bulletLineFrac(text: Column): Column = {
    val ls = lines(text)
    ratio(size(filter(ls, l => substring(l, 1, 1).isin("•", "‣", "●", "-", "*"))),
      size(ls))
  }

  /** Fraction of lines ending with an ellipsis — Gopher threshold ≤ 0.3. */
  def ellipsisLineFrac(text: Column): Column = {
    val ls = lines(text)
    ratio(size(filter(ls, l => l.endsWith("…") || l.endsWith("..."))), size(ls))
  }

  /** Fraction of words containing at least one ASCII letter — Gopher
    * threshold ≥ 0.8. */
  def alphaWordRatio(text: Column): Column = {
    val tk = tokens(text)
    ratio(size(filter(tk, t => t.rlike("[A-Za-z]"))), size(tk))
  }

  /** How many of Gopher's eight required English stop words appear as
    * whole words ({the, be, to, of, and, that, have, with}) — threshold
    * ≥ 2. */
  def requiredStopwordCount(text: Column): Column = {
    val lo = lower(text)
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => lo.rlike("\\b" + w + "\\b").cast("int"))
      .reduce(_ + _)
  }

  /** Gopher document-level keep decision (Rae et al. 2021, Table A1
    * document filters; the repetition thresholds are separate signals —
    * [[dupLineFrac]] etc.). All sub-signals are codegen built-ins. */
  def gopherKeep(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaWordRatio: Double = 0.8,
      minRequiredStopwords: Int = 2): Column = {
    val n = tokenCount(text)
    n.geq(minWords) && n.leq(maxWords) &&
      meanWordLength(text).between(minMeanWordLen, maxMeanWordLen) &&
      symbolToWordRatio(text).leq(maxSymbolRatio) &&
      bulletLineFrac(text).leq(maxBulletFrac) &&
      ellipsisLineFrac(text).leq(maxEllipsisFrac) &&
      alphaWordRatio(text).geq(minAlphaWordRatio) &&
      requiredStopwordCount(text).geq(minRequiredStopwords)
  }

  /** C4-style line filter (Raffel et al. 2020): keep lines that end in
    * terminal punctuation ('.', '!', '?', '"') and carry at least
    * `minWords` whitespace words; returns the retained lines re-joined
    * with '\n' (empty string when nothing survives). */
  def c4KeepLines(text: Column, minWords: Int = 3): Column =
    array_join(
      filter(lines(text), l =>
        (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
          l.endsWith("\"")) &&
          size(regexp_extract_all(l, lit("\\S+"), lit(0))).geq(minWords)),
      "\n")

  /** C4 document flags: boilerplate markers that drop the whole page. */
  def c4HasLoremIpsum(text: Column): Column =
    lower(text).contains("lorem ipsum")
  def c4HasCurlyBrace(text: Column): Column = text.contains("{")
}
