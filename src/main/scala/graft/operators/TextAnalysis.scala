package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, stopword-profile language scoring, and document
  * fingerprinting. All pure, codegen'd column expressions — no UDFs — so
  * they run at scan speed and their results are engine-exact (integer and
  * exactly-representable arithmetic wherever a ratio is emitted).
  */
object TextAnalysis {

  def tokens(textCol: Column): Column = split(textCol, " ")

  /** Codepoint-wise accent-fold map (lowercase Latin-1 Supplement +
    * common Latin Extended-A). 1:1 by construction — `translate` cannot
    * expand, so the ligatures œ/æ fold lossily to o/a (documented; CCNet's
    * fold table makes the same 1:1 choice for its hot path). Kept as two
    * parallel strings so the SAME literals drive both the Spark expression
    * and any SQL oracle. */
  val AccentFrom = "àáâãäåèéêëìíîïòóôõöøùúûüýÿñçšžœæ"
  val AccentTo = "aaaaaaeeeeiiiioooooouuuuyyncszoa"

  /** Text normalization — the C4/CCNet prep step (lowercase → accent fold
    * → whitespace collapse + trim) as ONE pure codegen'd column
    * expression: no UDF, no shuffle, stream-safe, and engine-portable
    * (`lower`/`translate`/`regexp_replace` are codepoint-wise Unicode in
    * Spark and DuckDB alike, and `\s+` means the same ASCII class in Java
    * regex and RE2). Lowercasing runs FIRST so the fold map only needs
    * lowercase entries. Idempotent: applying it twice is the identity on
    * its own output (spec-pinned).
    */
  def normalizeText(
      textCol: Column,
      lowercase: Boolean = true,
      stripAccents: Boolean = true,
      collapseWhitespace: Boolean = true
  ): Column = {
    val lowered = if (lowercase) lower(textCol) else textCol
    val folded = if (stripAccents) translate(lowered, AccentFrom, AccentTo) else lowered
    if (collapseWhitespace) trim(regexp_replace(folded, "\\s+", " ")) else folded
  }

  /** Language stopword profiles for the heuristic scorer. Tiny on purpose —
    * profiles broadcast as literals into the expression. */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es")
  )

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))

  // ---- column-level metric variants ------------------------------------
  // Each takes an ALREADY-PROJECTED token (or n-gram) array column and
  // returns a single metric expression. This is what lets a caller compose
  // several gates as one `select` + one `filter` over one scan — the
  // DataFrame forms below compute the same value expressions (same result
  // hashes; repetitionMetrics necessarily projects the intermediate counts
  // as output columns, so its plan differs structurally while its
  // dup_ngram_frac values are identical).

  /** `size(toks)` — whitespace token count. */
  def tokenCount(toks: Column): Column = size(toks)

  /** distinct-token / total-token ratio (double division of exact ints). */
  def distinctRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Per-language stopword hit counts, alphabetical by language code. */
  def languageHits(toks: Column): Seq[(String, Column)] =
    stopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> hitCount(toks, words)
    }

  /** Argmax language over [[languageHits]] (alphabetical tiebreak). */
  def detectedLanguage(toks: Column): Column =
    languageHits(toks).foldLeft((lit(""), lit(-1))) {
      case ((bestLang, bestHits), (lang, h)) =>
        (when(h > bestHits, lit(lang)).otherwise(bestLang),
         when(h > bestHits, h).otherwise(bestHits))
    }._1

  /** Word n-gram array, order-preserving and NON-distinct (repetition
    * counting needs the repeats; the dedup family's distinct form lives at
    * [[graft.operators.Dedup.shinglesOfTokens]]). Documents shorter than
    * `n` tokens yield one n-gram — the whole text. */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    val starts = sequence(lit(0), size(toks) - n)
    when(size(toks) >= n,
        transform(starts, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Repeated-n-gram fraction of a pre-projected [[wordNgrams]] array:
    * `round((total - distinct) / total, 4)` — the exact IEEE expression the
    * DataFrame form computes, so gate thresholds agree across both shapes. */
  def dupNgramFrac(grams: Column): Column =
    round((size(grams) - size(array_distinct(grams))).cast("double") /
      size(grams).cast("double"), 4)

  /** Per-document quality metrics:
    * token_cnt, distinct_cnt, avg_token_len, stop_ratio, distinct_ratio.
    * Ratios are double divisions of small exact integers — bit-identical in
    * any IEEE engine.
    */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val cnt = tokenCount(toks)
    val charSum = aggregate(transform(toks, t => length(t)), lit(0), _ + _)
    val stops = hitCount(toks, stopwordProfiles("en"))
    df.select(
      col(idCol),
      cnt.as("token_cnt"),
      size(array_distinct(toks)).as("distinct_cnt"),
      (charSum.cast("double") / cnt.cast("double")).as("avg_token_len"),
      (stops.cast("double") / cnt.cast("double")).as("stop_ratio"),
      distinctRatio(toks).as("distinct_ratio"))
  }

  /** The Gopher stop-word presence set (Rae et al. 2021, Appendix A). */
  val gopherStops: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher quality-rule battery (Rae et al. 2021, Appendix A) —
    * the published heuristic gate most large web-corpus pipelines start
    * from. Seven rules, each emitted as its metric + boolean flag plus the
    * conjunction `keep`:
    *
    *  1. 50 <= word count <= 100,000
    *  2. 3 <= mean word length <= 10
    *  3. symbol-to-word ratio <= 0.1 (symbols: `#`, `...`, `…`)
    *  4. <= 90% of lines start with a bullet (`- `, `* `, `•`)
    *  5. <= 30% of lines end with an ellipsis
    *  6. >= 80% of words contain an alphabetic character
    *  7. >= 2 distinct Gopher stop words present
    *
    * (Gopher's remaining rules — the duplicate-line/paragraph fractions —
    * are the [[repetitionMetrics]] family; compose both for the full
    * paper gate.)
    *
    * Scale shape: a pure per-row codegen'd projection — zero shuffles,
    * stream-safe, composes into the single-scan gate select of the
    * curation examples. Words split on `\s+` here (rules 4/5 make line
    * structure first-class, so tokens must not straddle newlines); ratios
    * are double divisions of exact ints, rounded to 4 for cross-engine
    * hashing; zero-word documents emit null ratios and `keep = false`.
    */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val nWords = size(ws).cast("long")
    // divisions are guarded: a zero-word document must yield NULL ratios
    // (NaN ordering is the known cross-engine divergence class), which the
    // final conjunction coalesces to keep = false
    def perWord(c: Column): Column = when(nWords > 0L, c / nWords.cast("double"))
    val meanLen = perWord(
      aggregate(transform(ws, w => length(w)), lit(0), _ + _).cast("double"))
    def occurrences(needle: String): Column =
      ((length(col(textCol)) - length(replace(col(textCol), lit(needle)))) /
        lit(needle.length)).cast("long")
    val symbolRatio = perWord(
      (occurrences("#") + occurrences("...") + occurrences("…")).cast("double"))
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("long")
    val bulletFrac = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))).cast("double") /
      nLines.cast("double")
    val ellipsisFrac = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("double") / nLines.cast("double")
    val alphaFrac = perWord(size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double"))
    val stopHits = gopherStops
      .map(sw => when(array_contains(transform(ws, w => lower(w)), sw), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val fWords = nWords >= 50L && nWords <= 100000L
    val fMean = meanLen >= 3.0 && meanLen <= 10.0
    val fSym = symbolRatio <= 0.1
    val fBullet = bulletFrac <= 0.9
    val fEllipsis = ellipsisFrac <= 0.3
    val fAlpha = alphaFrac >= 0.8
    val fStops = stopHits >= 2L
    df.select(
      col(idCol),
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_ratio"),
      round(bulletFrac, 4).as("bullet_frac"),
      round(ellipsisFrac, 4).as("ellipsis_frac"),
      round(alphaFrac, 4).as("alpha_frac"),
      stopHits.as("stop_hits"),
      fWords.as("f_words"), fMean.as("f_mean_len"), fSym.as("f_symbols"),
      fBullet.as("f_bullets"), fEllipsis.as("f_ellipsis"), fAlpha.as("f_alpha"),
      fStops.as("f_stops"),
      coalesce(fWords && fMean && fSym && fBullet && fEllipsis && fAlpha && fStops,
        lit(false)).as("keep"))
  }

  /** The C4 cleaning rules (Raffel et al. 2020, §2.2) — the line-level
    * sibling of [[gopherQualityFlags]]'s document gates, and the published
    * recipe the `documents` curation chain's ad-hoc gates approximate:
    *
    *  - keep only lines that end in a terminal punctuation mark
    *    (`.` `!` `?` or a closing quote), contain at least
    *    `minWordsPerLine` words, and do not mention "javascript";
    *  - flag documents containing "lorem ipsum" (template boilerplate) or
    *    a curly brace (code);
    *  - a document survives (`keep`) iff unflagged AND its CLEANED text
    *    still has >= 3 sentences.
    *
    * (C4's remaining step — the three-sentence-span dedup — is substring
    * dedup at sentence granularity: [[Dedup.stripDuplicatedWindows]]'s
    * family. Compose for the full paper pipeline.)
    *
    * Emits `clean_text` (kept lines joined by newline), the counts behind
    * each rule, the flags, and `keep`. A pure per-row codegen'd
    * projection — zero shuffles, stream-safe, RE2-portable regexes only;
    * the same predicates re-expressed over DuckDB list functions gate the
    * q135 oracle.
    */
  def c4Clean(
      df: DataFrame, idCol: String, textCol: String, minWordsPerLine: Int = 5): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine must be >= 1, got $minWordsPerLine")
    val lines = split(col(textCol), "\n")
    val keptLines = filter(lines, l =>
      (size(split(trim(l), " ")) >= minWordsPerLine) &&
        trim(l).rlike("[.!?\"]$") &&
        !lower(l).contains("javascript"))
    val cleanText = array_join(keptLines, "\n")
    // sentence count = terminal-punct occurrences in the CLEANED text,
    // via length-difference (portable; no per-char split)
    val nSentences = Seq(".", "!", "?")
      .map(p => length(cleanText) - length(replace(cleanText, lit(p))))
      .reduce(_ + _).cast("long")
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")
    val hasBrace = col(textCol).contains("{")
    df.select(
      col(idCol),
      cleanText.as("clean_text"),
      size(lines).cast("long").as("n_lines"),
      size(keptLines).cast("long").as("n_kept_lines"),
      nSentences.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (!hasLorem && !hasBrace && nSentences >= 3L).as("keep"))
  }

  /** Canary-string audit — the data-poisoning / secret-leak check: report
    * every (doc, canary) hit for a literal watchlist (planted canary
    * phrases, API-key prefixes, internal hostnames). The list is a plan
    * literal (watchlists are small by nature — q58's benchmark-set
    * argument); the scan is one per-row literal-array filter + explode,
    * zero shuffle, stream-safe. Exact substring semantics (no regex), so
    * hostile pattern characters in a canary cannot change the match.
    */
  def findCanaries(
      df: DataFrame, idCol: String, textCol: String, canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "at least one canary string is required")
    require(canaries.forall(_.nonEmpty), "canary strings must be non-empty")
    df.select(col(idCol),
        explode(filter(typedLit(canaries), c => col(textCol).contains(c))).as("canary"))
  }

  /** Template-prefix mining — boilerplate/template-spam detection: the
    * corpus's most repeated first-`prefixTokens`-token prefixes with doc
    * counts (a mass-produced template family shares its opening). One
    * per-row projection + one map-side-combined count; emit only
    * prefixes with ≥ `minCount` docs. Feed hits to
    * [[graft.operators.Dedup.stripKnownLines]]-style removal or a gate.
    */
  def templatePrefixes(
      df: DataFrame, textCol: String, prefixTokens: Int, minCount: Long): DataFrame = {
    require(prefixTokens >= 1, s"prefixTokens must be >= 1, got $prefixTokens")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    df.select(array_join(slice(tokens(col(textCol)), 1, prefixTokens), " ").as("prefix"))
      .groupBy(col("prefix")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minCount)
  }

  /** Zipf power-law fit of the token frequency distribution — the corpus
    * data-card statistic that catches a vocabulary anomaly (template spam,
    * boilerplate floods, a parser emitting glued tokens) as a slope shift:
    * ordinary least squares of `ln(freq)` on `ln(rank)` over the top
    * `topRanks` tokens (natural text sits near slope −1). One token-count
    * aggregation (map-side combined, vocabulary-shaped), a TakeOrdered
    * top-`topRanks` cut (never a global sort), and a single-row closed-form
    * regression over the parameter-bounded remainder; ranks tie-break on
    * the token string, slope/intercept round to 4. Output: one row
    * (n_ranks, slope, intercept).
    */
  def zipfFit(df: DataFrame, textCol: String, topRanks: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topRanks > 1, s"topRanks must be > 1, got $topRanks")
    val counts = df.select(explode(split(col(textCol), " ")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__t")).limit(topRanks)
    // UNPARTITIONED-WINDOW: bounded by the `topRanks` knob (limit above)
    // — <= topRanks rows on one task by construction; that IS the
    // contract, not an accident
    val ranked = counts.withColumn("__r",
      row_number().over(Window.orderBy(col("__c").desc, col("__t"))))
    val xy = ranked.select(log(col("__r").cast("double")).as("x"),
      log(col("__c").cast("double")).as("y"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    xy.agg(count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      // a 1-rank corpus has zero x-variance: the fit is undefined (null),
      // not an ANSI divide-by-zero (n >= 2 guarantees distinct ln ranks)
      .select(col("n").cast("long").as("n_ranks"),
        when(col("n") >= 2.0, round(slope, 4)).as("slope"),
        when(col("n") >= 2.0,
          round((col("sy") - slope * col("sx")) / col("n"), 4)).as("intercept"))
  }

  /** Lowercased character trigrams of `text` — the Cavnar–Trenkle feature.
    * Texts shorter than 3 chars yield an empty array (the explicit guard
    * matters: `sequence(1, len-2)` with len < 3 would COUNT DOWN).
    *
    * Positions are computed over the LOWERED text (delegates to
    * [[charTrigramsOfLowered]]): for characters whose lowercase mapping
    * changes string length (U+0130 'İ' → "i̇") the former
    * raw-length form emitted a different trigram set than the operators'
    * lowered-length form — the two must agree, and the lowered length is
    * the correct one (the grams are substrings OF the lowered text).
    * The `lower(text)` argument sits inside the transform lambda here, so
    * this convenience form re-evaluates it per trigram position — hot
    * paths should project `lower(text)` first (the [[Dedup.shinglesOfTokens]]
    * caveat; every operator in this file does). */
  def charTrigrams(text: Column): Column =
    charTrigramsOfLowered(lower(text))

  /** [[charTrigrams]] over an ALREADY-LOWERCASED projected column — the
    * form the operators below use. Higher-order functions do not
    * whole-stage-codegen, so a `lower(text)` INSIDE the transform lambda
    * re-evaluates once per trigram position — O(len²) character work per
    * document (the shinglesOfTokens caveat, r18). Callers project
    * `lower(text)` into a column first; the lambda then reads a bound
    * attribute. */
  private def charTrigramsOfLowered(lowered: Column): Column =
    when(length(lowered) >= 3,
      transform(sequence(lit(1), length(lowered) - 2), i => lowered.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** Cavnar–Trenkle (1994) language profiles: each language's `topN` most
    * frequent character trigrams with their rank (1 = most frequent; ties
    * break to the lexicographically smaller gram — integer counts and
    * binary string order, so two engines derive identical profiles). Train
    * on a labeled slice; classify with [[classifyByTrigramProfiles]].
    *
    * Scale shape: one explode→count aggregation (map-side combined) to the
    * (lang, gram) count table — bounded by |langs| × |charset|³, NOT
    * corpus-shaped — then a per-language top-N window over that bounded
    * table. The returned profile is |langs|·topN rows, a model artifact.
    */
  def trainTrigramProfiles(
      df: DataFrame, langCol: String, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN > 0, s"topN must be positive, got $topN")
    val w = Window.partitionBy(col("lang")).orderBy(col("__c").desc, col("gram"))
    df.select(col(langCol).as("lang"), lower(col(textCol)).as("__lt"))
      .select(col("lang"), explode(charTrigramsOfLowered(col("__lt"))).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("__c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("lang"), col("gram"), col("rank"))
  }

  /** Cavnar–Trenkle classification by rank-profile out-of-place distance:
    * the document's own top-`topN` trigram ranks are compared against each
    * language profile; a gram found in the profile contributes
    * `|docRank − profileRank|`, a gram absent contributes the `topN`
    * penalty. Lowest total distance wins (ties to the alphabetically
    * first language). INTEGER arithmetic end to end — unlike the cosine
    * profile alternatives there is no float boundary anywhere, so the
    * prediction is engine-exact by construction.
    *
    * Scale shape: the per-doc rank window partitions by doc (groups
    * bounded by text length); the profile (|langs|·topN rows) and the
    * language list are explicitly broadcast — model-sized by contract;
    * the per-(doc, lang) sum is one map-side-combined aggregation.
    */
  def classifyByTrigramProfiles(
      df: DataFrame, idCol: String, textCol: String, profiles: DataFrame, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN > 0, s"topN must be positive, got $topN")
    val dw = Window.partitionBy(col(idCol)).orderBy(col("__c").desc, col("gram"))
    val docGrams = df
      .select(col(idCol), lower(col(textCol)).as("__lt"))
      .select(col(idCol), explode(charTrigramsOfLowered(col("__lt"))).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("__c"))
      .withColumn("drank", row_number().over(dw))
      .filter(col("drank") <= topN)
    val langs = profiles.select(col("lang")).distinct()
    val dist = docGrams
      .crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "gram"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(coalesce(abs(col("drank") - col("rank")), lit(topN.toLong))).as("__dist"))
    dist
      .groupBy(col(idCol))
      .agg(min(struct(col("__dist"), col("lang"))).as("__best"))
      .select(col(idCol),
        col("__best").getField("lang").as("pred_lang"),
        col("__best").getField("__dist").as("dist"))
  }

  /** [[classifyByTrigramProfiles]] with a CONFIDENCE MARGIN: the integer
    * gap between the best and the runner-up language distance — the
    * abstain signal a multilingual router thresholds on (margin 0 means
    * the classifier genuinely can't tell; route to a heavier model or
    * keep both). Same shapes, one extra min-struct over the per-language
    * distances; everything integer, engine-exact.
    */
  def classifyByTrigramProfilesWithMargin(
      df: DataFrame, idCol: String, textCol: String, profiles: DataFrame, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN > 0, s"topN must be positive, got $topN")
    val dw = Window.partitionBy(col(idCol)).orderBy(col("__c").desc, col("gram"))
    val docGrams = df
      .select(col(idCol), lower(col(textCol)).as("__lt"))
      .select(col(idCol), explode(charTrigramsOfLowered(col("__lt"))).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("__c"))
      .withColumn("drank", row_number().over(dw))
      .filter(col("drank") <= topN)
    val langs = profiles.select(col("lang")).distinct()
    val dist = docGrams
      .crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "gram"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(coalesce(abs(col("drank") - col("rank")), lit(topN.toLong))).as("__dist"))
    val ranked = Window.partitionBy(col(idCol)).orderBy(col("__dist"), col("lang"))
    dist
      .withColumn("__rn", row_number().over(ranked))
      .withColumn("__next", lead(col("__dist"), 1).over(ranked))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("lang").as("pred_lang"), col("__dist").as("dist"),
        (col("__next") - col("__dist")).as("margin"))
  }

  /** Stopword-profile language scores + argmax (alphabetical tiebreak on
    * equal hit counts — deterministic). Emits integer hit counts so the
    * result is engine-exact.
    */
  def languageScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val hits = languageHits(toks)
    df.select(
      Seq(col(idCol)) ++ hits.map { case (lang, h) => h.as(s"${lang}_hits") } :+
        detectedLanguage(toks).as("detected"): _*)
  }

  /** Token counting two ways: whitespace tokens and BPE-ish subword chunks
    * (runs of 1-4 letters / digits via regexp) — the standard cheap proxy
    * for LLM token budgeting.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]{1,4}|[0-9]{1,4}"), lit(0))).as("subword_tokens"))

  /** TF-IDF over whitespace tokens: term frequency per (doc, term), document
    * frequency per term, `tfidf = tf * ln(N / df)`. Two keyed aggregations
    * and one broadcast-able join on term — no all-pairs anything; at 100 TB
    * the df table is vocabulary-sized and broadcasts.
    *
    * Without `totalDocs`, N rides the plan as a broadcast 1-row count
    * aggregate (a footer-only parquet count) instead of a separate
    * driver-side `df.count()` job — one plan, one submission, and the whole
    * computation stays lazy/explainable.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tfidfWithTotal(df, idCol, textCol, None)

  /** @param totalDocs precomputed corpus size N, when the caller already
    *                  has it (keeps the plan a pure function of its inputs) */
  def tfidf(df: DataFrame, idCol: String, textCol: String, totalDocs: Long): DataFrame =
    tfidfWithTotal(df, idCol, textCol, Some(totalDocs))

  private def tfidfWithTotal(
      df: DataFrame, idCol: String, textCol: String, totalDocs: Option[Long]): DataFrame = {
    val terms = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val joined = tf.join(broadcast(dfreq), "term")
    val withN = totalDocs match {
      case Some(n) => joined.withColumn("__n", lit(n.toDouble))
      case None    =>
        joined.crossJoin(broadcast(df.agg(count(lit(1)).cast("double").as("__n"))))
    }
    withN
      .withColumn("tfidf", col("tf") * log(col("__n") / col("df").cast("double")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 retrieval: top-k documents per query under Okapi BM25 over
    * whitespace tokens —
    * `score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`
    * with the standard smoothed `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`.
    *
    * Scale shape: the score is assembled from THREE keyed aggregations and
    * one inverted-index join — tf per (doc, term), df per term
    * (vocabulary-sized, broadcast), and N/avgdl as a broadcast 1-row
    * aggregate so the whole plan stays a lazy pure function of its inputs
    * (same trick as [[tfidf]]). Query terms join tf on term, so only
    * documents containing at least one query term are ever scored — never
    * a query × corpus cross product. The final top-k per query runs
    * through the bounded [[graft.functions.TopKScored]] Aggregator (O(k)
    * buffers at map/shuffle/reduce, ties to the lowest doc id), whose
    * (score, id) buffer IS the output row — no join back, the scored
    * subtree plans once. A window would buffer one query's ENTIRE match
    * set in a single task, the same hot-key class capPerKey exists to
    * avoid.
    *
    * `queries` is (queryId, query text); doc ids must be long-castable
    * (they ride the bounded aggregator as longs).
    *
    * `scoreScale >= 0` QUANTIZES the score (`round(score, scoreScale)`)
    * BEFORE top-k selection — the rank-stable retrieval form. BM25 sums
    * 2–3 ln-terms per doc in whatever order the aggregate visits them, so
    * two engines (or two runs of one engine) can disagree in the last ulp;
    * with `b = 0` the score is length-independent and exact theoretical
    * ties are common, making raw-score selection order — and even top-k
    * MEMBERSHIP at a tied boundary — noise-resolved (observed: a 5-way tie
    * straddling k=20 flipped between two DuckDB runs of the same SQL).
    * Quantizing first collapses ulp noise to equality, and the
    * lowest-doc-id tie rule then yields one engine-independent answer,
    * provided no true score lies within noise of a rounding boundary
    * (measured per corpus; see Bm25Spec's boundary-distance pin).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      scoreScale: Int = -1
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    val corpus = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(size(tokens(col(textCol))).cast("double")).as("__avgdl"))
    val dl = docs.select(col(idCol), size(tokens(col(textCol))).cast("double").as("__dl"))
    // distinct query terms: a term repeated in the query text scores once
    // (the standard bag-of-words-query simplification, and what keeps the
    // join keys unique)
    val qterms = queries
      .select(col(queryIdCol), explode(array_distinct(tokens(col(queryTextCol)))).as("term"))
    // df computed (and broadcast) only for the query terms: the full
    // vocabulary aggregate is corpus-shaped and must never be broadcast —
    // the semi-join bounds it by query vocabulary, which is
    // parameter-sized by the same contract as the query table itself
    val dfreq = tf
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val scored = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__contrib",
        col("__idf") * (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__contrib")).as("__raw"))
      .withColumn("__score",
        if (scoreScale >= 0) round(col("__raw"), scoreScale) else col("__raw"))
      // ids that are null or not long-castable are EXCLUDED before the
      // typed aggregator (its primitive Long field would decode them as
      // doc 0 — the capPerKey null-decode class); key on castable ids
      .filter(col(idCol).cast("long").isNotNull)
    // the aggregator's (score, id) pairs ARE the output rows — no kept-pair
    // join back (capPerKey needs one to recover untouched row payloads;
    // here the payload is exactly what the buffer carries), so the scored
    // subtree is planned ONCE
    val topK = udaf(new graft.functions.TopKScored(k))
    scored
      .groupBy(col(queryIdCol))
      .agg(topK(col("__score"), col(idCol).cast("long")).as("__keep"))
      .select(col(queryIdCol), explode(col("__keep")).as("__kv"))
      .select(col(queryIdCol), col("__kv._2").as(idCol), col("__kv._1").as("score"))
  }

  /** Bigram language-model perplexity — the CCNet-style statistical
    * quality signal: train add-k-smoothed bigram counts on `trainOn`
    * (defaults to the scored corpus itself), then score every document as
    * `ppl = exp(-mean_bigrams ln p(w2|w1))` with
    * `p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)` (V = distinct token
    * types in the training corpus). Lower = more like the training
    * distribution; gating on a reference-corpus-trained model is the
    * classic web-corpus filter.
    *
    * Scale shape: THREE keyed shuffles, all SMJ-pinned aggregate
    * derivatives (bigram and history-count tables are corpus-shaped — the
    * BM25 review's never-broadcast-the-vocabulary rule applies doubly
    * here), plus V as a broadcast 1-row scalar. Unseen bigrams/histories
    * coalesce to 0 so held-out scoring is total (`p = 1/V` at worst).
    * Documents with fewer than 2 tokens emit `n_bigrams = 0` and a null
    * `ppl`.
    */
  def bigramPerplexity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 1.0,
      trainOn: Option[DataFrame] = None
  ): DataFrame = {
    require(k > 0.0, s"smoothing k must be positive, got $k")
    def bigramsOf(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .select(cols :+ tokens(col(textCol)).as("__toks"): _*)
      .filter(size(col("__toks")) >= 2)
      .select(cols :+ explode(transform(sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2")))).as("__bg"): _*)
      .select(cols :+ col("__bg.w1").as("__w1") :+ col("__bg.w2").as("__w2"): _*)
    val train = trainOn.getOrElse(docs)
    val trainBg = bigramsOf(train, Seq.empty)
    val c12 = trainBg.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
    val c1 = trainBg.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val vocab = train
      .select(explode(tokens(col(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).cast("double").as("__v"))
    val scored = bigramsOf(docs, Seq(col(idCol)))
      .join(c12.hint("shuffle_merge"), Seq("__w1", "__w2"), "left")
      .join(c1.hint("shuffle_merge"), Seq("__w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", log(
        (coalesce(col("__c12"), lit(0L)) + lit(k)) /
          (coalesce(col("__c1"), lit(0L)) + lit(k) * col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), exp(-avg(col("__lp"))).as("__ppl"))
    docs.select(col(idCol))
      .join(scored.hint("shuffle_merge"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__ppl"), 4).as("ppl"))
  }

  /** Jelinek–Mercer INTERPOLATED bigram perplexity — the backoff form the
    * CCNet-style quality signal graduates to when held-out scoring meets
    * unseen histories: `p(w2|w1) = λ·p_ML(w2|w1) + (1−λ)·p_uni(w2)` with
    * the ML term `c12/c1` (0 for unseen histories — the unigram term
    * carries them) and an add-k smoothed unigram
    * `(c(w2)+k)/(T+k·V)`. Same scale shape as [[bigramPerplexity]] plus
    * ONE more keyed SMJ join (the unigram count table) and one more
    * 1-row scalar (T); vocabulary-shaped tables never broadcast.
    */
  def bigramPerplexityInterpolated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7,
      k: Double = 1.0,
      trainOn: Option[DataFrame] = None
  ): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1), got $lambda")
    require(k > 0.0, s"smoothing k must be positive, got $k")
    def bigramsOf(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .select(cols :+ tokens(col(textCol)).as("__toks"): _*)
      .filter(size(col("__toks")) >= 2)
      .select(cols :+ explode(transform(sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2")))).as("__bg"): _*)
      .select(cols :+ col("__bg.w1").as("__w1") :+ col("__bg.w2").as("__w2"): _*)
    val train = trainOn.getOrElse(docs)
    val trainBg = bigramsOf(train, Seq.empty)
    val c12 = trainBg.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
    val c1 = trainBg.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val uni = train.select(explode(tokens(col(textCol))).as("__w2"))
      .groupBy(col("__w2")).agg(count(lit(1)).as("__cu"))
    val totals = train.select(explode(tokens(col(textCol))).as("__t"))
      .agg(count(lit(1)).cast("double").as("__tt"),
        count_distinct(col("__t")).cast("double").as("__v"))
    val ml = when(coalesce(col("__c1"), lit(0L)) > 0L,
      coalesce(col("__c12"), lit(0L)).cast("double") / col("__c1").cast("double"))
      .otherwise(lit(0.0))
    val punit = (coalesce(col("__cu"), lit(0L)) + lit(k)) / (col("__tt") + lit(k) * col("__v"))
    val scored = bigramsOf(docs, Seq(col(idCol)))
      .join(c12.hint("shuffle_merge"), Seq("__w1", "__w2"), "left")
      .join(c1.hint("shuffle_merge"), Seq("__w1"), "left")
      .join(uni.hint("shuffle_merge"), Seq("__w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__lp", log(lit(lambda) * ml + lit(1.0 - lambda) * punit))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), exp(-avg(col("__lp"))).as("__ppl"))
    docs.select(col(idCol))
      .join(scored.hint("shuffle_merge"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__ppl"), 4).as("ppl"))
  }

  /** Interpolated KNESER–NEY bigram perplexity — the classic smoothing
    * beyond [[bigramPerplexityInterpolated]]'s mixture (Kneser & Ney
    * 1995; Chen & Goodman 1999's interpolated form): instead of mixing
    * in raw unigram frequency, the backoff weight is the CONTINUATION
    * probability `N1+(•w2) / |bigram types|` — "how many contexts does
    * w2 complete" — which stops high-frequency-but-context-bound tokens
    * (the "Francisco" effect) from soaking up backoff mass:
    *
    *   p(w2|w1) = max(c12 − d, 0)/c1 + d·N1+(w1•)/c1 · p_cont(w2)
    *
    * with absolute discount `d` and, for OOV coverage, the continuation
    * distribution add-k smoothed over the vocabulary (the
    * [[bigramPerplexityInterpolated]] `punit` rule — an unseen scored
    * token must not produce log 0). Unseen contexts (c1 = 0) back off to
    * p_cont alone. All counts are exact longs; the floating expression
    * is one fixed shape replayed literally by the q331 oracle (the q162
    * discipline). Same scale shape as the interpolated form: count
    * tables shuffle on their keys, scored bigrams join against them,
    * one per-doc aggregation. */
  def bigramPerplexityKneserNey(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75,
      k: Double = 1.0,
      trainOn: Option[DataFrame] = None
  ): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount must be in (0,1), got $discount")
    require(k > 0.0, s"smoothing k must be positive, got $k")
    def bigramsOf(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .select(cols :+ tokens(col(textCol)).as("__toks"): _*)
      .filter(size(col("__toks")) >= 2)
      .select(cols :+ explode(transform(sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2")))).as("__bg"): _*)
      .select(cols :+ col("__bg.w1").as("__w1") :+ col("__bg.w2").as("__w2"): _*)
    val train = trainOn.getOrElse(docs)
    val trainBg = bigramsOf(train, Seq.empty)
    val c12 = trainBg.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
    val c1 = trainBg.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val n1l = trainBg.groupBy(col("__w1")).agg(count_distinct(col("__w2")).as("__n1l"))
    val n1r = trainBg.groupBy(col("__w2")).agg(count_distinct(col("__w1")).as("__n1r"))
    val totals = c12.agg(count(lit(1)).cast("double").as("__T"))
      .crossJoin(train.select(explode(tokens(col(textCol))).as("__t"))
        .agg(count_distinct(col("__t")).cast("double").as("__v")))
    val pcont = (coalesce(col("__n1r"), lit(0L)) + lit(k)) / (col("__T") + lit(k) * col("__v"))
    val p = when(coalesce(col("__c1"), lit(0L)) > 0L,
      greatest(coalesce(col("__c12"), lit(0L)).cast("double") - lit(discount), lit(0.0))
        / col("__c1").cast("double")
        + lit(discount) * col("__n1l").cast("double") / col("__c1").cast("double") * pcont)
      .otherwise(pcont)
    val scored = bigramsOf(docs, Seq(col(idCol)))
      .join(c12.hint("shuffle_merge"), Seq("__w1", "__w2"), "left")
      .join(c1.hint("shuffle_merge"), Seq("__w1"), "left")
      .join(n1l.hint("shuffle_merge"), Seq("__w1"), "left")
      .join(n1r.hint("shuffle_merge"), Seq("__w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__lp", log(p))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), exp(-avg(col("__lp"))).as("__ppl"))
    docs.select(col(idCol))
      .join(scored.hint("shuffle_merge"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__ppl"), 4).as("ppl"))
  }

  /** TRIGRAM interpolated Kneser–Ney — [[bigramPerplexityKneserNey]]'s
    * order-3 form, with the textbook structure: the TOP level discounts
    * raw trigram counts and backs off (weighted by the left-off mass
    * `d·N1+(w1w2•)/c(w1w2•)`) into a bigram level built from
    * CONTINUATION counts (`N1+(•w2w3)` over `N1+(•w2•)` — at the lower
    * level "how many contexts completed this" replaces raw frequency,
    * the defining KN move), which itself backs off into the add-k
    * continuation unigram (the OOV guard). Unseen contexts at either
    * level skip straight to the level below. All nine count tables are
    * exact longs off one trigram pass + one bigram pass over train;
    * the float expression is one fixed shape replayed literally by the
    * q332 oracle. Scale: count tables shuffle on their keys, scored
    * trigrams left-join each (SMJ-pinned), one per-doc aggregation. */
  def trigramPerplexityKneserNey(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75,
      k: Double = 1.0,
      trainOn: Option[DataFrame] = None
  ): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount must be in (0,1), got $discount")
    require(k > 0.0, s"smoothing k must be positive, got $k")
    def trigramsOf(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .select(cols :+ tokens(col(textCol)).as("__toks"): _*)
      .filter(size(col("__toks")) >= 3)
      .select(cols :+ explode(transform(sequence(lit(0), size(col("__toks")) - 3),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2"),
          element_at(col("__toks"), i + 3).as("w3")))).as("__tg"): _*)
      .select(cols :+ col("__tg.w1").as("__w1") :+ col("__tg.w2").as("__w2")
        :+ col("__tg.w3").as("__w3"): _*)
    val train = trainOn.getOrElse(docs)
    val trainTg = trigramsOf(train, Seq.empty)
    val c123 = trainTg.groupBy(col("__w1"), col("__w2"), col("__w3"))
      .agg(count(lit(1)).as("__c123"))
    val ctx12 = trainTg.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__ctx12"))
    val n3 = trainTg.groupBy(col("__w1"), col("__w2"))
      .agg(count_distinct(col("__w3")).as("__n3"))
    // continuation tables: distinct left contexts per (w2,w3), then per w2
    val n12 = trainTg.groupBy(col("__w2"), col("__w3"))
      .agg(count_distinct(col("__w1")).as("__n12"))
    val nctx2 = n12.groupBy(col("__w2")).agg(sum(col("__n12")).as("__nctx2"))
    val nl2 = n12.groupBy(col("__w2")).agg(count(lit(1)).as("__nl2"))
    // unigram continuation off plain bigrams (the bigram-KN pcont)
    val trainBg = train
      .select(tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w2"),
          element_at(col("__toks"), i + 2).as("w3")))).as("__bg"))
      .select(col("__bg.w2").as("__w2"), col("__bg.w3").as("__w3"))
    val n1r = trainBg.groupBy(col("__w3")).agg(count_distinct(col("__w2")).as("__n1r"))
    val totals = trainBg.select(col("__w2"), col("__w3")).distinct()
      .agg(count(lit(1)).cast("double").as("__T"))
      .crossJoin(train.select(explode(tokens(col(textCol))).as("__t"))
        .agg(count_distinct(col("__t")).cast("double").as("__v")))
    val pcont = (coalesce(col("__n1r"), lit(0L)) + lit(k)) / (col("__T") + lit(k) * col("__v"))
    val p2 = when(coalesce(col("__nctx2"), lit(0L)) > 0L,
      greatest(coalesce(col("__n12"), lit(0L)).cast("double") - lit(discount), lit(0.0))
        / col("__nctx2").cast("double")
        + lit(discount) * col("__nl2").cast("double") / col("__nctx2").cast("double") * pcont)
      .otherwise(pcont)
    val p3 = when(coalesce(col("__ctx12"), lit(0L)) > 0L,
      greatest(coalesce(col("__c123"), lit(0L)).cast("double") - lit(discount), lit(0.0))
        / col("__ctx12").cast("double")
        + lit(discount) * col("__n3").cast("double") / col("__ctx12").cast("double") * p2)
      .otherwise(p2)
    val scored = trigramsOf(docs, Seq(col(idCol)))
      .join(c123.hint("shuffle_merge"), Seq("__w1", "__w2", "__w3"), "left")
      .join(ctx12.hint("shuffle_merge"), Seq("__w1", "__w2"), "left")
      .join(n3.hint("shuffle_merge"), Seq("__w1", "__w2"), "left")
      .join(n12.hint("shuffle_merge"), Seq("__w2", "__w3"), "left")
      .join(nctx2.hint("shuffle_merge"), Seq("__w2"), "left")
      .join(nl2.hint("shuffle_merge"), Seq("__w2"), "left")
      .join(n1r.hint("shuffle_merge"), Seq("__w3"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__lp", log(p3))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), exp(-avg(col("__lp"))).as("__ppl"))
    docs.select(col(idCol))
      .join(scored.hint("shuffle_merge"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        round(col("__ppl"), 4).as("ppl"))
  }

  /** A collected bigram LM for STREAM-side scoring: the
    * [[bigramPerplexity]] count tables as executor-broadcast maps — the
    * same collect-guard-broadcast lifetime pattern as
    * `collectBenchGrams`/`Dedup.collectWindowHashes` (build once per
    * model generation, reuse across compositions, `.destroy()` on
    * rotation). `maxBigrams` fails loudly before a corpus-shaped count
    * table OOMs the driver — a model that big belongs in the join-based
    * batch operator. */
  final case class BigramModel(
      c12: Map[(String, String), Long], c1: Map[String, Long], v: Double, k: Double)

  def collectBigramModel(
      train: DataFrame,
      textCol: String,
      k: Double = 1.0,
      maxBigrams: Int = 5000000
  ): org.apache.spark.broadcast.Broadcast[BigramModel] = {
    require(k > 0.0, s"smoothing k must be positive, got $k")
    val bg = train
      .select(tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2")))).as("__bg"))
      .groupBy(col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxBigrams + 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    require(bg.length <= maxBigrams,
      s"collectBigramModel: bigram table exceeds maxBigrams=$maxBigrams — " +
        "a model this large should score through the join-based bigramPerplexity")
    val c12 = bg.toMap
    val c1 = bg.groupBy(_._1._1).map { case (w1, xs) => w1 -> xs.map(_._2).sum }
    val v = train.select(explode(tokens(col(textCol))).as("__t"))
      .agg(count_distinct(col("__t"))).collect()(0).getLong(0).toDouble
    train.sparkSession.sparkContext.broadcast(BigramModel(c12, c1, v, k))
  }

  /** [[bigramPerplexity]] as a PURE per-row projection against a collected
    * [[BigramModel]] — the stream-safe scoring form (the batch operator's
    * per-doc aggregation cannot sit mid-stream in append mode; here the
    * whole fold is row-local, zero shuffles, zero state). Scores agree
    * with the batch form to summation-order ulp (spec-pinned at 1e-9).
    */
  def bigramPerplexityStateless(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bc: org.apache.spark.broadcast.Broadcast[BigramModel]
  ): DataFrame = {
    val score = udf { (toks: scala.collection.Seq[String]) =>
      val m = bc.value
      if (toks == null || toks.length < 2) (0L, None: Option[Double])
      else {
        var sum = 0.0
        var i = 0
        while (i < toks.length - 1) {
          val p = (m.c12.getOrElse((toks(i), toks(i + 1)), 0L) + m.k) /
            (m.c1.getOrElse(toks(i), 0L) + m.k * m.v)
          sum += math.log(p)
          i += 1
        }
        (toks.length - 1L, Some(math.exp(-sum / (toks.length - 1))))
      }
    }
    docs
      .withColumn("__sc", score(tokens(col(textCol))))
      .withColumn("n_bigrams", col("__sc._1"))
      .withColumn("ppl", round(col("__sc._2"), 4))
      .drop("__sc")
  }

  /** Reciprocal-rank fusion of several per-query rankings — the standard
    * hybrid-retrieval combiner (BM25 + dense ANN, or any mix):
    * `rrf(q, d) = Σ_rankings 1 / (rrfK + rank_i(q, d))`, documents absent
    * from a ranking simply contribute nothing.
    *
    * Contract: each input frame is a per-query BOUNDED list — the output
    * of a retrieval operator ([[bm25TopK]], [[Similarity.ivfTopK]], ...),
    * so the per-frame rank window sorts k-bounded partitions, never a
    * corpus. The fused top-k then rides the bounded
    * [[graft.functions.TopKScored]] Aggregator (ties to the lowest doc
    * id), the same no-hot-window shape as [[bm25TopK]]. With integer
    * ranks the fused score is a sum of exact dyadic-free rationals that
    * two engines compute identically when their input rankings agree —
    * which in turn requires RANK-STABLE leg scores: feed legs selected on
    * quantized scores ([[bm25TopK]]'s `scoreScale`) when the raw score is
    * a summation-order-sensitive float sum, or ulp noise decides ranks.
    */
  def reciprocalRankFusion(
      rankings: Seq[DataFrame],
      queryIdCol: String,
      docIdCol: String,
      scoreCol: String,
      k: Int,
      rrfK: Int = 60
  ): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0 && rrfK > 0, "k and rrfK must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col(scoreCol).desc, col(docIdCol))
    val contribs = rankings.map(r =>
      r.select(col(queryIdCol), col(docIdCol), col(scoreCol))
        .withColumn("__contrib", lit(1.0) / (lit(rrfK) + row_number().over(w)))
        .drop(scoreCol))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(queryIdCol), col(docIdCol))
      .agg(sum(col("__contrib")).as("rrf_score"))
      // same null-decode guard as bm25TopK: uncastable ids must not
      // become phantom doc 0 in the typed aggregator
      .filter(col(docIdCol).cast("long").isNotNull)
    // emit straight from the aggregator — see bm25TopK's same shape
    val topK = udaf(new graft.functions.TopKScored(k))
    fused
      .groupBy(col(queryIdCol))
      .agg(topK(col("rrf_score"), col(docIdCol).cast("long")).as("__keep"))
      .select(col(queryIdCol), explode(col("__keep")).as("__kv"))
      .select(col(queryIdCol), col("__kv._2").as(docIdCol), col("__kv._1").as("rrf_score"))
  }

  /** Retrieval-quality evaluation — recall@k, MRR@k, nDCG@k per query — the
    * closing piece of the retrieval family ([[bm25TopK]],
    * [[reciprocalRankFusion]], the ANN operators): a curation deployment
    * that retrieves at 100 TB needs its ranking quality MEASURED at the
    * same scale.
    *
    * `ranked` is any (queryId, docId, score) frame (the retrieval
    * operators' output shape); `qrels` is (queryId, docId, rel) graded
    * relevance with rel > 0 = relevant (linear nDCG gains — graded labels
    * contribute proportionally). Ranks are recomputed here by
    * (score desc, docId asc) — the engine-independent tie rule every
    * ranking operator in this file uses — rather than trusted from row
    * order, so the metrics are well-defined for any input frame.
    *
    * Scale shape: the per-query windows run over PARAMETER-BOUNDED groups
    * by contract — `ranked` carries ≤ producer-k rows per query and qrels
    * is an eval set (labeled by humans or a planted fixture, never
    * corpus-shaped), so no hot-key group exists; everything else is keyed
    * joins and aggregations on (queryId, docId). Metric definitions:
    * recall@k = |retrieved∩relevant| / |relevant| (null when the query has
    * no qrels); MRR@k = 1/rank of the first relevant hit, 0 when none;
    * nDCG@k = Σ rel_r/log2(r+1) over hits ÷ the same sum over the ideal
    * (rel-desc) ordering truncated at k, 0 when the query has no relevant
    * docs. Output: (queryId, recall_at_k, mrr_at_k, ndcg_at_k).
    */
  def retrievalMetrics(
      ranked: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      scoreCol: String,
      qrels: DataFrame,
      relCol: String,
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col(scoreCol).desc, col(docIdCol).asc)
    val rk = ranked
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
    val joined = rk
      .join(qrels.select(col(queryIdCol), col(docIdCol), col(relCol).cast("double").as("__rel")),
        Seq(queryIdCol, docIdCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0.0)))
    val perQuery = joined.groupBy(col(queryIdCol)).agg(
      sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("__hits"),
      // max(1/rank) over relevant hits = 1/min(rank): one aggregate, no window
      max(when(col("__rel") > 0, lit(1.0) / col("__rank")).otherwise(0.0)).as("mrr_at_k"),
      sum(when(col("__rel") > 0, col("__rel") / log2(col("__rank") + 1)).otherwise(0.0)).as("__dcg"))
    // ideal DCG: qrels re-ranked by (rel desc, docId asc), truncated at k
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col(relCol).desc, col(docIdCol).asc)
    val ideal = qrels
      .filter(col(relCol) > 0)
      .withColumn("__irank", row_number().over(wi))
      .groupBy(col(queryIdCol)).agg(
        count(lit(1)).as("__nrel"),
        sum(when(col("__irank") <= k, col(relCol).cast("double") / log2(col("__irank") + 1))
          .otherwise(0.0)).as("__idcg"))
    perQuery
      .join(ideal, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        (col("__hits").cast("double") / col("__nrel")).as("recall_at_k"),
        col("mrr_at_k"),
        when(col("__idcg") > 0, col("__dcg") / col("__idcg")).otherwise(lit(0.0)).as("ndcg_at_k"))
  }

  /** RM3 pseudo-relevance-feedback query expansion (Lavrenko & Croft's
    * relevance model, interpolated with the original query — the
    * classic recall lever of a production retrieval stack): run
    * [[bm25TopK]] for `fbDocs` feedback documents per query, estimate
    * the relevance model `P(t|R) ∝ Σ_d w_d · tf(t,d)/|d|` with `w_d`
    * the doc's normalized (quantized) BM25 score, keep the top
    * `fbTerms` terms, and emit the interpolated model
    * `weight(t) = α·P(t|q) + (1−α)·P(t|R)` over the union of original
    * and feedback terms — the weighted query a second-pass retrieval
    * scores with.
    *
    * Determinism: feedback selection uses the `scoreScale = 4`
    * quantized-rank contract (the q113 discipline); the weight
    * normalizer sums the quantized scores on their own 1e-4 integer
    * grid (order-free); each term contribution quantizes to a 1e-9
    * grid before the per-term LONG sum (the klFromCorpus convention);
    * final weights through scaledFloor(6) with (weight desc, term)
    * ranking. Engine-exact end to end.
    *
    * Shape: one [[bm25TopK]] (its own bounded-broadcast discipline),
    * then feedback-bounded joins — the fb table is queries×fbDocs rows
    * (parameter-sized), so its tf/dl joins SMJ against corpus-shaped
    * frames without ever broadcasting them. Output:
    * (queryIdCol, term, weight, rank).
    */
  def rm3Expansion(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      fbDocs: Int = 10,
      fbTerms: Int = 10,
      origWeight: Double = 0.5,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(fbDocs >= 1 && fbDocs <= 64, s"fbDocs=$fbDocs out of [1, 64]")
    require(fbTerms >= 1 && fbTerms <= 256, s"fbTerms=$fbTerms out of [1, 256]")
    require(origWeight >= 0.0 && origWeight <= 1.0,
      s"origWeight must be in [0, 1], got $origWeight")
    // the feedback table is queries×fbDocs rows but its SUBTREE is the
    // whole BM25 retrieval — referenced by both the normalizer and the
    // contribution branch, so materialize once (the HITS/triangles
    // discipline; without this the retrieval plans and RUNS twice,
    // measured as a doubled q87 plan signature in the audit)
    val fb = bm25TopK(docs, idCol, textCol, queries, queryIdCol, queryTextCol,
      k = fbDocs, k1 = k1, b = b, scoreScale = 4)
      .localCheckpoint(true)
    // order-free normalizer: the quantized scores recover their 1e-4 grid
    // cells exactly, and longs sum in any order
    val ws = fb.groupBy(col(queryIdCol))
      .agg(sum(floor(col("score") * 1e4 + lit(0.5)).cast("long")).as("__s4"))
    val toksD = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val tf = toksD.select(col(idCol), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    val dl = toksD.select(col(idCol), size(col("__toks")).cast("double").as("__dl"))
    val contrib = fb
      .join(ws, Seq(queryIdCol))
      .filter(col("__s4") > 0)
      .join(tf.hint("shuffle_merge"), Seq(idCol))
      .join(dl.hint("shuffle_merge"), Seq(idCol))
      .withColumn("__c9",
        floor(col("score") / (col("__s4").cast("double") / 1e4) *
          (col("__tf").cast("double") / col("__dl")) * 1e9 + lit(0.5)).cast("long"))
    val rm = contrib.groupBy(col(queryIdCol), col("term")).agg(sum(col("__c9")).as("__rm9"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("__rm9").desc, col("term"))
    val rmTop = rm.withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= fbTerms).drop("__rn")
    val qm = queries.select(col(queryIdCol), tokens(col(queryTextCol)).as("__qt"))
      .select(col(queryIdCol), size(col("__qt")).cast("double").as("__ql"),
        explode(col("__qt")).as("term"))
      .groupBy(col(queryIdCol), col("term"), col("__ql"))
      .agg(count(lit(1)).as("__qtf"))
      .select(col(queryIdCol), col("term"), (col("__qtf") / col("__ql")).as("__ptq"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("weight").desc, col("term"))
    qm.join(rmTop, Seq(queryIdCol, "term"), "full_outer")
      .select(col(queryIdCol), col("term"),
        graft.functions.Quantize.scaledFloor(
          lit(origWeight) * coalesce(col("__ptq"), lit(0.0)) +
            lit(1.0 - origWeight) *
              (coalesce(col("__rm9"), lit(0L)).cast("double") / 1e9), 6).as("weight"))
      .withColumn("rank", row_number().over(wRank))
  }

  /** Rank-Biased Overlap between two rankings, truncated at `depth`
    * (Webber, Moffat & Zobel 2010): per query,
    * `RBO@D = (1−p) · Σ_{d=1..D} p^{d−1} · |A_d ∩ B_d| / d` — the
    * top-weighted similarity of two retrieval runs (A/B-testing a new
    * ranker, validating an ANN index against brute force: q107/q122's
    * family measured as rank agreement instead of recall). `p` is the
    * persistence knob (0.9 ≈ top-10 dominated).
    *
    * A shared doc first enters the intersection at depth
    * `m = max(rank_A, rank_B)`, so its total contribution is the constant
    * `W[m] = Σ_{d=m..D} p^{d−1}/d` — the per-pair weights are a literal
    * table computed once (depth-bounded), and the per-query sum rides the
    * klFromCorpus INTEGER grid (weights quantized to 1e-9 longs,
    * integer-summed — order-free, engine-exact). Ranks are derived from
    * (score desc, doc asc) row_number like [[retrievalMetrics]], never
    * trusted from row order.
    *
    * Shape: two parameter-bounded per-query windows (≤ producer-k rows per
    * query by the eval contract), one (query, doc) join of the truncated
    * runs, one keyed aggregation. Output: (queryId, overlap_at_depth,
    * rbo) — for OVERLAP-POSITIVE queries only: two runs sharing nothing in
    * their depth-prefixes emit no row (RBO 0 by definition; left-join a
    * query dim and coalesce to 0 if the report needs every query).
    */
  def rankBiasedOverlap(
      runA: DataFrame,
      runB: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      scoreCol: String,
      p: Double = 0.9,
      depth: Int = 10
  ): DataFrame = {
    require(p > 0.0 && p < 1.0, s"p must be in (0, 1), got $p")
    require(depth >= 1 && depth <= 1000, s"depth=$depth out of [1, 1000]")
    // W[m] = sum_{d=m..D} p^(d-1)/d on a 1e-9 integer grid, smallest-first
    // summation per entry (deterministic literal table; the oracle embeds
    // the same longs)
    val wq: Array[Long] = rboWeightGrid(p, depth)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col(scoreCol).desc, col(docIdCol).asc)
    def top(run: DataFrame, rankAs: String) = run
      .withColumn(rankAs, row_number().over(w))
      .filter(col(rankAs) <= depth)
      .select(col(queryIdCol), col(docIdCol), col(rankAs))
    top(runA, "__ra")
      .join(top(runB, "__rb"), Seq(queryIdCol, docIdCol))
      .withColumn("__w9", element_at(lit(wq), greatest(col("__ra"), col("__rb")).cast("int")))
      .groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("overlap_at_depth"),
        graft.functions.Quantize.scaledFloor(
          sum(col("__w9")).cast("double") / 1e9 * (1.0 - p), 6).as("rbo"))
  }

  /** The [[rankBiasedOverlap]] weight table: `W[m] = Σ_{d=m..D} p^{d−1}/d`
    * quantized to a 1e-9 integer grid — public so the generated oracle
    * embeds the identical longs. Each entry sums smallest-term-first
    * (d = D down to m) for a fixed fold order. */
  def rboWeightGrid(p: Double, depth: Int): Array[Long] =
    Array.tabulate(depth) { m0 =>
      val m = m0 + 1
      val sum = (depth to m by -1).foldLeft(0.0)((acc, d) => acc + math.pow(p, d - 1) / d)
      math.floor(sum * 1e9 + 0.5).toLong
    }

  /** Hashed-feature linear scorer — the fasttext-shaped quality classifier
    * every production corpus filter runs, as a PURE per-row expression:
    * `score = sigmoid(bias + Σ_tokens weights[bucket(token)])` with
    * `bucket = md5-hash(token) mod |weights|` (the same engine-portable
    * hash family as [[Sampling.keyHash]], so an independent engine
    * reproduces every bucket). The weight vector rides the plan as a
    * literal array and the sum is a sequential left fold over the token
    * order — bit-identical wherever it reruns, zero shuffles, zero state,
    * stream-safe. Train the weights offline (logistic regression over
    * hashed token counts); this operator is the 100 TB inference pass.
    */
  def hashedLinearScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[Double],
      bias: Double
  ): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val wLit = typedLit(weights)
    val buckets = weights.size
    val z = aggregate(
      col("__toks"),
      lit(bias),
      (acc, t) => acc + element_at(wLit,
        (conv(substring(md5(t), 1, 15), 16, 10).cast("long") % buckets).cast("int") + 1))
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("quality_score", round(lit(1.0) / (lit(1.0) + exp(-z)), 4))
      .drop("__toks")
  }

  /** Distributed multinomial Naive-Bayes TRAINER for the hashed-feature
    * quality gate — the missing half of [[hashedLinearScore]] (whose
    * scaladoc says "train the weights offline"; this is that trainer, in
    * the engine). Given labeled documents (curated = positive, raw =
    * negative — the fasttext-classifier setup CCNet/GPT-3-style corpus
    * filters use), produces one log-odds weight per hash bucket:
    *
    *   weight_b = ln((cpos_b + α) / (Tpos + α·B)) − ln((cneg_b + α) / (Tneg + α·B))
    *
    * with per-class add-α smoothing over the B-bucket vocabulary. Scoring
    * a document by summing these weights over its token buckets (exactly
    * what [[hashedLinearScore]] does) computes the NB log-posterior-odds —
    * a linear classifier whose training is PURE COUNTING.
    *
    * Why NB and not gradient descent at 100 TB: the gradient of a logistic
    * loss is a corpus-sum of per-row FLOATS under the current weights —
    * iteration-serial, summation-order-dependent, and engine-divergent.
    * NB training is ONE pass: a single keyed integer aggregation
    * (map-side combine; ≤ B rows out regardless of corpus size) plus a
    * B-row domain join, and every weight is a float derived once from
    * integer counts — order-independent, oracle-reproducible bucket for
    * bucket. The bucket hash is the same md5-mod-B family as
    * [[hashedLinearScore]] and [[Sampling.keyHash]], so trainer and scorer
    * agree on features by construction.
    *
    * Output: (bucket int, cpos long, cneg long, weight double) — all B
    * buckets present (absent buckets carry the α-only weight). Rows with a
    * NULL label are excluded from both classes (documented, not silent:
    * the counts only cover labeled rows).
    */
  def trainNaiveBayesWeights(
      df: DataFrame,
      textCol: String,
      labelCol: Column,
      buckets: Int,
      alpha: Double = 1.0
  ): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val bucketed = df
      .select(labelCol.cast("boolean").as("__pos"), explode(tokens(col(textCol))).as("__t"))
      .select(col("__pos"),
        (conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long") % buckets).cast("int")
          .as("bucket"))
    val counts = bucketed.groupBy("bucket").agg(
      sum(when(col("__pos") === true, 1L).otherwise(0L)).as("cpos"),
      sum(when(col("__pos") === false, 1L).otherwise(0L)).as("cneg"))
    // scalar totals: a 1-row aggregate over the ≤ B-row counts frame —
    // in-plan, broadcast by construction (PlanAudit: scalar class)
    val totals = counts.agg(sum("cpos").as("__tpos"), sum("cneg").as("__tneg"))
    val aB = alpha * buckets
    df.sparkSession.range(buckets).select(col("id").cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("cpos", "cneg"))
      .crossJoin(totals)
      .select(
        col("bucket"), col("cpos"), col("cneg"),
        (log((col("cpos") + lit(alpha)) / (col("__tpos") + lit(aB))) -
          log((col("cneg") + lit(alpha)) / (col("__tneg") + lit(aB)))).as("weight"))
  }

  /** Class prior from the labeled corpus: (n_pos, n_neg, bias) with
    * bias = ln(n_pos / n_neg) — the intercept [[hashedLinearScore]] takes.
    * One scalar aggregation; both counts integer-exact. */
  def naiveBayesPrior(df: DataFrame, labelCol: Column): DataFrame =
    df.agg(
      sum(when(labelCol.cast("boolean") === true, 1L).otherwise(0L)).as("n_pos"),
      sum(when(labelCol.cast("boolean") === false, 1L).otherwise(0L)).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        log(col("n_pos").cast("double") / col("n_neg").cast("double")).as("bias"))

  /** Materialize a [[trainNaiveBayesWeights]] frame as the `Seq[Double]`
    * weight vector [[hashedLinearScore]] consumes. SMALL-BY-CONTRACT
    * collect: B rows, B a sizing knob never corpus-shaped, loud guard.
    * Weights are ROUNDED (`roundScale` decimals) before use — the same
    * engine-stability quantization as `scoreScale` on [[bm25TopK]]: the
    * model both engines score with is the rounded one, so a 1-ulp `ln`
    * divergence cannot leak into downstream scores. */
  def collectNaiveBayesModel(
      weightsDf: DataFrame,
      buckets: Int,
      roundScale: Int = 6,
      maxBuckets: Int = 1 << 16
  ): Seq[Double] = {
    require(buckets <= maxBuckets,
      s"buckets=$buckets exceeds maxBuckets=$maxBuckets; a hashed-feature model is " +
        "parameter-sized by contract — raise maxBuckets explicitly if the heap budget allows")
    val w = new Array[Double](buckets)
    weightsDf.select(col("bucket"), round(col("weight"), roundScale).as("w"))
      .collect()
      .foreach(r => w(r.getInt(0)) = r.getDouble(1))
    w.toSeq
  }

  /** PII scrubbing — the safety pass every training corpus gets before the
    * tokenizer sees it. Pure `regexp_replace`/`regexp_count` expressions
    * (vectorized, pushdown-friendly); patterns are RE2-compatible (no
    * backreferences or lookaround) so an independent engine applies the
    * SAME automaton semantics — leftmost match agreement is what makes the
    * operation oracle-checkable, and engine-portability is a feature for a
    * redaction pass that must behave identically wherever it reruns.
    * Emails, IPv4 literals, and xxx-xxx-xxxx phones become typed
    * placeholder tags; counts ride along for audit.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // replacements run in sequence, so each audit count is taken on the
    // text THAT replace actually sees — counts then equal the tags emitted
    // even when patterns abut (an email consuming "555-...@x.com" must not
    // also be counted as a phone; a boundary created by an inserted tag
    // must be counted if the next replace then matches there)
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    df.select(
      col(idCol),
      regexp_replace(afterPhone, Ipv4Pattern, "<IP>").as("redacted"),
      regexp_count(t, lit(EmailPattern)).as("n_emails"),
      regexp_count(afterPhone, lit(Ipv4Pattern)).as("n_ips"),
      regexp_count(afterEmail, lit(PhonePattern)).as("n_phones"))
  }

  /** Per-language corpus "data card" — the summary every curated training
    * set ships with: document counts, total whitespace tokens, and the
    * corpus-level distinct-token ratio per detected language. Ratios are a
    * division of two EXACT integer sums (an average of per-document doubles
    * would depend on summation order and diverge across engines/partitions;
    * sum-of-ints / sum-of-ints is one deterministic division). One scan +
    * one |languages|-row aggregate.
    */
  def corpusStats(df: DataFrame, textCol: String): DataFrame =
    df.select(tokens(col(textCol)).as("__toks"))
      .select(
        detectedLanguage(col("__toks")).as("lang"),
        tokenCount(col("__toks")).as("__tc"),
        size(array_distinct(col("__toks"))).as("__dc"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tc")).as("total_tokens"),
        round(sum(col("__dc")).cast("double") / sum(col("__tc")).cast("double"), 4)
          .as("mean_distinct_ratio"))

  /** Corpus-wide heavy-hitter word n-grams — the miner that produces the
    * boilerplate lists operators like [[Dedup.dedupLines]] and blocklist
    * curation consume: the `k` most frequent n-grams with exact counts,
    * ties broken by the gram (deterministic, oracle-checkable).
    *
    * Shape: per-row n-gram expressions (NON-distinct — frequency mining
    * counts every occurrence), one hash shuffle with map-side partial
    * counts (a boilerplate gram's millions of occurrences pre-combine per
    * partition), then `orderBy(...).limit(k)` which Spark executes as
    * TakeOrdered — per-partition top-k heaps, never a global sort.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int = 3, k: Int = 50): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(tokens(col(textCol)).as("__toks"))
      .select(explode(wordNgrams(col("__toks"), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }

  /** URL surface for web-corpus curation (the C4-family URL stage). Both
    * patterns are RE2-portable (no lookaround/backreferences) for the same
    * engine-agreement reason as the PII patterns above: extraction must
    * behave identically wherever it reruns. A URL ends at whitespace; the
    * domain is capture group 1. */
  val UrlPattern = "https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^ ]*)?"
  val UrlDomainPattern = "https?://([A-Za-z0-9.-]+)"

  /** Per-document URL extraction: the URL list, count, and the SORTED
    * DISTINCT domain list — pure codegen'd regexp expressions, zero
    * shuffles. */
  def urlMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      regexp_extract_all(col(textCol), lit(UrlPattern), lit(0)).as("urls"),
      size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0))).as("n_urls"),
      array_sort(array_distinct(
        regexp_extract_all(col(textCol), lit(UrlDomainPattern), lit(1)))).as("domains"))

  /** Drop documents containing a URL whose domain is on the blocklist — the
    * standard source-quality gate. The blocklist is EXPLICITLY broadcast
    * (blocklists are domain-count sized against a 100 TB corpus, the same
    * small-by-nature argument as the decontamination benchmark set); the
    * corpus side is one scan + per-row extraction + a semi-probe, and only
    * the matched doc ids shuffle. Returns the surviving rows of `df`
    * unchanged. */
  def filterByDomainBlocklist(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blocklist: DataFrame,
      domainCol: String = "domain"
  ): DataFrame = {
    val hit = df
      .select(col(idCol),
        explode(array_distinct(
          regexp_extract_all(col(textCol), lit(UrlDomainPattern), lit(1)))).as("__d"))
      .join(broadcast(blocklist.select(col(domainCol).as("__d")).distinct()), Seq("__d"), "left_semi")
      .select(col(idCol)).distinct()
    // the matched-id set is bounded by how much of the CORPUS hits the
    // blocklist, not by the blocklist — at 100 TB it can be a double-digit
    // percentage of all documents, and its static size estimate (an
    // explode->distinct chain) is garbage, so pin the anti-join to
    // sort-merge rather than let the planner broadcast it
    df.join(hit.hint("shuffle_merge"), Seq(idCol), "left_anti")
  }

  /** URL canonicalization — the crawl-dedup normalizer that makes
    * `http://WWW.Example.com/a/?b=2&a=1&utm_source=x#frag` and
    * `https://example.com/a?a=1&b=2` the SAME document key. Every crawl
    * pipeline runs this before exact URL dedup: without it, scheme/case/
    * tracking-param noise splinters each page into several "distinct"
    * URLs and the dedup silently keeps all of them.
    *
    * Steps (each a pure RE2-portable regexp/array expression — one
    * codegen'd projection, zero shuffle, stream-safe):
    * fragment stripped → scheme stripped → host lowercased, `www.`
    * prefix and default `:80`/`:443` ports dropped → trailing slashes
    * trimmed from the path (path CASE IS KEPT — only the host is
    * case-insensitive per RFC 3986) → query params sorted
    * lexicographically with `utm_*` tracking params and empties dropped.
    * Deterministic: `array_sort` on ASCII param strings is codepoint
    * order in any engine.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    val noScheme = regexp_replace(noFrag, "(?i)^https?://", "")
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(noScheme, "^([^/?]*)", 1)), "^www\\.", ""),
      ":(80|443)$", "")
    val rest = regexp_replace(noScheme, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)", 1)
    val params = filter(split(query, "&"),
      p => not(p.startsWith("utm_") || p === lit("")))
    val sortedQ = array_join(array_sort(params), "&")
    concat(host, path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Document fingerprints:
    *  - `fp_rolling`: order-sensitive polynomial rolling hash over tokens,
    *    mod 1e9+7 (token -> 24-bit md5 prefix; acc*131+h — bounded, never
    *    overflows, portable integer arithmetic);
    *  - `fp_md5`: exact content fingerprint.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val tokHash = (t: Column) => conv(substring(md5(t), 1, 6), 16, 10).cast("long")
    val rolling = aggregate(toks, lit(0L), (acc, t) => (acc * 131L + tokHash(t)) % 1000000007L)
    df.select(
      col(idCol),
      rolling.as("fp_rolling"),
      md5(col(textCol)).as("fp_md5"))
  }

  /** Intra-document repetition — the C4/Gopher-family quality signal that
    * gates boilerplate and spam: the fraction of a document's word n-grams
    * that are repeats of an earlier n-gram in the SAME document
    * (`1 - distinct/total`). Zero means every n-gram is unique; a
    * template page repeating one paragraph scores near 1.
    *
    * Shape: pure per-row array expressions (tokenize, slide, count) — no
    * shuffle, no state, embarrassingly parallel at any corpus size. Tokens
    * are projected to a bound column before the n-gram lambda for the same
    * once-per-row reason as [[graft.operators.Dedup.shinglesOfTokens]].
    * Documents shorter than `n` tokens count one n-gram (the whole text),
    * matching the shingle semantics used across the dedup family.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    require(n > 0, "n must be positive")
    val withToks = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    withToks
      .select(col(idCol), wordNgrams(col("__toks"), n).as("__grams"))
      .select(
        col(idCol),
        size(col("__grams")).as("total_ngrams"),
        size(array_distinct(col("__grams"))).as("distinct_ngrams"))
      .withColumn("dup_ngram_frac",
        round((col("total_ngrams") - col("distinct_ngrams")).cast("double") /
          col("total_ngrams").cast("double"), 4))
  }

  /** Benchmark decontamination — flag training documents that share word
    * n-grams with an evaluation/benchmark corpus, the standard leakage
    * check before a training run. Output: every input doc with the count
    * of DISTINCT doc n-grams that appear anywhere in the benchmark set,
    * and a `contaminated` flag at `minMatches`.
    *
    * Shape: the benchmark n-gram set is deduplicated and EXPLICITLY
    * broadcast — eval benchmarks are small by nature (thousands of docs
    * against a 100 TB corpus), and pinning the broadcast keeps the corpus
    * side a single scan + per-row semi-probe with a final count aggregate:
    * one shuffle on `idCol`, nothing corpus-sized ever moves. For an
    * atypically large benchmark set flip `broadcastBench = false` to
    * shuffle both sides on the n-gram instead.
    */
  def flagContaminated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 3,
      minMatches: Int = 1,
      broadcastBench: Boolean = true
  ): DataFrame = {
    require(n > 0, "n must be positive")
    require(minMatches > 0, "minMatches must be positive")
    def grams(df: DataFrame, keep: Seq[Column], text: String) = df
      .select(keep :+ tokens(col(text)).as("__toks"): _*)
      .select(keep :+ Dedup.shinglesOfTokens(col("__toks"), n).as("__grams"): _*)
    val benchGrams = grams(bench, Seq.empty, benchTextCol)
      .select(explode(col("__grams")).as("__g"))
      .distinct()
    val benchSide =
      if (broadcastBench) broadcast(benchGrams)
      else benchGrams.hint("shuffle_merge")
    val matched = grams(docs, Seq(col(idCol)), textCol)
      .select(col(idCol), explode(col("__grams")).as("__g"))
      .join(benchSide, Seq("__g"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("matched_ngrams"))
    docs.select(col(idCol))
      .join(matched, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("matched_ngrams"), lit(0)).as("matched_ngrams"))
      .withColumn("contaminated", col("matched_ngrams") >= minMatches)
  }

  /** STREAM-SAFE decontamination: drop documents sharing `minMatches`
    * distinct word n-grams with the benchmark corpus, as a PURE per-row
    * filter — [[flagContaminated]]'s explode → semi-join → re-aggregate
    * shape is stateful (an aggregation cannot sit in an append stream),
    * so the streaming form inverts the data flow: the benchmark's distinct
    * n-grams are collected ONCE (eval benchmarks are small by nature —
    * the same argument that lets the batch form broadcast them; `maxBenchGrams`
    * fails loudly if that assumption breaks) and probed per row through an
    * executor-broadcast hash set. A deliberate UDF: an O(1) set probe per
    * gram against a shared broadcast beats any literal-array expression
    * (linear scan per gram) once the benchmark is non-trivial, and the
    * surrounding shingle derivation stays the codegen'd expression shared
    * with the batch form, so both forms drop EXACTLY the same documents
    * (spec-pinned). Returns surviving rows of `docs` unchanged.
    *
    * Broadcast lifetime: each call collects the benchmark grams and pins a
    * fresh broadcast for the life of the SparkSession. A long-lived driver
    * composing many curated streams should build ONE broadcast with
    * [[collectBenchGrams]], pass it to the `Broadcast`-taking overload for
    * every composition, and `.destroy()` it when the benchmark rotates —
    * or simply reuse one curated stream definition.
    */
  def dropContaminatedStateless(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 3,
      minMatches: Int = 1,
      maxBenchGrams: Int = 5000000
  ): DataFrame =
    dropContaminatedStateless(
      docs, idCol, textCol,
      collectBenchGrams(bench, benchTextCol, n, maxBenchGrams), n, minMatches)

  /** Collect the benchmark's distinct word `n`-grams into a driver-managed
    * broadcast for [[dropContaminatedStateless]]. Callers that compose many
    * streams own the lifetime: build once, reuse, `.destroy()` on rotation. */
  def collectBenchGrams(
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 3,
      maxBenchGrams: Int = 5000000
  ): org.apache.spark.broadcast.Broadcast[Set[String]] = {
    require(n > 0, "n must be positive")
    val spark = bench.sparkSession
    import spark.implicits._
    // LIMIT rides into the collect so an oversized benchmark fails the
    // require below instead of OOMing the driver before the guard runs —
    // the guard must fire in exactly the misuse case it exists for
    val benchGrams = bench
      .select(tokens(col(benchTextCol)).as("__toks"))
      .select(explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("__g"))
      .distinct()
      .limit(maxBenchGrams + 1)
      .as[String].collect()
    require(benchGrams.length <= maxBenchGrams,
      s"dropContaminatedStateless: benchmark has > $maxBenchGrams distinct $n-grams " +
        "— that is corpus-sized, not benchmark-sized; use " +
        "flagContaminated with broadcastBench=false in a batch pass instead")
    spark.sparkContext.broadcast(benchGrams.toSet)
  }

  /** [[dropContaminatedStateless]] over a caller-owned gram broadcast from
    * [[collectBenchGrams]] — the reuse form for long-lived drivers. */
  def dropContaminatedStateless(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bc: org.apache.spark.broadcast.Broadcast[Set[String]],
      n: Int,
      minMatches: Int
  ): DataFrame = {
    require(minMatches > 0, "minMatches must be positive")
    // native expression, not a UDF: the watchlist count stays inside the
    // projection's WholeStageCodegen span
    def matches(grams: Column): Column =
      graft.functions.BroadcastSetExpressions.matchCount(grams, bc)
    docs
      .withColumn("__toks", tokens(col(textCol)))
      // null text → null gram array → matchCount NULL; coalesce keeps the
      // historical UDF semantics (null-text rows count 0 matches, so KEEP)
      .withColumn("__m",
        coalesce(matches(Dedup.shinglesOfTokens(col("__toks"), n)), lit(0)))
      .filter(col("__m") < minMatches)
      .drop("__toks", "__m")
  }

  // ------------------------------------------------ corpus statistics (r10)

  /** PMI collocation mining: pointwise mutual information of ADJACENT word
    * pairs vs their unigram probabilities —
    * pmi(w₁w₂) = ln( (c₁₂/B) / ((c₁/N)·(c₂/N)) ) with N total tokens and
    * B total bigrams. High-PMI pairs are multiword units ("San Francisco",
    * boilerplate stock phrases); the classic collocation extractor
    * (Church & Hanks 1990) and the fixed-phrase detector a template-mining
    * pass seeds from.
    *
    * Shape at 100 TB: one explode per doc into bigram rows, TWO keyed
    * count aggregations (bigrams; unigrams), two SMJ joins of count frames
    * (count tables are vocabulary-shaped, never broadcast), one bounded
    * top-k. `minCount` prunes the hapax tail BEFORE the joins — PMI is
    * degenerate at low counts anyway (a 1-occurrence pair maxes the
    * statistic), so the filter is both the statistical and the shuffle
    * fix. Ties break on (pair) for engine-stable selection.
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long,
      k: Int
  ): DataFrame = {
    require(minCount >= 1 && k > 0, "minCount and k must be positive")
    // referenced by the unigram count, the bigram count, AND the bigram
    // total — materialize once or the tokenize replays per reference
    // (the jaccardPairsPrefixFiltered lesson)
    val toks = df.select(tokens(col(textCol)).as("__toks")).localCheckpoint(true)
    val uni = toks.select(explode(col("__toks")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val totals = uni.agg(sum(col("__c")).cast("double").as("__n"))
    // raw adjacent pairs, NOT Dedup.shinglesOfTokens — that one is
    // array_distinct'd for Jaccard; PMI needs every OCCURRENCE to count
    val rawBigrams = transform(sequence(lit(0), size(col("__toks")) - 2),
      i => concat_ws(" ", element_at(col("__toks"), i + 1), element_at(col("__toks"), i + 2)))
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(explode(rawBigrams).as("__p"))
      .groupBy(col("__p")).agg(count(lit(1)).as("__c12"))
      .filter(col("__c12") >= minCount)
      .withColumn("__w1", element_at(split(col("__p"), " "), 1))
      .withColumn("__w2", element_at(split(col("__p"), " "), 2))
    val btotal = toks
      .select((size(col("__toks")) - 1).cast("long").as("__nb")).agg(
        sum(when(col("__nb") > 0, col("__nb")).otherwise(0L)).cast("double").as("__b"))
    bi
      .join(uni.select(col("__w").as("__w1"), col("__c").as("__c1")).hint("shuffle_merge"), Seq("__w1"))
      .join(uni.select(col("__w").as("__w2"), col("__c").as("__c2")).hint("shuffle_merge"), Seq("__w2"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(btotal))
      .select(col("__p").as("pair"), col("__c12").as("cnt"),
        graft.functions.Quantize.scaledFloor(log((col("__c12") / col("__b")) /
          ((col("__c1") / col("__n")) * (col("__c2") / col("__n")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("pair"))
      .limit(k)
  }

  /** χ² keyword extraction per group: for every (group, term), the 2×2
    * contingency χ² of term occurrence inside vs outside the group —
    * the per-domain / per-language distinctive-vocabulary card
    * (what words make THIS slice different), and the feature selector
    * behind per-source quality classifiers.
    *
    * χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) over token occurrence
    * counts, computed from ONE keyed (group, term) count plus a
    * term-marginal frame joined back — group marginals ride a broadcast
    * (|groups| rows). Top-`k` terms per group by (χ², term), computed
    * with a per-group window over CANDIDATE terms only (`minCount`
    * floors the tail first). Integer counts everywhere until the final
    * ratio, so the statistic is engine-exact at round(4).
    */
  def chiSquaredKeywords(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      minCount: Long,
      k: Int
  ): DataFrame = {
    require(minCount >= 1 && k > 0, "minCount and k must be positive")
    import org.apache.spark.sql.expressions.Window
    val occ = df.select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("term"))
    val gt = occ.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("__a"))
    val tMarg = gt.groupBy(col("term")).agg(sum(col("__a")).as("__t"))
    val gMarg = gt.groupBy(col("grp")).agg(sum(col("__a")).as("__g"))
    val total = gt.agg(sum(col("__a")).as("__n"))
    val cells = gt.filter(col("__a") >= minCount)
      .join(tMarg.hint("shuffle_merge"), Seq("term"))
      .join(broadcast(gMarg), Seq("grp"))
      .crossJoin(broadcast(total))
      // a = in-group count, b = out-group count of the term,
      // c = in-group other tokens, d = out-group other tokens
      .withColumn("__b", col("__t") - col("__a"))
      .withColumn("__c", col("__g") - col("__a"))
      .withColumn("__d", col("__n") - col("__g") - col("__b"))
      // all ratio arithmetic in doubles: the four-marginal product
      // overflows int64 well below corpus scale (each factor is
      // token-count-sized; their product is ~N⁴)
      .withColumn("chi2", graft.functions.Quantize.scaledFloor(
        (col("__n").cast("double") *
          pow(col("__a").cast("double") * col("__d").cast("double") -
            col("__b").cast("double") * col("__c").cast("double"), 2)) /
          ((col("__a") + col("__b")).cast("double") *
            (col("__c") + col("__d")).cast("double") *
            (col("__a") + col("__c")).cast("double") *
            (col("__b") + col("__d")).cast("double")), 4))
    val w = Window.partitionBy(col("grp")).orderBy(col("chi2").desc, col("term"))
    cells
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("grp"), col("rnk"), col("term"), col("__a").as("cnt"), col("chi2"))
  }

  /** Per-slice KL divergence from the corpus unigram distribution:
    * KL(p_s ‖ q) = Σ_{t observed in s} p·ln(p/q) with p = c_s/T_s exact
    * (terms the slice actually contains) and q add-one smoothed over the
    * corpus vocabulary ((c_t+1)/(T+V)) so q > 0 always. The drift /
    * domain-shift card statistic: how far a source's vocabulary sits from
    * the mixture it feeds ([[zipfFit]]'s companion; the token-level
    * analogue of q153's histogram TV distance).
    *
    * Shape: one (slice, term) count, one term-marginal frame SMJ-joined
    * back (vocabulary-shaped, never broadcast), slice totals broadcast
    * (|slices| rows), one keyed sum. Nothing dense: absent terms
    * contribute nothing by construction, so no slice×vocab cross join.
    */
  def klFromCorpus(
      df: DataFrame,
      sliceCol: String,
      textCol: String
  ): DataFrame = {
    val occ = df.select(col(sliceCol).as("slice"), explode(tokens(col(textCol))).as("__t"))
    val st = occ.groupBy(col("slice"), col("__t")).agg(count(lit(1)).as("__cs"))
    val tMarg = st.groupBy(col("__t")).agg(sum(col("__cs")).as("__ct"))
    val sTot = st.groupBy(col("slice")).agg(sum(col("__cs")).as("__ts"))
    val corpus = tMarg.agg(sum(col("__ct")).as("__tt"), count(lit(1)).as("__v"))
    st
      .join(tMarg.hint("shuffle_merge"), Seq("__t"))
      .join(broadcast(sTot), Seq("slice"))
      .crossJoin(broadcast(corpus))
      .withColumn("__p", col("__cs") / col("__ts").cast("double"))
      .withColumn("__q", (col("__ct") + 1).cast("double") / (col("__tt") + col("__v")))
      // per-term contributions quantized to a 1e-7 integer grid BEFORE the
      // sum: a raw float sum over a vocabulary-sized group follows
      // nondeterministic shuffle-fetch order (run-to-run AND cross-engine
      // divergence at the last ulp — the r10 self-review finding); integer
      // sums are order-free, so the statistic is reproducible by
      // construction at the cost of a 1e-7-per-term quantization error
      .withColumn("__c7",
        floor((col("__p") * log(col("__p") / col("__q"))) * lit(1.0e7) + lit(0.5))
          .cast("long"))
      .groupBy(col("slice"))
      .agg(graft.functions.Quantize.scaledFloor(
        sum(col("__c7")).cast("double") / lit(1.0e7), 6).as("kl_nats"))
  }

  /** Character-class profile + mojibake flag per document: fractions of
    * ASCII letters / digits / whitespace / punctuation-symbols / other
    * over the character length, plus a `mojibake` boolean for the two
    * encoding-damage fingerprints that survive every transcode — U+FFFD
    * replacement characters and the 'Ã□' UTF-8-read-as-Latin-1 digraph
    * family. The non-Latin-script and encoding-health card a multilingual
    * ingest wants BEFORE language ID (lang-id on mojibake is noise).
    * Pure per-row regexp-count projections — zero shuffle, stream-safe.
    */
  def scriptProfile(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("double")
    // explicit ASCII classes only — Java's \\s and \\p{P} differ from RE2's
    // at the margins (\\x0B; Unicode category edges), and an engine-exact
    // oracle needs byte-identical class definitions
    val alphaP = "[A-Za-z]"
    val digitP = "[0-9]"
    val spaceP = "[ \\t\\n\\r]"
    val punctP = "[!-/:-@\\[-`{-~]" // the four ASCII punct/symbol runs
    def frac(pattern: String): Column =
      graft.functions.Quantize.scaledFloor(regexp_count(t, lit(pattern)) / len, 4)
    df.select(col(idCol),
      when(length(t) > 0, frac(alphaP)).otherwise(lit(0.0)).as("frac_alpha"),
      when(length(t) > 0, frac(digitP)).otherwise(lit(0.0)).as("frac_digit"),
      when(length(t) > 0, frac(spaceP)).otherwise(lit(0.0)).as("frac_space"),
      when(length(t) > 0, frac(punctP)).otherwise(lit(0.0)).as("frac_punct"),
      when(length(t) > 0,
        graft.functions.Quantize.scaledFloor(
          lit(1.0) - frac(alphaP) - frac(digitP) - frac(spaceP) - frac(punctP), 4))
        .otherwise(lit(0.0)).as("frac_other"),
      (t.contains("\ufffd") || t.contains("\u00c3\u00a9") || t.contains("\u00c3\u00a2") ||
        t.contains("\u00e2\u20ac")).as("mojibake"))
  }

  /** Flesch-style readability proxy per document: 206.835 − 1.015·(words/
    * sentences) − 84.6·(syllables/words), with syllables approximated as
    * vowel-group counts (the standard no-dictionary proxy) and sentences
    * as terminal-punctuation runs (min 1 so fragments still score). The
    * reading-level half of the quality card — complexity-targeted mixes
    * filter on it. All counts via regexp_count over ASCII classes (the
    * [[scriptProfile]] portability discipline); pure per-row projection,
    * zero shuffle, stream-safe. Score scaled-floor quantized to 4;
    * tokenless docs emit null.
    */
  def readability(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val t = col(textCol)
    val words = regexp_count(t, lit("[A-Za-z0-9]+")).cast("double")
    val sents = greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("double")
    val syll = regexp_count(t, lit("[aeiouyAEIOUY]+")).cast("double")
    val raw = lit(206.835) - lit(1.015) * (words / sents) - lit(84.6) * (syll / words)
    df.select(col(idCol),
      words.cast("long").as("n_words"),
      sents.cast("long").as("n_sentences"),
      syll.cast("long").as("n_syllables"),
      when(words > 0,
        floor(raw * lit(10000.0) + lit(0.5)).cast("double") / lit(10000.0)).as("flesch"))
  }

  /** Lexical-diversity card per group: type-token ratio, hapax fraction,
    * and Simpson's repeat-probability over the group's token counts —
    * the vocabulary-richness companion to [[zipfFit]] (template spam and
    * boilerplate floods crater TTR and spike Simpson; natural prose is
    * hapax-heavy). All counts integer-exact; ratios computed in doubles
    * (T·(T−1) is ~N² — int64 overflows at corpus scale).
    *
    * Shape: one (group, term) count, then ONE bounded per-group
    * aggregation over vocabulary-shaped rows — map-side combined, never
    * a corpus-wide distinct.
    */
  def lexicalDiversity(
      df: DataFrame,
      groupCol: String,
      textCol: String
  ): DataFrame = {
    val counts = df.select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("grp"), col("__t")).agg(count(lit(1)).as("__c"))
    counts.groupBy(col("grp"))
      .agg(
        sum(col("__c")).as("total_tokens"),
        count(lit(1)).as("distinct_terms"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax_terms"),
        sum(col("__c").cast("double") * (col("__c") - 1).cast("double")).as("__rep"))
      .select(col("grp"), col("total_tokens"), col("distinct_terms"), col("hapax_terms"),
        graft.functions.Quantize.scaledFloor(
          col("distinct_terms") / col("total_tokens").cast("double"), 6).as("ttr"),
        graft.functions.Quantize.scaledFloor(
          col("hapax_terms") / col("distinct_terms").cast("double"), 6).as("hapax_frac"),
        graft.functions.Quantize.scaledFloor(col("__rep") /
          (col("total_tokens").cast("double") * (col("total_tokens") - 1).cast("double")), 6)
          .as("simpson"))
  }

  /** N-gram novelty vs a reference corpus: per document, the fraction of
    * its DISTINCT `n`-grams absent from the reference's gram set \u2014 the
    * inverse of contamination (q58 flags overlap; this scores how much
    * NEW text a candidate batch actually brings, the dedup-adjacent
    * "marginal value" signal incremental corpus building ranks on).
    *
    * Shape: reference grams are CORPUS-shaped, so membership is one
    * SMJ-pinned anti-join (never a broadcast set \u2014 q64's discipline);
    * per-doc totals are one keyed count. Output:
    * (id, total_grams, novel_grams, novelty).
    */
  def ngramNovelty(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: DataFrame,
      refTextCol: String,
      n: Int = 3
  ): DataFrame = {
    val refGrams = reference
      .select(tokens(col(refTextCol)).as("__toks"))
      .select(explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("__g"))
      .distinct()
    val docGrams = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("__g"))
    val totals = docGrams.groupBy(col(idCol)).agg(count(lit(1)).as("total_grams"))
    val novel = docGrams
      .hint("shuffle_merge")
      .join(refGrams.hint("shuffle_merge"), Seq("__g"), "left_anti")
      .groupBy(col(idCol)).agg(count(lit(1)).as("novel_grams"))
    totals.join(novel.hint("shuffle_merge"), Seq(idCol), "left")
      .select(col(idCol), col("total_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        graft.functions.Quantize.scaledFloor(
          coalesce(col("novel_grams"), lit(0L)) / col("total_grams").cast("double"), 4)
          .as("novelty"))
  }

  /** Sparse TF-IDF cosine document pairs — the LEXICAL similarity join
    * complementing the dense-embedding family ([[graft.operators.Dedup]]'s
    * MinHash measures set overlap; this weighs shared RARE terms, the
    * plagiarism/near-template signal Jaccard dilutes): pairs sharing ≥ 1
    * surviving term scored by `cos = Σ w₁w₂ / (‖w₁‖‖w₂‖)` over the [[tfidf]]
    * weights, thresholded, top-k.
    *
    * Scale contract: candidates come from a term-keyed self-join, so the
    * volume is Σ_term df² — `maxDf` caps it BY CONTRACT (a term in more
    * than maxDf docs is too common to signal similarity anyway; its IDF
    * weight is already ~0 — the adamicAdar maxDegree trade verbatim).
    * Weights are 1e-6-quantized once (the float log is engine-identical
    * on exact integer inputs), then every dot/norm sum is exact decimal —
    * the similarity orders deterministically with (id_a, id_b)
    * tie-breaks. Output: top-k (id_a, id_b, n_terms, cosine) by cosine
    * desc.
    */
  def tfidfCosinePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Int,
      threshold: Double,
      topK: Int
  ): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    require(threshold > 0.0 && threshold < 1.0, s"threshold out of (0, 1)")
    require(topK > 0, s"topK must be positive")
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val w = tfidf(df, idCol, textCol)
      .filter(col("df") <= maxDf)
      .select(col(idCol).as("__id"), col("term"),
        q6(col("tfidf")).cast("decimal(18,6)").as("__w"))
      .localCheckpoint(true) // feeds norms AND both sides of the pair join
    val norms = w.groupBy(col("__id"))
      .agg(sum((col("__w") * col("__w")).cast("decimal(38,12)")).as("__nn"))
      .select(col("__id"), sqrt(col("__nn").cast("double")).as("__nrm"))
    val pairs = w.as("l").hint("shuffle_merge")
      .join(w.as("r").hint("shuffle_merge"),
        col("l.term") === col("r.term") && col("l.__id") < col("r.__id"))
      .groupBy(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .agg(count(lit(1)).as("n_terms"),
        sum((col("l.__w") * col("r.__w")).cast("decimal(38,12)")).as("__dot"))
    pairs
      .join(norms.select(col("__id").as("id_a"), col("__nrm").as("__na"))
        .hint("shuffle_merge"), Seq("id_a"))
      .join(norms.select(col("__id").as("id_b"), col("__nrm").as("__nb"))
        .hint("shuffle_merge"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_terms"),
        q6(col("__dot").cast("double") / (col("__na") * col("__nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topK)
  }

  /** Heaps'-law fit of vocabulary growth, `V(n) ≈ K·n^β` — the
    * corpus-health scaling read: β far above the prose band (~0.4–0.6)
    * means unbounded novel-token production (serial numbers, hashes —
    * tokenizer poison); β collapsing toward 0 means template/duplication
    * saturation. The same read drives "is more data still buying
    * vocabulary" decisions before a tokenizer retrain.
    *
    * Growth curve WITHOUT a corpus-ordered window: docs bucket by id
    * RANGE (integer arithmetic — engine-exact), per-bucket token totals
    * and per-token FIRST bucket (one min aggregation over the token
    * stream) give cumulative (tokens, vocab) over the `buckets`-row
    * frame. β and K are the OLS fit on (ln n, ln V) with each log
    * 1e-9-quantized and products summed as decimal — the theilSen grid
    * discipline. Whitespace tokens (the q65 convention), empties dropped.
    *
    * Shape: two corpus-linear aggregations (bucket totals; per-token min
    * bucket — vocabulary-shaped shuffle), then buckets-row windows. The
    * id-range bucketing is uniform-id-sized — a sparse/skewed id space
    * skews bucket SIZES, not correctness (the fit only needs increasing
    * checkpoints; degenerate empty buckets are dropped). Output 1 row:
    * (n_points, beta, k) — null fit when < 2 distinct checkpoints.
    */
  def heapsLaw(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 10
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2 && buckets <= 1000, s"buckets=$buckets out of [2, 1000]")
    val q9 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 9)
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    // bounds collected driver-side (1 row, the trainKMeans precedent) so
    // the bucket arithmetic can be overflow-CHECKED: 64-bit-hash id
    // schemes would overflow (id-lo)*buckets in Long and silently
    // garbage the checkpoints otherwise
    val boundsRow = df.agg(min(col(idCol).cast("long")).as("__lo"),
      max(col(idCol).cast("long")).as("__hi")).collect().head
    require(!boundsRow.isNullAt(0), s"$idCol has no non-null values")
    val lo = boundsRow.getLong(0); val hi = boundsRow.getLong(1)
    require(BigInt(hi) - BigInt(lo) + 1 <= Long.MaxValue / buckets,
      s"id range [$lo, $hi] x $buckets overflows the bucket arithmetic — " +
        "remap ids to a dense range first")
    val span = hi - lo + 1L
    val toks = df
      .select(col(idCol).cast("long").as("__hid"),
        explode(split(col(textCol), " ")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(expr(s"((__hid - ${lo}L) * ${buckets}L) DIV ${span}L").as("__b"),
        col("__tok"))
    val perBucket = toks.groupBy(col("__b")).agg(count(lit(1)).as("__nt"))
    val firstBucket = toks.groupBy(col("__tok")).agg(min(col("__b")).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__nv"))
    // UNPARTITIONED-WINDOW: bounded by the `buckets` knob (the id span
    // is quantized into exactly `buckets` cells above)
    val wCum = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perBucket.join(firstBucket, Seq("__b"), "left")
      .select(col("__b"), col("__nt"), coalesce(col("__nv"), lit(0L)).as("__nv"))
      .withColumn("__cn", sum(col("__nt")).over(wCum))
      .withColumn("__cv", sum(col("__nv")).over(wCum))
      .filter(col("__cn") > 0 && col("__cv") > 0)
      .select(q9(log(col("__cn").cast("double"))).cast("decimal(18,9)").as("__x"),
        q9(log(col("__cv").cast("double"))).cast("decimal(18,9)").as("__y"))
    val sums = pts.agg(count(lit(1)).as("n_points"),
      sum(col("__x")).cast("decimal(38,9)").as("__sx"),
      sum(col("__y")).cast("decimal(38,9)").as("__sy"),
      sum((col("__x") * col("__y")).cast("decimal(38,18)")).as("__sxy"),
      sum((col("__x") * col("__x")).cast("decimal(38,18)")).as("__sxx"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n_points").cast("double")
    val den = nD * d("__sxx") - d("__sx") * d("__sx")
    val beta = (nD * d("__sxy") - d("__sx") * d("__sy")) / den
    val logk = (d("__sy") - beta * d("__sx")) / nD
    val ok = col("n_points") >= 2 && den =!= 0.0
    sums.select(col("n_points"),
      when(ok, q6(beta)).as("beta"),
      when(ok, q6(exp(logk))).as("k"))
  }

  /** Corpus coverage card (Good–Turing): token total N, vocabulary V,
    * hapax count n₁, dis-legomena n₂, and the Good–Turing UNSEEN MASS
    * `P(next token is novel) ≈ n₁/N` — the coverage statistic that says
    * how much of the long tail a corpus has actually captured (a
    * curation pass that strips rare junk should RAISE coverage = lower
    * unseen mass; a dedup pass that collapses boilerplate lowers n₁'s
    * share). The card reports the exact integer sufficient statistics
    * plus the two standard ratios, quantized; downstream smoothing owns
    * its own fit. Shape: one vocabulary-shaped counting aggregation +
    * one count-of-counts aggregation, both map-side combined. Output 1
    * row: (n_tokens, vocab, n1, n2, unseen_mass, hapax_share). */
  def coverageCard(df: DataFrame, textCol: String): DataFrame = {
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val counts = df.select(explode(split(col(textCol), " ")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    counts.agg(
      sum(col("__cnt")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      count(when(col("__cnt") === 1L, 1)).as("n1"),
      count(when(col("__cnt") === 2L, 1)).as("n2"))
      .select(col("n_tokens"), col("vocab"), col("n1"), col("n2"),
        q6(col("n1").cast("double") / col("n_tokens").cast("double"))
          .as("unseen_mass"),
        q6(col("n1").cast("double") / col("vocab").cast("double"))
          .as("hapax_share"))
  }

  /** Per-row robots.txt politeness decision for one crawler product
    * token ([[graft.functions.RobotsKernel]] — RFC 9309 group selection,
    * longest-match rules, `*`/`$` patterns, permissive failure posture):
    * adds `<prefix>_allowed` (boolean) and `<prefix>_delay` (long,
    * null when the selected group names no Crawl-delay). The frontier
    * gate of a crawl pipeline (q345); zero shuffle. */
  def robotsDecision(df: DataFrame, robotsCol: String, pathCol: String,
      agent: String, prefix: String): DataFrame = {
    val d = graft.functions.RobotsExpressions.robotsAllow(
      col(robotsCol), col(pathCol), agent)
    df.withColumn("__r", d)
      .withColumn(s"${prefix}_allowed", element_at(col("__r"), 1) === 1L)
      .withColumn(s"${prefix}_delay",
        when(element_at(col("__r"), 2) >= 0L, element_at(col("__r"), 2)))
      .drop("__r")
  }
}
