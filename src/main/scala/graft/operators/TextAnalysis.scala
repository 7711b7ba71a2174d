package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (beyond-reference
  * scope, SURVEY.md §7.4): language ID, quality scoring, token counting,
  * and document fingerprinting. All pure column expressions — codegen'd,
  * shuffle-free per document. */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(textCol: Column): Column = split(lower(textCol), "\\s+")

  /** Tokens matching a distinct word list, counted in ONE native pass
    * ([[graft.functions.TokenSetCount]]). Exactly equals the per-word
    * HOF sum `words.map(w => size(filter(toks, _ === w))).reduce(_+_)`
    * it replaced — which walked the array once per word with an
    * interpreted lambda per element, the measured dominant cost of the
    * quality gate (16 passes per document). */
  private def countTokensIn(toks: Column, words: Seq[String]): Column =
    graft.functions.TokenSetCount.token_set_count(toks, words)

  /** Stopword-marker lists per language for the n-gram/stopword heuristic
    * language ID. Tiny by design: at corpus scale the scoring is a linear
    * scan either way, and the lists are an interchangeable parameter. */
  val StopwordMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "und", "das", "ein"),
    "fr" -> Seq("le", "et", "la", "un"),
    "es" -> Seq("el", "y", "los", "una"))

  /** Language ID: argmax of per-language marker-token counts with a fixed
    * en>de>fr>es tie-break. Adds `pred_lang` and the per-language scores. */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = StopwordMarkers.toSeq.sortBy(_._1).foldLeft(df) {
      case (d, (lang, words)) =>
        d.withColumn(s"score_$lang", countTokensIn(toks, words))
    }
    scored.withColumn("pred_lang",
      when(col("score_en") >= col("score_de") &&
        col("score_en") >= col("score_fr") &&
        col("score_en") >= col("score_es"), "en")
        .when(col("score_de") >= col("score_fr") &&
          col("score_de") >= col("score_es"), "de")
        .when(col("score_fr") >= col("score_es"), "fr")
        .otherwise("es"))
  }

  /** floor-based 6-decimal rounding: identical across engines for
    * bit-identical input doubles (unlike decimal-string round, which can
    * disagree on .5 midpoints). */
  private def round6(c: Column): Column = floor(c * 1000000L + 0.5) / 1000000L

  /** Heuristic quality score in [0,1]: length saturation, non-stopword
    * density, and mean word length. Deterministic arithmetic, rounded. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val allStops = StopwordMarkers.values.flatten.toSeq.distinct
    val stopCnt = countTokensIn(toks, allStops)
    val alphaLen = length(regexp_replace(col(textCol), "\\s+", ""))
    df.withColumn("n_tokens", nTok)
      .withColumn("stopword_ratio", round6(stopCnt / nTok.cast("double")))
      .withColumn("avg_word_len", round6(alphaLen / nTok.cast("double")))
      .withColumn("quality_score", round6(
        least(nTok / lit(100.0), lit(1.0)) * 0.4 +
          (lit(1.0) - stopCnt / nTok.cast("double")) * 0.3 +
          least(alphaLen / nTok.cast("double") / lit(8.0), lit(1.0)) * 0.3))
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex token count
    * (runs of letters, runs of digits, or single other non-space chars —
    * a cheap proxy for subword vocab size; RE2-compatible pattern). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val ws = size(tokens(col(textCol)))
    val bpeish = size(regexp_extract_all(lower(col(textCol)),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
    df.withColumn("ws_tokens", ws).withColumn("subword_tokens", bpeish)
  }

  /** PII patterns, shared by the redactor and its oracle SQL. Written to
    * the common subset of Java regex and RE2 (no lookaround, no
    * backreferences) so the exact same pattern string runs in Spark's
    * codegen'd regexp_replace and in any RE2-based engine. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // order matters: emails contain dots+digits, so they go first; IPv4
    // before phone so dotted phone fragments can't half-match an IP
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "ip" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b")

  /** PII redaction: count then mask emails / IPv4s / SSN-shaped ids /
    * phone numbers with `[KIND]` tokens, in one codegen'd pass per
    * document (chained regexp_replace — no shuffle, no UDF). Adds
    * `n_<kind>` counts and `redacted`. The pattern list is a heuristic
    * floor, not a compliance guarantee — swap in heavier patterns (or an
    * NER model via mapInPandas) behind the same column contract. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val counted = PiiPatterns.foldLeft(df) { case (d, (kind, pat)) =>
      d.withColumn(s"n_$kind", regexp_count(col(textCol), lit(pat)))
    }
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (kind, pat)) =>
        regexp_replace(c, pat, s"[${kind.toUpperCase}]")
    }
    counted.withColumn("redacted", redacted)
  }

  /** Gopher-style repetition statistics over word n-grams: the fraction
    * of all n-grams claimed by the single most frequent one (`top_ratio`)
    * and the duplicate fraction (1 − distinct/total, `dup_ratio`) —
    * the two filters repetitive/boilerplate text fails first
    * (Rae et al. 2021, "Scaling Language Models", table A1). Two grouped
    * passes over exploded n-grams, partial-aggregated map-side. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val perGram = Dedup.shingles(df, idCol, textCol, n)
      .groupBy(col(idCol), col("shingle"))
      .agg(count(lit(1)).as("c"))
    perGram.groupBy(col(idCol))
      .agg(sum("c").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_n"))
      .withColumn("top_ratio", round6(col("top_n") / col("n_grams")))
      .withColumn("dup_ratio",
        round6(lit(1.0) - col("n_distinct") / col("n_grams")))
  }

  /** Gopher-style quality rules (Rae et al. 2021, appendix A1.1 — the
    * standard pre-filter every web-scale corpus runs): per-document
    * boolean rules plus the combined `keep` flag. Thresholds are
    * parameters with the paper's defaults where they translate to the
    * whitespace-token world; every rule is a pure column expression, so
    * the full rule set is one codegen'd map pass at any corpus size.
    *
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [3, 10]; symbol-to-word ratio (#, …, ellipsis) ≤ 0.1; ratio of
    * words containing an alphabetic char ≥ 0.8; at least `minStopwords`
    * distinct common stopwords present (the "stop word" rule that kills
    * keyword-stuffing pages). */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minStopwords: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks)
    val meanLen = round6(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        nWords.cast("double"))
    val symbolWords = size(filter(toks, t =>
      t.contains("#") || t.contains("...") || t.contains("…")))
    val symbolRatio = round6(symbolWords.cast("double") / nWords.cast("double"))
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]")))
    val alphaRatio = round6(alphaWords.cast("double") / nWords.cast("double"))
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStops = stopwords.map(w =>
      when(array_contains(toks, w), 1).otherwise(0)).reduce(_ + _)
    df.select(col(idCol), col(textCol))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("n_stopwords", nStops.cast("long"))
      .withColumn("rule_words",
        nWords >= minWords && nWords <= maxWords)
      .withColumn("rule_mean_len",
        col("mean_word_len") >= 3 && col("mean_word_len") <= 10)
      .withColumn("rule_symbols", col("symbol_ratio") <= 0.1)
      .withColumn("rule_alpha", col("alpha_ratio") >= 0.8)
      .withColumn("rule_stopwords", col("n_stopwords") >= minStopwords)
      .withColumn("keep",
        col("rule_words") && col("rule_mean_len") && col("rule_symbols") &&
          col("rule_alpha") && col("rule_stopwords"))
      .drop(textCol)
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    * lines that end in terminal punctuation, have at least
    * `minWordsPerLine` words, and don't mention "javascript"; drop whole
    * pages containing "lorem ipsum" or a curly brace (code), or with
    * fewer than `minLines` surviving lines. Emits both the verdict AND
    * the cleaned text (surviving lines re-joined), since C4 rewrites
    * pages rather than just filtering them. All rules are pure column
    * expressions over the line array — one codegen'd map pass, no
    * shuffle, at any corpus size. */
  def c4Rules(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 5, minLines: Int = 3): DataFrame = {
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    val keptLines = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    df.select(col(idCol), col(textCol))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept_lines", size(keptLines).cast("long"))
      .withColumn("clean_text", array_join(keptLines, "\n"))
      .withColumn("has_lorem", lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("has_brace", col(textCol).contains("{"))
      .withColumn("keep", col("n_kept_lines") >= minLines &&
        !col("has_lorem") && !col("has_brace"))
      .drop(textCol)
  }

  /** Document fingerprint: min/max md5 prefix over word 4-grams — a
    * winnowing-style content signature that survives reordering-free edits
    * and is identical across engines. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4): DataFrame = {
    val sh = Dedup.shingles(df, idCol, textCol, n)
    sh.withColumn("h", substring(md5(col("shingle")), 1, 16))
      .groupBy(col(idCol))
      .agg(min("h").as("fp_min"), max("h").as("fp_max"),
        count(lit(1)).as("n_grams"))
  }

  /** Unigram language-model token frequencies over a reference corpus —
    * the training half of CCNet-style LM quality filtering (Wenzek et al.
    * 2020 score documents by LM perplexity; a unigram model is the
    * engine-portable core of the same mechanism). One grouped pass;
    * the result is vocabulary-sized, not corpus-sized. */
  def unigramModel(reference: DataFrame, textCol: String): DataFrame = {
    val toks = reference.select(explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("total"))
    counts.crossJoin(broadcast(total))
  }

  /** Score each document by its average unigram negative log-likelihood
    * under `model` (from [[unigramModel]]): low = fluent/common text,
    * high = gibberish or vocabulary the reference corpus has never seen.
    * Out-of-vocabulary tokens take an add-one-smoothed floor of
    * 1/(total+1). The model join strategy is left to AQE: at test scale
    * the vocabulary broadcasts; a web-scale reference vocabulary exceeds
    * broadcast/driver limits, and AQE then falls back to a shuffle join
    * keyed on the token — still one shuffle of the (doc, token) relation
    * plus the per-doc aggregation. Callers with a huge model who want the
    * broadcast back should prune it by a frequency threshold first
    * (rare tokens score at the floor anyway). */
  def unigramLogLoss(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val scored = model.select(col("tok"),
      log(col("c") / (col("total") + 1)).as("__logp"))
    val floor = model.agg(
      log(lit(1.0) / (max(col("total")) + 1)).as("__floor"))
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    toks
      .join(scored, Seq("tok"), "left")
      .crossJoin(broadcast(floor))
      .withColumn("__nll", -coalesce(col("__logp"), col("__floor")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg("__nll"), 4).as("avg_nll"))
  }

  /** Adjacent token pairs of each document, extracted map-side (the
    * token array zipped with itself shifted by one — no window, no
    * shuffle): (idCol, w1, w2), one row per bigram occurrence. */
  private[operators] def tokenPairs(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t)
    val pairs = arrays_zip(
      slice(t, lit(1), greatest(n - 1, lit(0))).as("w1"),
      slice(t, lit(2), greatest(n - 1, lit(0))).as("w2"))
    df.select(col(idCol), explode(pairs).as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
  }

  /** Interpolated bigram LM log-loss — the step up from
    * [[unigramLogLoss]] on the perplexity-quality axis (CCNet buckets
    * documents by LM score; a bigram model with unigram backoff is the
    * classic cheap approximation). Per adjacent pair (w1, w2):
    * p = ½·c(w1,w2)/c(w1·) + ½·c(w2)/(T+1), the second term flooring
    * at 1/(T+1) for OOV; score = mean −ln p over the doc's pairs.
    * Documents with fewer than two tokens emit no row (no pairs).
    *
    * Scale shape: pair extraction is map-only; the model is two grouped
    * counts over the reference corpus; scoring joins the (doc, pair)
    * relation against the model on the pair key — AQE broadcasts while
    * the model fits, falls back to a key-partitioned shuffle join
    * beyond, never anything driver-sized. */
  def bigramLogLoss(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame): DataFrame = {
    val refPairs = tokenPairs(reference.select(lit(0L).as("__rid"),
      col(textCol)), "__rid", textCol)
    val bi = refPairs.groupBy("w1", "w2").agg(count(lit(1)).as("__cb"))
    val ctx = bi.groupBy("w1").agg(sum("__cb").as("__c1"))
    val uni = unigramModel(reference, textCol)
    val total = uni.agg(max(col("total")).as("__total"))
    val docPairs = tokenPairs(df, idCol, textCol)
    docPairs
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni.select(col("tok").as("w2"), col("c").as("__cu")),
        Seq("w2"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__p",
        lit(0.5) * coalesce(col("__cb") / col("__c1"), lit(0.0)) +
          lit(0.5) * coalesce(col("__cu") / (col("__total") + 1),
            lit(1.0) / (col("__total") + 1)))
      .withColumn("__nll", -log(col("__p")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("__nll"), 4).as("avg_nll"))
  }

  /** Interpolated Kneser-Ney bigram log-loss (Kneser & Ney 1995) — the
    * smoothing KenLM-class LMs actually use, one rung above
    * [[bigramLogLoss]]'s fixed 50/50 interpolation: seen bigrams take
    * an absolute discount `D`, the freed mass escapes through
    * `λ(w1) = D·N1+(w1·)/c(w1)`, and the lower-order model is the
    * CONTINUATION distribution `P_cont(w2) = N1+(·w2)/|bigram types|`
    * ("how many contexts does w2 follow", not "how often does w2
    * occur" — the francisco problem). Unseen contexts back off to
    * `P_cont` directly; continuation-unseen words take a
    * `1/(types+1)` floor so the log never sees zero.
    *
    * Same plan shape as [[bigramLogLoss]]: the bigram-type relation is
    * aggregated ONCE and materialized (three consumers — context
    * totals+fan-out, continuation counts, the scoring join — must not
    * re-run the reference scan), everything else is hits-sized joins.
    * All model tables are aggregates of the type relation, so at
    * 100 TB the reference corpus is scanned exactly once. */
  def kneserNeyLogLoss(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0,1), got $discount")
    val refPairs = tokenPairs(reference.select(lit(0L).as("__rid"),
      col(textCol)), "__rid", textCol)
    val bi = refPairs.groupBy("w1", "w2").agg(count(lit(1)).as("__cb"))
      .localCheckpoint(true)
    val ctx = bi.groupBy("w1")
      .agg(sum("__cb").as("__c1"), count(lit(1)).as("__n1f"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("__n1b"))
    val types = bi.agg(count(lit(1)).as("__nt"))
    val docPairs = tokenPairs(df, idCol, textCol)
    val pcont = coalesce(col("__n1b") / col("__nt").cast("double"),
      lit(1.0) / (col("__nt") + 1))
    val seenCtx =
      greatest(coalesce(col("__cb"), lit(0L)).cast("double") - discount,
        lit(0.0)) / col("__c1") +
        (lit(discount) * col("__n1f") / col("__c1")) * pcont
    docPairs
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .withColumn("__p",
        when(col("__c1").isNotNull, seenCtx).otherwise(pcont))
      .withColumn("__nll", -log(col("__p")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("__nll"), 4).as("avg_nll"))
  }
}
