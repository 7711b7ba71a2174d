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

  private def countToken(toks: Column, word: String): Column =
    size(filter(toks, t => t === word))

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
        d.withColumn(s"score_$lang",
          words.map(w => countToken(toks, w)).reduce(_ + _))
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
    val stopCnt = allStops.map(w => countToken(toks, w)).reduce(_ + _)
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
}
