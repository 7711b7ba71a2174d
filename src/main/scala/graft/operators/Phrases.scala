package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation / phrase mining and merging — word2phrase (Mikolov et
  * al. 2013, the phrase pass of word2vec): find token bigrams that
  * co-occur far more than chance and fuse them into single tokens
  * ("new york" → "new_york"), so downstream tokenizers/embedders see
  * phrases as units. Beyond-reference scope (SURVEY.md §7.4).
  *
  * Score, exactly word2phrase's: `(count(ab) − δ) · N / (count(a) ·
  * count(b))` with N the corpus token count and δ the discount that
  * kills rare accidental pairs; keep pairs with `count ≥ minCount` and
  * `score > threshold`. Rounded to 6 decimals before any
  * rank/filter (the repo rule).
  *
  * Scale shape: ONE corpus scan — bigram pairs extracted map-side
  * (array zip-shift, no window), unigram counts off the same token
  * relation; the score join is (bigram-vocab × 2 unigram-vocab)
  * key-joins at vocabulary scale, orders below corpus scale. Merging
  * ([[mergePhrases]]) deploys a FROZEN phrase list as one chained
  * map-only projection over the padded token join — boundary-safe
  * literal replaces, the Bpe.segment idiom; the phrase list is
  * display-sized metadata (top-k collocations), never corpus-derived
  * state at row time.
  */
object Phrases {

  /** (w1, w2, pair_count, score) for every adjacent bigram with
    * `pair_count ≥ minCount` and `score > threshold`. */
  def phraseScores(docs: DataFrame, idCol: String, textCol: String,
      delta: Double = 3.0, minCount: Long = 3L,
      threshold: Double = 1.0): DataFrame = {
    require(minCount >= 1, s"minCount must be ≥1, got $minCount")
    val uni = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocabulary-sized; counts AND total read it
    val total = uni.agg(sum("c").as("n"))
    val pairs = TextAnalysis.tokenPairs(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
    pairs
      .join(uni.select(col("tok").as("w1"), col("c").as("__ca")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("__cb")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("pair_count"),
        round((col("pair_count") - delta) * col("n") /
          (col("__ca").cast("double") * col("__cb")), 6).as("score"))
      .filter(col("pair_count") >= minCount && col("score") > threshold)
  }

  /** The top-`k` phrase list, collected for deployment (display-sized
    * metadata, the k-means-centroid pattern): ordered by
    * (score DESC, w1, w2). */
  def topPhrases(docs: DataFrame, idCol: String, textCol: String,
      k: Int, delta: Double = 3.0, minCount: Long = 3L,
      threshold: Double = 1.0): Seq[(String, String)] = {
    require(k >= 1, s"k must be positive, got $k")
    phraseScores(docs, idCol, textCol, delta, minCount, threshold)
      .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      .limit(k).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** Apply a frozen phrase list: every " w1 w2 " in the whitespace-
    * normalized lowercased token join becomes " w1_w2 ", phrases
    * applied in list order as ONE chained map-only projection.
    * Left-to-right non-overlapping replace semantics — identical in
    * every engine (the BPE variant note applies to runs of an
    * identical token). Adds `outCol` (the phrased text). */
  def mergePhrases(docs: DataFrame, textCol: String,
      phrases: Seq[(String, String)], outCol: String): DataFrame = {
    val padded = concat(lit(" "),
      concat_ws(" ", TextAnalysis.tokens(col(textCol))), lit(" "))
    val merged = phrases.foldLeft(padded: Column) { case (acc, (a, b)) =>
      replace(acc, lit(s" $a $b "), lit(s" ${a}_$b "))
    }
    docs.withColumn(outCol, trim(merged))
  }
}
