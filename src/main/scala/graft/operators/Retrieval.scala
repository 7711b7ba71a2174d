package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Okapi BM25 top-k retrieval over the document corpus.
  *
  * The training-data-pipeline use case is query-based curation: score every
  * corpus document against a set of probe queries (eval-set titles, topic
  * seeds, contamination probes) and keep/drop/inspect the top hits. The
  * same plan is the batch face of a search index: `postings` below IS the
  * inverted index (term → (doc, tf)), it is just never materialized wider
  * than the query set needs.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - The query set is display-sized and is BROADCAST twice — once as
  *    (query_id, term) pairs to filter the exploded corpus map-side, and
  *    once as a distinct-term set to scope the document-frequency count.
  *    The corpus is never shuffled at corpus size: every shuffle in the
  *    plan (tf counting, df counting, per-query score sum) carries only
  *    rows whose term matched a query term.
  *  - Corpus statistics (N, avgdl) are a one-row aggregate cross-joined
  *    in, the same scalar-broadcast pattern the downsampler uses.
  *  - Ranking is a window partitioned BY QUERY — parallelism = |queries|,
  *    each partition holding only that query's candidate docs.
  *
  * Scoring is standard Okapi BM25 with the Lucene-style `+1` inside the
  * idf log (keeps idf positive for terms in more than half the corpus):
  * `idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`, and per-term
  * `idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`. Query terms are
  * deduplicated (query term frequency is ignored, the common engine
  * default). Tokenization is the corpus-wide convention: whitespace split
  * of the lowercased text (TextAnalysis.tokens).
  *
  * Determinism contract: per-term scores round to 6 decimals, the summed
  * score to 4, and the rank orders by (score DESC, doc_id ASC) — the same
  * rounded-before-ranked rule every cosine ranking in this repo uses.
  */
object Retrieval {

  /** BM25 top-`k` docs per query. `queries` must be display-sized
    * (broadcast). Returns (query_id, doc_id, score, rk) with rk 1..k. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")

    def toks(c: Column): Column = split(lower(c), "\\s+")

    // corpus tokens, one row per (doc, position): (doc_id, dl, term)
    val exploded = docs.select(col(idCol).as("doc_id"),
        toks(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).as("__dl"),
        explode(col("__t")).as("__term"))

    // (query_id, term) pairs, deduped per query — broadcast side
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(toks(col(queryTextCol)))).as("__term"))
    val qtermSet = qterms.select("__term").distinct()

    // one-row corpus stats (N docs, mean token count)
    val stats = docs.select(size(toks(col(textCol))).as("__dl"))
      .agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))

    // document frequency, computed only for query terms: map-side
    // broadcast filter, then a hits-sized distinct count
    val dfreq = exploded.join(broadcast(qtermSet), Seq("__term"))
      .groupBy("__term")
      .agg(countDistinct(col("doc_id")).as("__df"))
    val idf = dfreq.crossJoin(broadcast(stats))
      .select(col("__term"),
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
          .as("__idf"))

    // candidate postings: exploded corpus ⋈ broadcast query terms, tf per
    // (query, doc, term) — the only corpus-wide pass, shuffle is hits-only
    val hits = exploded.join(broadcast(qterms), Seq("__term"))
      .groupBy("query_id", "doc_id", "__dl", "__term")
      .agg(count(lit(1)).as("__tf"))

    val termScores = hits
      .join(broadcast(idf), Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        // grouping mirrors the oracle's `1 - b + b*dl/avgdl` bit-exactly:
        // IEEE * and + commute, so (dl*b)/avgdl + (1-b) == (b*dl)/avgdl
        // evaluated left-to-right
        round(col("__idf") * col("__tf") * (k1 + 1.0) /
          (col("__tf") +
            (col("__dl") * b / col("__avgdl") + (1.0 - b)) * k1),
          6).as("__ts"))

    val scored = termScores.groupBy("query_id", "doc_id")
      .agg(round(sum("__ts"), 4).as("score"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "score", "rk")
  }
}
