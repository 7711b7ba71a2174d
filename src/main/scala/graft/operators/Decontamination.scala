package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ShingleSet, SortedIntersectCount}

/** Benchmark decontamination for training corpora (beyond-reference
  * scope, SURVEY.md §7.4): flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard guard against
  * test-set leakage into training data (GPT-3 appendix C style: drop a
  * training document when any 13-gram collides with an eval document;
  * the n is a parameter here — the synthetic docs are short, so tests
  * and oracles exercise n=3 while the mechanism is n-agnostic).
  *
  * Scale shape: the eval set is tiny (thousands of docs) next to a
  * 100 TB corpus, so the eval n-gram vocabulary is collapsed to ONE row
  * (a sorted distinct array) and broadcast; each corpus document then
  * computes its overlap in a single native merge pass
  * ([[graft.functions.ShingleSet]] → [[graft.functions.SortedIntersectCount]])
  * with NO shuffle of corpus rows and no exploded (doc, ngram) relation
  * — the whole scan is map-only work after a one-row broadcast. The
  * eval-side aggregation is an all-to-one collect_list, bounded by the
  * eval vocabulary (not the corpus).
  */
object Decontamination {

  /** The distinct n-gram vocabulary of the eval set as ONE row holding a
    * sorted array — the broadcast side of [[contamination]]. Sorted under
    * the same UTF8String binary order [[ShingleSet]] emits, so the
    * per-doc intersect stays a single merge pass. */
  def evalNgramSet(evalDocs: DataFrame, textCol: String, n: Int = 3,
      maxChars: Int = 4096): DataFrame =
    evalDocs
      .select(ShingleSet.shingle_set(
        lower(substring(col(textCol), 1, maxChars)), n).as("__ss"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__ss")))))
        .as("eval_ngrams"))

  /** Per-document contamination report: distinct n-gram count, how many
    * of them appear in the eval vocabulary, and the overlap ratio.
    * `evalSet` is the one-row frame from [[evalNgramSet]]; it is
    * broadcast so the cross join is a map-side 1-row nested loop, never
    * a shuffle. Filter `n_shared > 0` (any-collision, the GPT-3 rule) or
    * on `overlap` for a softer threshold. */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, n: Int = 3, maxChars: Int = 4096): DataFrame = {
    val ss = ShingleSet.shingle_set(
      lower(substring(col(textCol), 1, maxChars)), n)
    corpus
      .select(col(idCol), ss.as("__ss"))
      .crossJoin(broadcast(evalSet))
      .select(
        col(idCol),
        size(col("__ss")).cast("long").as("n_ngrams"),
        SortedIntersectCount.sorted_intersect_count(
          col("__ss"), col("eval_ngrams")).as("n_shared"))
      .withColumn("overlap",
        round(col("n_shared") / col("n_ngrams"), 6))
  }

  /** The decontaminated corpus: drop every document sharing at least
    * `minShared` n-grams with the eval set. Same map-only scan shape as
    * [[contamination]]; the filter pushes into the scan projection. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, n: Int = 3, minShared: Long = 1,
      maxChars: Int = 4096): DataFrame = {
    val flagged = contamination(corpus, idCol, textCol, evalSet, n, maxChars)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
