package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, the SentencePiece
  * unigram model) — the EM-over-a-piece-inventory sibling of [[Bpe]]:
  * where BPE GROWS a vocabulary bottom-up by merging, the unigram model
  * SHRINKS one top-down: seed an over-complete piece inventory from
  * corpus substring counts, then alternate (E) segment the corpus under
  * the current piece log-probs and (M) re-estimate log-probs from the
  * segmentation counts, pruning to the best pieces each round.
  *
  * Like BPE, everything past the first scan runs on the WORD-FREQUENCY
  * table: the corpus is scanned once (word counts, one shuffle) and
  * every EM round is vocabulary-scale — candidate generation explodes
  * the DISTINCT words' character positions (≤ 4 candidates per
  * position), the piece inventory joins in as a broadcast (bounded at
  * `keepMulti` + the corpus alphabet by construction), and counts come
  * from one freq-weighted aggregation. Nothing in a round touches
  * corpus scale, which is what holds at 100 TB where the distinct-word
  * table is orders of magnitude smaller than the corpus.
  *
  * Determinism contract (the whole chain is integer-exact so a DuckDB
  * oracle reproduces it bit-for-bit):
  *  - piece log-probs are INTEGER-SCALED: `floor(ln((cnt+1) /
  *    (total+|V|)) * 1e6 + 0.5)` (Laplace-smoothed so zero-count
  *    single chars — which are force-kept for coverage — stay finite);
  *  - the E-step segments each word GREEDILY left-to-right, at each
  *    position taking the matching piece with the best PER-CHARACTER
  *    log-prob — compared exactly as `logp * (12 / len)` (12 = lcm of
  *    the piece lengths 1..4, so the per-char comparison is integer
  *    cross-multiplication, no float division), ties to the LONGER
  *    piece. Greedy-by-density is the deterministic, engine-portable
  *    stand-in for full Viterbi: both favor fewer, denser pieces, and
  *    the training loop only needs segmentation counts, not optimal
  *    likelihoods. (Real tokenizer families differ on exactly this
  *    class of choice — the BpeSpec run-merge note's sibling.)
  *  - pruning keeps ALL single characters (coverage: segmentation can
  *    never get stuck) plus the top `keepMulti` multi-char pieces by
  *    (count DESC, piece ASC).
  *
  * Deployment twin: [[segment]] applies a FROZEN inventory to words as
  * a map-only projection plus one broadcast join — how the trained
  * tokenizer runs in production (the bp2 relationship).
  */
object Unigram {

  /** Max seed piece length: substrings up to 4 chars. 12 below = the
    * lcm of 1..4 — the integer per-char comparison scale. */
  val MaxPieceLen = 4

  private def lenMults =
    array((1 to MaxPieceLen).map(l =>
      struct(lit(l).as("l"), lit(12 / l).as("mult"))): _*)

  /** Substring counts over (word, freq): every (position, length ≤ 4)
    * span of every distinct word, weighted by word frequency —
    * the over-complete seed inventory's raw counts. */
  private[operators] def substrCounts(words: DataFrame): DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("freq"), col("pos"),
        explode(lenMults).as("lm"))
      .filter(col("pos") + col("lm.l") - 1 <= length(col("word")))
      .select(col("word").substr(col("pos"), col("lm.l")).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Prune an inventory's counts to singles ∪ top-`keepMulti` multis:
    * every single char (zero-count singles kept at 0 — coverage), the
    * multi-char pieces ranked (cnt DESC, piece ASC). `chars` is the
    * corpus alphabet, fixed at seed time. */
  private def prune(cnts: DataFrame, chars: DataFrame,
      keepMulti: Int): DataFrame = {
    val singles = chars.join(cnts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val multi = cnts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(keepMulti)
    singles.unionByName(multi)
  }

  /** Attach the integer-scaled smoothed log-prob: one total/size
    * aggregate broadcast across the inventory. Output
    * (piece, l, cnt, logp). */
  private def withLogp(kept: DataFrame): DataFrame = {
    val t = kept.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__nv"))
    kept.crossJoin(broadcast(t))
      .select(col("piece"), length(col("piece")).as("l"), col("cnt"),
        floor(log((col("cnt") + lit(1.0)) /
          (col("__total") + col("__nv"))) * 1e6 + lit(0.5))
          .cast("long").as("logp"))
  }

  /** Greedy best piece LENGTH at every character position of every
    * word: candidate spans (≤ 4 per position) equi-join the broadcast
    * inventory on the piece string, then one partial-aggregated argmax
    * per (word, pos) on (logp × 12/len, len). Returns
    * (word, __bl: map pos → best piece length) — the per-word walk
    * metadata [[walkPieces]] consumes. */
  private def bestLens(words: DataFrame, vocab: DataFrame): DataFrame =
    words
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("pos"), explode(lenMults).as("lm"))
      .filter(col("pos") + col("lm.l") - 1 <= length(col("word")))
      .select(col("word"), col("pos"), col("lm.mult").as("mult"),
        col("word").substr(col("pos"), col("lm.l")).as("piece"))
      .join(broadcast(vocab.select("piece", "l", "logp")), Seq("piece"))
      .groupBy("word", "pos")
      .agg(max(struct((col("logp") * col("mult")).as("key"),
        col("l").as("l"))).as("b"))
      .groupBy("word")
      .agg(map_from_entries(
        collect_list(struct(col("pos"), col("b.l")))).as("__bl"))

  /** The greedy left-to-right walk as one in-row fold: start at
    * position 1, at each position consume the precomputed best piece
    * and jump past it. In training the inventory holds every corpus
    * char, so a best length always exists; at DEPLOY time a word may
    * carry characters outside the trained alphabet — those positions
    * fall back to consuming ONE raw char as its own piece (the
    * deterministic stand-in for SentencePiece's byte fallback), so the
    * walk is total on any input. Returns the pieces in order. */
  private def walkPieces = aggregate(
    sequence(lit(1), length(col("word"))),
    struct(lit(1).as("pos"), array().cast("array<string>").as("ps")),
    (acc, i) => {
      val pos = acc.getField("pos")
      val bl = coalesce(element_at(col("__bl"), pos), lit(1))
      when(i =!= pos, acc).otherwise(struct(
        (pos + bl).as("pos"),
        concat(acc.getField("ps"),
          array(col("word").substr(pos, bl))).as("ps")))
    },
    acc => acc.getField("ps"))

  /** One E-step: segment every distinct word under `vocab`, count the
    * consumed pieces weighted by word frequency. */
  private def segmentCounts(words: DataFrame, vocab: DataFrame): DataFrame =
    words.join(bestLens(words, vocab), "word")
      .select(col("freq"), explode(walkPieces).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Train `rounds` EM rounds over a (word, freq) table (the
    * [[Bpe.wordFreqs]] shape). Returns the final inventory
    * (piece, l, cnt, logp): `cnt` = the last E-step's consumption
    * count, `logp` = the integer-scaled smoothed log-prob. */
  def train(wordFreqs: DataFrame, rounds: Int = 2,
      keepMulti: Int = 256): DataFrame = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    require(keepMulti > 0, s"keepMulti must be positive, got $keepMulti")
    // checkpointed: every round's candidate explode + count re-reads it
    val words = wordFreqs.filter(length(col("word")) >= 1)
      .localCheckpoint(true)
    val sub = substrCounts(words).localCheckpoint(true) // singles + multis read it
    val chars = sub.filter(length(col("piece")) === 1).select("piece")
      .localCheckpoint(true) // the fixed alphabet, read every round
    var vocab = withLogp(prune(sub, chars, keepMulti)).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cnts = segmentCounts(words, vocab).localCheckpoint(true)
      vocab = withLogp(prune(cnts, chars, keepMulti)).localCheckpoint(true)
    }
    vocab
  }

  /** Deploy a FROZEN inventory: segment `wordCol` of `words` into the
    * space-joined greedy pieces — one broadcast join plus a map-only
    * fold, no training actions (the bp2 relationship to bp1).
    * Characters outside the inventory's alphabet segment as single raw
    * chars (the [[walkPieces]] fallback), so any input is covered. */
  def segment(words: DataFrame, wordCol: String,
      vocab: DataFrame): DataFrame = {
    val w = words.select(col(wordCol).as("word"))
      .filter(length(col("word")) >= 1).distinct()
    w.join(bestLens(w, vocab), Seq("word"), "left")
      .select(col("word"), concat_ws(" ", walkPieces).as("segmented"))
  }
}
