package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** End-to-end RECALL of the MinHash→LSH→Jaccard pipeline against exact
  * all-pairs ground truth — the DuckDB oracle proves each operator
  * computes what it claims; this proves the shipped parameters
  * (numHashes=8, bands=4 → r=2 rows/band, s-curve knee at
  * (1/b)^(1/r) ≈ 0.71) actually CATCH near-duplicates, and that the
  * candidate set stays a sliver of the quadratic pair space.
  * [[AnnRecallSpec]] is the ANN sibling of this check. */
class DedupRecallSpec extends SparkSuite {
  import spark.implicits._

  test("LSH banding recall vs exact all-pairs jaccard at shipped params") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector.tabulate(400)(i => f"tok$i%03d")
    def fresh(len: Int) = Vector.fill(len)(vocab(rnd.nextInt(vocab.length)))
    def mutate(t0: Vector[String], edits: Int): Vector[String] = {
      var t = t0
      (0 until edits).foreach { _ =>
        val i = rnd.nextInt(t.length)
        t = rnd.nextInt(3) match {
          case 0 => t.updated(i, vocab(rnd.nextInt(vocab.length)))
          case 1 if t.length > 5 => t.patch(i, Nil, 1) // delete
          case _ => t.patch(i, Seq(vocab(rnd.nextInt(vocab.length))), 0)
        }
      }
      t
    }
    // 150 independent docs + 50 near-duplicate copies (1-2 edits on
    // 40-80 tokens → shingle jaccard comfortably above the banding knee)
    val bases = (0 until 150).map(i => (i.toLong, fresh(40 + rnd.nextInt(40))))
    val nearDups = bases.take(50).map { case (i, t) =>
      (1000L + i, mutate(t, 1 + rnd.nextInt(2)))
    }
    val docs = (bases ++ nearDups)
      .map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text")
      .localCheckpoint(true)

    // exact ground truth: jaccard over EVERY pair (19,900 here — the
    // join LSH exists to avoid at corpus scale), thresholded in the
    // near-dup regime the banding is tuned for
    val ids = docs.select(col("doc_id"))
    val allPairs = ids.select(col("doc_id").as("id_a"))
      .crossJoin(ids.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val truth = Dedup.jaccardFromText(allPairs, docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 30, s"fixture degenerate: ${truth.size} true pairs")

    // the pipeline at its shipped defaults
    val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text")
    val cand = Dedup.lshCandidatePairs(sig, "doc_id")
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.jaccardFromText(cand, docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.9,
      s"LSH recall $recall over ${truth.size} true pairs")
    // selectivity: the candidate join touched a sliver of the 19,900
    assert(candSet.size < 19900 / 5,
      s"LSH emitted ${candSet.size} of 19,900 pairs — not selective")
  }

  test("simhash block banding finds EXACTLY the pairs within hamming k") {
    val rnd = new scala.util.Random(7)
    val raw = (0L until 120L).map(i => (i, rnd.nextInt(1 << 16).toLong))
    val fps = raw.toDF("doc_id", "fingerprint")
    val got = Dedup.simhashNearDupPairs(fps, "doc_id", bits = 16, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force: the pigeonhole argument promises COMPLETENESS, so
    // the banded result must equal the all-pairs popcount scan
    val brute = (for {
      (a, fa) <- raw; (b, fb) <- raw if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 2
    } yield (a, b, h)).toSet
    assert(got === brute,
      s"banding missed ${(brute -- got).size}, invented ${(got -- brute).size}")
    assert(brute.nonEmpty) // 7,140 random 16-bit pairs → expect a few
  }
}
