package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** In-engine logistic regression: direct-loop parity on random
  * problems, separable-fixture learning, and prediction contracts. */
class LogRegSpec extends SparkSuite {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's row-level contribution scaling: an exact 6-decimal
    * long, so reference sums below are integer sums like the engine's. */
  private def s6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  /** Plain-Scala full-batch GD with the operator's exact
    * integer-scaled sums and rounding. */
  private def reference(feats: Seq[(Long, Long, Double)],
      labels: Map[Long, Double], dim: Int, eta: Double,
      rounds: Int): Map[Long, Double] = {
    val train = feats.filter(f => labels.contains(f._1))
    var w = ((-1L until dim.toLong).map(_ -> 0.0)).toMap
    val n = labels.size.toDouble
    for (_ <- 1 to rounds) {
      val p = labels.map { case (id, y) =>
        val m6 = train.filter(_._1 == id)
          .map { case (_, s, x) => s6(x * w(s)) }.sum
        id -> (r6(1.0 / (1.0 + math.exp(-(m6 / 1e6 + w(-1L))))), y)
      }
      val grads = train.groupBy(_._2).map { case (s, rows) =>
        s -> r6(rows.map { case (id, _, x) =>
          s6(x * (p(id)._1 - p(id)._2)) }.sum / 1e6 / n)
      }
      val bg = r6(p.values.map { case (pp, y) => s6(pp - y) }.sum / 1e6 / n)
      w = w.map { case (s, ws) =>
        val g = if (s == -1L) bg else grads.getOrElse(s, 0.0)
        s -> r6(ws - eta * g)
      }
    }
    w
  }

  test("fit matches the direct GD loop on 10 random problems") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 10) {
      val dim = 2 + rnd.nextInt(6)
      val nDocs = 5 + rnd.nextInt(20)
      val feats = for {
        id <- 0L until nDocs.toLong
        s <- 0L until dim.toLong if rnd.nextBoolean()
      } yield (id, s, r6(rnd.nextDouble() * 3))
      val labels = (0L until nDocs.toLong)
        .map(id => id -> (if (rnd.nextBoolean()) 1.0 else 0.0)).toMap
      val rounds = 1 + rnd.nextInt(4)
      val got = LogReg.fit(
          feats.toDF("doc_id", "slot", "weight"),
          labels.toSeq.toDF("doc_id", "y"),
          dim, eta = 0.5, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = reference(feats, labels, dim, 0.5, rounds)
      assert(got === want, s"trial $trial dim=$dim rounds=$rounds")
    }
  }

  test("learns a separable problem and scores held-out docs correctly") {
    // feature 0 fires iff positive class
    val feats = (0L until 40L).flatMap { id =>
      val pos = id % 2 == 0
      Seq((id, if (pos) 0L else 1L, 1.0))
    }
    val labels = (0L until 30L).map(id => (id, if (id % 2 == 0) 1.0 else 0.0))
    val w = LogReg.fit(feats.toDF("doc_id", "slot", "weight"),
      labels.toDF("doc_id", "y"), dim = 2, eta = 1.0, rounds = 20)
    val holdout = (30L until 40L).map(Tuple1(_)).toDF("doc_id")
    val pred = LogReg.predict(feats.toDF("doc_id", "slot", "weight"),
        holdout, "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    for (id <- 30L until 40L)
      assert(pred(id) === (id % 2 == 0), s"doc $id")
  }

  test("training is partition-invariant: identical weights under " +
      "1, 3, and 32 partitions") {
    val rnd = new scala.util.Random(4242)
    // weights dense enough that per-slot sums span many rows, with
    // irrational-ish magnitudes that exercise last-ulp addition order
    val feats = for {
      id <- 0L until 60L
      s <- 0L until 8L if rnd.nextInt(3) > 0
    } yield (id, s, r6(rnd.nextDouble() * math.Pi))
    val labels = (0L until 60L)
      .map(id => (id, if (rnd.nextBoolean()) 1.0 else 0.0))
    val got = Seq(1, 3, 32).map { parts =>
      LogReg.fit(
          feats.toDF("doc_id", "slot", "weight").repartition(parts),
          labels.toDF("doc_id", "y").repartition(parts),
          dim = 8, eta = 0.5, rounds = 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(got(0) === got(1))
    assert(got(1) === got(2))
    assert(got(0) === reference(feats, labels.toMap, 8, 0.5, 5))
  }

  test("docs with no active features get the bias-only score") {
    val feats = Seq((1L, 0L, 2.0)).toDF("doc_id", "slot", "weight")
    val labels = Seq((1L, 1.0)).toDF("doc_id", "y")
    val w = LogReg.fit(feats, labels, dim = 1, eta = 0.5, rounds = 2)
    val bias = w.filter(col("slot") === -1).collect().head.getDouble(1)
    val out = LogReg.predict(feats, Seq(Tuple1(9L)).toDF("doc_id"),
      "doc_id", w).collect().head
    assert(out.getDouble(1) === r6(1.0 / (1.0 + math.exp(-bias))))
  }

  /** A small text corpus whose tfidf features train a real model: the
    * frozen-deployment pins below run the whole text → hash → tf·idf →
    * margin chain, not a synthetic feature table. */
  private def textCorpus = Seq(
    (0L, "buy cheap pills now buy", 1.0),
    (1L, "meeting notes for the board", 0.0),
    (2L, "cheap cheap offer now", 1.0),
    (3L, "quarterly board meeting agenda", 0.0),
    (4L, "offer pills offer now now", 1.0),
    (5L, "agenda and notes for review", 0.0),
    (6L, "now buy the cheap offer", 1.0),
    (7L, "review of the quarterly notes", 0.0),
    (8L, "pills offer buy", 1.0),
    (9L, "board review meeting", 0.0)
  ).toDF("doc_id", "text", "y")

  test("scoreFrozen is bit-equal to predict() over the join path") {
    val docs = textCorpus
    val (feats0, idf) =
      Vectorize.tfidfSparseWithIdf(docs, "doc_id", "text", dim = 16)
    val feats = feats0.localCheckpoint(true)
    val w = LogReg.fit(feats, docs.select("doc_id", "y"),
      dim = 16, eta = 0.5, rounds = 3)
    val viaJoin = LogReg.predict(feats, docs, "doc_id", w)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    val frozen = LogReg.freeze(w, idf)
    val viaKernel = LogReg.scoreFrozen(frozen, docs, "text")
      .select("doc_id", "score", "predicted")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(viaKernel === viaJoin)
    // the learned gate actually separates the fixture
    val byId = viaKernel.map(t => t._1 -> t._3).toMap
    assert((0L until 10L).forall(id => byId(id) === (id % 2 == 0)))
  }

  test("scoreFrozen: OOV tokens (slots with no corpus df) and null " +
      "text fall back exactly like the join path") {
    val docs = textCorpus
    val (feats0, idf) =
      Vectorize.tfidfSparseWithIdf(docs, "doc_id", "text", dim = 256)
    val feats = feats0.localCheckpoint(true)
    val w = LogReg.fit(feats, docs.select("doc_id", "y"),
      dim = 256, eta = 0.5, rounds = 2)
    val frozen = LogReg.freeze(w, idf)
    val newDocs = Seq((100L, "zzz qqq unseen tokens entirely"),
      (101L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = LogReg.scoreFrozen(frozen, newDocs, "text")
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the join-path answer for the same docs: featurize under the
    // TRAINING idf (the frozen-deployment contract — slots with no
    // corpus df drop out of the inner join)
    val newFeats = newDocs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), Vectorize.termSlot(col("tok"), 256).as("slot"))
      .groupBy("doc_id", "slot").agg(count(lit(1)).as("tf"))
      .join(idf, "slot")
      .select(col("doc_id"), col("slot"),
        round(col("tf") * col("idf"), 6).as("weight"))
    val viaJoin = LogReg.predict(newFeats, newDocs, "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === viaJoin)
    // null text has no token rows anywhere: the shared answer IS the
    // bias-only fallback
    assert(got(101L) === r6(1.0 / (1.0 + math.exp(-frozen.bias))))
  }

  test("scoreFrozen's physical plan is one stateless projection: no " +
      "join, no exchange, the native margin kernel inline") {
    val docs = textCorpus
    val (feats0, idf) =
      Vectorize.tfidfSparseWithIdf(docs, "doc_id", "text", dim = 16)
    val w = LogReg.fit(feats0.localCheckpoint(true),
      docs.select("doc_id", "y"), dim = 16, eta = 0.5, rounds = 1)
    val frozen = LogReg.freeze(w, idf)
    // over a LOCAL fixture the optimizer constant-folds the whole
    // scoring into a LocalTableScan — already join-free, but to pin the
    // DISTRIBUTED shape (projection over the scan, kernel inline, no
    // exchange) the scored side must be a real file relation
    val fileDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = LogReg.scoreFrozen(frozen, fileDocs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("graft_hashed_tfidf_margin"), plan)
    // and the local-fixture fold stays join-free too
    val localPlan = LogReg.scoreFrozen(frozen, docs, "text")
      .queryExecution.executedPlan.toString
    assert(!localPlan.toLowerCase.contains("join"), localPlan)
  }

  test("fitText's trained trajectory is bit-equal to fit over " +
      "tfidfSparse — for every round count") {
    val docs = textCorpus
    val labels = docs.select("doc_id", "y")
    for (rounds <- Seq(1, 3, 5); dim <- Seq(8, 64)) {
      val feats = Vectorize.tfidfSparse(docs, "doc_id", "text", dim)
        .localCheckpoint(true)
      val viaJoin = LogReg.fit(feats, labels, dim, eta = 0.5, rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaText = LogReg.fitText(docs, "doc_id", "text", labels,
          dim, eta = 0.5, rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaText === viaJoin, s"rounds=$rounds dim=$dim")
    }
  }

  test("fitText: labeled docs with null/empty text take the margin-0 " +
      "fallback, and the per-round plans are join-free") {
    val base = textCorpus
    val docs = base.unionByName(Seq(
      (20L, null.asInstanceOf[String], 1.0),
      (21L, "", 0.0)).toDF("doc_id", "text", "y"))
    val labels = docs.select("doc_id", "y")
    // the SAME relation on both sides (null-text docs still count into
    // the idf's N — explodedSlots just emits no rows for them)
    val feats = Vectorize.tfidfSparse(docs, "doc_id", "text", 16)
      .localCheckpoint(true)
    val viaJoin = LogReg.fit(feats, labels, 16, eta = 0.5, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaText = LogReg.fitText(docs, "doc_id", "text", labels,
        16, eta = 0.5, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaText === viaJoin)
  }

  test("fitText: labels referencing ABSENT doc_ids train bit-equal to " +
      "fit (bias-only rows that still count into n)") {
    val docs = textCorpus
    // two labels whose doc_ids have no corpus row, plus one with a
    // NULL doc_id: fit gives all three p = sigmoid(bias) via its left
    // join (null joins nothing) and counts them in n — the stage's
    // labels-side left join must reproduce that exactly, and the
    // duplicate guard must NOT misread null ids as duplicates
    val labels = docs.select("doc_id", "y").unionByName(
      Seq((Some(100L), 1.0), (Some(101L), 0.0),
        (Option.empty[Long], 1.0)).toDF("doc_id", "y"))
    for (rounds <- Seq(1, 3)) {
      val feats = Vectorize.tfidfSparse(docs, "doc_id", "text", 16)
        .localCheckpoint(true)
      val viaJoin = LogReg.fit(feats, labels, 16, eta = 0.5, rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaText = LogReg.fitText(docs, "doc_id", "text", labels,
          16, eta = 0.5, rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaText === viaJoin, s"rounds=$rounds")
    }
  }

  test("fitText refuses duplicate ids (labels or corpus) with a " +
      "caller-facing message") {
    val docs = textCorpus
    val labels = docs.select("doc_id", "y")
    val dupLabels = labels.unionByName(Seq((0L, 1.0)).toDF("doc_id", "y"))
    val e1 = intercept[IllegalArgumentException] {
      LogReg.fitText(docs, "doc_id", "text", dupLabels, 16,
        eta = 0.5, rounds = 1)
    }
    assert(e1.getMessage.contains("duplicate doc_id in labels"))
    val dupDocs = docs.unionByName(
      Seq((0L, "buy again", 1.0)).toDF("doc_id", "text", "y"))
    val e2 = intercept[IllegalArgumentException] {
      LogReg.fitText(dupDocs, "doc_id", "text", labels, 16,
        eta = 0.5, rounds = 1)
    }
    assert(e2.getMessage.contains("matches multiple corpus rows"))
  }

  test("fitTextFrozen reuses the training idf: same frozen model as " +
      "freeze(fitText, tfidfSparseWithIdf) without the second corpus " +
      "pass") {
    val docs = textCorpus
    val labels = docs.select("doc_id", "y")
    val direct = LogReg.fitTextFrozen(docs, "doc_id", "text", labels,
      dim = 16, eta = 0.5, rounds = 3)
    val w = LogReg.fitText(docs, "doc_id", "text", labels,
      dim = 16, eta = 0.5, rounds = 3)
    val (_, idf) =
      Vectorize.tfidfSparseWithIdf(docs, "doc_id", "text", dim = 16)
    val twoPass = LogReg.freeze(w, idf)
    assert(direct.bias === twoPass.bias)
    assert(direct.w.toSeq === twoPass.w.toSeq)
    // NaN-bearing idf arrays: compare slot-wise with NaN == NaN
    assert(direct.idf.length === twoPass.idf.length)
    direct.idf.zip(twoPass.idf).zipWithIndex.foreach { case ((a, b), s) =>
      assert(a === b || (a.isNaN && b.isNaN), s"idf slot $s: $a vs $b")
    }
    // and the deployment face scores identically through either model
    val viaDirect = LogReg.scoreFrozen(direct, docs, "text")
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaTwoPass = LogReg.scoreFrozen(twoPass, docs, "text")
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaDirect === viaTwoPass)
  }

  test("freeze rejects weight tables with missing slots or no bias") {
    val idf = Seq((0L, 1.0)).toDF("slot", "idf")
    intercept[IllegalArgumentException] {
      LogReg.freeze(Seq((0L, 0.5)).toDF("slot", "w"), idf) // no bias
    }
    intercept[IllegalArgumentException] {
      LogReg.freeze(Seq((-1L, 0.1), (1L, 0.5)).toDF("slot", "w"),
        idf) // slot 0 missing
    }
  }
}
