package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.FrequentItemsSketch.frequent_items

/** Misra-Gries heavy-hitter aggregate: exact-regime equality, the
  * approximation contract under eviction, and partitioning invariance
  * of the guarantees. */
class FrequentItemsSpec extends SparkSuite {
  import spark.implicits._

  // zipf-ish: item i appears (40 - i) times, i = 0..39 → N = 820,
  // distinct = 40, counts 40,39,…,1
  private def skewed = (0 until 40).flatMap(i =>
    Seq.fill(40 - i)(s"item_${"%02d".format(i)}"))

  test("exact regime: capacity >= distinct reproduces groupBy counts") {
    val df = skewed.map(("g", _)).toDF("g", "item")
    val got = df.groupBy("g").agg(frequent_items(col("item"), 64).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.max_err"))
      .as[(String, Long, Long)].collect().toSeq
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(_._1).toSet === exact.keySet)
    got.foreach { case (item, est, err) =>
      assert(est === exact(item), s"exact-regime count for $item")
      assert(err === 0L, "exact regime certifies max_err 0")
    }
    // output order is (est DESC, item ASC)
    assert(got === got.sortBy(t => (-t._2, t._1)))
  }

  test("exact regime is partitioning-invariant") {
    val rows = skewed.map(("g", _))
    val expected = spark.createDataset(rows).repartition(1)
      .toDF("g", "item").groupBy("g")
      .agg(frequent_items(col("item"), 64).as("fi"))
      .select(col("fi").cast("string")).as[String].head()
    for (p <- Seq(3, 7, 32)) {
      val got = spark.createDataset(rows).repartition(p)
        .toDF("g", "item").groupBy("g")
        .agg(frequent_items(col("item"), 64).as("fi"))
        .select(col("fi").cast("string")).as[String].head()
      assert(got === expected, s"partitions=$p")
    }
  }

  test("eviction regime: bounds and guaranteed hitters hold under any partitioning") {
    val n = skewed.size.toLong // 820
    val capacity = 8
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (p <- Seq(1, 4, 16)) {
      val got = spark.createDataset(skewed.map(("g", _))).repartition(p)
        .toDF("g", "item").groupBy("g")
        .agg(frequent_items(col("item"), capacity).as("fi"))
        .select(explode(col("fi")).as("e"))
        .select(col("e.item"), col("e.est"), col("e.max_err"))
        .as[(String, Long, Long)].collect().toSeq
      assert(got.size <= capacity, s"summary exceeds capacity (p=$p)")
      val errs = got.map(_._3).distinct
      assert(errs.size === 1, "offset is summary-global")
      val err = errs.head
      assert(err <= n / (capacity + 1),
        s"offset $err exceeds N/(m+1) = ${n / (capacity + 1)} (p=$p)")
      got.foreach { case (item, est, _) =>
        assert(est <= exact(item), s"est must lower-bound true ($item, p=$p)")
        assert(exact(item) <= est + err,
          s"true must not exceed est+err ($item, p=$p)")
      }
      // any item with true count > N/(m+1) is guaranteed tracked
      val guaranteed = exact.filter(_._2 > n / (capacity + 1)).keySet
      assert(guaranteed.subsetOf(got.map(_._1).toSet),
        s"guaranteed hitters missing (p=$p)")
    }
  }

  test("topTokensSketch matches topTokens in the exact regime") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat"),
      (3L, "en", "  leading whitespace token "),
      (4L, "fr", "le chat le chien le"),
      (5L, "fr", "chat chien")).toDF("doc_id", "lang", "text")
    val exact = graft.operators.Profile
      .topTokens(docs, "lang", "text", k = 3)
      .orderBy("lang", "rk")
      .as[(String, String, Long, Long)].collect().toSeq
    val sketch = graft.operators.Profile
      .topTokensSketch(docs, "lang", "text", k = 3, capacity = 64)
      .orderBy("lang", "rk")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(sketch.map(t => (t._1, t._2, t._3, t._5)) === exact)
    assert(sketch.forall(_._4 == 0L), "exact regime certifies max_err 0")
  }

  test("a token past writeUTF's 64 KiB limit survives the shuffle") {
    // writeUTF throws UTFDataFormatException at 65536+ encoded bytes;
    // the summary serializes length-prefixed raw UTF-8 instead, so one
    // pathological token degrades nothing
    val big = "x" * 70000
    val rows = Seq.fill(5)(("g", big)) ++ Seq.fill(3)(("g", "small"))
    val got = spark.createDataset(rows).repartition(4).toDF("g", "item")
      .groupBy("g").agg(frequent_items(col("item"), 8).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap
    assert(got(big) === 5L)
    assert(got("small") === 3L)
  }

  test("count ties break in UTF-8 byte order, matching Spark's string sort") {
    // U+1F600 (😀) encodes F0 9F 98 80; U+FFFD encodes EF BF BD. UTF-16
    // code units order 😀 (surrogate D83D) BEFORE FFFD, UTF-8 bytes the
    // reverse — the sketch must match topTokens' UTF8String ordering
    val smiley = "😀"
    val repl = "�"
    val rows = Seq(("g", smiley), ("g", repl))
    val got = spark.createDataset(rows).toDF("g", "item")
      .groupBy("g").agg(frequent_items(col("item"), 8).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item")).as[String].collect().toSeq
    val sparkOrder = spark.createDataset(rows).toDF("g", "item")
      .orderBy("item").select("item").as[String].collect().toSeq
    assert(got === sparkOrder, "tie order must be UTF-8 binary")
    assert(got === Seq(repl, smiley))
  }
}
