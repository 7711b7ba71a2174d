package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  /** Reference Levenshtein for brute-force comparison. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val sub = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + sub)
    }
    d(a.length)(b.length)
  }

  private def brutePairs(names: Seq[String], k: Int): Set[(String, String, Long)] =
    (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= k
    } yield (a, b, d.toLong)).toSet

  // short strings where q-gram prefix filtering would have false
  // negatives ("cat"/"car" share zero trigrams), plus longer keys
  private val vocab = Seq(
    "cat", "car", "ca", "cart", "art", "dog",
    "Customer#000000123", "Customer#000000124", "Customer#000000133",
    "Customer#00000123", "Xustomer#000000123",
    "widget red", "widget rad", "widgetred", "gadget red",
    "a", "b", "")

  test("deletionVariants enumerates the exact depth-k neighborhood") {
    val df = Seq("abc").toDF("name")
    val d1 = EntityResolution.deletionVariants(df, "name", 1)
      .select("__v").as[String].collect().toSet
    assert(d1 === Set("abc", "ab", "ac", "bc"))
    val d2 = EntityResolution.deletionVariants(df, "name", 2)
      .select("__v").as[String].collect().toSet
    assert(d2 === Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    // empty string contributes only its depth-0 row
    val e = EntityResolution.deletionVariants(Seq("").toDF("name"), "name", 2)
      .select("__v").as[String].collect().toSeq
    assert(e === Seq(""))
  }

  test("editDistancePairs == brute force at k=1 and k=2 (short strings incl.)") {
    // duplicate rows on purpose: the operator works on the distinct vocabulary
    val df = (vocab ++ vocab.take(5)).toDF("name")
    for (k <- Seq(1, 2)) {
      val got = EntityResolution.editDistancePairs(df, "name", k)
        .as[(String, String, Long)].collect().toSet
      assert(got === brutePairs(vocab, k), s"k=$k")
    }
  }

  test("editDistancePairs is partition-count invariant") {
    val df = vocab.toDF("name")
    val p1 = EntityResolution.editDistancePairs(df.repartition(1), "name", 1)
      .as[(String, String, Long)].collect().toSet
    val p8 = EntityResolution.editDistancePairs(df.repartition(8), "name", 1)
      .as[(String, String, Long)].collect().toSet
    assert(p1 === p8)
  }

  test("nearestMaster: brute-force equality, self-match at 0, null when none") {
    val records = vocab.filter(_.nonEmpty).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    val masters = Seq("cat", "cart", "Customer#000000123", "widget red")
      .toDF("mname")
    val got = EntityResolution.nearestMaster(records, "name",
        masters, "mname", k = 1)
      .select("id", "name", "master_name", "dist")
      .as[(Long, String, Option[String], Option[Long])]
      .collect().sortBy(_._1)
    val masterSet = Seq("cat", "cart", "Customer#000000123", "widget red")
    got.foreach { case (_, n, m, d) =>
      val best = masterSet.map(mm => (lev(n, mm), mm)).filter(_._1 <= 1)
        .sorted.headOption
      assert(m === best.map(_._2), s"name=$n")
      assert(d === best.map(_._1.toLong), s"name=$n")
      if (masterSet.contains(n)) assert(d === Some(0L))
    }
    // at least one record must be unmatched (e.g. "dog")
    assert(got.exists(_._3.isEmpty))
  }

  test("nearestMaster tie-break is deterministic: dist asc then master asc") {
    val records = Seq("ab").toDF("name").withColumn("id", lit(1L))
    // both masters at distance 1 -> lexicographically smaller wins
    val masters = Seq("abd", "abc").toDF("mname")
    val r = EntityResolution.nearestMaster(records, "name", masters,
        "mname", k = 1)
      .select("master_name", "dist").as[(String, Long)].collect()
    assert(r.toSeq === Seq(("abc", 1L)))
  }
}
