package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.{Clustering, Dedup, Similarity}

/** Physical-plan shape assertions for the similarity/dedup hot paths —
  * the properties that make them scale are checked, not assumed. */
class PlanShapeSpec extends SparkSuite {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("native minhash signature is map-only: zero exchanges") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h")).toDF("doc_id", "text")
    val p = plan(Dedup.minhashSignatureFromText(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }

  test("k-means assignment is one stateless projection: no join, no " +
      "exchange, the frozen-matrix kernel inline") {
    // a FILE relation, so the optimizer can't constant-fold the whole
    // assignment away (a local fixture folds to LocalTableScan — also
    // join-free, pinned in NearestCentroidSpec)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Seq((0L, Array.fill(8)(1.0)), (1L, Array.fill(8)(-1.0)))
      .toDF("cell_id", "centroid")
    val p = plan(Clustering.assignCells(emb, "vec_id", "embedding", cents))
    assert(!p.toLowerCase.contains("join"), s"unexpected join:\n$p")
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
    assert(p.contains("graft_nearest_centroid"), s"kernel not inline:\n$p")
  }

  test("brute-force kNN broadcasts the query side; corpus is not shuffled") {
    val emb = (0L until 50L).map(i =>
      (i, Array.tabulate(8)(j => (i * 3 + j).toFloat))).toDF("vec_id", "embedding")
    val df = Similarity.bruteForceKnn(emb.filter(col("vec_id") < 3), emb,
      "vec_id", "embedding", k = 3)
    val p = plan(df)
    assert(p.contains("Broadcast"), s"query side not broadcast:\n$p")
    // the only exchange allowed is the top-k window's partition by query
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"corpus shuffled more than the rank window:\n$p")
  }

  test("dot product runs inside whole-stage codegen") {
    // a literal-only local relation folds to LocalTableScan, and HOFs
    // like transform would break the codegen span themselves — build the
    // arrays with CreateArray (codegen'd) over a real source
    val df = spark.range(100).select(
      array((0 until 8).map(j => (col("id") + j).cast("double")): _*).as("a"),
      array((0 until 8).map(j => (col("id") * 2 + j).cast("double")): _*).as("b"))
    val scored = df.select(
      graft.functions.ArrayDot.array_dot(col("a"), col("b")).as("d"))
    val p = plan(scored)
    // a codegen'd project prints as "*(n) Project"
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection not inside whole-stage codegen:\n$p")
    assert(p.contains("graft_array_dot"), s"expression missing:\n$p")
  }

  test("PQ ADC scan broadcasts the query tables; codes are not shuffled") {
    import graft.operators.ProductQuantization
    val emb = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(j => (i * 3 + j).toFloat))).toDF("vec_id", "embedding")
    val cb = ProductQuantization.pqTrain(emb, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 1)
    val enc = ProductQuantization.pqEncode(emb, "vec_id", "embedding", cb)
      .localCheckpoint(true)
    val df = ProductQuantization.pqKnn(emb.filter(col("vec_id") < 3),
      enc, cb, "vec_id", "embedding", k = 3)
    val p = plan(df)
    assert(p.contains("Broadcast"), s"query tables not broadcast:\n$p")
    // the encoded corpus flows straight into scoring: on the STREAMED
    // path the only exchange is the top-k rank window's partition by
    // query (the query-side table build shuffles its handful of rows
    // inside the broadcast subtree, which is fine)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    def streamedShuffles(pl: SparkPlan): Int = pl match {
      case a: AdaptiveSparkPlanExec => streamedShuffles(a.executedPlan)
      case _: BroadcastExchangeExec => 0
      case s: ShuffleExchangeExec =>
        1 + s.children.map(streamedShuffles).sum
      case other => other.children.map(streamedShuffles).sum
    }
    val n = streamedShuffles(df.queryExecution.executedPlan)
    assert(n <= 1, s"codes shuffled beyond the rank window ($n):\n$p")
    // scoring runs the native expression, not an interpreted HOF fold
    assert(p.contains("graft_adc_score"), s"native ADC score missing:\n$p")
    assert(!p.contains("aggregate(transform"),
      s"interpreted HOF fold in the scan:\n$p")
  }

  test("BM25 broadcasts the query side; no sort-merge join touches the corpus") {
    val docs = (0L until 200L).map(i =>
      (i, s"token$i filler common words here")).toDF("doc_id", "text")
    val qs = Seq((1L, "token7 common"), (2L, "token13")).toDF("qid", "qtext")
    val p = plan(graft.operators.Retrieval.bm25TopK(
      docs, "doc_id", "text", qs, "qid", "qtext", k = 5))
    // every join in the plan is broadcast (query terms, idf, stats are
    // all display-sized); the corpus is never a sort-merge side
    assert(p.contains("Broadcast"), s"query side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized join side:\n$p")
  }

  test("tfidfKnn: the corpus×query dot join is broadcast, norms attach " +
      "BEFORE the pair fan-out, and the top-k rank is salted two-stage") {
    val docs = (0L until 200L).map(i =>
      (i, s"token$i filler common words here")).toDF("doc_id", "text")
    val qs = Seq((1L, "token7 common"), (2L, "token13")).toDF("qid", "qt")
    val df = graft.operators.Vectorize.tfidfKnn(
      docs, "doc_id", "text", qs, "qid", "qt", dim = 64, k = 5)
    val p = plan(df)
    // the corpus-token-scale join (normalized weights × query weights
    // on slot) must be broadcast — that is the join that would shuffle
    // the corpus if it ever degraded to sort-merge
    assert(p.contains("BroadcastHashJoin [slot"),
      s"slot join not broadcast:\n$p")
    // weights ⋈ norms is co-keyed on doc_id and runs on the
    // corpus-token relation (pre-fan-out) — one shuffled join there is
    // the correct plan; anything beyond it is a regression (the
    // norms-after-dots shape joined the PAIR-scale relation twice)
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj <= 1, s"unexpected extra sort-merge joins ($smj):\n$p")
    // pair-scale ranking never funnels one query's matches through one
    // partition: bottom window salted, top window over __lrk survivors
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(pl: SparkPlan): Seq[WindowExec] = pl match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val ws = windows(df.queryExecution.executedPlan)
    assert(ws.size === 2, s"expected the two-stage rank:\n$p")
    assert(ws(1).partitionSpec.size === 2, s"pair window not salted:\n$p")
    assert(ws(0).partitionSpec.size === 1)
  }

  test("NB prediction is a frozen projection: no join, no exchange, " +
      "no window in the scoring plan") {
    val train = Seq(("a", "x y z"), ("b", "p q r")).toDF("label", "text")
    val model = graft.operators.Classify.nbFit(train, "label", "text", 10)
    val test_ = (0L until 100L).map(i => (i, s"x p t$i")).toDF("doc_id", "text")
    val p = plan(graft.operators.Classify.nbPredict(model, test_,
      "doc_id", "text"))
    // the model rides as TokenMapSum reference objects — scoring adds
    // ZERO exchanges/joins/windows to whatever plan the input runs
    // (the join-shaped path this replaced paid an exploded-token
    // broadcast join plus a docs×C shuffle and a rank window)
    for (bad <- Seq("Exchange", "Join", "Window"))
      assert(!p.contains(bad), s"frozen predict plan contains $bad:\n$p")
  }

  test("chunkWindows is map-only: zero exchanges") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 200).map(i => lit(s"t$i")): _*).as("text"))
    val p = plan(graft.operators.Packing.chunkWindows(
      docs, "doc_id", "text", 128, 64))
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }

  test("dedupByUrl shuffles exactly once, on the canonical key") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("http://h"), col("id") % 7, lit(".com/p")).as("url"),
      (col("id") * 31 % 997).as("n_chars"))
    val p = plan(graft.operators.Urls.dedupByUrl(docs))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected one canonical-key shuffle:\n$p")
  }

  test("wave-6 series combinators broadcast their small relations") {
    import graft.operators.SeriesFunctions
    val a = (0L until 200L).map(i => (s"x.${i % 4}", i * 60, i.toDouble))
      .toDF("name", "ts", "value")
    val b = (0L until 200L).map(i => (s"y.${i % 4}", i * 60, i.toDouble + 1))
      .toDF("name", "ts", "value")
    // pairwise lists: both display-sized rank relations and the rank→
    // name map ride broadcasts — the points sides join without a
    // points-sized global sort
    val pp = plan(SeriesFunctions.pairwiseSeriesLists(a, b, "sum"))
    assert(pp.contains("Broadcast"), s"rank relations not broadcast:\n$pp")
    // removeBetweenPercentile: the slot-sized bound relation broadcasts
    // and the kept-name semi-join broadcasts
    val rp = plan(SeriesFunctions.removeBetweenPercentile(a, 80))
    assert("BroadcastHashJoin".r.findAllIn(rp).size >= 2,
      s"bounds/kept-names not broadcast:\n$rp")
  }

  test("topTokens: the vocabulary-scale window is salted — no window " +
      "partitioned by group alone ranks the full token relation") {
    val docs = spark.range(200).select(
      (col("id") % 3).cast("string").as("lang"),
      concat_ws(" ", lit("common"), concat(lit("w"), col("id") % 41),
        concat(lit("w"), col("id") % 13)).as("text"))
    val df = graft.operators.Profile.topTokens(docs, "lang", "text", k = 5)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(pl: SparkPlan): Seq[WindowExec] = pl match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val ws = windows(df.queryExecution.executedPlan)
    assert(ws.size === 2, s"expected the two-stage rank:\n${plan(df)}")
    // pre-order: ws(0) is the final display-sized merge (<= k*salts rows
    // per group), ws(1) the bottom vocabulary rank — which MUST carry the
    // salt in its partition spec or the dominant group's whole vocabulary
    // funnels through one task
    assert(ws(1).partitionSpec.size === 2,
      s"vocabulary window not salted:\n${plan(df)}")
    assert(ws(0).partitionSpec.size === 1)
    // and the final window's input is the stage-1 survivors, not the raw
    // counts: a __lrk filter sits in its subtree below it
    val belowFinal = ws(0).children.head.toString
    assert(belowFinal.contains("__lrk"),
      s"final window not fed by local top-k survivors:\n${plan(df)}")
  }

  test("topTokensSketch: sketch partials aggregate map-side — one " +
      "exchange carrying summaries, zero windows") {
    val docs = spark.range(200).select(
      (col("id") % 3).cast("string").as("lang"),
      concat_ws(" ", lit("common"), concat(lit("w"), col("id") % 41),
        concat(lit("w"), col("id") % 13)).as("text"))
    val df = graft.operators.Profile.topTokensSketch(docs, "lang", "text",
      k = 5, capacity = 64)
    val p = plan(df)
    // the TypedImperativeAggregate plans as ObjectHashAggregate
    // partial/final around ONE exchange: the shuffle moves per-partition
    // summaries, never the (group, token) vocabulary
    assert("ObjectHashAggregate".r.findAllIn(p).size === 2,
      s"expected partial+final sketch aggregation:\n$p")
    assert("Exchange".r.findAllIn(p).size === 1,
      s"expected one summary-sized exchange:\n$p")
    assert(!p.contains("Window"), s"sketch path must not rank a window:\n$p")
    assert(p.contains("graft_frequent_items"), s"sketch agg missing:\n$p")
  }

  test("clusterRepresentatives is single-pass: the scores side is scanned " +
      "once and there is no join-back after the window") {
    val docs = spark.range(100).select(col("id").as("doc_id"))
    val comps = Seq((1L, 0L), (2L, 0L), (5L, 4L)).toDF("id", "cluster")
    val scores = spark.range(100).select(col("id").as("doc_id"),
      (col("id") % 7).cast("double").as("score"))
    val df = Dedup.clusterRepresentatives(docs, "doc_id", scores, "score",
      comps)
    val p = plan(df)
    // one window computes rep_id in place — a second Window or a join
    // AFTER the window would be the r6 double-branch regression
    assert("Window".r.findAllIn(p).size === 1, s"expected one window:\n$p")
    // the scores relation appears exactly once (Range scans: docs,
    // scores; a duplicated branch would re-scan or ReusedExchange it)
    val ranges = "Range \\(0, 100".r.findAllIn(p).size
    assert(ranges === 2, s"expected docs+scores scanned once each:\n$p")
    assert(!p.contains("ReusedExchange"), s"duplicated branch:\n$p")
  }

  test("wave-2 warehouse queries: dimensions broadcast, the fact side is " +
      "scanned once per query") {
    val dir = "/root/testdata/sf0.001"
    def scansOf(p: String, tbl: String): Int =
      s"$tbl\\.parquet".r.findAllIn(p).size
    // h17: the correlated per-part avg is a window, not an agg+join-back
    // — lineitem is scanned ONCE and the part filter broadcasts
    val h17 = graft.SparkEntry.queries("h17_small_qty_revenue")(spark, dir)
    h17.count()
    val p17 = plan(h17)
    assert(scansOf(p17, "lineitem") === 1, s"fact scanned twice:\n$p17")
    assert(p17.contains("BroadcastHashJoin"), s"part not broadcast:\n$p17")
    assert("Window".r.findAllIn(p17).size === 1, s"expected one window:\n$p17")
    // h21: the finished-order rows are checkpointed once; every further
    // join is either co-keyed on l_orderkey or a broadcast
    val h21 = graft.SparkEntry.queries("h21_waiting_suppliers")(spark, dir)
    h21.count()
    val p21 = plan(h21)
    assert(scansOf(p21, "lineitem") === 0,
      s"fact re-read past the checkpoint:\n$p21")
    assert(p21.contains("BroadcastHashJoin"),
      s"supplier/nation dim not broadcast:\n$p21")
    // h13: the raw orders rows never ride the customer join — orders
    // pre-aggregate to per-customer counts first
    val h13 = graft.SparkEntry.queries("h13_order_count_distribution")(
      spark, dir)
    h13.count()
    val p13 = plan(h13)
    assert(scansOf(p13, "orders") === 1 && scansOf(p13, "customer") === 1,
      s"expected one scan of each side:\n$p13")
    // h16: both dims broadcast (filtered part, complained suppliers) —
    // the only exchanges are the distinct and the final group
    val h16 = graft.SparkEntry.queries("h16_part_supplier_variety")(
      spark, dir)
    h16.count()
    val p16 = plan(h16)
    assert(scansOf(p16, "lineitem") === 1, s"fact scanned twice:\n$p16")
    assert("BroadcastHashJoin".r.findAllIn(p16).size === 2,
      s"part/bad-supplier dims not both broadcast:\n$p16")
    assert(!p16.contains("SortMergeJoin"), s"corpus-sized join side:\n$p16")
  }

  test("wave-3 warehouse queries: correlated-min window, nested-IN semi, " +
      "substring anti-join all keep the fact to one scan") {
    val dir = "/root/testdata/sf0.001"
    def scansOf(p: String, tbl: String): Int =
      s"$tbl\\.parquet".r.findAllIn(p).size
    // h2: Q2's correlated min() decorrelates to ONE window over the
    // (part, supplier) aggregate — one lineitem scan, both the part
    // filter and the EUROPE supplier chain broadcast
    val h2 = graft.SparkEntry.queries("h2_min_cost_supplier")(spark, dir)
    h2.count()
    val p2 = plan(h2)
    assert(scansOf(p2, "lineitem") === 1, s"fact scanned twice:\n$p2")
    assert("Window".r.findAllIn(p2).size === 1, s"expected one window:\n$p2")
    assert("BroadcastHashJoin".r.findAllIn(p2).size >= 2,
      s"part/supplier-chain dims not broadcast:\n$p2")
    // h20: the nested part IN-list broadcasts into the single date-
    // pruned fact scan; the HAVING survivors reach supplier as a
    // semi-join, and the shipdate filter is pushed to the parquet scan
    val h20 = graft.SparkEntry.queries("h20_part_promotion_suppliers")(
      spark, dir)
    h20.count()
    val p20 = plan(h20)
    assert(scansOf(p20, "lineitem") === 1, s"fact scanned twice:\n$p20")
    assert(p20.contains("LeftSemi"), s"supplier filter not a semi-join:\n$p20")
    assert(p20.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate"),
      s"shipdate not pushed to the scan:\n$p20")
    // h22: the filtered customer slice is checkpointed once and feeds
    // both the threshold row and the main pass; the anti-join's order
    // side is scanned once, projected to its key column
    val h22 = graft.SparkEntry.queries("h22_sales_opportunity")(spark, dir)
    h22.count()
    val p22 = plan(h22)
    assert(scansOf(p22, "customer") === 0,
      s"customer re-read past the checkpoint:\n$p22")
    assert(scansOf(p22, "orders") === 1,
      s"expected one orders scan:\n$p22")
    assert(p22.contains("LeftAnti"), s"dormant test not an anti-join:\n$p22")
    assert(p22.contains("BroadcastNestedLoopJoin") ||
      "BroadcastHashJoin".r.findAllIn(p22).size >= 1,
      s"one-row threshold not broadcast:\n$p22")
  }

  test("wave-4 warehouse queries: pushed scan filters, semi-join EXISTS, " +
      "pre-aggregated dim joins, hull-filtered disjunction") {
    val dir = "/root/testdata/sf0.001"
    def scansOf(p: String, tbl: String): Int =
      s"$tbl\\.parquet".r.findAllIn(p).size
    // h6: the pure scan-aggregate — every predicate reaches the parquet
    // scan, no join, no exchange beyond the partial-agg gather. The
    // plan's toString elides long PushedFilters lists, so read the
    // scan node's metadata un-truncated
    val h6 = graft.SparkEntry.queries("h6_forecast_revenue")(spark, dir)
    h6.count()
    val p6 = plan(h6)
    assert(!p6.contains("Join"), s"Q6 must be join-free:\n$p6")
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val final6 = h6.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // post-count final
      case p => p
    }
    val pushed6 = final6.collectFirst {
      case f: FileSourceScanExec => f.metadata("PushedFilters")
    }.get
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount"))
      assert(pushed6.contains(f), s"$f not pushed to the scan: $pushed6")
    // h4: EXISTS compiles to ONE co-keyed left_semi; the quarter filter
    // prunes orders at the scan
    val h4 = graft.SparkEntry.queries("h4_order_priority_check")(spark, dir)
    h4.count()
    val p4 = plan(h4)
    assert(p4.contains("LeftSemi"), s"EXISTS not a semi-join:\n$p4")
    assert(scansOf(p4, "orders") === 1 && scansOf(p4, "lineitem") === 1,
      s"expected one scan per side:\n$p4")
    assert(p4.contains("GreaterThanOrEqual(o_orderdate"),
      s"quarter filter not pushed:\n$p4")
    // h10: lineitem aggregates to per-customer rows BEFORE customer/
    // nation join, and those dims broadcast
    val h10 = graft.SparkEntry.queries("h10_returned_items")(spark, dir)
    h10.count()
    val p10 = plan(h10)
    assert(scansOf(p10, "lineitem") === 1, s"fact scanned twice:\n$p10")
    assert("BroadcastHashJoin".r.findAllIn(p10).size >= 2,
      s"customer/nation not broadcast:\n$p10")
    assert(p10.contains("EqualTo(l_returnflag,R)"),
      s"return flag not pushed:\n$p10")
    // h19: the OR-hull (brand set + size band) reaches the part scan so
    // the broadcast side is pre-shrunk; the fact is scanned once
    val h19 = graft.SparkEntry.queries("h19_disjunctive_revenue")(spark, dir)
    h19.count()
    val p19 = plan(h19)
    assert(scansOf(p19, "lineitem") === 1, s"fact scanned twice:\n$p19")
    assert(p19.contains("BroadcastHashJoin"), s"part not broadcast:\n$p19")
    assert(p19.contains("In(p_brand"), s"brand hull not pushed:\n$p19")
  }

  test("wave-5 warehouse queries: disjunctive nation pair, share-of-sum, " +
      "profit star, group-vs-global HAVING, max-over-view — one fact " +
      "scan each, dims broadcast, scalars broadcast not recomputed") {
    val dir = "/root/testdata/sf0.001"
    def scansOf(p: String, tbl: String): Int =
      s"$tbl\\.parquet".r.findAllIn(p).size
    // h7: both nation chains broadcast pre-filtered; fact scanned once
    // with the shipdate window pushed
    val h7 = graft.SparkEntry.queries("h7_volume_shipping")(spark, dir)
    h7.count()
    val p7 = plan(h7)
    assert(scansOf(p7, "lineitem") === 1, s"fact scanned twice:\n$p7")
    assert("BroadcastHashJoin".r.findAllIn(p7).size >= 2,
      s"supplier/customer chains not broadcast:\n$p7")
    assert(p7.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed:\n$p7")
    // h8: the share needs ONE fact pass — the conditional nation sum
    // and the total ride the same aggregate, no self-join; the market
    // membership is a semi-join
    val h8 = graft.SparkEntry.queries("h8_market_share")(spark, dir)
    h8.count()
    val p8 = plan(h8)
    assert(scansOf(p8, "lineitem") === 1,
      s"share-of-sum must not rescan the fact:\n$p8")
    assert(p8.contains("LeftSemi"), s"market filter not a semi-join:\n$p8")
    assert("HashAggregate".r.findAllIn(p8).nonEmpty)
    // h9: profit star — one fact scan, part and supplier→nation
    // broadcast, orders co-keyed
    val h9 = graft.SparkEntry.queries("h9_product_profit")(spark, dir)
    h9.count()
    val p9 = plan(h9)
    assert(scansOf(p9, "lineitem") === 1, s"fact scanned twice:\n$p9")
    assert("BroadcastHashJoin".r.findAllIn(p9).size >= 2,
      s"part/supplier dims not broadcast:\n$p9")
    // h11: the per-part aggregate is checkpointed ONCE and feeds both
    // the global total (a one-row broadcast) and the filter — the fact
    // never re-scans; the nation supplier set is a semi-join
    val h11 = graft.SparkEntry.queries("h11_important_stock")(spark, dir)
    h11.count()
    val p11 = plan(h11)
    assert(scansOf(p11, "lineitem") === 0,
      s"fact re-read past the checkpoint:\n$p11")
    assert(p11.contains("BroadcastNestedLoopJoin") ||
      p11.contains("BroadcastHashJoin"),
      s"global threshold not broadcast:\n$p11")
    // h15: max-over-view — the revenue view is checkpointed once, its
    // max comes back as a one-row broadcast, supplier dim broadcasts
    val h15 = graft.SparkEntry.queries("h15_top_supplier")(spark, dir)
    h15.count()
    val p15 = plan(h15)
    assert(scansOf(p15, "lineitem") === 0,
      s"view re-read past the checkpoint:\n$p15")
    assert(p15.contains("BroadcastNestedLoopJoin") ||
      "BroadcastHashJoin".r.findAllIn(p15).size >= 1,
      s"max row / supplier not broadcast:\n$p15")
  }

  test("dated catalog: time-scoped scan reads fewer files than full scan") {
    import graft.sources.MetricCatalog
    val dir = java.nio.file.Files.createTempDirectory("datedcat").toString
    val span = MetricCatalog.MonthSpanS
    // 90 days of updated_on → 3 month partitions on disk
    val cat = (0 until 90).map(i => (s"m.$i", i.toLong * 86400))
      .toDF("name", "updated_on")
    MetricCatalog.writeDated(cat, dir)
    val stored = spark.read.parquet(dir)

    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum
    }
    val full = filesRead(stored)
    // cutoff inside month 0 → months 1-2 pruned at PLAN time
    val expired = MetricCatalog.expiredMetrics(stored, nowS = span, maxAgeS = 1)
    val pruned = filesRead(expired)
    assert(pruned < full, s"expected partition pruning: $pruned !< $full")
    // pruning is lossless: exactly the days-0..29 rows survive
    assert(expired.count() === 30)
  }

  test("edit-distance join: variant-keyed equi-join, never cartesian, " +
      "never a window; nearestMaster argmin aggregates map-side") {
    import graft.operators.EntityResolution
    val df = Seq.tabulate(40)(i => f"key_$i%03d").toDF("name")
    val p = plan(EntityResolution.editDistancePairs(df, "name", 1))
    assert(!p.contains("CartesianProduct"), s"all-pairs join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"non-equi candidate join:\n$p")
    assert(!p.contains("Window"), s"unexpected window:\n$p")

    // masters SHARE LINEAGE with records (filtered from the same frame)
    // — the case where an ambiguous variant self-join would resolve
    // trivially true and silently degrade to filtered all-pairs
    val masters = df.filter(col("name").isin("key_001", "key_017"))
      .withColumnRenamed("name", "mname")
    val p2 = plan(EntityResolution.nearestMaster(df, "name", masters,
      "mname", 1))
    assert(!p2.contains("Window"), s"argmin must not be a window:\n$p2")
    assert(p2.contains("partial_min"),
      s"per-key argmin has no map-side partial:\n$p2")
    assert(!p2.contains("CartesianProduct"), s"all-pairs join:\n$p2")
  }
}
