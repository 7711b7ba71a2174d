package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation — PageRank over a host
  * graph, the quality prior web-curation pipelines attach to documents
  * (CommonCrawl publishes host-level harmonic centrality / PageRank
  * ranks for exactly this; a curation stack joins them in as a keep
  * signal next to content-quality scores like t2/t8).
  *
  * The iteration is the canonical Spark shape: edges are materialized
  * once ([[org.apache.spark.sql.Dataset.localCheckpoint]] — the
  * convergence-loop rule learned on connectedComponents: never let a
  * loop re-execute the caller's edge-producing plan), each round is
  * one join (ranks ⋈ edges on src) + one aggregation (sum by dst),
  * and the dangling-mass term is a one-row scalar collect (the
  * centroid pattern — metadata-sized, never row data).
  *
  * All arithmetic is integer-scaled (rank mass in parts-per-1e9,
  * per-edge contribution = integer div by out-degree) so sums are
  * order-independent and the result is bit-exact across engines and
  * partitionings — the same trick the Naive Bayes scorer uses for its
  * log-probability grid.
  *
  * At 100 TB: ranks and edges both shuffle-partition on `src`, so
  * iterations 2..k reuse the same exchange; out-degrees ride the edge
  * partitioning (join on src, not a broadcast — host counts are
  * web-scale). The scalar dangling sum stays one row regardless of
  * graph size.
  */
object LinkGraph {

  /** Deterministic synthetic host graph over a document corpus: each
    * doc contributes one directed edge between two content-addressed
    * hosts (`digest("pgs:"+id) mod n` → `digest("pgd:"+id) mod n`),
    * self-loops dropped, parallel edges collapsed. Stands in for the
    * real outlink relation a crawl would provide. */
  def syntheticHostEdges(docs: DataFrame, idCol: String,
                         hosts: Int): DataFrame =
    docs.select(sourceHost(col(idCol), hosts).as("src"),
        saltedHost("pgd:", col(idCol), hosts).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** The content-addressed source host a document's synthetic edge
    * originates from — the join key for attaching host centrality
    * back to documents (a crawl would carry a real host column). */
  def sourceHost(idCol: Column, hosts: Int): Column =
    saltedHost("pgs:", idCol, hosts)

  private def saltedHost(salt: String, idCol: Column,
                         hosts: Int): Column =
    pmod(Sampling.digestInt(
      md5(concat(lit(salt), idCol.cast("string"))), 8),
      lit(hosts.toLong)).cast("long")

  /** Personalized PageRank: the restart distribution concentrates on
    * `seeds` instead of being uniform — rank measures proximity to the
    * seed set (topic-focused crawl scoring, related-host discovery).
    * Same integer-scaled recurrence as [[pagerank]], with the teleport
    * term and the dangling mass both returning to the seeds (uniformly
    * across them), so total mass still telescopes to ~`scale`:
    *
    * {{{
    *   rank'(v) = [v ∈ seeds] * (15 * (scale div |seeds|)) div 100
    *            + (85 * (sum contrib into v
    *                     + [v ∈ seeds] * (dangling div |seeds|))) div 100
    * }}}
    */
  def personalizedPagerank(spark: SparkSession, edges: DataFrame,
      n: Long, seeds: Seq[Long], iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(n > 0 && iters >= 0 && seeds.nonEmpty,
      "personalizedPagerank needs n > 0, iters >= 0, seeds non-empty")
    require(seeds.forall(s => s >= 0 && s < n),
      s"seeds must lie in [0, $n): ${seeds.filterNot(s => s >= 0 && s < n)}")
    val ns = seeds.size.toLong
    val isSeed = col("node").isin(seeds: _*)
    val base = (15L * (scale / ns)) / 100L
    rankIteration(spark, edges, n, iters,
      initRank = when(isSeed, lit(scale / ns)).otherwise(lit(0L)),
      teleport = when(isSeed, lit(base)).otherwise(lit(0L)),
      // d div ns: exact long floor-division in-plan (d ≥ 0), the same
      // value the old driver-side `lit(d / ns)` literal carried
      danglingShare = d => when(isSeed, intDiv(d, ns)).otherwise(lit(0L)))
  }

  /** The shared damped mass-flow recurrence behind [[pagerank]]
    * (uniform restart) and [[personalizedPagerank]] (seed restart):
    * per round, one scalar dangling collect, one contributions
    * join+sum, one node-keyed update
    *
    * {{{ rank'(v) = teleport(v)
    *              + (85 * (incoming(v) + danglingShare(v))) div 100 }}}
    *
    * with the restart policy injected as expressions over `node`. */
  private def rankIteration(spark: SparkSession, edges: DataFrame,
      n: Long, iters: Int, initRank: Column, teleport: Column,
      danglingShare: Column => Column): DataFrame = {
    val ed = edges.select(col("src").cast("long"),
      col("dst").cast("long")).localCheckpoint(true)
    val odeg = ed.groupBy("src").agg(count(lit(1)).as("__odeg"))
      .localCheckpoint(true)
    val nodes = spark.range(n).select(col("id").as("node"))
    var ranks = nodes.withColumn("rank_scaled", initRank)
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // the dangling mass rides as a one-row broadcast scalar INSIDE
      // the round's plan (same integer value the old driver-side
      // head() collected) — per round this drops one action and one
      // duplicate execution of the ranks-scan lineage; the checkpoint
      // below stays the one materialization barrier per round
      val dangling = ranks.join(odeg,
          ranks("node") === odeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank_scaled")), lit(0L)).as("__dang"))
      val incoming = ed
        .join(ranks, ed("src") === ranks("node"))
        .join(odeg, "src")
        .select(col("dst").as("node"),
          floor(col("rank_scaled") / col("__odeg")).cast("long")
            .as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(incoming, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (teleport +
            floor((coalesce(col("__in"), lit(0L)) +
              danglingShare(col("__dang"))) * 85L / 100L).cast("long"))
            .as("rank_scaled"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** HITS hubs and authorities (Kleinberg) — the link-analysis pair to
    * PageRank: a good AUTHORITY is pointed at by good hubs, a good HUB
    * points at good authorities. Curation reads authorities as
    * reference-quality hosts and hubs as link-directory hosts.
    *
    * Each half-round is one join + one sum by node, then an integer
    * renormalization `x'(v) = (x(v) * scale) div Σx` (the L1 norm in
    * place of Kleinberg's L2 — same fixed point direction, and integer
    * arithmetic keeps every engine bit-identical; Σx is a one-row
    * scalar, the centroid pattern). Bounds: `scale >= n` (so the
    * initial per-node mass `scale div n` is non-zero) and
    * `n * scale^2 < 2^63` (the worst renormalization intermediate) —
    * the 1e6 default covers host graphs to ~1e6 nodes; larger graphs
    * need a Decimal renormalization, which this integer formulation
    * deliberately trades away for bit-exactness.
    *
    * Returns `(node, hub_scaled, auth_scaled)` in parts-per-`scale`. */
  def hits(spark: SparkSession, edges: DataFrame, n: Long, iters: Int,
           scale: Long = 1000000L): DataFrame = {
    require(n > 0 && iters >= 0, "hits needs n > 0, iters >= 0")
    require(scale >= n, s"hits needs scale >= n ($scale < $n): the " +
      "initial per-node mass scale div n would be zero")
    // the documented overflow precondition, enforced: the renormalization
    // intermediate `mass * scale` is bounded by scale^2 (mass is L1-capped
    // at `scale` each half-round), with n-fold headroom kept for the
    // pre-normalization gather sum
    require(BigInt(n) * BigInt(scale) * BigInt(scale) < BigInt(Long.MaxValue),
      s"hits needs n * scale^2 < 2^63 (n=$n, scale=$scale): the integer " +
        "renormalization would overflow — use a smaller scale or a Decimal " +
        "renorm for graphs this large")
    val ed = edges.select(col("src").cast("long"),
      col("dst").cast("long")).localCheckpoint(true)
    val nodes = spark.range(n).select(col("id").as("node"))
    // one half-round: gather mass across edges (fromCol → toCol), then
    // L1-renormalize to `scale` with exact integer div (the quotient's
    // fractional part can be ~1/(n·scale), below double precision, so
    // floor-of-double-division would not be engine-exact). A zero
    // total (empty graph, or all mass on edgeless nodes) renormalizes
    // to all-zero instead of dividing by zero.
    def halfRound(mass: DataFrame, massCol: String, fromCol: String,
        toCol: String, outCol: String): DataFrame = {
      val gathered = ed.join(mass, ed(fromCol) === mass("node"))
        .groupBy(col(toCol).as("__n"))
        .agg(sum(col(massCol)).as("__m"))
      // the L1 total rides as a one-row broadcast scalar INSIDE the
      // half-round's plan (missing nodes contribute 0, so the sum over
      // `gathered` equals the old sum over the node-joined relation) —
      // the old driver-side head() both cost an action per half-round
      // and re-executed the gather lineage a second time. The zero
      // total (empty graph / edgeless mass) renormalizes to all-zero
      // via the when-guard, exactly like the old driver-side branch.
      val total = gathered.agg(coalesce(sum(col("__m")), lit(0L)).as("__tot"))
      nodes.join(gathered, col("node") === col("__n"), "left")
        .select(col("node"), coalesce(col("__m"), lit(0L)).as(outCol))
        .crossJoin(broadcast(total))
        .select(col("node"),
          when(col("__tot") === 0L, lit(0L))
            .otherwise(expr(s"$outCol * ${scale}L div __tot"))
            .as(outCol))
        .localCheckpoint(true)
    }
    var hub = nodes.withColumn("h", lit(scale / n)).localCheckpoint(true)
    var auth = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      auth = halfRound(hub, "h", "src", "dst", "a")
      hub = halfRound(auth, "a", "dst", "src", "h")
    }
    hub.join(auth, "node")
      .select(col("node"), col("h").as("hub_scaled"),
        col("a").as("auth_scaled"))
  }

  /** Directed edges → the canonical undirected edge set `(a < b)`,
    * parallel/reverse duplicates collapsed. */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-node triangle participation counts over the undirected graph
    * — the local clustering signal (spam farms show dense triangle
    * neighborhoods; isolated content shows none).
    *
    * The classic two-join plan on canonically ordered edges: wedge
    * `(a<b) ⋈ (b<c)` then close with `(a,c)` — each triangle is
    * enumerated exactly once as `a<b<c`, so no division by 6. Both
    * joins key on node ids; at web scale the standard skew treatment
    * (degree-ordered orientation) drops in here, and the edge relation
    * is materialized once for its three consumers. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = undirected(edges).localCheckpoint(true)
    val e1 = und.select(col("a").as("x"), col("b").as("y"))
    val e2 = und.select(col("a").as("y"), col("b").as("z"))
    val e3 = und.select(col("a").as("x"), col("b").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Bounded-hop BFS distance from a seed set over the undirected
    * graph: `rounds` relaxation sweeps, each one join + one min-
    * aggregation on integer hop counts (order-independent, bit-exact).
    * Nodes unreached within `rounds` hops are absent from the result.
    * Frontier/visited-set optimizations are deliberately left out —
    * the full-relaxation form is what unrolls into the SQL oracle, and
    * each sweep is still one hits-sized shuffle. */
  def bfsHops(spark: SparkSession, edges: DataFrame, seeds: Seq[Long],
              rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    import spark.implicits._
    val und = undirected(edges).localCheckpoint(true)
    // both directions, so one join per sweep covers all neighbors
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    var dist = seeds.toDF("node").withColumn("hops", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = adj.join(dist, adj("u") === dist("node"))
        .select(col("v").as("node"), (col("hops") + 1L).as("hops"))
      dist = dist.union(relaxed)
        .groupBy("node").agg(min(col("hops")).as("hops"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Integer-scaled PageRank with damping 0.85 over nodes `0..n-1`.
    *
    * Per iteration, with all divisions integer (floor — every term is
    * non-negative):
    *
    * {{{
    *   contrib(e)  = rank(e.src) div outdeg(e.src)
    *   dangling    = sum of rank over nodes with no outlinks
    *   rank'(v)    = (15 * (scale div n)) div 100
    *               + (85 * (sum contrib into v + dangling div n)) div 100
    * }}}
    *
    * Returns `(node, rank_scaled)` — rank mass in parts-per-`scale`.
    * Truncation loses < 1 part per 1e7 of mass per round at the
    * default scale; centrality ORDER is what curation consumes.
    */
  def pagerank(spark: SparkSession, edges: DataFrame, n: Long,
               iters: Int, scale: Long = 1000000000L): DataFrame = {
    require(n > 0 && iters >= 0, "pagerank needs n > 0, iters >= 0")
    rankIteration(spark, edges, n, iters,
      initRank = lit(scale / n),
      teleport = lit((15L * (scale / n)) / 100L),
      danglingShare = d => intDiv(d, n))
  }

  /** `a div b` for non-negative longs with a literal divisor — the
    * in-plan twin of driver-side `lit(a / b)`: subtract the remainder,
    * then divide the (now exactly divisible) value as DECIMAL so the
    * quotient is exact for the full long range (a double `/` would
    * round past 2^53). */
  private def intDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")
}
