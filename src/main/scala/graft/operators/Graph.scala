package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.Functions.stableSum

/** Iterative graph analytics on DataFrames — the pattern for
  * fixed-point computations (PageRank, label propagation, shortest
  * paths) that a 100 TB graph runs as a sequence of joins +
  * aggregations rather than a driver loop over rows.
  *
  * Scale shape per iteration: one join of the rank vector with the
  * edge list on the source key, one aggregation of contributions on
  * the destination key — both hash-partitioned; the rank vector is
  * nodes-sized, never edges-sized. Determinism: inflow sums accumulate
  * through [[stableSum]] (DECIMAL(38,10) of each double's shortest
  * representation), so partition order cannot change results and a
  * SQL oracle reproduces every iteration bit-for-bit. Long lineage is
  * the known hazard of iterative DataFrame loops — cut it with
  * `localCheckpoint` every few iterations (the clusters operator's
  * pointer-jumping loop documents the same technique); the bounded
  * iteration counts used here don't need it.
  */
object Graph {

  /** Fixed-iteration PageRank over an edge multiset (src, dst) — every
    * node must appear as a source (dangling-free, e.g. a k-regular
    * generated graph; a general graph adds the dangling-mass term).
    * Parallel edges contribute once each, matching the multiset
    * semantics of the edge list. `nodes` supplies the vertex domain
    * (single `id` column). Returns (id, rank) with rank rounded to
    * `roundTo`. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
               damping: Double = 0.85, roundTo: Int = 6): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1): $damping")
    val n = nodes.count()
    require(n > 0, "empty vertex domain")
    // the documented dangling-free contract, ENFORCED: a node with no
    // out-edges would silently leak rank mass every iteration
    val dangling = nodes
      .join(edges.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
      .count()
    require(dangling == 0,
      s"$dangling dangling node(s) with no out-edges — add self-loops or a dangling-mass term first")
    // teleport is (1.0 − damping) [one IEEE subtraction] / n [one IEEE
    // division]; an oracle reproduces it bit-exactly by interpolating
    // the SAME shortest-repr doubles and dividing by n in SQL — never
    // by re-deriving `1.0 - damping` in DECIMAL arithmetic
    val teleport = (1.0 - damping) / n
    val init = 1.0 / n
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("id"), lit(init).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
      ranks = nodes
        .join(contribs.groupBy(col("id"))
          .agg(stableSum(col("c")).cast("double").as("inflow")), Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
    }
    ranks.select(col("id"), round(col("rank"), roundTo).as("rank"))
  }

  /** Fixed-iteration multi-source BFS hop distances over an edge
    * multiset (src, dst): after `iters` rounds, `dist` is the hop count
    * from the nearest source for every node reachable within `iters`
    * hops, and -1 for the rest. `nodes` supplies the vertex domain,
    * `sources` the frontier seeds (both single `id` column).
    *
    * Same scale shape as [[pageRank]]: per iteration one join of the
    * nodes-sized distance vector with the edge list on the source key
    * plus one min-aggregation on the destination key, both
    * hash-partitioned — never an edges-sized state. Distances are exact
    * small integers, so results are bitwise engine-independent with no
    * stable-summation machinery, and an unrolled SQL oracle replays
    * every round exactly. */
  def bfsDistances(nodes: DataFrame, edges: DataFrame, sources: DataFrame,
                   iters: Int): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    var dist = nodes
      .join(sources.select(col("id"), lit(0).as("d")), Seq("id"), "left")
      .select(col("id"), col("d").as("dist")) // null = not yet reached
    for (_ <- 1 to iters) {
      // the carry-forward rides the SAME min-aggregation as the new
      // hops (a union branch, map-side), and the keep-unreached join is
      // against the STATIC nodes frame — the pageRank loop shape. A
      // least()-combine against the previous vector instead would put
      // the distance vector on two join sides per round (6 exchanges,
      // measured) vs this form's 3.
      val frontier = dist.filter(col("dist").isNotNull)
      val combined = edges
        .join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("dist") + 1).as("d"))
        .union(frontier.select(col("id"), col("dist").as("d")))
        .groupBy(col("id")).agg(min(col("d")).as("d"))
      dist = nodes.join(combined, Seq("id"), "left")
        .select(col("id"), col("d").as("dist"))
    }
    dist.select(col("id"), coalesce(col("dist"), lit(-1)).cast("int").as("dist"))
  }

  /** Fixed-round weighted shortest paths (Bellman–Ford relaxation):
    * after `iters` rounds, `dist` is the minimum-cost path from the
    * nearest source using AT MOST `iters` edges, -1 beyond — the
    * weighted sibling of [[bfsDistances]] with the identical loop
    * shape (the bounded-hop contract is the honest distributed form;
    * full convergence needs diameter-many rounds). `edges` carries
    * (src, dst, w) with non-negative integer weights; distances stay
    * exact integers, so an unrolled SQL oracle replays every round.
    * Same per-round scale shape as pageRank/bfs: one join of the
    * nodes-sized frontier with the edge list, one min-aggregation. */
  def ssspRounds(nodes: DataFrame, edges: DataFrame, sources: DataFrame,
                 iters: Int): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    var dist = nodes
      .join(sources.select(col("id"), lit(0L).as("d")), Seq("id"), "left")
      .select(col("id"), col("d").as("dist"))
    for (_ <- 1 to iters) {
      val frontier = dist.filter(col("dist").isNotNull)
      val combined = edges
        .join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("dist") + col("w")).as("d"))
        .union(frontier.select(col("id"), col("dist").as("d")))
        .groupBy(col("id")).agg(min(col("d")).as("d"))
      dist = nodes.join(combined, Seq("id"), "left")
        .select(col("id"), col("d").as("dist"))
    }
    // distances return as LONG, matching the long weight column — an
    // int cast here would silently wrap for large weights or many
    // rounds in general operator-level use
    dist.select(col("id"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** Fixed-round k-core peel: `iters` rounds of SIMULTANEOUSLY
    * removing every vertex whose degree within the surviving subgraph
    * is below `k` — the degeneracy-ordering primitive behind
    * community cores, graph sparsification, and spam-farm detection.
    * After the rounds, reports each vertex's survival and its degree
    * in the surviving subgraph (0 once peeled). A bounded round count
    * is the honest distributed contract: full coreness convergence is
    * data-dependent, while each round here is one degree aggregation
    * + one filter — the pageRank loop shape, nodes-sized state, exact
    * integers, so an unrolled SQL oracle replays every round.
    *
    * Scale shape per round: the symmetrized edge list semi-joins the
    * alive set on BOTH endpoints (hash-partitioned), then one degree
    * aggregation; edges stream through, state is the alive vertex
    * set. Lineage grows linearly in `iters` — cut with localCheckpoint
    * past ~10 rounds (the clusters operator documents the technique).
    *
    * Returns (id, in_core, deg) for every node in `nodes`. */
  def kCoreRounds(nodes: DataFrame, edges: DataFrame, k: Int,
                  iters: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(iters >= 1, "iters must be at least 1")
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    // both directions, so degree is one groupBy on the source slot.
    // Entry-scoped persisted (TransientCache): sym is consumed once
    // per round plus the final-degree pass, and its union inlines the
    // corpus-sized distinct TWICE per consumer — un-persisted, a
    // 3-round peel recomputes the edge canonicalization 8 times
    // (measured 5.4 s uncached vs 3.1 s cached, warm local[4] sf0.1;
    // the cached remainder is the ~15-stage floor of an iterative
    // plan, the pageRank family's known cost shape).
    val sym = graft.TransientCache.register(
      und.select(col("u").as("a"), col("v").as("b"))
        .union(und.select(col("v").as("a"), col("u").as("b"))))
    // each round's alive set is referenced TWICE (both semi-join
    // endpoints) — un-cached, every round would inline the prior
    // round's plan twice, doubling the tree per round (measured 12
    // unique exchanges added per round vs 5 cached). The per-round
    // cache is nodes-sized; drain() frees the chain after the query.
    var alive = nodes.select(col("id"))
    for (_ <- 1 to iters) {
      val degAlive = sym
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
        .groupBy(col("a")).agg(count(lit(1)).as("deg"))
      alive = graft.TransientCache.register(
        degAlive.filter(col("deg") >= k).select(col("a").as("id")))
    }
    // final-subgraph degree for survivors — recomputed AFTER the last
    // peel, so it may sit below k where the last round removed
    // neighbors (that is the signal the next round would act on);
    // peeled vertices report 0
    val fin = sym
      .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
      .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
      .groupBy(col("a")).agg(count(lit(1)).as("deg"))
    nodes
      .join(alive.withColumn("in_core", lit(true)), Seq("id"), "left")
      .join(fin.select(col("a").as("id"), col("deg")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("in_core"), lit(false)).as("in_core"),
        coalesce(col("deg"), lit(0L)).cast("int").as("deg"))
  }

  /** Per-node triangle counts over an edge multiset (src, dst),
    * treated as an undirected simple graph (self-loops and parallel /
    * reversed duplicates collapse first).
    *
    * Enumeration is DEGREE-ORDERED (compact-forward): every undirected
    * edge is oriented from its (degree, id)-smaller endpoint to the
    * larger, wedges are generated only at each triangle's unique apex
    * (the vertex that out-points to both others), and the closing edge
    * is probed in its one canonical direction. The orientation is why
    * this survives a power-law 100 TB graph: out-degree under the
    * (deg, id) total order is bounded by O(sqrt(m)) regardless of how
    * skewed the raw degree distribution is, so the wedge self-join's
    * per-key fan-out — the quadratic blowup that kills the naive
    * formulation on celebrity nodes — is capped. The undirected
    * distinct and the oriented list are entry-scoped persisted
    * (multiple consumers each; see the inline notes), leaving 5
    * unique exchanges (pinned in ScaleToolsSpec); state never exceeds
    * the wedge set, which the orientation keeps near the triangle
    * count. The triangle SET is orientation-independent, so an
    * id-ordered SQL oracle reproduces the result without mirroring
    * the degree machinery.
    *
    * Returns (id, triangles) for every node in `nodes` (0 for nodes in
    * no triangle), each triangle counted once per member vertex. */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // undirected simple edge set, canonical as u < v — THE expensive
    // corpus-sized intermediate, so entry-scoped persisted: it feeds
    // the degree profile (twice, via the u- and v-side joins), the
    // orientation join, and the closing-edge probe; un-persisted each
    // consumer re-runs the corpus-wide distinct.
    val und = graft.TransientCache.register(
      edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct())
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient a -> b iff (deg(a), a) < (deg(b), b). Entry-scoped
    // persist (TransientCache): the oriented list feeds BOTH sides of
    // the wedge self-join — un-persisted, Catalyst inlines the
    // distinct+degree subtree once per side.
    val oriented = graft.TransientCache.register(und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b")))
          .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b")))
    // wedges at the apex: unordered out-neighbor pairs, canonicalized
    // by plain id; each triangle has exactly ONE apex (the vertex
    // out-pointing to the other two), so probing the closing edge
    // {b1, b2} against the id-canonical UNDIRECTED set counts it once
    // — and the probe side is the cheap distinct, not the
    // degree-joined list
    val wedges = oriented.select(col("a"), col("b").as("b1"))
      .join(oriented.select(col("a"), col("b").as("b2")), "a")
      .filter(col("b1") < col("b2"))
    val triangles = wedges.join(
      und.select(col("u").as("b1"), col("v").as("b2")),
      Seq("b1", "b2"), "left_semi")
    // explode, NOT a 3-way union: a union would inline the whole
    // wedge-join subtree once per branch (measured 65 exchanges vs
    // explode's 9 — exchange reuse does not rescue a union of three
    // differently-projected scans of the same join)
    val members = triangles
      .select(explode(array(col("a"), col("b1"), col("b2"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
    nodes.join(members, Seq("id"), "left")
      .select(col("id"), coalesce(col("n"), lit(0L)).as("triangles"))
  }
}
