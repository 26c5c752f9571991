package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Iterative graph analytics over relational edge lists (SURVEY §2.11+
  * extension surface — the reference has no graph operators; a curation
  * pipeline needs them for influence/importance weighting of linked
  * corpora, domain graphs, and citation networks).
  *
  * Everything here is expressed as DataFrame joins/aggregations — no RDD
  * Pregel, no driver-side adjacency — so Catalyst plans each iteration
  * and AQE handles skew. Determinism convention (the sim14 lesson): all
  * iterative arithmetic is FIXED-POINT INTEGER (micro-units, truncating
  * division), so an unrolled replay in DuckDB reproduces the result
  * bit-for-bit and the oracle is exact, with no float-order ambiguity.
  *
  * At 100 TB: the edge list is two longs per edge and static — bucket it
  * by `src` once and every per-iteration join co-locates; ranks are one
  * slim row per node. Production runs loop to convergence with a
  * `localCheckpoint` every few iterations to cut lineage (the gate
  * unrolls exactly two so the oracle can replay them); each iteration is
  * one equi-join plus one partial-aggregated shuffle — the canonical
  * distributed PageRank schedule.
  */
object Graph {

  /** Undirected customer↔supplier trade graph from orders ⋈ lineitem,
    * as a DIRECTED symmetric edge list over disambiguated node ids
    * (customer c → node 2c, supplier s → node 2s+1 — the two key spaces
    * overlap numerically). DISTINCT first: the pair multiplicity is
    * line-item volume, not graph structure.
    */
  private[operators] def tradeEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("p"))
      .distinct()
    pairs.select($"c".as("src"), $"p".as("dst"))
      .unionAll(pairs.select($"p".as("src"), $"c".as("dst")))
  }

  // graph01 — PageRank, two unrolled iterations in fixed-point micro-units.
  // r0(v) = 1_000_000; r_{k+1}(v) = 150_000 + (85 * Σ_{u→v} (r_k(u) div
  // deg(u))) div 100 — i.e. damping 0.85 with truncating integer division
  // at both the per-source split and the damped sum, matching DuckDB's
  // `//` exactly (both truncate toward zero; every operand here is
  // positive). The symmetric edge list means no dangling nodes: every
  // node has out-edges (deg ≥ 1) and in-edges, so no rank mass needs a
  // redistribution term. Output keys decode the node id back to
  // (kind, key) so the result reads as customers (kind 0) and suppliers
  // (kind 1).
  def graph01PageRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // NOT persisted: the edge list recurs as an identical subplan in the
    // degree table and both iterations, and Catalyst's exchange reuse
    // serves every recurrence from the one distinct-shuffle output —
    // measured FASTER than persist + eager detach (which pays an extra
    // materialization pass for the same dedup). A production convergence
    // loop of unbounded depth would persist instead, because each
    // iteration is a separate action there.
    val edges = tradeEdges(s, d)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val r0 = deg.select($"src".as("node"), lit(1000000L).as("r"))
    val degN = deg.select($"src".as("deg_node"), $"deg")
    val edgesE = edges.select($"src".as("e_src"), $"dst".as("e_dst"))
    val r2 = (1 to 2).foldLeft(r0)((ranks, _) => rankStep(ranks, degN, edgesE))
    r2.select(($"node" % 2).as("node_kind"), expr("node div 2").as("node_key"),
        $"r".as("rank_e6"))
      .orderBy($"node_kind", $"node_key")
  }

  /** One damped fixed-point rank update (shared by the unrolled gate and
    * the convergence loop): split each node's rank over its out-edges
    * with truncating division, sum inflows per target, damp.
    */
  private def rankStep(ranks: DataFrame, degN: DataFrame,
                       edgesE: DataFrame): DataFrame = {
    import ranks.sparkSession.implicits._
    ranks.join(degN, $"node" === $"deg_node")
      .select($"node", expr("r div deg").as("contrib"))
      .join(edgesE, $"node" === $"e_src")
      .groupBy($"e_dst")
      .agg(sum($"contrib").as("inflow"))
      .select($"e_dst".as("node"),
        (lit(150000L) + expr("85 * inflow div 100")).as("r"))
  }

  /** Production PageRank: iterate [[rankStep]] to a fixed point — stop
    * when the largest per-node change is <= `tolE6` micro-units (or at
    * `maxIter`) — returning (ranks, iterations run). The convergence
    * probe is one slim max-of-abs-delta aggregate per iteration (an
    * action is inherent to ANY convergence check; a cost-sensitive
    * deployment probes every k-th iteration instead). Lineage is cut
    * with an eager `localCheckpoint` every `checkpointEvery` iterations
    * — an unbounded loop otherwise accretes a plan per iteration until
    * analysis time explodes (at cluster scale use `checkpoint` to
    * reliable storage for executor-loss recovery). Edges and degrees
    * persist across the whole loop — here, unlike the 2-iteration gate,
    * every iteration is a separate action, so exchange reuse cannot
    * serve them (the gate's measured trade-off inverts).
    */
  def pageRankConverged(edges: DataFrame, tolE6: Long = 1000,
                        maxIter: Int = 30,
                        checkpointEvery: Int = 3,
                        seeds: Option[DataFrame] = None): (DataFrame, Int) = {
    import edges.sparkSession.implicits._
    val cached = edges.persist()
    val deg = cached.groupBy($"src").agg(count(lit(1)).as("deg"))
    val degN = deg.select($"src".as("deg_node"), $"deg").persist()
    val edgesE = cached.select($"src".as("e_src"), $"dst".as("e_dst"))
    // seeded (personalized) restart: nodes carry an indicator; uniform PR
    // is the all-ones special case. Persisted — the node frame recurs in
    // every iteration's base term and (seeded) the left join breaks
    // exchange-reuse canonicalization, graph04's measured lesson.
    val nodes = (seeds match {
      case Some(sd) =>
        deg.select($"src".as("node"))
          .join(sd.select($"node".as("s_node")).distinct(),
            $"node" === $"s_node", "left")
          .select($"node",
            when($"s_node".isNotNull, 1L).otherwise(0L).as("seed"))
      case None => deg.select($"src".as("node"), lit(1L).as("seed"))
    }).persist()
    try {
      var ranks = nodes.select($"node", ($"seed" * 1000000L).as("r"))
        .localCheckpoint(true)
      var it = 0
      var converged = false
      while (it < maxIter && !converged) {
        var next = pprStep(ranks, nodes, degN, edgesE)
        it += 1
        if (it % checkpointEvery == 0) next = next.localCheckpoint(true)
        val prev = ranks.select($"node".as("p_node"), $"r".as("p_r"))
        val maxDelta = next.join(prev, $"node" === $"p_node")
          .agg(max(abs($"r" - $"p_r"))).head().getLong(0)
        converged = maxDelta <= tolE6
        ranks = next
      }
      (ranks.localCheckpoint(true), it) // detach before unpersist below
    } finally { nodes.unpersist(); degN.unpersist(); cached.unpersist() }
  }

  /** Seed-indicator-weighted damped update over the full node set —
    * [[rankStep]] generalized: base term = seed·150000, inflow-less
    * nodes stay addressable via the left join (graph04's formulation).
    * With seed ≡ 1 this equals [[rankStep]]'s result on graphs where
    * every node has inflow (symmetric edge lists — both gate graphs).
    */
  private def pprStep(ranks: DataFrame, nodes: DataFrame, degN: DataFrame,
                      edgesE: DataFrame): DataFrame = {
    import ranks.sparkSession.implicits._
    val inflow = ranks.join(degN, $"node" === $"deg_node")
      .select($"node", expr("r div deg").as("contrib"))
      .join(edgesE, $"node" === $"e_src")
      .groupBy($"e_dst").agg(sum($"contrib").as("inflow"))
    nodes.join(inflow, $"node" === $"e_dst", "left")
      .select($"node",
        ($"seed" * 150000L +
          expr("85 * coalesce(inflow, cast(0 as bigint)) div 100")).as("r"))
  }

  val graph01Sql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (
      |  SELECT c AS src, p AS dst FROM pairs
      |  UNION ALL
      |  SELECT p AS src, c AS dst FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
      |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
      |i1 AS (
      |  SELECT e.dst AS node,
      |    CAST(150000 + (85 * SUM(r.r // d.deg)) // 100 AS BIGINT) AS r
      |  FROM r0 r JOIN deg d ON r.node = d.src JOIN edges e ON e.src = r.node
      |  GROUP BY e.dst),
      |i2 AS (
      |  SELECT e.dst AS node,
      |    CAST(150000 + (85 * SUM(r.r // d.deg)) // 100 AS BIGINT) AS r
      |  FROM i1 r JOIN deg d ON r.node = d.src JOIN edges e ON e.src = r.node
      |  GROUP BY e.dst)
      |SELECT CAST(node % 2 AS BIGINT) AS node_kind,
      |  CAST(node // 2 AS BIGINT) AS node_key, r AS rank_e6
      |FROM i2
      |ORDER BY node_kind, node_key""".stripMargin

  // graph02 — multi-source BFS hop distance, three unrolled relaxation
  // rounds: dist_{k+1}(v) = min(dist_k(v), 1 + min over u→v of
  // dist_k(u)), seeded at distance 0 from the suppliers of nations 0–4.
  // Pure integer min-propagation — exact on both engines, no fixed-point
  // scaling needed. Each round is one equi-join + one min-aggregated
  // shuffle over slim (node, dist) rows; seeds with no edges still emit
  // (distance 0 to themselves). Only nodes reached within three hops
  // appear — the frontier semantics a reachability/contamination sweep
  // wants. At 100 TB the same bucketing note as [[graph01PageRank]]
  // applies, and a production run would iterate to fixpoint with
  // periodic lineage cuts.
  def graph02HopDistance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = tradeEdges(s, d).select($"src".as("e_src"), $"dst".as("e_dst"))
    val seeds = Tables.supplier(s, d)
      .filter($"s_nationkey" < 5)
      .select(($"s_suppkey" * 2 + 1).as("node"), lit(0L).as("dist"))
    val d3 = (1 to 3).foldLeft(seeds) { (dk, _) =>
      val next = dk.join(edges, $"node" === $"e_src")
        .select($"e_dst".as("node"), ($"dist" + 1).as("dist"))
      dk.unionAll(next).groupBy($"node").agg(min($"dist").as("dist"))
    }
    d3.select(($"node" % 2).as("node_kind"), expr("node div 2").as("node_key"),
        $"dist")
      .orderBy($"node_kind", $"node_key")
  }

  val graph02Sql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (
      |  SELECT c AS src, p AS dst FROM pairs
      |  UNION ALL
      |  SELECT p AS src, c AS dst FROM pairs),
      |d0 AS (
      |  SELECT s_suppkey * 2 + 1 AS node, CAST(0 AS BIGINT) AS dist
      |  FROM supplier WHERE s_nationkey < 5),
      |d1 AS (
      |  SELECT node, MIN(dist) AS dist FROM (
      |    SELECT node, dist FROM d0
      |    UNION ALL
      |    SELECT e.dst AS node, d.dist + 1 AS dist
      |    FROM d0 d JOIN edges e ON e.src = d.node) GROUP BY node),
      |d2 AS (
      |  SELECT node, MIN(dist) AS dist FROM (
      |    SELECT node, dist FROM d1
      |    UNION ALL
      |    SELECT e.dst AS node, d.dist + 1 AS dist
      |    FROM d1 d JOIN edges e ON e.src = d.node) GROUP BY node),
      |d3 AS (
      |  SELECT node, MIN(dist) AS dist FROM (
      |    SELECT node, dist FROM d2
      |    UNION ALL
      |    SELECT e.dst AS node, d.dist + 1 AS dist
      |    FROM d2 d JOIN edges e ON e.src = d.node) GROUP BY node)
      |SELECT CAST(node % 2 AS BIGINT) AS node_kind,
      |  CAST(node // 2 AS BIGINT) AS node_key, CAST(dist AS BIGINT) AS dist
      |FROM d3
      |ORDER BY node_kind, node_key""".stripMargin

  // graph04 — PERSONALIZED PageRank: graph01's damped fixed-point update
  // with the restart mass concentrated on a SEED set (customers of
  // nations < 5 — graph02's seed flavor) instead of spread uniformly.
  // This is importance CONDITIONED on a root population — the curation
  // form: "rank suppliers/domains by relevance to THESE sources" —
  // and the only changes to the schedule are an indicator-weighted base
  // term and a left join that keeps zero-rank nodes addressable (a seed
  // with no inflow still restarts; a non-seed with no inflow still
  // appears at rank 0 — the pure-join formulation would silently drop
  // both). Same integer fixed-point arithmetic, two unrolled iterations,
  // exact DuckDB replay; the convergence loop composes exactly as
  // [[pageRankConverged]] does for the uniform case.
  def graph04PersonalizedPr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // PERSISTED, unlike graph01: the seed left-join gives every consumer
    // of the edge/node frames a different projection shape, so subtree
    // canonicalization never matches and exchange reuse serves NOTHING —
    // measured unpersisted: 62 parquet scans of lineitem/orders in one
    // plan (graph01's identical-subplan trick doesn't survive the
    // outer-join asymmetry). The slim cached frames (two longs per edge,
    // two per node) are exactly what a cluster would pin; the result
    // detaches eagerly so the caches release here (the cache contract).
    val edges = tradeEdges(s, d).persist()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val seedSet = Tables.customer(s, d).toDF()
      .filter($"c_nationkey" < 5)
      .select(($"c_custkey" * 2).as("s_node")).distinct()
    val nodes = deg.select($"src".as("node"))
      .join(seedSet, $"node" === $"s_node", "left")
      .select($"node", when($"s_node".isNotNull, 1L).otherwise(0L).as("seed"))
      .persist()
    try {
      val degN = deg.select($"src".as("deg_node"), $"deg")
      val edgesE = edges.select($"src".as("e_src"), $"dst".as("e_dst"))
      var ranks = nodes.select($"node", ($"seed" * 1000000L).as("r"))
      for (_ <- 1 to 2) {
        val inflow = ranks.join(degN, $"node" === $"deg_node")
          .select($"node", expr("r div deg").as("contrib"))
          .join(edgesE, $"node" === $"e_src")
          .groupBy($"e_dst").agg(sum($"contrib").as("inflow"))
        ranks = nodes.join(inflow, $"node" === $"e_dst", "left")
          .select($"node",
            ($"seed" * 150000L +
              expr("85 * coalesce(inflow, cast(0 as bigint)) div 100")).as("r"))
      }
      ranks.select(($"node" % 2).as("node_kind"),
          expr("node div 2").as("node_key"), $"r".as("rank_e6"))
        .orderBy($"node_kind", $"node_key")
        .localCheckpoint(true)
        .orderBy($"node_kind", $"node_key")
    } finally { nodes.unpersist(); edges.unpersist() }
  }

  val graph04Sql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (
      |  SELECT c AS src, p AS dst FROM pairs
      |  UNION ALL
      |  SELECT p AS src, c AS dst FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
      |seeds AS (
      |  SELECT DISTINCT c_custkey * 2 AS node FROM customer
      |  WHERE c_nationkey < 5),
      |nodes AS (
      |  SELECT d.src AS node,
      |    CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS seed
      |  FROM deg d LEFT JOIN seeds s ON d.src = s.node),
      |r0 AS (SELECT node, CAST(seed * 1000000 AS BIGINT) AS r FROM nodes),
      |inf1 AS (
      |  SELECT e.dst AS node, SUM(r.r // d.deg) AS inflow
      |  FROM r0 r JOIN deg d ON r.node = d.src JOIN edges e ON e.src = r.node
      |  GROUP BY e.dst),
      |i1 AS (
      |  SELECT n.node, n.seed,
      |    CAST(n.seed * 150000 + (85 * COALESCE(i.inflow, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN inf1 i ON n.node = i.node),
      |inf2 AS (
      |  SELECT e.dst AS node, SUM(r.r // d.deg) AS inflow
      |  FROM i1 r JOIN deg d ON r.node = d.src JOIN edges e ON e.src = r.node
      |  GROUP BY e.dst),
      |i2 AS (
      |  SELECT n.node,
      |    CAST(n.seed * 150000 + (85 * COALESCE(i.inflow, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN inf2 i ON n.node = i.node)
      |SELECT CAST(node % 2 AS BIGINT) AS node_kind,
      |  CAST(node // 2 AS BIGINT) AS node_key, r AS rank_e6
      |FROM i2
      |ORDER BY node_kind, node_key""".stripMargin

  // graph03 — TRIANGLE COUNTING over the co-purchase part graph (edges =
  // q32's frequent pairs, so the two gates can never disagree on edge
  // semantics). Output: every node's degree and the number of triangles
  // through it — the clustering-coefficient numerator, the local-density
  // statistic curation uses to find tightly-coupled item/domain
  // clusters. The naive 3-way edge self-join explodes on hubs (a node of
  // degree d contributes d² wedge candidates); the classic distributed
  // fix (Suri & Vassilvitskii's MR algorithm) is DEGREE-ORDERED
  // ORIENTATION: direct each edge toward its higher-(degree, id)
  // endpoint, which bounds every out-degree by O(√m), so the wedge count
  // Σ outdeg² is minimal and hub skew cannot appear BY CONSTRUCTION —
  // the skew fix is algebraic, not physical (no salting needed). Wedges
  // are generated IN-NEIGHBORHOOD (sorted neighbor array + HOF pair
  // transform — q32's in-basket idiom, one exchange on src), then one
  // equi-join against the oriented edge list confirms the closing edge;
  // each triangle materializes exactly once (at its lowest-ordered
  // corner) and explodes into 3 per-corner attribution rows. The oracle
  // replays the id-ordered 3-way join — a different enumeration order of
  // the SAME triangle set, so the per-node counts hash-match exactly.
  def graph03Triangles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // SCALE-AWARE support threshold, derived from the DATA (mirrored
    // verbatim in the oracle SQL, so both sides derive the same rule):
    // the fixed ">= 2" of q32 thins the co-purchase graph as SF grows —
    // part count scales with SF while the per-order basket stays
    // constant-sized, so random pair repeats get rarer and sf0.1 kept a
    // single triangle (a hash-exact but weakly discriminating gate).
    // Above 20k baskets the graph drops to support >= 1 (all
    // co-purchase pairs), restoring a ~10^6-triangle population at
    // sf0.1; orientation still bounds every out-degree by O(sqrt(m)),
    // so the denser edge list raises work linearly in wedge count, not
    // quadratically in any hub's degree. The basket count is one slim
    // distinct-count pass (at 100 TB this is a table statistic).
    val nBaskets = graft.core.Tables.lineitem(s, d)
      .select($"l_orderkey").distinct().count()
    val minSup = if (nBaskets > 20000L) 1L else 2L
    // the corpus-scale basket → pair pipeline feeds three consumers
    // (degrees, orientation, and transitively both sides of the confirm
    // join) — persist the slim edge list so it runs ONCE; the oriented
    // list is detached eagerly (its two deg-enrichment joins shouldn't
    // replay per consumer either), and the result detaches before the
    // caches release (the gate cache contract)
    val e = Relational.pairSupport(Relational.baskets(s, d), minSup)
      .select($"a", $"b").persist()
    val deg = e.select($"a".as("n")).unionAll(e.select($"b".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg")).persist()
    try {
      val o = graph03Orient(e, deg).localCheckpoint(true)
      graph03TriCounts(o, deg)
        .localCheckpoint(true)
        .orderBy($"part")
    } finally { deg.unpersist(); e.unpersist() }
  }

  /** Degree-ordered orientation: each undirected edge directed toward its
    * higher-(degree, id) endpoint, dst carried with its ordering struct so
    * neighbor arrays sort by the same total order. Lazy — the gate layers
    * persist/checkpoint; `PlanShapeSpec` pins the lazy composition.
    */
  private[operators] def graph03Orient(e: DataFrame, deg: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.join(deg.select($"n".as("a"), $"deg".as("deg_a")), "a")
      .join(deg.select($"n".as("b"), $"deg".as("deg_b")), "b")
      .select(
        when(struct($"deg_a", $"a") < struct($"deg_b", $"b"), $"a")
          .otherwise($"b").as("src"),
        when(struct($"deg_a", $"a") < struct($"deg_b", $"b"),
            struct($"deg_b".as("d"), $"b".as("n")))
          .otherwise(struct($"deg_a".as("d"), $"a".as("n"))).as("dst"))
  }

  /** Wedge generation (in-neighborhood HOF pairs over the sorted neighbor
    * array — one src exchange, never an o⋈o self-join on src) + the
    * closing-edge confirm equi-join + per-corner attribution counts.
    */
  private[operators] def graph03TriCounts(o: DataFrame, deg: DataFrame): DataFrame = {
    import o.sparkSession.implicits._
    val wedges = o.groupBy($"src")
      .agg(array_sort(collect_list($"dst")).as("nb"))
      .select($"src", explode(expr(
        """flatten(transform(nb, (x, i) ->
          |  transform(slice(nb, i + 2, size(nb)),
          |            y -> struct(x.n AS v1, y.n AS v2))))""".stripMargin))
        .as("w"))
      .select($"src", $"w.v1".as("v1"), $"w.v2".as("v2"))
    val tri = wedges.join(
      o.select($"src".as("v1"), $"dst.n".as("v2")), Seq("v1", "v2"))
    val tcnt = tri
      .select(explode(array($"src", $"v1", $"v2")).as("n"))
      .groupBy($"n").agg(count(lit(1)).as("n_tri"))
    deg.join(tcnt, Seq("n"), "left")
      .select($"n".as("part"), $"deg",
        coalesce($"n_tri", lit(0L)).as("n_tri"))
      .orderBy($"part")
  }

  val graph03Sql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= (CASE WHEN (SELECT COUNT(DISTINCT l_orderkey)
      |                                 FROM lineitem) > 20000
      |                      THEN 1 ELSE 2 END)),
      |deg AS (
      |  SELECT n, COUNT(*) AS deg FROM (
      |    SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
      |  GROUP BY n),
      |tri AS (
      |  SELECT ab.a AS x, ab.b AS y, bc.b AS z
      |  FROM e ab JOIN e bc ON ab.b = bc.a
      |  JOIN e ac ON ab.a = ac.a AND bc.b = ac.b),
      |tcnt AS (
      |  SELECT n, COUNT(*) AS n_tri FROM (
      |    SELECT x AS n FROM tri UNION ALL
      |    SELECT y AS n FROM tri UNION ALL
      |    SELECT z AS n FROM tri)
      |  GROUP BY n)
      |SELECT deg.n AS part, CAST(deg.deg AS BIGINT) AS deg,
      |  CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri
      |FROM deg LEFT JOIN tcnt t ON deg.n = t.n
      |ORDER BY part""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph01_pagerank" -> graph01PageRank _,
    "graph02_hop_distance" -> graph02HopDistance _,
    "graph03_triangles" -> graph03Triangles _,
    "graph04_personalized_pr" -> graph04PersonalizedPr _)

  def oracles: Map[String, String] = Map(
    "graph01_pagerank" -> graph01Sql,
    "graph02_hop_distance" -> graph02Sql,
    "graph03_triangles" -> graph03Sql,
    "graph04_personalized_pr" -> graph04Sql)
}
