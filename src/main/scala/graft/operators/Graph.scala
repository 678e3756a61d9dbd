package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Barriers.BarrierOps

/** Graph analytics over bare (long, long) edge lists — the second graph
  * operator family after [[Dedup.connectedComponents]] (near-dup
  * clustering). Same scale stance: edges are 16-byte rows, every
  * iteration is one shuffle on the node id, and every round's result is
  * cut from its lineage with an eager `localCheckpoint` (the iterative-
  * plan-growth trap documented in CLAUDE.md / Dedup.scala).
  */
object Graph {

  /** PageRank (Page, Brin, Motwani, Winograd 1999 — public) by power
    * iteration with a FIXED iteration count:
    * `rank_{i+1}(v) = (1−d)/N + d · Σ_{u→v} rank_i(u)/outdeg(u)`.
    *
    * Fixed iterations rather than convergence detection is deliberate:
    * it makes the operator ORACLE-EXPRESSIBLE — the oracle unrolls the
    * same recurrence as chained SQL CTEs and must match to FP tolerance
    * (`q_pagerank`) — and matches how production runs schedule PR (a
    * known round budget, not a data-dependent loop). Dangling nodes
    * (no out-edges) contribute no mass, identically on both sides; swap
    * in redistributed-mass semantics by adding their aggregate as a
    * broadcast scalar per round if the normalized variant is wanted.
    *
    * Scale: node count enters as a 1-row aggregate broadcast into the
    * init and teleport terms — never a driver-side collect; each
    * iteration is (edges ⋈ ranks on src) → groupBy(dst) partial-agg sum
    * → left join back to nodes, i.e. two hash shuffles of (long, double)
    * rows per round; `localCheckpoint(true)` per round keeps the plan
    * flat (round N would otherwise embed round N−1's plan twice). Skew:
    * a celebrity node's in-mass sum partial-aggregates map-side, so the
    * hot reducer sees one row per upstream partition, not per in-edge.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame =
    // the unweighted walk IS the weighted one over distinct edges with
    // w = 1 (rank·1/Σ1 ≡ rank/outdeg, bit-identically — the weighted
    // groupBy(src,dst).sum over distinct unit edges yields w = 1.0 and
    // W_u = outdeg exactly); one iteration scaffold, so a future fix
    // (e.g. dangling-mass redistribution) lands in both walks
    // cast to long BEFORE distinct: inputs equal only after the cast
    // (fractional/string keys) must collapse to ONE unit edge, not
    // survive distinct and then sum to weight 2.0 downstream
    pageRankWeighted(
      edges.select(col(srcCol).cast("long").as(srcCol),
          col(dstCol).cast("long").as(dstCol)).distinct()
        .withColumn("__w", lit(1.0)),
      srcCol, dstCol, "__w", iterations, damping)

  /** WEIGHTED PageRank — [[pageRank]] with edge weights: mass flows
    * proportional to weight, `rank_{i+1}(v) = (1−d)/N + d · Σ_{u→v}
    * rank_i(u) · w_{uv} / W_u` with `W_u` the sum of `u`'s outgoing
    * weights (the natural model when edges are interaction COUNTS —
    * e.g. a co-occurrence graph where multiplicity is signal the
    * unweighted walk throws away). Identical plan economics to the
    * unweighted operator: weights ride the same 24-byte edge rows, the
    * weight-degree table replaces the out-degree table, two
    * (long, double) shuffles per round, per-round `localCheckpoint`.
    * Fixed rounds keep it oracle-expressible. Judged `q_pagerank_w`,
    * fully oracled. */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(wCol).cast("double").as("w"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .barrierCut
    // loop partitions sized to the measured edge count (r18 rule)
    graft.engine.Loops.sized(edges.sparkSession, e.count()) {
      val nodeIds = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct().barrierCut
      val nodes = nodeIds
        .crossJoin(broadcast(nodeIds.agg(count(lit(1)).as("__n"))))
      val wDeg = e.groupBy("src").agg(sum(col("w")).as("__wd"))
      var ranks = nodes.select(col("id"), (lit(1.0) / col("__n")).as("rank"))
        .barrierCut
      for (_ <- 1 to iterations) {
        val inMass = e
          .join(ranks.select(col("id").as("src"), col("rank")), "src")
          .join(wDeg, "src")
          .select(col("dst").as("id"),
            (col("rank") * col("w") / col("__wd")).as("__c"))
          .groupBy("id").agg(sum(col("__c")).as("__mass"))
        ranks = nodes
          .join(inMass, Seq("id"), "left")
          .select(col("id"),
            (lit(1 - damping) / col("__n") +
              lit(damping) * coalesce(col("__mass"), lit(0.0))).as("rank"))
          .barrierCut
      }
      ranks
    }
  }

  /** Exact triangle count by degree-ordered edge orientation (the
    * MapReduce-era standard — Suri & Vassilvitskii, WWW 2011; Cohen
    * 2009): canonicalize to undirected distinct edges, orient every edge
    * from its lower-(degree, id) endpoint — a total order, so the
    * oriented graph is acyclic and each triangle has EXACTLY one apex
    * with out-edges to both other corners — then enumerate wedges
    * (out-neighbor pairs per apex) and semi-join them against the edge
    * set. No per-triangle dedup pass needed.
    *
    * Why the orientation matters at 100 TB: wedge volume is
    * Σ outdeg(v)², and degree-ordering bounds every outdeg by O(√m) —
    * a celebrity node's millions of in-edges produce wedges at its
    * LOW-degree neighbors instead of deg² at the hub. The degree table
    * is node-scale and broadcast-joins; the wedge→edge semi-join is the
    * only large shuffle. Judged `q_triangles` against DuckDB's canonical
    * a<b<c triple-join — orientation strategy must not change the
    * count. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e = graft.engine.Caches.persisted(canon) // feeds degrees, wedges, closure
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val orient = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
    val o = graft.engine.Caches.persisted(orient) // self-joined for wedges
    val wedges = o.as("x").join(o.as("y"),
        col("x.u") === col("y.u") && col("x.w") < col("y.w"))
      .select(col("x.w").as("a"), col("y.w").as("b")) // value-canonical: a < b
    wedges.join(e, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-node local clustering coefficient — "how close is each
    * node's neighborhood to a clique" (Watts & Strogatz 1998), the
    * node-level refinement of [[triangleCount]]'s single number:
    * `lcc = 2·tri_v / (d_v·(d_v−1))` with the milli form an exact
    * integer (`tri_v·2000 div (d_v·(d_v−1))`); degree-1 nodes emit 0
    * (no possible wedge). Every triangle credits all THREE corners —
    * found once each via the same degree-ordered orientation
    * (per-center wedge volume bounded by √m), an inner join against
    * the canonical edge set instead of the count's semi-join, then one
    * explode + count per corner.
    *
    * Scale: identical posture to [[triangleCount]] — oriented wedges,
    * partial-aggregated corner counts, a degree-relation hash join.
    * Judged `q_clustering`, fully ORACLED; clique-1000, star-zero,
    * corner crediting and isolated-pair edges pinned in GraphSpec. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e = graft.engine.Caches.persisted(canon)
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val orient = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
    val o = graft.engine.Caches.persisted(orient)
    val wedges = o.as("x").join(o.as("y"),
        col("x.u") === col("y.u") && col("x.w") < col("y.w"))
      .select(col("x.u").as("u"), col("x.w").as("a"), col("y.w").as("b"))
    val tris = wedges.join(e, Seq("a", "b")) // inner: keep all 3 corners
      .select(explode(array(col("u"), col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(tris, Seq("v"), "left")
      .select(col("v"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc_milli",
        when(col("degree") >= 2L,
          expr("n_tri * 2000 div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
  }

  /** Directed reciprocity — the share of directed edges whose reverse
    * also exists (`r = |{(u,v) : (v,u) ∈ E}| / |E|`, Newman et al.
    * 2002): the one classic measure that needs the DIRECTED simple
    * graph (every other operator here canonicalizes) — mutual-follow
    * rate in a social graph, request/response symmetry in a call
    * graph. Exact integers: distinct non-loop directed edges, a
    * self-semi-join on the swapped pair, one milli division.
    *
    * Scale: edge dedup partial-aggregates; the reverse probe is one
    * key-swapped left-semi hash join of the edge set against itself.
    * Judged `q_reciprocity`, fully ORACLED; mutual-pair counting
    * (both directions count), pure-DAG zero and dedup invariance
    * pinned in GraphSpec. */
  def reciprocity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = graft.engine.Caches.persisted(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    val recip = e.join(
      e.select(col("v").as("u"), col("u").as("v")), Seq("u", "v"),
      "left_semi")
    e.agg(count(lit(1)).as("m_edges"))
      .crossJoin(broadcast(recip.agg(count(lit(1)).as("n_reciprocal"))))
      .select(col("m_edges"), col("n_reciprocal"),
        expr("n_reciprocal * 1000 div nullif(m_edges, 0L)")
          .as("reciprocity_milli"))
  }

  /** Degree assortativity — "do hubs link to hubs" (Newman 2002,
    * Phys. Rev. Lett. 89, 208701): the Pearson correlation of the
    * degrees at the two ends of an edge, over the undirected simple
    * graph. Positive = social-network-like (hubs cluster), negative =
    * internet-like (hubs fan out to leaves). Because every undirected
    * edge contributes BOTH orientations, the two endpoint-degree
    * marginals are identical, so the Pearson denominator needs no
    * square root: `r = (M·Σdudv − (Σdu)²) / (M·Σdu² − (Σdu)²)` over
    * the M = 2m directed orientations — numerator and denominator are
    * exact BIGINTs, `r_milli` exact integer division, `r` one final
    * double divide (overflow-safe while `M·Σdudv < 2^63`, i.e.
    * M·d_max² ≲ 9e18 — beyond that, sample edges first).
    *
    * Scale: canonical-edge dedup, a degree aggregate, two hash joins
    * edge←degree (a hub's degree row fans out — partial aggregation of
    * the final sums absorbs it), one global 1-row aggregate. No
    * windows at all. Judged `q_assortativity`, fully ORACLED; hand
    * star (exactly −1), path sign and regular-graph null pinned in
    * GraphSpec. */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e = graft.engine.Caches.persisted(canon)
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // both orientations of every edge: identical endpoint marginals
    val directed = e.select(col("a").as("u"), col("b").as("w"))
      .unionByName(e.select(col("b").as("u"), col("a").as("w")))
    directed
      .join(deg.select(col("v").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("v").as("w"), col("d").as("dw")), "w")
      .agg(count(lit(1)).as("__M"), sum(col("du")).as("__sx"),
        sum(col("du") * col("du")).as("__sxx"),
        sum(col("du") * col("dw")).as("__sxy"))
      .select((col("__M") / 2).cast("long").as("m_edges"),
        expr("__M * __sxy - __sx * __sx").as("num"),
        expr("__M * __sxx - __sx * __sx").as("den"))
      .select(col("m_edges"), col("num"), col("den"),
        // toward-zero milli on BOTH engines: Spark div truncates but
        // DuckDB // floors, so negative numerators go through abs
        expr("cast(sign(num) as bigint) * (abs(num) * 1000" +
          " div nullif(den, 0L))").as("r_milli"),
        when(col("den") > 0L,
          col("num").cast("double") / col("den").cast("double"))
          .otherwise(lit(null).cast("double")).as("assortativity"))
  }

  /** Link-prediction features — the classic "who will connect next"
    * scores (Liben-Nowell & Kleinberg 2003) for every node pair at
    * distance ≤ 2 in the undirected simple graph: exact
    * `common_neighbors`, the degree pair, preferential attachment
    * `pa = da·db`, Jaccard neighborhood overlap in exact milli
    * (`cn·1000 div (da + db − cn)`) and an `is_edge` flag so the same
    * relation serves as training labels (existing edges) and
    * candidates (cn > 0 non-edges). All-integer — no Adamic-Adar here
    * by design: its Σ1/ln(d) term is float-order-dependent across
    * engines (the judged-double rule); pa and jaccard_milli carry the
    * same ranking signal exactly.
    *
    * Scale: candidate pairs come from wedge enumeration — per center
    * node O(d²), so hubs above `maxCenterDegree` are EXCLUDED as
    * centers (their pairs still form through lower-degree shared
    * neighbors; the cap is the standard mitigation, and capped centers
    * are a deliberate, documented approximation — set it above your
    * d_max for exact results). Pairs partial-aggregate to (pair, cn)
    * before degrees attach via two hash joins; `is_edge` is one
    * left-semi-shaped left join on the canonical edge set. Judged
    * `q_link_pred`, fully ORACLED; hand wedge/square features, the
    * cap's exclusion semantics and edge labeling pinned in GraphSpec. */
  def linkFeatures(edges: DataFrame, srcCol: String, dstCol: String,
      maxCenterDegree: Int = 10000): DataFrame = {
    require(maxCenterDegree >= 1,
      s"maxCenterDegree must be >= 1: $maxCenterDegree")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e = graft.engine.Caches.persisted(canon)
    val deg = graft.engine.Caches.persisted(
      e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("d")))
    // adjacency with the center's degree, hub centers excluded
    val adj = e.select(col("a").as("c"), col("b").as("n"))
      .unionByName(e.select(col("b").as("c"), col("a").as("n")))
      .join(deg.select(col("v").as("c"), col("d").as("__dc")), "c")
      .filter(col("__dc") <= maxCenterDegree)
      .select(col("c"), col("n"))
    val o = graft.engine.Caches.persisted(adj)
    val cn = o.as("x").join(o.as("y"),
        col("x.c") === col("y.c") && col("x.n") < col("y.n"))
      .select(col("x.n").as("a"), col("y.n").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common_neighbors"))
    cn
      .join(deg.select(col("v").as("a"), col("d").as("deg_a")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("deg_b")), "b")
      .join(e.withColumn("__e", lit(1)), Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("common_neighbors"),
        col("deg_a"), col("deg_b"),
        (col("deg_a") * col("deg_b")).as("pa"),
        expr("common_neighbors * 1000" +
          " div (deg_a + deg_b - common_neighbors)").as("jaccard_milli"),
        (col("__e") === 1).cast("boolean").as("is_edge"))
      .na.fill(false, Seq("is_edge"))
  }

  /** Multi-source BFS: minimum hop count from any seed to every node
    * reachable within `maxHops`, over DIRECTED edges. Classic frontier
    * expansion — per round, the frontier joins the edge set on src,
    * anti-joins the visited set (a node keeps its FIRST (= minimum)
    * depth), and the loop stops early when a frontier empties. The
    * bounded depth is deliberate, as with [[pageRank]]'s fixed rounds:
    * it makes the operator oracle-expressible (a depth-capped recursive
    * CTE) and matches production use (k-hop neighborhoods, blast-radius
    * queries), where unbounded reachability is
    * [[graft.operators.Dedup.connectedComponents]]'s job.
    *
    * Scale: state is (long id, int hops) rows; each round costs one
    * shuffle of the frontier against the persisted edge relation plus a
    * node-scale anti-join, with `localCheckpoint(true)` cutting lineage
    * per round (the iterative-plan-growth trap). Frontier dedup before
    * the anti-join keeps a dense round's fan-in from multiplying rows.
    * Skew: a hub node's fan-out partial-aggregates in the distinct;
    * total work is O(edges × rounds) worst case, the BFS floor. Judged
    * `q_bfs`, fully oracled. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = graft.engine.Caches.persisted(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct())
    // loop partitions sized to the measured edge count (r18: the
    // cycleNodes few-partition rule, size-derived instead of constant)
    graft.engine.Loops.sized(edges.sparkSession, e.count()) {
      // ONE action per hop (r18): next materializes inside visited's
      // cut (it is referenced only by the union), the frontier
      // re-derives from the cut frame by level, and convergence reads
      // off the cut's OWN row count (cutCounted) — "no new nodes" ⟺
      // the count stopped growing — instead of a per-round isEmpty job.
      var (visited, nVis) = graft.engine.Barriers.cutCounted(
        seeds.select(col(seedCol).cast("long").as("id"))
          .distinct().withColumn("hops", lit(0)))
      var frontier = visited.select("id")
      var h = 1
      var growing = nVis > 0
      while (h <= maxHops && growing) {
        val next = frontier.join(e, col("id") === col("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited.select("id"), Seq("id"), "left_anti")
        val (v2, n2) = graft.engine.Barriers.cutCounted(
          visited.union(next.withColumn("hops", lit(h))))
        growing = n2 > nVis
        visited = v2
        nVis = n2
        frontier = visited.filter(col("hops") === h).select("id")
        h += 1
      }
      visited
    }
  }

  /** Rich-club coefficient ladder (Zhou & Mondragón 2004) — do the
    * hubs club together? For each degree threshold k, `R(k) = 2·E_k /
    * (N_k(N_k−1))`: the realized edge density among the N_k nodes of
    * degree > k. Rising R(k) = an elite core (interlocking hubs);
    * flat/falling = hubs connect outward (the router-network shape).
    * Everything reduces to TWO config-scale histograms — nodes by
    * degree and edges by min(endpoint degree) — so the whole ladder is
    * exact-integer suffix sums over them: `rc_milli = 2·E_k·1000 div
    * (N_k(N_k−1))`, N_k < 2 fenced NULL. Undirected: edges
    * canonicalize + dedupe, self-loops drop.
    *
    * Scale: one edge dedup, two degree joins, then histogram
    * aggregates; the threshold ladder is a literal crossJoin. Judged
    * `q_rich_club` (the affine-map graph over thresholds 0..4), fully
    * ORACLED; the clique-core hand graph (R rises to 1000), the star
    * (no club above the leaves' degree), empty-club fence and
    * duplicate-edge collapse pinned in GraphSpec. */
  def richClub(edges: DataFrame, srcCol: String, dstCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 0), s"thresholds >= 0: $ks")
    val session = edges.sparkSession
    import session.implicits._
    val e = graft.engine.Caches.persisted(
      edges.select(col(srcCol).cast("long").as("u"),
          col(dstCol).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("a"),
          least(col("u"), col("v")).as("b"))
        .distinct())
    val deg = graft.engine.Caches.persisted(
      e.select(col("a").as("id")).unionByName(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg")))
    val degHist = deg.groupBy("deg").agg(count(lit(1)).as("__nn"))
    val edgeHist = e
      .join(deg.select(col("id").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("__db")), Seq("b"))
      .select(least(col("__da"), col("__db")).as("__md"))
      .groupBy("__md").agg(count(lit(1)).as("__ne"))
    val kdf = ks.distinct.sorted.toDF("k")
    val nk = kdf.join(degHist, col("deg") > col("k"), "left")
      .groupBy("k").agg(coalesce(sum(col("__nn")), lit(0L)).as("n_rich"))
    val ek = kdf.join(edgeHist, col("__md") > col("k"), "left")
      .groupBy("k").agg(coalesce(sum(col("__ne")), lit(0L)).as("e_rich"))
    nk.join(ek, Seq("k"))
      .select(col("k"), col("n_rich"), col("e_rich"),
        when(col("n_rich") >= 2,
          expr("2 * e_rich * 1000 div (n_rich * (n_rich - 1))"))
          .as("rc_milli"))
  }

  /** Graph diameter lower bound via the classic DOUBLE BFS SWEEP
    * (Magnien/Latapy/Habib): sweep 1 runs [[bfsHops]] from the min-id
    * node and takes the farthest node reached (ties to the smallest
    * id); sweep 2 runs from that peripheral node — its eccentricity is
    * the double-sweep diameter estimate, exact on trees and within a
    * small factor on real-world graphs (the full diameter is all-pairs
    * — never computed distributed). Undirected: edges symmetrize and
    * self-loops drop. On a DISCONNECTED graph the sweep covers the
    * min-id node's component only (n_reached says how much), the
    * per-component convention [[Dedup.connectedComponents]] callers
    * compose with.
    *
    * Scale: two frontier BFS passes over bare (long, long) edges — the
    * bfsHops posture (barrierCut rounds); the two argmax readouts are
    * TakeOrdered(1). Judged `q_diameter`, fully ORACLED (recursive-CTE
    * BFS replay of both sweeps); path-graph exactness, the star case,
    * disconnected confinement and the tie-to-smallest-id sweep pinned
    * in GraphSpec. */
  def diameterSweep(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 64): DataFrame = {
    val session = edges.sparkSession
    import session.implicits._
    val und = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val sym = graft.engine.Caches.persisted(
      und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
        .distinct())
    val starts = sym.agg(min(col("u")).as("s"))
      .filter(col("s").isNotNull).as[Long].collect()
    if (starts.isEmpty)
      session.range(0).select(col("id").as("start"),
        col("id").as("peripheral"), col("id").cast("int").as("ecc_start"),
        col("id").as("far_node"), col("id").cast("int").as("diameter_lb"),
        col("id").as("n_reached"))
    else {
      def sweep(seed: Long): (Long, Int, Long) = {
        val vis = graft.engine.Caches.persisted(
          bfsHops(sym, "u", "v", Seq(seed).toDF("id"), "id", maxHops))
        val far = vis.orderBy(col("hops").desc, col("id")).limit(1)
          .select(col("id"), col("hops"))
          .as[(Long, Int)].collect().head
        (far._1, far._2, vis.count())
      }
      val start = starts.head
      val (p1, ecc1, n) = sweep(start)
      val (p2, ecc2, _) = sweep(p1)
      Seq((start, p1, ecc1, p2, ecc2, n))
        .toDF("start", "peripheral", "ecc_start", "far_node",
          "diameter_lb", "n_reached")
    }
  }

  /** Longest-path layering of a DAG (the ASAP schedule / critical-path
    * stage assignment; Kahn-style level numbering): `layer(v)` = length
    * of the longest path ending at v — 0 for sources, otherwise
    * `1 + max` over predecessors. The planning primitive behind stage
    * scheduling, dependency-ordered backfills and BOM depth audits;
    * [[bfsHops]]'s max-dual (shortest from seeds vs longest from
    * sources).
    *
    * Semi-naive iteration (the q_cycles rule): only nodes whose layer
    * IMPROVED last round propagate — each round is a frontier ⋈ edges
    * hash join, a per-node partial-agg max, and a filter against the
    * current labels; `barrierCut` per round keeps the plan flat and
    * materialized. Rounds are bounded by the DAG depth; exceeding
    * `maxDepth` rounds means a cycle (layers would grow forever) and
    * throws rather than spinning — [[cycleNodes]] is the diagnostic.
    * Labels are bare (long, int) rows; edges partial-agg dedup before
    * the loop. Judged `q_topo_layers` (orders-residue DAG with strictly
    * increasing edges; the oracle replays max-propagation as a
    * recursive CTE), fully ORACLED; hand DAG, diamond reconvergence,
    * cycle reject pinned in GraphSpec. */
  def topoLayers(edges: DataFrame, srcCol: String, dstCol: String,
      maxDepth: Int = 100): DataFrame = {
    val e = graft.engine.Caches.persisted(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct())
    // NOT Loops.sized (r18, measured): layer frames are node-scale and
    // every round rewrites them (q_topo_layers 1.7 -> 2.4 s at 4
    // partitions) — compute-bound like hierarchyRollup.
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var layers = nodes.withColumn("layer", lit(0)).barrierCut
    var frontier = layers
    var rounds = 0
    var changed = true
    while (changed) {
      rounds += 1
      require(rounds <= maxDepth,
        s"topoLayers: no convergence after $maxDepth rounds — " +
          "cycle in the edge set or depth > maxDepth")
      val cand = frontier.join(e, col("id") === col("src"))
        .select(col("dst").as("id"), (col("layer") + 1).as("layer"))
        .groupBy("id").agg(max(col("layer")).as("layer"))
      // convergence off the cut's own count (cutCounted, r18): no
      // separate isEmpty job per round
      val (improved, nImp) = graft.engine.Barriers.cutCounted(cand.as("c")
        .join(layers.select(col("id"), col("layer").as("old")).as("l"), "id")
        .filter(col("c.layer") > col("old"))
        .select(col("id"), col("c.layer").as("layer")))
      changed = nImp > 0
      if (changed) {
        layers = layers.as("l")
          .join(improved.select(col("id"), col("layer").as("upd")).as("i"),
            Seq("id"), "left")
          .select(col("id"),
            greatest(col("l.layer"), coalesce(col("upd"), lit(0)))
              .as("layer"))
          .barrierCut
        frontier = improved
      }
    }
    layers
  }

  /** Synchronous label propagation (Raghavan, Albert, Kumara 2007 —
    * public): community detection, the graph family's complement to
    * [[Dedup.connectedComponents]] — CC answers "reachable at all" and
    * merges two dense groups joined by ONE stray edge, LPA answers
    * "densely connected" and keeps them apart (the property that matters
    * when near-dup clusters are bridged by a boilerplate false positive;
    * divergence pinned in GraphSpec on a bridged-triangles fixture).
    *
    * Every node starts labeled with its own id; each round every node
    * adopts the most frequent label among its NEIGHBORS (undirected),
    * ties to the smallest label, isolated nodes keep their label. A
    * FIXED round budget rather than convergence detection, for the same
    * two reasons as [[pageRank]]: deterministic judged output and
    * production round scheduling. Synchronous LPA can 2-cycle on
    * bipartite-ish structures (the classic caveat) — with an EVEN budget
    * that denegerates deterministically to the pre-cycle labels, which
    * the oracle encodes.
    *
    * Scale: labels are (long, long) rows; a round is edges ⋈ labels on
    * dst (hash join), a (node, label) partial-aggregated count, and a
    * per-node argmax via `max(struct(cnt, -label))` — ALL partial-agg
    * shapes, no windows; `barrierCut` per round keeps the plan flat.
    * Skew: a hub's neighbor-label multiset partial-aggregates map-side,
    * one row per (node, distinct label) per upstream partition. Judged
    * `q_communities` over mod-blocks of `orders` keys whose converged
    * label is pure arithmetic; bridged-community divergence from CC in
    * GraphSpec. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations % 2 == 0,
      "iterations must be positive and EVEN (sync-LPA 2-cycles resolve " +
        "deterministically only on an even budget)")
    val fwd = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val und = graft.engine.Caches.persisted(
      fwd.union(fwd.select(col("b").as("a"), col("a").as("b"))).distinct())
    // loop partitions sized to the measured edge count (r18 rule)
    graft.engine.Loops.sized(edges.sparkSession, und.count()) {
      var labels = und.select(col("a").as("id")).distinct()
        .withColumn("lbl", col("id")).barrierCut
      for (_ <- 1 to iterations)
        labels = lpaRound(und, labels).barrierCut
      labels.select(col("id"), col("lbl").as("label"))
    }
  }

  /** Newman modularity of a labeled partition (Newman & Girvan 2004;
    * Newman 2004 — public): the standard quality score for community
    * assignments — `Q = Σ_c [e_c/m − (d_c/2m)²]`, the within-community
    * edge fraction minus what a degree-preserving random rewiring would
    * put there. This is the missing JUDGE for the graph family's own
    * outputs: [[labelPropagation]] and [[Dedup.connectedComponents]]
    * produce labelings, and nothing measured their quality until now.
    *
    * Exact-integer discipline: per community
    * `dq_micro = sign(num)·(|num|·10⁶ div 4m²)` with
    * `num = 4m·e_c − d_c²` — numerator and divisor ride DECIMAL(38,0)
    * (4m·e_c and d_c² both hit 4m², BIGINT-overflow past m ≈ 1.5e9;
    * the q_gini rule), signed because a community wired mostly outward
    * goes negative (the signed div rule — Spark `div` truncates, DuckDB
    * `//` floors, identical only via sign·abs). The global score is the
    * SUM of the per-community micro-truncated terms (truncate-then-sum,
    * the chi2 pattern — a defined contract both engines replay
    * token-identically), repeated on every row as `q_micro`.
    *
    * Semantics: the graph canonicalizes to UNDIRECTED DISTINCT edges
    * (a<b, self-loops dropped — a self-loop is neither a within- nor a
    * cross-community edge under the e_c/m decomposition used here);
    * nodes are those incident to an edge; a node missing from `labels`
    * falls back to its own id as a singleton community (the
    * LPA/CC coalesce convention). Σ_c d_c = 2m by construction.
    *
    * Scale: one distinct-edge canonicalization, a node-scale degree
    * aggregate, two label joins on bare longs, and community-scale
    * output — no windows, no pair enumeration; m enters as a broadcast
    * 1-row aggregate. Judged `q_modularity` (mod-5 order-key cliques
    * with every-7th-block bridges, labels = the block id — closed-form
    * arithmetic on both sides), fully ORACLED; hand two-triangle-bridge
    * values, the trivial-partition Q = 0 identity, negative singleton
    * terms and the unlabeled-node fallback pinned in GraphSpec. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val canon = graft.engine.Caches.persisted(
      edges.select(
          least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
          greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    val lbl = labels.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("lbl"))
    val nodes = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id"))).distinct()
    val labeled = graft.engine.Caches.persisted(
      nodes.join(lbl, Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl")))
    val m = broadcast(canon.agg(count(lit(1)).as("__m")))
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("__d"))
    val dSum = labeled.join(deg, Seq("id"), "left")
      .groupBy("lbl")
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("__d"), lit(0L))).as("d_c"))
    val eIn = canon
      .join(labeled.select(col("id").as("a"), col("lbl").as("__la")), "a")
      .join(labeled.select(col("id").as("b"), col("lbl").as("__lb")), "b")
      .filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("lbl")).agg(count(lit(1)).as("e_in"))
    // barrierCut, not persist: the frame feeds BOTH the output rows and
    // its own 1-row global sum via the crossJoin below. A persist caches
    // the DATA but the crossJoin still embeds this whole join tree TWICE
    // in the logical plan, and Catalyst re-optimizes that doubled tree on
    // every AQE stage materialization — measured as multi-second DRIVER
    // GAPS between jobs in the r18 louvain probe. The cut flattens the
    // plan to a leaf; downstream planning is then O(1) in this tree.
    val per = (
      dSum.join(eIn, Seq("lbl"), "left")
      .crossJoin(m)
      .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
      .withColumn("__num", expr(
        """cast(4 as decimal(38,0)) * __m * e_in -
           cast(d_c as decimal(38,0)) * d_c"""))
      .select(col("lbl").as("label"), col("n_nodes"), col("e_in"),
        col("d_c"),
        expr("""cast(sign(__num) as bigint) *
          cast((abs(__num) * 1000000)
            div (cast(4 as decimal(38,0)) * __m * __m) as bigint)""")
          .as("dq_micro"))).barrierCut
    per.crossJoin(broadcast(per.agg(sum(col("dq_micro")).as("q_micro"))))
  }

  /** One Louvain LOCAL-MOVE sweep (Blondel et al. 2008 — public): every
    * node simultaneously evaluates moving to a neighbor's community and
    * takes the best strictly-ordered gain — the refinement step that
    * turns a labeling ([[labelPropagation]] output, CC labels, or the
    * singleton start) into a better partition, JUDGED by
    * [[modularity]] itself (the r16 row finally made partition quality
    * measurable; this operator is its first consumer). One synchronous
    * sweep, not the sequential fixpoint: deterministic, oracle-
    * replayable, and the standard distributed formulation (sequential
    * Louvain's node order is inherently serial).
    *
    * The move rule needs NO division: for candidate community `c` of
    * node `v` (its neighbors' communities plus its own),
    * `score(c) = 2m·k_{v,c} − d_v·(Σtot(c) − [c = own]·d_v)` orders
    * exactly like the Newman ΔQ (both sides of the comparison share
    * the 1/2m² factor) — all exact integers through DECIMAL(38,0)
    * (the q_gini rule), argmax per node via ONE partial-agg
    * `max(struct(score, −label))` so ties go to the SMALLEST label
    * (window-free, the TopKAgg posture). Graph canonicalization is
    * [[modularity]]'s verbatim (undirected distinct, self-loops
    * dropped, unlabeled nodes fall back to their id).
    *
    * Scale: degree + community-total partial aggs, the neighbor-label
    * join on bare longs (≤ 2m rows), candidate rows ≤ 2m + |V| — no
    * windows, no pair enumeration, m broadcast. Judged `q_louvain`
    * (the bridged-clique fixture from SINGLETON labels — the full
    * sweep replayed in SQL, with before/after `q_micro` carried on
    * every row), fully ORACLED; strict Q improvement, the stay-put
    * case on an already-optimal partition and the tie rule pinned in
    * GraphSpec. */
  def louvainMove(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val canon = graft.engine.Caches.persisted(
      edges.select(
          least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
          greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    val und = canon.union(canon.select(col("b").as("a"), col("a").as("b")))
    val nodes = und.select(col("a").as("id")).distinct()
    val lbl = labels.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("lbl"))
    val labeled = graft.engine.Caches.persisted(
      nodes.join(lbl, Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl")))
    val m = broadcast(canon.agg(count(lit(1)).as("__m")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("__d"))
    val tot = labeled.join(deg, Seq("id"))
      .groupBy(col("lbl").as("c")).agg(sum(col("__d")).as("__tot"))
    val k = und
      .join(labeled.select(col("id").as("b"), col("lbl").as("c")), "b")
      .groupBy(col("a").as("id"), col("c")).agg(count(lit(1)).as("__k"))
    // own community is always a candidate (k 0 when no neighbor shares
    // it; max() recovers the true k when one does)
    val cand = k.unionByName(
        labeled.select(col("id"), col("lbl").as("c"), lit(0L).as("__k")))
      .groupBy(col("id"), col("c")).agg(max(col("__k")).as("__k"))
    cand.join(labeled, Seq("id")).join(deg, Seq("id"))
      .join(tot, Seq("c")).crossJoin(m)
      .withColumn("__score", expr(
        """cast(2 as decimal(38,0)) * __m * __k -
           cast(__d as decimal(38,0)) *
             (__tot - if(c = lbl, __d, cast(0 as bigint)))"""))
      .groupBy(col("id"))
      .agg(max(struct(col("__score").as("s"), (-col("c")).as("nc"),
        col("c").as("c"))).as("__b"))
      .select(col("id"), col("__b.c").as("label"))
  }

  /** Root-to-leaf path flattening over a parent-pointer forest — the
    * conversation-tree linearization an SFT pipeline runs before
    * [[graft.functions.TextOps.sftAssemble]] (branched chats — edits,
    * regenerations, A/B continuations — become one training sequence
    * per LEAF, each carrying its full ancestry): every leaf emits
    * `(leaf_id, depth, path, truncated)` with `path` the
    * `sep`-joined texts from its root down. A node whose parent is
    * NULL or ABSENT from the relation is a root (upstream filtering
    * creates dangling parents; silently dropping those subtrees would
    * lose documents). Paths still open at `maxDepth` emit with
    * `truncated = true` rather than disappearing. Nodes trapped in a
    * parent-pointer CYCLE (corrupt data — a→b→a — no ancestor chain
    * reaches a root, so the frontier never visits them) emit one
    * orphan row each with `depth = 0`, `path` = own text and
    * `truncated = true` instead of vanishing: depth 0 is the orphan
    * sentinel (real paths start at depth 1). Descendants of a
    * maxDepth-truncated path are NOT orphans — the truncated row
    * already flags that loss — so reachability is completed below the
    * cut frontier (id-only semi-naive descent, new ids only, so a
    * cycle cannot loop it) before the orphan anti-join.
    *
    * Scale: hop-bounded frontier iteration (the [[bfsHops]] economics
    * — one hash join per level on bare longs + the accumulated path
    * string, `barrierCut` per round, union children re-aliased to
    * mint fresh exprIds — the cycleNodes union rule); depth is
    * config-bounded by `maxDepth`, and each level's frontier only
    * carries OPEN paths. Judged `q_conv_paths` (a blocks-of-8
    * branched forest over dense doc ids — the oracle walks the same
    * forest with a recursive CTE), fully ORACLED; branch coverage,
    * dangling-parent roots, truncation flag and single-node trees
    * pinned in GraphSpec. */
  def rootPaths(nodes: DataFrame, idCol: String, parentCol: String,
      textCol: String, maxDepth: Int = 32,
      sep: String = " | "): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 128,
      s"maxDepth must be in 1..128: $maxDepth")
    val t = graft.engine.Caches.persisted(
      nodes.select(col(idCol).cast("long").as("id"),
        col(parentCol).cast("long").as("parent"),
        col(textCol).cast("string").as("txt")))
    val ids = t.select(col("id").as("parent")).distinct()
    val parentsOf = graft.engine.Caches.persisted(
      t.select(col("parent").as("id")).filter(col("id").isNotNull)
        .distinct())
    def fresh(df: DataFrame): DataFrame =
      df.select(col("id").as("id"), col("depth").as("depth"),
        col("path").as("path"))
    def freshIds(df: DataFrame): DataFrame = df.select(col("id").as("id"))
    // loop partitions sized to the measured node count (r18 rule)
    graft.engine.Loops.sized(nodes.sparkSession, t.count()) {
    val roots = t.join(ids, Seq("parent"), "left_anti")
      .select(col("id"), lit(1).as("depth"), col("txt").as("path"))
      .barrierCut
    var out = fresh(roots.join(parentsOf, Seq("id"), "left_anti"))
      .withColumn("truncated", lit(false))
    // convergence off each cut's own count (cutCounted, r18): no
    // separate isEmpty job per round in either loop
    var (frontier, nFrontier) = graft.engine.Barriers.cutCounted(
      roots.join(parentsOf, Seq("id"), "left_semi"))
    var reached = freshIds(roots).barrierCut
    var depth = 1
    while (depth < maxDepth && nFrontier > 0) {
      val next = t
        .join(frontier.select(col("id").as("parent"), col("depth"),
          col("path")), "parent")
        .select(col("id"), (col("depth") + 1).as("depth"),
          concat(col("path"), lit(sep), col("txt")).as("path"))
        .barrierCut
      out = out.unionByName(
        fresh(next.join(parentsOf, Seq("id"), "left_anti"))
          .withColumn("truncated", lit(false)))
      // union of already-cut level leaves — shallow lineage, no extra
      // barrier needed (the betweenness accumulator rule, r18)
      reached = reached.unionByName(freshIds(next))
      val fc = graft.engine.Barriers.cutCounted(
        next.join(parentsOf, Seq("id"), "left_semi"))
      frontier = fc._1
      nFrontier = fc._2
      depth += 1
    }
    out = out.unionByName(
      fresh(frontier).withColumn("truncated", lit(true)))
    // Complete reachability below the maxDepth cut so descendants of a
    // truncated path don't read as orphans; new-ids-only keeps a cycle
    // from ever re-feeding the descent. The frontier's count is already
    // known from the loop above — the projection preserves it.
    var f2 = freshIds(frontier)
    var nF2 = nFrontier
    while (nF2 > 0) {
      val (nxt, nNxt) = graft.engine.Barriers.cutCounted(
        t.join(f2.select(col("id").as("parent")), "parent")
          .select(col("id"))
          .join(reached, Seq("id"), "left_anti").distinct())
      reached = reached.unionByName(freshIds(nxt))
      f2 = freshIds(nxt)
      nF2 = nNxt
    }
    val orphans = t.join(reached, Seq("id"), "left_anti")
      .select(col("id"), lit(0).as("depth"), col("txt").as("path"))
    out = out.unionByName(orphans.withColumn("truncated", lit(true)))
    out.select(col("id").as("leaf_id"), col("depth"), col("path"),
      col("truncated"))
    } // Loops.sized
  }

  /** Eigenvector centrality by fixed-round power iteration (Bonacich
    * 1987 — public): the principal-eigenvector score `x ∝ A·x` that
    * completes the centrality family (degree / [[pageRank]] /
    * [[personalizedPageRank]] / [[hits]] / [[coreness]]) — PageRank
    * minus the teleport: influence flows along edges undamped, so a
    * node is central when its NEIGHBORS are central, with no floor for
    * isolated regions. Each round multiplies by the adjacency matrix
    * and L1-normalizes (scores sum to 1 — unnormalized iteration
    * diverges at the spectral-radius rate); fixed rounds for
    * oracle-expressibility, exactly the PR-family rationale. The graph
    * canonicalizes to undirected distinct edges, self-loops dropped.
    * Caveat inherited from the mathematics: on a BIPARTITE graph the
    * power iteration oscillates between the two classes rather than
    * converging (pinned in GraphSpec) — callers on bipartite-ish
    * graphs want [[hits]], which models the two roles explicitly.
    *
    * Scale: the [[pageRank]] economics exactly — each round is one
    * (long, double) hash join + partial-agg sum plus a broadcast 1-row
    * normalizer, `barrierCut` per round. Judged `q_eigen` (the
    * part→supplier graph, 2 rounds, micro-quantized scores — the
    * q_hits float-sort-key rule), fully ORACLED via the unrolled
    * recurrence; triangle-with-pendant hand values, 4-clique
    * uniformity, L1 invariant and bipartite oscillation pinned in
    * GraphSpec. */
  def eigenvectorCentrality(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int): DataFrame = {
    require(iterations >= 1)
    val fwd = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = graft.engine.Caches.persisted(
      fwd.union(fwd.select(col("b").as("a"), col("a").as("b"))).distinct())
    // loop partitions sized to the measured edge count (r18 rule)
    graft.engine.Loops.sized(edges.sparkSession, und.count()) {
    val nodes = und.select(col("a").as("id")).distinct().barrierCut
    val n = broadcast(nodes.agg(count(lit(1)).as("__n")))
    var x = nodes.crossJoin(n)
      .select(col("id"), (lit(1.0) / col("__n")).as("score")).barrierCut
    for (_ <- 1 to iterations) {
      val raw = und.join(x.select(col("id").as("a"), col("score")), "a")
        .groupBy(col("b").as("id")).agg(sum(col("score")).as("raw"))
      val s = broadcast(raw.agg(sum(col("raw")).as("__s")))
      x = nodes.join(raw, Seq("id"), "left").crossJoin(s)
        .select(col("id"),
          when(col("__s") > 0,
            coalesce(col("raw"), lit(0.0)) / col("__s"))
            .otherwise(lit(0.0)).as("score"))
        .barrierCut
    }
    x
    } // Loops.sized
  }

  /** k-source betweenness centrality (Brandes 2001; k-source sampling
    * form Brandes & Pich 2007 — both public): the PATH-based member
    * the centrality family lacked (degree / [[pageRank]] / [[hits]] /
    * [[katzCentrality]] / [[eigenvectorCentrality]] / [[coreness]] all
    * score by neighborhoods; betweenness scores by lying ON shortest
    * paths — the broker role). Exact all-sources betweenness is
    * O(V·E), unrunnable at data scale, so this is the standard scale
    * form: Brandes dependency accumulation from the `k`
    * smallest-id nodes (deterministic pick — rerunnable, and with
    * k ≥ |V| it IS exact: each node's score = the number of ordered
    * source→target shortest paths through it, weighted by path
    * multiplicity — 2× the classic undirected betweenness).
    *
    * Two hop-bounded phases over the undirected distinct graph, both
    * keyed (source, node) so all k sources traverse SIMULTANEOUSLY:
    * forward BFS accumulates shortest-path counts σ (partial-agg sum
    * per level, never per-path enumeration); backward from the deepest
    * level, `δ(v) = Σ_{w ∈ succ(v)} σ_v/σ_w · (1 + δ(w))` — one join
    * per level against the level below. Every level `barrierCut`s (the
    * bfsHops economics); frontier rows ≤ k·|V| total. Dependency
    * fractions are exact binary rationals on the judged fixture, so
    * micro-quantized sums hash across engines (the q_hits rule).
    * Judged `q_betweenness` (capped path + diamond fixture, all nodes
    * sources — closed-form 2·i·(n−1−i) on the path, the diamond's
    * every node exactly 1); path/star/diamond hand values and the
    * k < |V| subset pinned in GraphSpec. */
  def betweenness(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxDepth: Int = 16): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in 1..4096: $k")
    require(maxDepth >= 1 && maxDepth <= 64,
      s"maxDepth must be in 1..64: $maxDepth")
    // per-level FIXED cost (checkpoint + shuffle rounds) dominates the
    // hop loops — plan them at few partitions (the cycleNodes rule,
    // size-derived since r18), restored after
    val session = edges.sparkSession
    val fwd = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = graft.engine.Caches.persisted(
      fwd.union(fwd.select(col("b").as("a"), col("a").as("b"))).distinct())
    val prevParts = session.conf.get("spark.sql.shuffle.partitions")
    session.conf.set("spark.sql.shuffle.partitions",
      graft.engine.Loops.partitionsFor(session, und.count()).toString)
    try {
    val nodes = und.select(col("a").as("id")).distinct().barrierCut
    val sources = nodes.orderBy(col("id")).limit(k)
      .select(col("id").as("s")).barrierCut
    def freshL(df: DataFrame): DataFrame = df.select(col("s").as("s"),
      col("v").as("v"), col("sigma").as("sigma"))
    // forward: per-level (source, node, sigma) — σ sums over parents
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val (f0, nF0) = graft.engine.Barriers.cutCounted(
      sources.select(col("s"), col("s").as("v"), lit(1L).as("sigma")))
    var frontier = f0
    var visited = frontier.select(col("s"), col("v")).barrierCut
    levels += frontier
    var d = 0
    var done = nF0 == 0L
    while (d < maxDepth && !done) {
      // convergence off the cut's own count (cutCounted, r18): no
      // separate isEmpty job per level
      val (nxt, nNxt) = graft.engine.Barriers.cutCounted(
        frontier.join(und, col("v") === col("a"))
          .select(col("s"), col("b").as("v"), col("sigma"))
          .join(visited, Seq("s", "v"), "left_anti")
          .groupBy(col("s"), col("v")).agg(sum(col("sigma")).as("sigma")))
      if (nNxt == 0L) done = true
      else {
        // a union of already-cut level leaves — shallow lineage, no
        // extra barrier needed (each barrierCut is a scheduling round)
        visited = visited.unionByName(nxt.select(col("s"), col("v")))
        levels += nxt
        frontier = nxt
        d += 1
      }
    }
    // silent truncation understates scores with no signal — warn like
    // kTruss's round cap (r17 ADVICE)
    if (!done)
      System.err.println(s"[graft] betweenness: depth cap $maxDepth " +
        "reached with the frontier still open — scores may be " +
        "understated for pairs beyond the cap; raise maxDepth")
    // backward: dependency accumulation, deepest level first (δ = 0
    // there — no successors); each level joins only the one below it
    var below = freshL(levels.last).withColumn("delta", lit(0.0))
      .barrierCut
    var acc = below.select(col("s"), col("v"), col("delta"))
    for (i <- levels.size - 2 to 0 by -1) {
      val up = freshL(levels(i))
      val contrib = up
        .join(und.select(col("a").as("v"), col("b").as("w")), "v")
        .join(below.select(col("s"), col("v").as("w"),
          col("sigma").as("__sw"), col("delta").as("__dw")), Seq("s", "w"))
        .groupBy(col("s"), col("v"))
        .agg(sum(col("sigma").cast("double") / col("__sw")
          * (lit(1.0) + col("__dw"))).as("delta"))
      below = up.join(contrib, Seq("s", "v"), "left")
        .select(col("s"), col("v"), col("sigma"),
          coalesce(col("delta"), lit(0.0)).as("delta"))
        .barrierCut
      // acc unions already-cut level frames — no extra barrier needed
      acc = acc.unionByName(below.select(col("s"), col("v"), col("delta")))
    }
    nodes.join(
      acc.filter(col("v") =!= col("s"))
        .groupBy(col("v").as("id")).agg(sum(col("delta")).as("bc")),
      Seq("id"), "left")
      .select(col("id"), coalesce(col("bc"), lit(0.0)).as("bc"))
      .barrierCut // materialize under the loop's partition count
    } finally session.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** k-source harmonic centrality (Marchiori & Latora 2000; Boldi &
    * Vigna 2014 axiomatization — public): `H(v) = Σ_{s≠v} 1/d(s,v)`,
    * the closeness variant that is WELL-DEFINED on disconnected graphs
    * (unreachable pairs contribute 0, no infinite-distance blowup) —
    * the distance-based sibling of [[betweenness]] on the same k-source
    * machinery (exact when k ≥ |V|, the Brandes–Pich sampling form
    * otherwise; sources = the k smallest ids, deterministic).
    *
    * Exact-integer contract: each term is micro-quantized AS AN
    * INTEGER — `⌊10⁶/d + ½⌋ = (2·10⁶ + d) div (2d)`, pure BIGINT
    * arithmetic — and `harmonic_micro` is their sum, so the result is
    * order-independent and replays bit-for-bit in any engine (the
    * chi2 truncate-then-sum pattern, with ZERO floats anywhere).
    *
    * Scale: one hop-bounded forward BFS keyed (source, node) — the
    * [[betweenness]] forward phase minus path counting; frontier rows
    * ≤ k·|V| total, barrierCut per level. Judged `q_harmonic` (the
    * betweenness path+diamond fixture, all nodes sources — closed-form
    * harmonic-number sums), fully ORACLED; path/star hand values,
    * disconnected-component zeros and the k-subset pinned in
    * GraphSpec. */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxDepth: Int = 16): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in 1..4096: $k")
    require(maxDepth >= 1 && maxDepth <= 64,
      s"maxDepth must be in 1..64: $maxDepth")
    // hop loop at few partitions — the betweenness/cycleNodes rule
    // (size-derived since r18)
    val session = edges.sparkSession
    val fwd = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = graft.engine.Caches.persisted(
      fwd.union(fwd.select(col("b").as("a"), col("a").as("b"))).distinct())
    val prevParts = session.conf.get("spark.sql.shuffle.partitions")
    session.conf.set("spark.sql.shuffle.partitions",
      graft.engine.Loops.partitionsFor(session, und.count()).toString)
    try {
    val nodes = und.select(col("a").as("id")).distinct().barrierCut
    val sources = nodes.orderBy(col("id")).limit(k)
      .select(col("id").as("s")).barrierCut
    val (f0, nF0) = graft.engine.Barriers.cutCounted(
      sources.select(col("s"), col("s").as("v")))
    var frontier = f0
    var visited = frontier
    // per-node micro-term accumulator, grown level by level
    var acc = nodes.select(col("id"), lit(0L).as("h")).limit(0)
    var d = 1
    var done = nF0 == 0L
    while (d <= maxDepth && !done) {
      // convergence off the cut's own count (cutCounted, r18): no
      // separate isEmpty job per level
      val (nxt, nNxt) = graft.engine.Barriers.cutCounted(
        frontier.join(und, col("v") === col("a"))
          .select(col("s"), col("b").as("v")).distinct()
          .join(visited, Seq("s", "v"), "left_anti"))
      if (nNxt == 0L) done = true
      else {
        // term = ⌊10⁶/d + ½⌋ = (2·10⁶ + d) div (2d), exact in longs;
        // both accumulators union already-cut leaves — no extra barrier
        acc = acc.unionByName(
          nxt.groupBy(col("v").as("id"))
            .agg((count(lit(1)) * lit((2000000L + d) / (2L * d))).as("h")))
        visited = visited.unionByName(
          nxt.select(col("s").as("s"), col("v").as("v")))
        frontier = nxt
        d += 1
      }
    }
    // the betweenness depth-cap warning (r17 ADVICE): silent
    // truncation would understate H(v) with no signal
    if (!done)
      System.err.println(s"[graft] harmonicCentrality: depth cap " +
        s"$maxDepth reached with the frontier still open — scores may " +
        "be understated for pairs beyond the cap; raise maxDepth")
    nodes.join(
      acc.groupBy(col("id")).agg(sum(col("h")).as("harmonic_micro")),
      Seq("id"), "left")
      .select(col("id"),
        coalesce(col("harmonic_micro"), lit(0L)).as("harmonic_micro"))
      .barrierCut // materialize under the loop's partition count
    } finally session.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999 — public): the
    * OTHER classic link-analysis recurrence — an authority is pointed
    * at by good hubs, a hub points at good authorities:
    * `auth_{i}(v) = Σ_{u→v} hub_{i-1}(u)`, `hub_i(u) = Σ_{u→v} auth_i(v)`,
    * each half-step L1-normalized (scores sum to 1 — the mutual
    * recursion diverges unnormalized). Where PageRank models one
    * random surfer, HITS separates the two roles a node plays in a
    * directed graph — curation-relevant when the graph is bipartite-ish
    * (aggregator pages vs content pages; query hubs vs answer docs).
    * Fixed iterations for oracle-expressibility, as with the PR family.
    *
    * Scale: each half-step is one hash join + one partial-agg sum over
    * (long, double) rows plus a broadcast 1-row normalizer — the
    * pageRank economics exactly, `barrierCut` per half-step pair.
    * Nodes with no in-edges hold authority 0, no out-edges hub 0; an
    * all-isolated graph normalizes to all-zero rather than dividing by
    * zero. Judged `q_hits`, fully oracled (the unrolled normalized
    * recurrence); hand-computed star values and role separation pinned
    * in GraphSpec. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1)
    val e = graft.engine.Caches.persisted(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct())
    // loop partitions sized to the measured edge count (r18 rule)
    graft.engine.Loops.sized(edges.sparkSession, e.count()) {
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().barrierCut
    val n = broadcast(nodes.agg(count(lit(1)).as("__n")))
    def normalized(raw: DataFrame, out: String): DataFrame = {
      val s = broadcast(raw.agg(sum(col("raw")).as("__s")))
      nodes.join(raw, Seq("id"), "left").crossJoin(s)
        .select(col("id"),
          when(col("__s") > 0, coalesce(col("raw"), lit(0.0)) / col("__s"))
            .otherwise(lit(0.0)).as(out))
    }
    var hub = nodes.crossJoin(n)
      .select(col("id"), (lit(1.0) / col("__n")).as("hub")).barrierCut
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      auth = normalized(
        e.join(hub.select(col("id").as("src"), col("hub")), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("raw")),
        "authority").barrierCut
      hub = normalized(
        e.join(auth.select(col("id").as("dst"), col("authority")), "dst")
          .groupBy(col("src").as("id")).agg(sum(col("authority")).as("raw")),
        "hub").barrierCut
    }
    hub.join(auth, "id")
    } // Loops.sized
  }

  /** Power-law tail exponent of the DEGREE distribution — the
    * discrete maximum-likelihood estimator (Clauset, Shalizi & Newman
    * 2009, eq. 3.7 — public): `α̂ = 1 + n·[Σ ln(d_i/(d_min−½))]⁻¹`
    * over nodes with degree ≥ d_min. The scale-free diagnostic beside
    * [[graft.functions.TextOps]]' Zipf fit (q_zipf fits token
    * frequencies; this fits the GRAPH's hub structure — α ∈ [2, 3] is
    * the scale-free band, larger means thinner tails than a crawl
    * graph should have, a data-quality smell for link corpora).
    *
    * Judged-double discipline: each distinct degree contributes
    * `cnt_d·⌊(ln(2d) − ln(2·d_min−1))·10⁶ + 0.5⌋` — two IEEE ln over
    * exact INTEGER arguments micro-quantized once (the chi2/MI
    * pattern; `d/(d_min−½) = 2d/(2d_min−1)` keeps both arguments
    * integral), then `alpha_milli = 1000 + (n·10⁹) div s_micro` over
    * DECIMAL(38,0). NULL when the tail is empty (s_micro is strictly
    * positive otherwise — 2d > 2·d_min−1 for every tail degree).
    *
    * Scale: degrees are one partial agg over distinct undirected
    * edges; the tail aggregates per DISTINCT DEGREE (ln computed once
    * per degree value, not per node). Judged `q_degree_tail`, fully
    * ORACLED; a hand two-degree tail, the d_min cut, the all-d_min
    * fence and direction independence pinned in GraphSpec. */
  def degreeTailAlpha(edges: DataFrame, srcCol: String, dstCol: String,
      dMin: Long = 2L): DataFrame = {
    require(dMin >= 1, s"dMin must be >= 1: $dMin")
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    deg.filter(col("d") >= dMin)
      .groupBy(col("d")).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("n_tail"),
        sum(expr(s"""__c * cast(floor((ln(2 * d) - ln(${2 * dMin - 1}))
          * 1000000 + 0.5) as bigint)""")).as("s_micro"))
      .select(lit(dMin).as("d_min"), col("n_tail"), col("s_micro"),
        when(col("s_micro") > 0, expr(
          """cast(1000 + (cast(n_tail as decimal(38,0)) * 1000000000)
            div s_micro as bigint)"""))
          .as("alpha_milli"))
  }

  /** Katz centrality by fixed-round iteration (Katz 1953 — public):
    * `x_{i+1}(v) = β + α·Σ_{u→v} x_i(u)`, x₀ = β — the attenuated
    * path-count centrality between degree (α→0) and
    * [[eigenvectorCentrality]] (β→0, renormalized): a node earns
    * influence from ALL walks reaching it, damped α per hop, with the
    * β floor keeping zero-in-degree nodes visible (where eigenvector
    * centrality zeroes entire source-only regions). Directed, over
    * distinct edges; fixed rounds for oracle-expressibility (the PR
    * family rationale — callers pick α below 1/λ_max for a contracting
    * iteration; the fixed-round output is well-defined for any α).
    *
    * Scale: the [[pageRank]] economics minus the degree join — one
    * (long, double) hash join + partial-agg sum per round,
    * `barrierCut` per round. Judged `q_katz` (part→supplier graph,
    * 2 rounds, raw doubles under the driver's float tolerance — the
    * q_pagerank precedent), fully ORACLED via the unrolled
    * recurrence; path/star hand values and the α → degree limit
    * pinned in GraphSpec. */
  def katzCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, alpha: Double = 0.1,
      beta: Double = 1.0): DataFrame = {
    require(iterations >= 1 && alpha > 0 && beta > 0)
    val e = graft.engine.Caches.persisted(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct())
    // loop partitions sized to the measured edge count (r18 rule)
    graft.engine.Loops.sized(edges.sparkSession, e.count()) {
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().barrierCut
    var x = nodes.select(col("id"), lit(beta).as("score")).barrierCut
    for (_ <- 1 to iterations) {
      val inMass = e
        .join(x.select(col("id").as("src"), col("score")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("score")).as("__m"))
      x = nodes.join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit(beta) + lit(alpha) * coalesce(col("__m"), lit(0.0)))
            .as("score"))
        .barrierCut
    }
    x
    } // Loops.sized
  }

  /** PERSONALIZED PageRank (Haveliwala, WWW 2002 — public): the random
    * walk teleports back to the SEED SET instead of everywhere, so rank
    * concentrates in the seeds' neighborhood — "importance relative to
    * these nodes", the similarity/recommendation primitive (related
    * items from a co-occurrence graph, expansion sets for retrieval)
    * where global PageRank answers global importance. Recurrence:
    * `rank_{i+1}(v) = (1−d)·1[v ∈ S]/|S| + d·Σ_{u→v} rank_i(u)/outdeg(u)`,
    * rank_0 = the teleport vector itself. Fixed iterations for the
    * same reasons as [[pageRank]] (oracle-expressible, production round
    * budgets); dangling nodes leak mass identically on both sides.
    * Seeds with no edges still teleport (they join the node set).
    *
    * Scale: identical plan economics to [[pageRank]] — the teleport
    * vector is a node-scale relation persisted once and reused every
    * round, |S| enters as a broadcast 1-row aggregate, each round is
    * two (long, double) hash shuffles with map-side partial sums,
    * `barrierCut` per round. Judged `q_ppr`, fully oracled (the
    * unrolled recurrence); seed-locality and teleport-mass edges
    * pinned in GraphSpec. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct().barrierCut
    // loop partitions sized to the measured edge count (r18 rule)
    graft.engine.Loops.sized(edges.sparkSession, e.count()) {
    val seedIds = seeds.select(col(seedCol).cast("long").as("id")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .union(seedIds)
      .distinct().barrierCut
    val nS = broadcast(seedIds.agg(count(lit(1)).as("__ns")))
    val tele = graft.engine.Caches.persisted(
      nodes.join(seedIds.withColumn("__s", lit(1)), Seq("id"), "left")
        .crossJoin(nS)
        .select(col("id"),
          when(col("__s").isNotNull, lit(1.0) / col("__ns"))
            .otherwise(lit(0.0)).as("t")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("__d"))
    var ranks = tele.select(col("id"), col("t").as("rank")).barrierCut
    for (_ <- 1 to iterations) {
      val inMass = e
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), (col("rank") / col("__d")).as("__c"))
        .groupBy("id").agg(sum(col("__c")).as("__mass"))
      ranks = tele
        .join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit(1 - damping) * col("t") +
            lit(damping) * coalesce(col("__mass"), lit(0.0))).as("rank"))
        .barrierCut
    }
    ranks
    } // Loops.sized
  }

  /** Hop-bounded weighted shortest paths (Bellman-Ford relaxation —
    * public since 1958): minimum path WEIGHT from any seed to every
    * node reachable within `maxHops` edges, over DIRECTED weighted
    * edges — [[bfsHops]]'s weighted sibling (BFS counts edges; this
    * sums costs — latency graphs, toll routing, similarity chains).
    * After round `h` the distance table holds EXACTLY the cheapest
    * path using ≤ h edges — the bound is the semantics, not a cutoff,
    * which is what makes the operator oracle-expressible (a
    * depth-bounded recursive CTE minimizing the same sum) and is the
    * production shape anyway (k-hop cost neighborhoods).
    *
    * Scale: one round = frontier ⋈ edges (hash join on src) unioned
    * with the standing table, then ONE partial-agg `min` per node —
    * the same (long, long) row economics and `barrierCut` lineage
    * control as [[pageRank]]; a hub's relaxations partial-aggregate
    * map-side. Parallel edges collapse to their MINIMUM weight up
    * front (the only one that can win). INTEGER-weight contract:
    * distances accumulate in BIGINT (exact, order-independent — the
    * judged-arithmetic discipline), so the weight column must be an
    * integral type; a float/double weight column is REJECTED rather
    * than silently truncated (cast-then-sum of fractional weights
    * would return wrong distances). Non-negative weights required,
    * validated on the RAW column before any cast: under a hop bound
    * negative edges are well-defined but make the "distance" label
    * misleading — rejected explicitly rather than silently. Judged
    * `q_sssp`, fully oracled; hand-graph distances, parallel-edge
    * min, unreachable absence and both rejects pinned in GraphSpec. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seeds: DataFrame, seedCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    import org.apache.spark.sql.types._
    val wType = edges.schema(wCol).dataType
    val integral = wType match {
      case ByteType | ShortType | IntegerType | LongType => true
      // scale-0 decimals are exact integers — the BIGINT accumulation
      // loses nothing (aggregate-derived weights often arrive DECIMAL(p,0))
      case d: DecimalType if d.scale == 0 => true
      case _ => false
    }
    require(integral,
      s"shortestPaths requires an integral weight column (got $wType): " +
        "fractional weights would be silently truncated by the BIGINT " +
        "distance accumulation — scale them to integer units first")
    val e = graft.engine.Caches.persisted(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"))
      .groupBy("src", "dst").agg(min(col("w")).as("w")))
    // negative-weight gate on the PERSISTED narrow projection, not the
    // raw frame (one extra source scan per call otherwise): parallel
    // edges collapse to their min first, so any negative raw weight
    // survives into e's min and this one small action sees it
    // one pass serves both gates: the negative-weight check and the
    // size-derived loop partition count (r18)
    val gate = e.agg(min(col("w")), count(lit(1))).head
    val minW = gate.get(0)
    require(minW == null || minW.asInstanceOf[Long] >= 0L,
      "shortestPaths requires non-negative edge weights")
    graft.engine.Loops.sized(edges.sparkSession, gate.getLong(1)) {
      var dist = seeds.select(col(seedCol).cast("long").as("id"))
        .distinct().withColumn("dist", lit(0L)).barrierCut
      for (_ <- 1 to maxHops) {
        dist = dist.join(e, col("id") === col("src"))
          .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
          .unionByName(dist)
          .groupBy("id").agg(min(col("dist")).as("dist"))
          .barrierCut
      }
      dist
    }
  }

  /** k-core DECOMPOSITION (coreness): each vertex's maximum k such that
    * it survives in the k-core — the subgraph where every vertex keeps
    * ≥ k neighbors after iteratively peeling lower-degree vertices. The
    * graph family's density ladder: CC answers "connected at all", LPA
    * "which dense community", coreness "HOW dense a neighborhood" — the
    * standard nucleus signal for curation (spam farms and boilerplate
    * rings sit in shallow cores; organic reference clusters run deep).
    *
    * Algorithm: the distributed H-index iteration (Montresor, De
    * Pellegrini, Miorandi 2011 — public), not sequential peeling: every
    * vertex starts at its degree and repeatedly lowers its estimate to
    * the H-index of its neighbors' estimates (the max k such that ≥ k
    * neighbors estimate ≥ k); estimates are non-increasing, lower-bounded
    * by true coreness, and the fixpoint IS the coreness — convergence in
    * rounds bounded by the estimate-chain depth, typically ≪ the peel
    * count sequential deletion needs.
    *
    * Scale: the H-index never sees a hub's raw neighbor list — neighbor
    * estimates partial-aggregate to (vertex, estimate, count) rows
    * FIRST, so the per-vertex window (running count over estimates
    * descending, H = max(min(estimate, cumulative))) runs over at most
    * #distinct-estimates rows (≤ O(√m) by the coreness bound), not
    * degree rows — a million-edge hub contributes map-side-combined
    * counts, never a million-row sort partition. One hash join + two
    * partial aggs + the tiny window per round, `barrierCut` per round,
    * convergence detected on the estimate delta. Vertices are defined
    * by edge endpoints; self-loops are dropped (degree-0 vertices have
    * coreness 0 and no edge rows — callers union them back if wanted).
    * Judged `q_kcore` on an engineered clique/cycle/star fixture whose
    * coreness is known in closed form; structural edges pinned in
    * GraphSpec. */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val fwd = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = graft.engine.Caches.persisted(
      fwd.union(fwd.select(col("b").as("a"), col("a").as("b"))).distinct())
    // loop partitions sized to the measured edge count (r18 rule)
    graft.engine.Loops.sized(edges.sparkSession, und.count()) {
    var c = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("c"))
      .barrierCut
    var changed = 1L
    // fixed round budget (the pageRank/LPA/BFS posture): the H-index
    // iteration is provably terminating, but an adversarial long-chain
    // graph converges in O(chain-depth) rounds, each a count() action —
    // the cap bounds wall-clock, and a capped run returns estimates that
    // are still exact UPPER BOUNDS on coreness (non-increasing from
    // degree, lower-bounded by the true value; pinned in GraphSpec)
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      val grouped = und
        .join(c.select(col("id").as("b"), col("c").as("cb")), "b")
        .groupBy(col("a").as("id"), col("cb")).agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
        .orderBy(col("cb").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val h = grouped.withColumn("cum", sum(col("cnt")).over(w))
        .groupBy("id").agg(max(least(col("cb"), col("cum"))).as("h"))
      // the previous estimate rides along as c0 so the changed-count is
      // a bare filter over the cut leaf, not a join back to c (r18)
      val next = c.join(h, Seq("id"))
        .select(col("id"), least(col("c"), col("h")).as("c"),
          col("c").as("c0"))
        .barrierCut
      changed = next.filter(col("c") =!= col("c0")).count()
      c = next
    }
    // a capped run is an estimate, not the fixpoint — say so out loud
    // (estimates are still exact upper bounds on coreness, but silence
    // here would let "exact-to-convergence" quietly degrade on
    // deep-chain graphs; pinned in GraphSpec)
    if (changed > 0)
      System.err.println(s"[graft] coreness: round cap $maxRounds exhausted " +
        s"with $changed estimates still moving — result is an upper-bound " +
        "estimate, not the converged coreness; raise maxRounds for exact")
    c.select(col("id"), col("c").cast("int").as("core"))
    } // Loops.sized
  }

  /** The k-core vertex set: exactly {v : coreness(v) ≥ k} — derived
    * from the decomposition rather than re-peeling (the k-core is
    * unique, so the filter is exact for every k from one pass). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    coreness(edges, srcCol, dstCol).filter(col("core") >= k).select("id")
  }

  /** k-TRUSS subgraph (Cohen 2008 — public): the maximal subgraph in
    * which every EDGE sits in at least k−2 triangles — [[coreness]]'s
    * triangle-based sibling one rung up the density ladder (a k-truss
    * is always inside the (k−1)-core, but demands cohesion k-core
    * can't: a star has core 1 everywhere yet contains no triangle at
    * all). The community-mining nucleus for curation: link farms that
    * survive degree-based peeling still die here unless their links
    * actually close triangles.
    *
    * Algorithm: iterative support peeling to the FIXPOINT — per round,
    * each surviving edge's support = its common-neighbor count (two
    * hash joins on bare longs: (a,x) ∧ (b,x) → count per (a,b); never
    * a neighbor-list explode), edges below k−2 drop, and removals
    * cascade until no edge moves (round cap with the loud [[coreness]]
    * estimate warning — a capped result is a SUPERSET of the truss).
    * Graph canonicalizes to undirected distinct edges, self-loops
    * dropped; returns the surviving canonical `(a, b)` pairs.
    *
    * Scale: each round is two joins + one partial-agg count over edge
    * rows, `barrierCut` per round at few shuffle partitions (the
    * hop-loop rule); cascade depth bounds rounds. Judged `q_ktruss`
    * (the q_kcore clique/cycle/star fixture plus a pendant triangle
    * whose removal CASCADES — 4-truss = exactly the K6 pairs, closed
    * form, the FIXTURES.md convention); lone-triangle 3-truss,
    * cascade, direction/self-loop invariance pinned in GraphSpec. */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in 2..1000: $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val session = edges.sparkSession
    val minSup = k - 2L
    var (e, n) = graft.engine.Barriers.cutCounted(edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("b"))
      .filter(col("a") =!= col("b")).distinct())
    val prevParts = session.conf.get("spark.sql.shuffle.partitions")
    // loop partitions sized to the measured edge count (r18 rule)
    session.conf.set("spark.sql.shuffle.partitions",
      graft.engine.Loops.partitionsFor(session, n).toString)
    try {
      var changed = n > 0 && minSup > 0
      var round = 0
      while (changed && round < maxRounds) {
        round += 1
        val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
        val sup = e
          .join(und.select(col("a"), col("b").as("x")), "a")
          .join(und.select(col("a").as("b"), col("b").as("x")),
            Seq("b", "x"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("__sup"))
        // the filter only ever REMOVES edges, so an unchanged count is
        // an unchanged set — convergence off the cut's own count
        // (cutCounted, r18): no separate count job per round
        val (next, n2) = graft.engine.Barriers.cutCounted(
          e.join(sup, Seq("a", "b"), "left")
            .filter(coalesce(col("__sup"), lit(0L)) >= minSup)
            .select(col("a"), col("b")))
        changed = n2 != n
        n = n2
        e = next
      }
      if (changed)
        System.err.println(s"[graft] kTruss: round cap $maxRounds " +
          "exhausted with edges still dropping — result is a SUPERSET " +
          "of the k-truss; raise maxRounds for exact")
      e
    } finally session.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** One synchronous LPA round — exposed package-private so PlanSpec can
    * pin its shape pre-barrier (the barrier executes rounds eagerly, so
    * the returned frame's plan no longer contains them): join + two
    * partial-agg levels, argmax as `max(struct(cnt, -label))`, never a
    * window. */
  private[graft] def lpaRound(und: DataFrame, labels: DataFrame): DataFrame =
    und.join(labels.withColumnRenamed("id", "b"), Seq("b"))
      .groupBy(col("a").as("id"), col("lbl"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("best"))
      .select(col("id"), (-col("best.neg")).as("lbl"))

  /** Hierarchy / bill-of-materials rollup — the SUM-OF-PATH-PRODUCTS
    * semiring the graph family was missing: over quantity-weighted
    * child→parent edges, the transitive closure `(ancestor, descendant,
    * qty)` where qty = Σ over all paths of Π edge quantities — "how
    * many of component d does one assembly a consume, through every
    * intermediate sub-assembly" (shortestPaths is min-plus, PageRank
    * sum-times-damping; this is plus-times — each needs its own
    * iteration, there is no generic matrix op in SQL). Exact BIGINT
    * arithmetic (quantities are counts); on a DAG, converging paths
    * SUM as the recurrence requires — each round extends the frontier
    * one level up, partial-aggregating per (descendant, ancestor)
    * BEFORE the union, and the final aggregate merges same-pair
    * contributions from different path lengths.
    *
    * Scale: per-round hash join frontier⋈edges + partial agg over
    * (long, long, long) rows, `barrierCut` per round (the CC/PageRank
    * lineage posture); rounds bounded by hierarchy DEPTH (log-scale
    * for balanced trees), cap exhaustion reported on stderr like
    * [[coreness]]. Judged `q_bom` on the arithmetic div-8 forest
    * (closed-form oracle via DuckDB's recursive CTE — monotone, the
    * FIXTURES convention), fully ORACLED; diamond-DAG path summing,
    * depth product and cap warning pinned in GraphSpec. */
  def hierarchyRollup(edges: DataFrame, childCol: String, parentCol: String,
      qtyCol: String, maxRounds: Int = 30): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val e = graft.engine.Caches.persisted(
      edges.select(col(childCol).cast("long").as("c"),
        col(parentCol).cast("long").as("p"),
        col(qtyCol).cast("long").as("q")))
    // NOT Loops.sized (r18, measured): the ancestor-closure frontier is
    // DATA-scale and grows with depth (q_bom 4.0 -> 5.3 s at 4
    // partitions) — this loop is compute-bound, not scheduling-bound.
    var frontier = e.select(col("c").as("descendant"),
      col("p").as("ancestor"), col("q").as("qty")).barrierCut
    var out = frontier
    var round = 1
    var more = true
    while (more && round < maxRounds) {
      round += 1
      // convergence off the cut's own count (cutCounted, r18): no
      // separate limit(1).count job per round
      val (next, nNext) = graft.engine.Barriers.cutCounted(frontier
        .join(e.select(col("c").as("ancestor"), col("p").as("__p2"),
          col("q").as("__q2")), "ancestor")
        .groupBy(col("descendant"), col("__p2").as("ancestor"))
        .agg(sum(col("qty") * col("__q2")).as("qty"))
        .select(col("descendant"), col("ancestor"), col("qty")))
      more = nNext > 0
      if (more) { out = out.unionByName(next); frontier = next }
    }
    if (more && round >= maxRounds)
      System.err.println(s"[graft] hierarchyRollup: round cap $maxRounds " +
        "exhausted with the frontier still extending — deeper ancestors " +
        "are missing from the closure; raise maxRounds")
    // converging paths of DIFFERENT lengths land in different rounds —
    // the final aggregate sums them per (ancestor, descendant) pair
    out.groupBy(col("ancestor"), col("descendant"))
      .agg(sum(col("qty")).as("qty"))
  }

  /** Cycle detection over a DIRECTED graph — the DAG validator: a node
    * is `in_cycle` iff it reaches itself, computed as a distributed
    * TRANSITIVE CLOSURE by frontier expansion (`reach ∪ reach⋈e₀` —
    * one hop per round, fixpoint after diameter rounds; the closure is
    * monotone, so a stable count IS convergence) with each round's
    * edge set cut through [[graft.engine.Barriers]] (the CC-loop
    * lineage rule). Expansion joins the BASE edges, not the closure:
    * on the dense graphs where cycle questions arise the closure
    * saturates fast and `reach⋈reach` squares a saturated relation
    * every round (measured 9.5s vs ~3s for the frontier form at the
    * same fixpoint); path-doubling only wins on long thin chains.
    * Self-loops are cycles by definition and ride the same test.
    *
    * Contract: this is the DEPENDENCY-GRAPH validator (pipeline DAGs,
    * BOM structures, schema lineage — config-to-metadata scale, where
    * the exact answer matters and the closure is small). On a
    * data-scale dense graph the closure is quadratic — there you trim
    * in/out-degree-0 leaves and run SCC decomposition instead; that
    * path is documented, not built. Judged `q_cycles`, fully ORACLED
    * against the recursive-CTE self-reach; pure-DAG all-false, ring,
    * self-loop and cycle-to-cycle-bridge (NOT in_cycle) edges pinned
    * in GraphSpec. */
  def cycleNodes(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50): DataFrame = {
    import graft.engine.Barriers.BarrierOps
    val session = edges.sparkSession
    // the loop's cost is per-round FIXED overhead (checkpoint +
    // shuffle-partition count), not data volume — a dependency-graph
    // closure is metadata-scale, so plan the rounds at few partitions
    // (the streaming-fixed-cost lesson; size-derived since r18);
    // restored after the loop
    val (e0, nE0) = graft.engine.Barriers.cutCounted(edges
      .select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .distinct())
    val prevParts = session.conf.get("spark.sql.shuffle.partitions")
    session.conf.set("spark.sql.shuffle.partitions",
      graft.engine.Loops.partitionsFor(session, nE0).toString)
    // constraint propagation is an optimizer aid, and on this loop's
    // checkpoint + self-join + union chain Spark's Union constraint
    // rewriting throws AttributeMap key-not-found (constraints leak
    // attributes a checkpointed child no longer outputs); disable it
    // for the loop's actions — results are unaffected
    val prevCp = session.conf.get(
      "spark.sql.constraintPropagation.enabled", "true")
    session.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try {
      // SEMI-NAIVE evaluation (the datalog rule): only the FRONTIER —
      // pairs first derived last round — joins the base edges; rejoining
      // the whole closure every round multiplied saturated pairs by the
      // mean out-degree for nothing (measured 8.5s naive vs semi-naive
      // on the judged fixture)
      var reach = e0
      var frontier = e0
      var round = 0
      var done = false
      while (!done && round < maxRounds) {
        val derived = frontier.as("a")
          .join(e0.as("b"), col("a.v") === col("b.u"))
          .select(col("a.u").as("u"), col("b.v").as("v"))
          .distinct()
        // anti join rather than EXCEPT: Except's constraint rewriting
        // trips on checkpointed self-join attribute ids here (AttributeMap
        // key-not-found during analysis); the anti join is also the
        // cheaper plan (no distinct on the right side)
        // convergence off the cut's own count (cutCounted, r18): no
        // separate isEmpty job per round
        val (fresh, nFresh) = graft.engine.Barriers.cutCounted(derived
          .join(reach.select(col("u").as("ru"), col("v").as("rv")),
            col("u") === col("ru") && col("v") === col("rv"), "left_anti"))
        done = nFresh == 0L
        if (!done) {
          // explicit aliases mint NEW exprIds on both union children:
          // localCheckpoint preserves attribute ids, so reach and fresh
          // otherwise share e0's ids and Union's constraint rewriting
          // throws key-not-found during analysis
          reach = reach.select(col("u").as("u"), col("v").as("v"))
            .union(fresh.select(col("u").as("u"), col("v").as("v")))
            .barrierCut
          frontier = fresh
        }
        round += 1
      }
      if (!done)
        throw new IllegalStateException(
          s"cycleNodes: closure not converged after $maxRounds rounds")
      val nodes = e0.select(col("u").as("node"))
        .union(e0.select(col("v").as("node"))).distinct()
      val selfReach = reach.filter(col("u") === col("v"))
        .select(col("u").as("node")).distinct()
      // materialize the readout while the loop confs are still active
      // (the plan references the loop's checkpointed frames)
      nodes.join(selfReach.withColumn("__c", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__c"), lit(false)).as("in_cycle"))
        .barrierCut
    } finally {
      session.conf.set("spark.sql.shuffle.partitions", prevParts)
      session.conf.set("spark.sql.constraintPropagation.enabled", prevCp)
    }
  }

  /** Network robustness under hub removal — the resilience audit a
    * graph-shaped system (supply chain, service mesh, social spread)
    * reads before trusting its redundancy: component structure of the
    * undirected graph BEFORE and AFTER deleting the `topK`
    * highest-degree hubs (ties broken by node id — deterministic).
    * A graph whose `largest_cc` collapses when 10 hubs vanish is
    * scale-free-fragile; one that barely moves is mesh-robust.
    *
    * EXACT integers throughout: degrees, component counts and sizes
    * ([[Dedup.connectedComponents]] does the labeling; isolated
    * survivors of hub removal leave the edge-endpoint universe — the
    * CC node contract, mirrored by the oracle).
    *
    * Scale: canonical undirected distinct edges (16-byte rows), one
    * degree aggregate, a TakeOrdered hub head (config-scale k), two
    * anti-joins, and the CC posture twice. Judged `q_robustness`,
    * fully ORACLED; star-collapse vs ring-resilience hands and the
    * tie determinism pinned in GraphSpec. */
  def robustnessReport(edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK >= 1: $topK")
    val e0 = graft.engine.Caches.persisted(edges
      .select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("a"),
        least(col("u"), col("v")).as("b"))
      .distinct())
    val deg = e0.select(col("a").as("n"))
      .unionByName(e0.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val hubs = broadcast(deg.orderBy(col("d").desc, col("n")).limit(topK))
    val kept = e0
      .join(hubs.select(col("n").as("a")), Seq("a"), "left_anti")
      .join(hubs.select(col("n").as("b")), Seq("b"), "left_anti")
    // BOTH scenarios label in ONE connectedComponents pass: the
    // dehubbed copy lives at node ids offset past the full graph's
    // max (components can never cross the disjoint id spaces), so the
    // iterative fixed cost — the dominant term — is paid once, not
    // twice. The offset read is a 1-row config-scale collect.
    val off = e0.agg(max(col("a")).as("m")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.toString.toLong))
      .getOrElse(0L) + 1L
    val fused = e0.unionByName(
      kept.select((col("a") + off).as("a"), (col("b") + off).as("b")))
    val sizes = graft.engine.Caches.persisted(
      graft.operators.Dedup.connectedComponents(fused, "a", "b")
        .withColumn("scenario",
          when(col("id") < off, "full").otherwise("dehubbed"))
        .groupBy(col("scenario"), col("component"))
        .agg(count(lit(1)).as("__sz")))
    val tags = e0.sparkSession.createDataFrame(
      Seq(Tuple1("full"), Tuple1("dehubbed"))).toDF("scenario")
    tags.join(
        sizes.groupBy(col("scenario"))
          .agg(sum(col("__sz")).as("n_nodes"),
            count(lit(1)).as("n_components"),
            max(col("__sz")).as("largest_cc")),
        Seq("scenario"), "left")
      .select(col("scenario"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_components"), lit(0L)).as("n_components"),
        coalesce(col("largest_cc"), lit(0L)).as("largest_cc"))
  }

  /** Strongly connected components — the DIRECTED twin of
    * [[Dedup.connectedComponents]] ([[cycleNodes]] says WHETHER a node
    * sits on a cycle; this says WHICH nodes cycle together): labels
    * every edge-endpoint node with the minimum id of its SCC, via
    * multi-pivot forward-backward peeling (Fleischer et al. / the
    * Slota coloring family): per round, propagate the min-id label
    * along edges (`F` = min id that reaches v) and against them (`B` =
    * min id v reaches); `F(v) = B(v) = m` forces `m ↔ v` mutual
    * reachability, so all such v ARE exactly SCC(m) — every weak
    * component peels at least its min-id node's SCC per round, and
    * peeled nodes leave the active subgraph (paths through a peeled
    * SCC can never certify a NEW mutual pair — any cycle touching it
    * would have joined it).
    *
    * Scale: bare (long, long) edges; each propagation round is one
    * key-partitioned join + min-aggregate with eager barrierCut
    * (the CC posture), run at few shuffle partitions (closure graphs
    * are metadata-scale). Each outer round opens with the TRIM
    * refinement of FW-BW (Slota/Hong): a node with no in-edge or no
    * out-edge in the active subgraph cannot sit on a cycle there, so
    * it peels as a singleton SCC in a CHEAP round (two endpoint
    * distincts + anti-join) instead of a full F/B fixpoint — DAG
    * periphery and deep chains drain through trim (up to
    * `maxTrimRounds` layers per outer round), leaving the expensive
    * fixpoints to the cyclic core. Cost is (peel rounds) × (graph
    * diameter) FIXED per-round overhead — built for dependency /
    * interaction graphs with few large SCCs (the common shape);
    * maxRounds guards adversarial shapes. Judged `q_scc` (union of
    * two affine maps mod 300 — nontrivial cycle partition, oracled by
    * a recursive-CTE closure + mutual-pair min), fully ORACLED; hand
    * 2-cycle+tail, disjoint cycles, DAG all-singletons,
    * label-is-member and the deep-chain-into-cycle trim path (depth
    * beyond the old per-round peel budget) pinned in GraphSpec. */
  def stronglyConnected(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30, maxPropRounds: Int = 80,
      maxTrimRounds: Int = 20): DataFrame = {
    val session = edges.sparkSession
    val (e0pre, nE0pre) = graft.engine.Barriers.cutCounted(edges
      .select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val prevParts = session.conf.get("spark.sql.shuffle.partitions")
    // loop partitions sized to the measured edge count (r18 rule)
    session.conf.set("spark.sql.shuffle.partitions",
      graft.engine.Loops.partitionsFor(session, nE0pre).toString)
    val prevCp = session.conf.get(
      "spark.sql.constraintPropagation.enabled", "true")
    session.conf.set("spark.sql.constraintPropagation.enabled", "false")

    // min-label propagation to fixpoint on the ACTIVE subgraph:
    // lbl(v) = min id over {v} ∪ {u : u reaches v along e}
    def minReach(nodes: DataFrame, e: DataFrame): DataFrame = {
      // nodes is always a cut leaf here — the init projection needs no
      // barrier of its own (r18)
      var lbl = nodes.select(col("id"), col("id").as("lbl"))
      var r = 0
      var changed = true
      while (changed && r < maxPropRounds) {
        val cand = e.join(
            lbl.select(col("id").as("u"), col("lbl").as("__ul")), Seq("u"))
          .groupBy(col("v").as("id")).agg(min(col("__ul")).as("__cl"))
        // the PREVIOUS label rides along as __old so the convergence
        // check is a bare filter over the cut leaf, not a join back to
        // lbl (one cheap job per round instead of a join job — r18)
        val hop = lbl.join(cand, Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("__cl"), col("lbl"))).as("lbl"),
            col("lbl").as("__old"))
        // pointer jumping (the CC hooking trick): a label IS a node id,
        // so chase it one step — lbl(v) := min(lbl(v), lbl(lbl(v))) —
        // turning O(cycle length) rounds into O(log)
        val next = hop.as("a")
          .join(hop.select(col("id").as("lbl"), col("lbl").as("__ll"))
            .as("b"), Seq("lbl"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("__ll"), col("lbl"))).as("lbl"),
            col("__old"))
          .barrierCut
        changed = next.filter(col("lbl") < col("__old")).count() > 0
        lbl = next
        r += 1
      }
      require(!changed, s"label propagation did not converge in" +
        s" $maxPropRounds rounds (raise maxPropRounds)")
      lbl.select(col("id"), col("lbl"))
    }

    try {
      val e0 = e0pre
      var (active, nActive) = graft.engine.Barriers.cutCounted(
        e0.select(col("u").as("id"))
          .union(e0.select(col("v").as("id"))).distinct())
      var aEdges = e0
      var labeled: DataFrame = null

      // trim: a node with no in-edge or no out-edge in the active
      // subgraph cannot lie on a cycle there — peel as singleton SCCs
      // in cheap rounds (two layers of a chain per round) before each
      // F/B fixpoint; isolated nodes (all edges peeled) drain here too
      def trim(): Unit = {
        var t = 0
        var trimming = true
        while (trimming && t < maxTrimRounds && nActive > 0) {
          // plans stay UNCUT until a drop is confirmed: on the common
          // cyclic-core round where nothing trims, the whole check is
          // ONE job (the isEmpty), not three barrier materializations
          val both = aEdges.select(col("u").as("id")).distinct()
            .join(aEdges.select(col("v").as("id")).distinct(),
              Seq("id"), "left_semi")
          val dropped = active.join(both, Seq("id"), "left_anti")
          if (dropped.isEmpty) trimming = false
          else {
            // cut only the NEW singleton rows; labeled itself stays a
            // lazy union of cut leaves (the betweenness accumulator
            // rule, r18) — re-cutting the whole labeled set per trim
            // round re-materialized O(total labeled) every time
            val singles = dropped
              .select(col("id").as("node"), col("id").as("scc"))
              .barrierCut
            labeled =
              if (labeled == null) singles
              else labeled
                .select(col("node").as("node"), col("scc").as("scc"))
                .union(singles
                  .select(col("node").as("node"), col("scc").as("scc")))
            val ac = graft.engine.Barriers.cutCounted(both)
            active = ac._1
            nActive = ac._2
            aEdges = aEdges
              .join(active.select(col("id").as("u")), Seq("u"), "left_semi")
              .join(active.select(col("id").as("v")), Seq("v"), "left_semi")
              .barrierCut
            t += 1
          }
        }
      }

      var round = 0
      while (round < maxRounds && nActive > 0) {
        trim()
        if (nActive == 0) {
          round += 1
        } else {
          val f = minReach(active, aEdges)
          val b = minReach(active,
            aEdges.select(col("v").as("u"), col("u").as("v")))
          val fb = f.join(
            b.select(col("id").as("id"), col("lbl").as("__b")), Seq("id"))
            .barrierCut
          // done is a bare filter over the cut fb leaf — union it
          // lazily (the betweenness accumulator rule, r18)
          val done = fb.filter(col("lbl") === col("__b"))
            .select(col("id").as("node"), col("lbl").as("scc"))
          labeled =
            if (labeled == null) done
            else labeled.select(col("node").as("node"), col("scc").as("scc"))
              .union(done.select(col("node").as("node"), col("scc").as("scc")))
          val ac = graft.engine.Barriers.cutCounted(
            fb.filter(col("lbl") =!= col("__b")).select("id"))
          active = ac._1
          nActive = ac._2
          aEdges = aEdges
            .join(active.select(col("id").as("u")), Seq("u"), "left_semi")
            .join(active.select(col("id").as("v")), Seq("v"), "left_semi")
            .barrierCut
          round += 1
        }
      }
      require(nActive == 0,
        s"SCC peeling did not converge in $maxRounds rounds")
      if (labeled == null) // no edges at all: no endpoint nodes
        session.range(0).select(col("id").as("node"), col("id").as("scc"))
      else labeled
    } finally {
      session.conf.set("spark.sql.shuffle.partitions", prevParts)
      session.conf.set("spark.sql.constraintPropagation.enabled", prevCp)
    }
  }
}
