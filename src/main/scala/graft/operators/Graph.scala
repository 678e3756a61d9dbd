package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().localCheckpoint(true)
    val nodeIds = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    // node count as a broadcast 1-row aggregate over the CHECKPOINTED id
    // set (one cheap rescan, zero recompute), not a driver collect
    val nodes = nodeIds
      .crossJoin(broadcast(nodeIds.agg(count(lit(1)).as("__n"))))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    var ranks = nodes.select(col("id"), (lit(1.0) / col("__n")).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val inMass = e
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("id").agg(sum(col("__c")).as("__mass"))
      ranks = nodes
        .join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit(1 - damping) / col("__n") +
            lit(damping) * coalesce(col("__mass"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
