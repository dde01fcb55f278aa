package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over an edge list — the curation-side
  * reads of a similarity graph (rank representative members, find the
  * dense near-dup cores). Both primitives run a FIXED, small number of
  * rounds so the computation is deterministic, cross-engine exact
  * (pure integer arithmetic — no float fixpoints), and SQL-unrollable
  * for the DuckDB oracle.
  *
  * Scale shape: every round is an id-keyed equi join against the edge
  * list plus one map-side-combining keyed aggregation — the classic
  * distributed PageRank/peeling step. Nothing is ever all-pairs, no
  * round sorts the graph, and state per round is one (node, value)
  * table. The driver loops over ROUNDS (a constant), never over data.
  */
object GraphOps {

  /** Fixed-iteration PageRank (Page et al. 1999) with integer
    * arithmetic: ranks are maintained as ×`scale` integers, each
    * node's outgoing contribution is `rank div out_degree` (integer
    * division — both engines truncate identically for non-negative
    * operands), and the damping update is
    * `((dampDen - dampNum)·scale + dampNum·Σ contrib) div dampDen`.
    *
    * `edges` carries one row per DIRECTED edge (a, b). On a symmetric
    * (mutual-kNN) graph every node has out-degree ≥ 1, so there is no
    * dangling-mass term; the left join still guards nodes that receive
    * no contributions. In-degree on a mutual top-k graph is bounded by
    * k, so `dampNum · Σ contrib ≤ dampNum · k · scale` — no overflow
    * headroom issues at any corpus size.
    *
    * Returns (v, deg, pr_q): node id, out-degree, final ×scale rank.
    */
  def pagerank(edges: DataFrame, iters: Int, scale: Long,
               dampNum: Int, dampDen: Int): DataFrame = {
    val nodes = Release.afterFirstUse(edges.select(col("a").as("v")).distinct())
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    // contribution denominator rides the edge list once, outside the loop
    val ed = Release.afterFirstUse(edges.join(deg, "a"))
    val teleport = (dampDen - dampNum).toLong * scale
    var r = nodes.select(col("v"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val m = ed.join(r.withColumnRenamed("v", "a"), "a")
        .select(col("b").as("v"), expr("r div deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      r = nodes.join(m, Seq("v"), "left")
        .select(col("v"),
          expr(s"($teleport + $dampNum * coalesce(m, 0L)) div $dampDen").as("r"))
    }
    r.join(deg.select(col("a").as("v"), col("deg")), "v")
      .select(col("v"), col("deg"), col("r").as("pr_q"))
  }

  /** Bounded-round k-core peeling (Seidman 1983; Matula–Beck): each
    * round drops every node whose degree AMONG STILL-ALIVE nodes is
    * below `k`, for exactly `rounds` rounds. The survivors approximate
    * the k-core from above (they ARE the k-core once a round removes
    * nothing); the peel round is the standard coreness-ordering signal
    * a dedup audit reads — early-peeled nodes are tree-like fringe,
    * survivors sit in dense near-dup cores.
    *
    * `edges` carries one row per DIRECTED edge of a symmetric graph.
    * Returns (v, deg0, peel_round, in_core): initial degree, the round
    * that dropped the node (0 = survived all rounds), survivor flag.
    */
  /** Id-reduction modulus for the walk hash: terms stay < 2^21·10^6 ≈
    * 2^41, far from int64 overflow in BOTH engines however large the
    * raw node ids get (the p69 lesson: reduce before multiplying —
    * Spark wraps silently where DuckDB errors).
    */
  val WalkMod = 1048576L

  /** Deterministic hash-seeded random walks (the DeepWalk / node2vec
    * corpus-prep step, Perozzi et al. 2014): one walk starts at every
    * node, and at step s the walk at w chooses the neighbor b of its
    * current node minimizing h(w, s, b) — a pseudo-random but
    * reproducible choice, so walks diversify across steps and seeds
    * while both engines agree exactly (no RNG state, ties broken by
    * b). On the symmetric mutual-kNN graph every reachable node has a
    * neighbor, so walks never dead-end.
    *
    * Returns (walk_id, step, v) for steps 0..`steps`.
    *
    * Scale shape: each step is one id-keyed equi join of the walk
    * frontier (N rows) against the edge list plus one
    * map-side-combining min aggregation — never all-pairs, state is
    * one (walk, position) row per walk, and the driver loops over a
    * constant step count.
    */
  def hashWalks(edges: DataFrame, steps: Int): DataFrame = {
    var cur = Release.afterFirstUse(
      edges.select(col("a")).distinct()
        .select(col("a").as("walk_id"), col("a").as("v")))
    var out = cur.withColumn("step", lit(0L))
    for (s <- 1 to steps) {
      val h = (col("walk_id") % WalkMod) * lit(1000003L) +
        lit(s.toLong * 31L) + (col("b") % WalkMod) * lit(7919L)
      cur = Release.afterFirstUse(
        cur.join(edges, cur("v") === edges("a"))
          .withColumn("h", h)
          .groupBy(col("walk_id"))
          .agg(min(struct(col("h"), col("b"))).as("m"))
          .select(col("walk_id"), col("m.b").as("v")))
      out = out.union(cur.withColumn("step", lit(s.toLong)))
    }
    out.select(col("walk_id"), col("step"), col("v"))
  }

  /** Triangle counting via the ordered wedge join (the classic
    * distributed formulation: each triangle a<b<c is generated exactly
    * once from the wedge (a,b)+(b,c) closed by (a,c), so no triangle
    * is double-counted and the join is keyed, never all-pairs). Wedge
    * volume is Σ deg² — bounded on a mutual top-k graph (deg ≤ k) and
    * kept skew-safe at scale by the same degree-boundedness. Returns
    * per node (v, deg, n_tri, cc_q): degree, incident triangles, and
    * the local clustering coefficient 2·tri/(deg·(deg−1)) as an exact
    * ×10⁶ integer (0 when deg < 2) — the "how dense is this near-dup
    * neighborhood" dial one level below p84's core flags.
    */
  def triangles(edges: DataFrame, scale: Long = 1000000L): DataFrame = {
    val mut = Release.afterFirstUse(
      edges.filter(col("a") < col("b")))
    val deg = Release.afterFirstUse(
      edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .select(col("a").as("v"), col("deg")))
    val wedge = mut.select(col("a").as("x"), col("b").as("y"))
      .join(mut.select(col("a").as("y"), col("b").as("z")), "y")
    val tri = Release.afterFirstUse(
      wedge.join(mut.select(col("a").as("x"), col("b").as("z")),
        Seq("x", "z"), "left_semi"))
    val tc = tri.select(col("x").as("v"))
      .union(tri.select(col("y")))
      .union(tri.select(col("z")))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    deg.join(tc, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, lit(0L))
          .otherwise(expr(s"(2 * coalesce(n_tri, 0L) * $scale) div (deg * (deg - 1))"))
          .as("cc_q"))
  }

  def corePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val nodes = Release.afterFirstUse(
      edges.groupBy(col("a")).agg(count(lit(1)).as("deg0"))
        .select(col("a").as("v"), col("deg0")))
    // Peeling is monotone: alive sets only shrink, so a node's
    // alive-neighbor count is non-increasing across rounds — once it
    // dips below k the node can never re-qualify. The ≥ k filter on
    // the fresh count therefore subsumes the "was still alive" check,
    // and each round is ONE edge join + ONE keyed count (round 1 needs
    // no join at all: every node is alive, the count is deg0).
    val alives = Vector.newBuilder[DataFrame]
    var alive = Release.afterFirstUse(
      nodes.filter(col("deg0") >= k).select(col("v")))
    alives += alive
    for (_ <- 2 to rounds) {
      alive = Release.afterFirstUse(
        edges.join(alive.withColumnRenamed("v", "b"), "b")
          .groupBy(col("a")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= k).select(col("a").as("v")))
      alives += alive
    }
    val marks = alives.result().zipWithIndex.map { case (a, idx) =>
      a.withColumn(s"alive_${idx + 1}", lit(1L))
    }
    val flagged = marks.foldLeft(nodes)((acc, m) => acc.join(m, Seq("v"), "left"))
    val peel = (1 to rounds).foldRight(lit(0L): Column)((i, rest) =>
      when(col(s"alive_$i").isNull, lit(i.toLong)).otherwise(rest))
    flagged.select(col("v"), col("deg0"), peel.as("peel_round"),
      col(s"alive_$rounds").isNotNull.as("in_core"))
  }
}
