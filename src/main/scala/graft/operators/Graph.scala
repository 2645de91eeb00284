package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl-corpus curation. PageRank over the
  * domain link graph is the classic crawl-frontier / quality prior a
  * web-scale training-data pipeline computes before filtering (domains
  * endorsed by many ranked domains are fetched and kept first).
  */
object Graph {

  /** Per-node exact triangle counts via degree orientation — the
    * MapReduce node-iterator of Suri & Vassilvitskii (WWW'11, "Counting
    * triangles and the curse of the last reducer").
    *
    * Each undirected edge is oriented from its lower-(degree, id)
    * endpoint to the higher one, so wedges (candidate two-paths)
    * generate ONLY at an edge's source: a node spawns C(outdeg, 2)
    * candidates and oriented out-degrees are O(√m) on any graph, which
    * caps wedge volume at O(m^1.5) — a mega-hub node (the "last
    * reducer" that makes naive per-node triangle counting die at
    * scale) contributes almost nothing because its edges all point
    * INTO it. One closing equi-join against the canonical (a<b) edge
    * set confirms each wedge; each confirmed triangle then credits all
    * three corners via a bounded ×3 explode and a partial-agg count.
    *
    * Deterministic by construction (set semantics + integer counts) —
    * no quantization needed; the oracle replays the same orientation
    * rule and joins.
    *
    * 100 TB: two shuffles on node keys (degree, wedge-source grouping)
    * plus the closing equi-join on the canonical pair key — no
    * all-pairs path; skewed wedge sources are ordinary skewed join
    * keys (AQE/salting territory), already bounded by the orientation.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String,
                     broadcastEdgeLimit: Long = 4000000L): DataFrame = {
    val canon = graft.Caches.persistOnce(
      edges.select(least(col(aCol), col(bCol)).as("a"),
                   greatest(col(aCol), col(bCol)).as("b"))
        .filter(col("a") =!= col("b") && col("a").isNotNull).distinct())
    val deg = canon.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // measured broadcast decision (the Dedup dup-rate-routing
    // discipline): canon is persisted, so the count is a cache pass.
    // Under the limit, degree and closing-edge joins broadcast — the
    // 41 M-wedge stream then probes a hash table scan-side and NEVER
    // shuffles; above it, ordinary shuffled equi-joins (the keys are
    // uniform node/pair ids).
    val nEdges = canon.count()
    def maybeB(df: DataFrame): DataFrame =
      if (nEdges <= broadcastEdgeLimit) broadcast(df) else df
    val withDeg = canon
      .join(maybeB(deg.select(col("v").as("a"), col("d").as("da"))), "a")
      .join(maybeB(deg.select(col("v").as("b"), col("d").as("db"))), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("w"))
    // wedges generate SCAN-SIDE from per-source sorted out-neighbor
    // lists (the a56 posexplode × tail-slice trick) — one shuffle on u
    // builds adjacency, and list length is the oriented out-degree,
    // O(√m) by construction, so no list is ever a mega-basket.
    val adj = oriented.groupBy("u")
      .agg(sort_array(collect_list(col("w"))).as("ws"))
    val wedges = adj
      .select(col("u"), col("ws"), posexplode(col("ws")).as(Seq("i", "a")))
      .select(col("u"), col("a"),
        explode(slice(col("ws"), col("i") + lit(2), size(col("ws"))))
          .as("b"))
    wedges.join(maybeB(canon), Seq("a", "b"))
      .select(explode(array(col("u"), col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
  }

  /** Power-iteration PageRank with a fixed iteration count.
    *
    * Semantics: simplified (non-dangling-redistributing) PageRank —
    * `r'(v) = (1-d)/N + d · Σ_{u→v} r(u)/outdeg(u)` for `iterations`
    * rounds from the uniform start `1/N`, over the distinct self-loop-
    * free edge set. Rank mass reaching a node with no out-edges leaks
    * (total < 1); that variant keeps every step plain relational
    * algebra, which is what makes the cross-engine oracle possible.
    *
    * Determinism across engines: per-edge contributions `r/outdeg` are
    * quantized to the 2^-20 binary grid BEFORE the per-node sum (grid
    * addends sum exactly in double, so aggregation order cannot matter)
    * and the rank update is re-quantized each round; `d` and `1-d` are
    * threaded into the oracle SQL via round-trip `Double.toString`, so
    * both engines evaluate the identical IEEE chain. Fixed iteration
    * count (not a convergence test) keeps the replay finite.
    *
    * 100 TB: each round is one equi-join of the edge table against the
    * node-sized rank table plus one partial-aggregatable sum keyed on
    * dst — the standard distributed PageRank shape; the edge table is
    * computed once and cached, rank lineage grows linearly in the
    * (fixed, small) round count. Hot dst nodes salt like any skewed
    * aggregation key.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, damping: Double = 0.85,
               checkpointEvery: Int = 8): DataFrame = {
    val grid = 1048576 // 2^20
    def q(c: Column): Column = floor(c * grid + lit(0.5)) / grid
    val e = graft.Caches.persistOnce(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst")).distinct())
    val nodes = graft.Caches.persistOnce(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val nCount = nodes.agg(count(lit(1)).cast("double").as("n"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.crossJoin(broadcast(nCount))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (i <- 1 to iterations) {
      val sums = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), q(col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .crossJoin(broadcast(nCount))
        .select(col("node"),
          q(lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      // the rank lineage chains one join+agg per round; truncate it
      // periodically so a high-iteration run can't blow analysis/plan
      // depth (same discipline as the connected-components loop)
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Bounded-round k-core peeling: starting from the undirected
    * self-loop-free edge set, each round removes every node whose
    * current degree is < k together with its incident edges, for
    * `rounds` rounds — the standard iterative k-core decomposition
    * step (Seidman 1983; the distributed formulation of Montresor et
    * al.). After enough rounds the survivor set IS the k-core; a FIXED
    * round count keeps the unrolled cross-engine oracle replay finite
    * (the pageRank/minLabelPropagation discipline) and each round's
    * survivor sizes are themselves the analytics deliverable — how
    * fast the periphery peels is the graph's core-structure profile
    * (spam/bot rings peel instantly; dense communities survive).
    *
    * Returns one row per round 0..rounds: (round, n_nodes, n_edges),
    * round 0 being the input graph. Deterministic by construction —
    * integer degrees and set semantics, no quantization.
    *
    * 100 TB: each round is one partial-aggregatable degree count keyed
    * on the node plus two left-semi joins of the edge table against the
    * (node-sized) survivor set — the label-propagation shape with semi
    * joins instead of min; the edge frame halves-or-better per round on
    * real graphs, so later rounds are cheap. The per-round (n_nodes,
    * n_edges) stats are LAZY single-row aggregates unioned into the
    * result frame — the whole peel is ONE Spark action at the caller's
    * first action, not 2·(rounds+1) eager driver round-trips (each
    * round's edge frame is persisted, so every union branch reads its
    * round's cache, and the degree rollup doubles as the node count:
    * n_nodes = count of degree groups, n_edges = Σdeg/2 — no second
    * pass, no Expand). The one-action contract holds for rounds <
    * checkpointEvery; at the cadence an EAGER localCheckpoint fires
    * deliberately (see the in-loop comment for the measured
    * adjudication of the lazy/no-checkpoint alternatives).
    */
  def kCorePeel(edges: DataFrame, aCol: String, bCol: String,
                k: Int = 3, rounds: Int = 3,
                checkpointEvery: Int = 6): DataFrame = {
    require(checkpointEvery >= 2, s"checkpointEvery=$checkpointEvery")
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1, 64] (bounded unrolled replay), got $rounds")
    var e = graft.Caches.persistOnce(
      edges.select(least(col(aCol), col(bCol)).as("a"),
                   greatest(col(aCol), col(bCol)).as("b"))
        .filter(col("a") =!= col("b") && col("a").isNotNull).distinct())
    // node set = endpoints of surviving edges (a node isolated by its
    // neighbors' removal has degree 0 < k and is gone next round anyway
    // — counting it as already peeled keeps every round one edge scan).
    // LAZY one-row stats per round: the degree rollup is the node count
    // (one group per endpoint) and Σdeg = 2·|E| — one partial agg + one
    // single-row rollup, no driver action here.
    def degrees(ed: DataFrame): DataFrame =
      ed.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("d"))
    def stats(ed: DataFrame, r: Int): DataFrame =
      degrees(ed).agg(
          count(lit(1)).as("n_nodes"),
          (coalesce(sum(col("d")), lit(0L)) / 2).cast("long").as("n_edges"))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
    var out = stats(e, 0)
    for (r <- 1 to rounds) {
      val keep = degrees(e).filter(col("d") >= k).select("v")
      e = graft.Caches.persistOnce(
        e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
          .select("a", "b"))
      // Periodic EAGER checkpoint, both alternatives measured and
      // rejected (r11 ADVICE follow-up): localCheckpoint(eager = false)
      // is NOT construction-lazy under AQE (Dataset.checkpoint calls
      // toRdd, and AdaptiveSparkPlanExec materializes every query stage
      // to finalize the plan — measured: 92 construction jobs at
      // rounds=9), and NO checkpoint makes the PRINTED plan exponential
      // (each round's frame references the previous one 3×; persist
      // bounds execution but InMemoryRelation prints its build subtree
      // per reference, and AQE emits explainString events at execution
      // — a rounds=9 run hung 30+ min inside generateTreeString). So:
      // the one-action contract holds for rounds < checkpointEvery
      // (pinned in Round10bPlanSpec); longer runs deliberately pay one
      // truncating job per checkpointEvery rounds.
      if (r % checkpointEvery == 0 && r < rounds) e = e.localCheckpoint()
      out = out.unionByName(stats(e, r))
    }
    out
  }

  /** Synchronous min-label propagation for `rounds` rounds: every node
    * starts labeled with its own id and each round takes
    * `lbl'(v) = min(lbl(v), min_{u~v} lbl(u))` over the undirected
    * neighbor set. After k rounds two nodes share a label iff a path of
    * ≤ k hops connects them to the same minimum — the bounded-round
    * community view (label = the component minimum once k reaches the
    * component diameter).
    *
    * This is the fully-distributed companion to the driver union-find
    * in [[Dedup]] (which is fenced at 1 M edges): label propagation
    * never materializes edges on the driver, so it is the path past the
    * fence — at the cost of Θ(diameter) rounds instead of one pass
    * (star-contraction, also in Dedup, closes the gap to O(log n)
    * rounds; the FIXED round count here is what makes the unrolled
    * cross-engine oracle replay finite, the pageRank discipline).
    *
    * Deterministic by construction: integer min over a set — no
    * quantization, no tie concerns.
    *
    * Round structure (round 12 — bit-identical to the naive unrolling,
    * ~2× fewer edge-sized exchanges):
    *   - Round 1 needs NO join: every node's label is still its own id,
    *     so `nbrMin(v) = min_{u~v} u` is one partial-aggregatable min
    *     straight off the edge table.
    *   - Rounds 2+ are DELTA rounds: a neighbor u can only improve v in
    *     round r if u's own label changed in round r−1 (an unchanged
    *     label was already offered to v last round and min is
    *     idempotent), so the edge join runs against the CHANGED label
    *     rows only. The frontier collapses geometrically on real graphs
    *     (a label must travel r−1 hops to still be moving), and AQE
    *     broadcasts the shrunken frontier — later rounds cost a
    *     broadcast probe of the cached edge frame instead of a full
    *     edge exchange. At 100 TB the same delta discipline holds: the
    *     per-round join volume is frontier-incident edges, not E.
    *
    * A pre-partitioned edge persist (repartition(u) before cache) was
    * MEASURED and rejected: the per-round joins rebuild attribute ids,
    * so the cached layout does not satisfy the join distribution and
    * the exchange stays (A/B at sf0.1: 4.99 s min both ways, +1 build
    * shuffle); bucketed TABLES (SourcesSpec's co-located-join path)
    * are the exchange-free variant when edges live in storage.
    */
  def minLabelPropagation(edges: DataFrame, aCol: String, bCol: String,
                          rounds: Int = 3,
                          checkpointEvery: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1, 64] (bounded unrolled replay), got $rounds")
    require(checkpointEvery >= 2, s"checkpointEvery=$checkpointEvery")
    val und = graft.Caches.persistOnce(
      edges.select(col(aCol).as("v"), col(bCol).as("u"))
        .union(edges.select(col(bCol).as("v"), col(aCol).as("u")))
        .filter(col("v") =!= col("u") && col("v").isNotNull).distinct())
    // round 1: nbrMin = min neighbor id (labels are identities), fused
    // with the node set build — one aggregate produces (v, lbl, changed)
    var lbl = graft.Caches.persistOnce(
      und.groupBy("v").agg(min(col("u")).as("nlbl"))
        .select(col("v"), least(col("v"), col("nlbl")).as("lbl"),
          (col("nlbl") < col("v")).as("changed")))
    for (r <- 2 to rounds) {
      // only last round's movers can improve a neighbor this round
      val frontier = lbl.filter(col("changed"))
        .select(col("v").as("u"), col("lbl").as("ulbl"))
      val nbrMin = und.join(frontier, "u")
        .groupBy("v").agg(min(col("ulbl")).as("nlbl"))
      // per-round persist truncates recomputation (lbl is referenced
      // twice each round: frontier + update join). Unlike the CC
      // loop's unique-per-round intermediates, these NODE-SIZED round
      // frames deliberately stay cached: persistOnce dedups them by
      // canonical plan across invocations, so the bench's repeated a63
      // runs converge on one cache set instead of rebuilding the
      // chain (Caches lifecycle policy: callers release via clearAll).
      // The periodic EAGER checkpoint truncates the PRINTED plan,
      // which doubles per round and would hang AQE's explainString
      // events at high round counts — see kCorePeel's measured
      // adjudication of both alternatives.
      lbl = graft.Caches.persistOnce(
        lbl.join(nbrMin, Seq("v"), "left")
          .select(col("v"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
            coalesce(col("nlbl") < col("lbl"), lit(false)).as("changed")))
      if (r % checkpointEvery == 0 && r < rounds) lbl = lbl.localCheckpoint()
    }
    lbl.select("v", "lbl")
  }
}
