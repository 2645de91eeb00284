package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl-corpus curation. PageRank over the
  * domain link graph is the classic crawl-frontier / quality prior a
  * web-scale training-data pipeline computes before filtering (domains
  * endorsed by many ranked domains are fetched and kept first).
  */
object Graph {

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
}
