package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-side composition: fusing ranked lists from heterogeneous
  * scorers — the hybrid lexical+semantic retrieval shape every
  * RAG / hard-negative-mining pipeline runs over its corpus.
  */
object Retrieval {
  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009, the
    * SIGIR "RRF" method): each arm contributes 1/(kRrf + rank) for the
    * documents it ranked; documents missing from an arm contribute
    * nothing from it. Scores are the 2^-20-grid-quantized reciprocal
    * (one IEEE division of exact integers per row — engine-exact, the
    * no-ln policy applied to 1/x), summed as integers; final order is
    * (fused score desc, id) with the rank assigned on the k survivors
    * via the bm25 partitionless-window-free idiom.
    *
    * Input arms are (name, ranked list with `idCol` + an integer
    * `rank` column starting at 1). Output: one row per fused doc —
    * `(rank, <idCol>, rrf_q, <name>_rank ...)` with per-arm ranks
    * null where an arm did not rank the doc.
    *
    * 100 TB: the arms are top-k lists — BOUNDED inputs regardless of
    * corpus size (each arm's own operator did the corpus-scale work);
    * fusion is a union of k·|arms| rows, one partial-agg shuffle on
    * those rows, and a TakeOrdered — driver-trivial by construction.
    */
  def rrfFuse(arms: Seq[(String, DataFrame)], idCol: String,
              k: Int = 20, kRrf: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one ranked arm")
    require(arms.map(_._1).distinct.size == arms.size, "arm names must be unique")
    val grid = 1048576L // 2^20
    val tagged = arms.map { case (name, df) =>
      df.select(col(idCol), col("rank").cast("long").as("rank"))
        .withColumn("arm", lit(name))
    }.reduce(_ unionByName _)
    val armRanks: Seq[Column] = arms.map { case (name, _) =>
      max(when(col("arm") === name, col("rank"))).as(s"${name}_rank")
    }
    tagged
      .withColumn("q",
        floor(lit(grid.toDouble) / (col("rank") + kRrf) + lit(0.5)).cast("long"))
      .groupBy(idCol)
      .agg(sum(col("q")).as("rrf_q"), armRanks: _*)
      .orderBy(col("rrf_q").desc, col(idCol)).limit(k)
      .coalesce(1)
      .sortWithinPartitions(col("rrf_q").desc, col(idCol))
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
  }
}
