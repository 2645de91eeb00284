package graft.queries

/** DuckDB replay of [[graft.functions.HilbertIndex2D]] — the top-bit-
  * down Hilbert walk unrolled into staged per-level CTEs, the
  * [[Murmur3Sql]] pattern: one small CTE pair per level keeps every
  * expression referencing the PREVIOUS level's materialized (x, y, d)
  * columns, so no lateral-alias ambiguity and no combinatorial
  * expression growth. Pure integer arithmetic (`&`, `xor`, adds) —
  * bit-identical to the codegen'd loop.
  */
object HilbertSql {
  /** CTE chain computing the Hilbert index of (hx, hy) from `srcCte`
    * (which must expose non-negative BIGINT `hx`, `hy` plus
    * `keepCols`), exposing keepCols + the index as `d` in the returned
    * final CTE name. Inputs wrap into the grid via floor-mod like the
    * expression (`((v % m) + m) % m`, exact for the non-negative
    * fixture ids too).
    */
  def curveCtes(srcCte: String, keep: Seq[String], prefix: String,
                bits: Int): (String, String) = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range [1,31]")
    val reserved = Set("x", "y", "d", "rx", "ry", "hx", "hy")
    require(keep.forall(k => !reserved.contains(k)),
      s"keep columns $keep collide with the walk's internal names " +
        s"($reserved)")
    val m = 1L << bits
    val ks = keep.mkString(", ")
    val kc = if (keep.isEmpty) "" else s"$ks, "
    val levels = (bits - 1 to 0 by -1).zipWithIndex.map { case (lvl, i) =>
      val s = 1L << lvl
      val prev = if (i == 0) s"${prefix}0" else s"$prefix$i"
      s"""${prefix}a$i AS (SELECT $kc x, y, d,
           CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
           CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         FROM $prev),
       ${prefix}${i + 1} AS (SELECT $kc
           CASE WHEN ry = 1 THEN x
                WHEN rx = 1 THEN $s - 1 - y ELSE y END AS x,
           CASE WHEN ry = 1 THEN y
                WHEN rx = 1 THEN $s - 1 - x ELSE x END AS y,
           d + ${s * s} * xor(3 * rx, ry) AS d
         FROM ${prefix}a$i)"""
    }.mkString(",\n       ")
    (s"""${prefix}0 AS (SELECT $kc ((hx % $m) + $m) % $m AS x,
           ((hy % $m) + $m) % $m AS y, CAST(0 AS BIGINT) AS d
         FROM $srcCte),
       $levels,""",
      s"$prefix$bits")
  }
}
