package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.functions.{col, count, lit, max}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Memorialized guards for the two cross-engine divergence classes the
  * round-10 full-surface sf1 sweep caught (VERDICT r10 ask 7) — run as
  * LINTS over every surface query's optimized plan so a regression
  * fails here, one scale factor below where it would bite:
  *
  *  1. MONEY: a DECIMAL chain whose unclamped precision exceeds 38
  *     silently rounds scale in Spark while DuckDB at exactly 38 stays
  *     exact; and a DECIMAL→DOUBLE cast above cent scale can double-
  *     round past 2^53 in DuckDB (int128→double→scale-down) vs Spark's
  *     single-rounded BigDecimal. Discipline: round exact sums to
  *     cents (scale ≤ 2) before any DOUBLE cast; never let decimal
  *     arithmetic saturate precision 38.
  *
  *  2. LIMIT: a limit(n) whose sort is not a TOTAL order of its rows
  *     lets the two engines break ties differently (the p14 class —
  *     the sf1 fixture duplicates the TPC-H (orderkey, linenumber)
  *     key). Checked EMPIRICALLY: for every Limit's underlying Sort,
  *     the sort-key tuple must be duplicate-free over the sort input
  *     at the spec's SF.
  *
  * Both lints are red-teamed with seeded violations.
  */
class GuardrailsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private lazy val plans: Seq[(String, LogicalPlan)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, q) =>
      n -> q(spark, sf).queryExecution.optimizedPlan
    }

  // ------------------------------------------------------- money lint

  private def moneyFindings(name: String, p: LogicalPlan): Seq[String] =
    p.flatMap { node =>
      node.expressions.flatMap(_.collect {
        case c: Cast
            if c.dataType == DoubleType &&
              c.child.dataType.isInstanceOf[DecimalType] &&
              c.child.dataType.asInstanceOf[DecimalType].scale > 2 =>
          s"$name: cast(${c.child.dataType.simpleString} as double) — " +
            "round to cents (scale <= 2) before the DOUBLE cast"
        case m: Multiply
            if m.left.dataType.isInstanceOf[DecimalType] &&
              m.right.dataType.isInstanceOf[DecimalType] &&
              decimalMulLosesScale(
                m.left.dataType.asInstanceOf[DecimalType],
                m.right.dataType.asInstanceOf[DecimalType]) =>
          s"$name: decimal multiply needs precision > 38 AND loses scale " +
            s"(${m.left.dataType.simpleString} * ${m.right.dataType.simpleString})" +
            " — Spark rounds where DuckDB at 38 stays exact"
      })
    }

  /** Spark's DecimalPrecision adjustment for multiply: natural result is
    * (p1+p2+1, s1+s2); above 38 the scale clamps to
    * max(38 − intDigits, min(s, 6)). The r10 divergence class is the
    * SCALE LOSS — a clamped result that keeps its natural scale (e.g.
    * a40's (35,4)·(5,0) → (38,4)) is still exact for any magnitude the
    * fixture can produce and hash-matches.
    */
  private def decimalMulLosesScale(l: DecimalType, r: DecimalType): Boolean = {
    val p = l.precision + r.precision + 1
    val s = l.scale + r.scale
    if (p <= 38) false
    else {
      val adjusted = math.max(38 - (p - s), math.min(s, 6))
      adjusted < s
    }
  }

  test("money lint: no surface query casts DECIMAL above cent scale to " +
       "DOUBLE, and no decimal multiply saturates precision 38") {
    val bad = plans.flatMap { case (n, p) => moneyFindings(n, p) }
    assert(bad.isEmpty, "money-discipline violations:\n" + bad.mkString("\n"))
  }

  test("money lint catches a seeded violation (red team)") {
    // parquet-backed so ConvertToLocalRelation can't fold the casts away
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("decimal(24,6)").as("v"))
    val castBad = li.select(col("v").cast("double").as("d"))
    assert(moneyFindings("seed", castBad.queryExecution.optimizedPlan).nonEmpty)
    // (24,6)·(24,6) → natural (49,12), clamps to (38,6): scale LOST
    val mulBad = li.select((col("v") * col("v")).as("m"))
    assert(moneyFindings("seed", mulBad.queryExecution.optimizedPlan).nonEmpty)
  }

  // ------------------------------------------------------- limit lint

  /** For every GlobalLimit in `p`, the nearest Sort beneath it (the
    * planner collapses orderBy().limit() into exactly this shape); a
    * limit with NO sort anywhere below is itself a finding.
    */
  private def limitSorts(p: LogicalPlan): Seq[(GlobalLimit, Option[Sort])] =
    p.collect { case gl: GlobalLimit => gl }.map { gl =>
      gl -> gl.collectFirst { case s: Sort => s }
    }

  private def dupKeyCount(s: Sort): Long = {
    val keys = s.order.map(_.child).zipWithIndex.map { case (e: Expression, i) =>
      Alias(e, s"k$i")()
    }
    val proj = org.apache.spark.sql.GraftSqlTestShims.ofRows(
      spark, Project(keys, s.child))
    proj.groupBy(proj.columns.map(col): _*)
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
  }

  /** A Sort under a Limit is engine-independent iff ties cannot change
    * the emitted rows: either (a) the sort keys COVER the limit's
    * output (tied rows are then identical in the projection — the p14
    * shape, checked structurally, no execution), or (b) the sort-key
    * tuple is empirically duplicate-free over the sort input at this SF.
    */
  private def limitFinding(name: String, gl: GlobalLimit,
                           s: Sort): Option[String] = {
    val keyAttrs = s.order.map(_.child)
    val covered = gl.output.forall(a => keyAttrs.exists(_.semanticEquals(a)))
    if (covered) None
    else {
      val m = dupKeyCount(s)
      if (m > 1L)
        Some(s"$name: sort keys [${s.order.map(_.child.sql).mkString(", ")}] " +
          s"have duplicate tuples (max multiplicity $m) and do not cover " +
          "the projection — not a total order")
      else None
    }
  }

  test("limit lint: every surface Limit rides a Sort that is a TOTAL " +
       "order — keys cover the projection, or the key tuple is " +
       "duplicate-free over the sort input (the p14 class cannot " +
       "regress silently)") {
    val bad = plans.flatMap { case (n, p) =>
      limitSorts(p).flatMap {
        case (gl, None) =>
          Some(s"$n: limit without any sort beneath it — " +
            s"${gl.simpleString(60)}")
        case (gl, Some(s)) => limitFinding(n, gl, s)
      }
    }
    assert(bad.isEmpty, "limit-discipline violations:\n" + bad.mkString("\n"))
  }

  test("limit lint catches a seeded under-ordered limit (red team)") {
    // l_orderkey repeats across lineitems, and the projection keeps a
    // column the sort key does not determine
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val bad = li.orderBy("l_orderkey").limit(2)
    val findings = limitSorts(bad.queryExecution.optimizedPlan).collect {
      case (gl, Some(s)) => limitFinding("seed", gl, s)
    }.flatten
    assert(findings.nonEmpty, "seeded duplicate sort key must be caught")
  }
}
