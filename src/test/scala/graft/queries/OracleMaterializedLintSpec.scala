package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Full-surface lint for the twice-learned DuckDB closure-CTE lesson
  * (PERF.md rounds 10 and 11: x82, then x115): in an oracle containing
  * a RECURSIVE closure, any CTE that touches the closure (references a
  * recursive CTE directly or transitively) AND is referenced two or
  * more times downstream MUST be declared `AS MATERIALIZED` — otherwise
  * DuckDB inlines one copy of the closure per reference path, and at
  * sf1 the duplicated closure spills unboundedly (x115 died at >78 GB
  * of temp). Two strikes made it a pattern; this lint makes the third
  * impossible.
  *
  * The lint parses each oracle's top-level WITH list with a quote-aware
  * balanced-paren scan (CTE bodies may nest WITH/parens/regex literals),
  * marks recursive roots (self-referencing CTEs under WITH RECURSIVE),
  * closes touch-transitively, and counts downstream references.
  */
class OracleMaterializedLintSpec extends AnyFunSuite {

  private case class Cte(name: String, materialized: Boolean, body: String)

  /** Drop `--` line comments (quote-aware: a literal containing `--`
    * survives) so the paren scan and the CTE-list walk never trip on
    * commented-out parens or names. */
  private def stripComments(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (inStr) {
        if (c == '\'') inStr = false
        out += c
        i += 1
      } else if (c == '\'') { inStr = true; out += c; i += 1 }
      else if (c == '-' && i + 1 < sql.length && sql(i + 1) == '-') {
        while (i < sql.length && sql(i) != '\n') i += 1
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Top-level CTE list + the trailing main query, or None if the SQL
    * has no top-level WITH. */
  private def parseWith(raw: String): Option[(Boolean, Seq[Cte], String)] = {
    val sql = stripComments(raw)
    val m = "(?is)^\\s*WITH\\s+(RECURSIVE\\s+)?".r.findPrefixMatchOf(sql)
    m.map { pm =>
      val recursive = pm.group(1) != null
      var i = pm.end
      val ctes = Seq.newBuilder[Cte]
      var done = false
      while (!done) {
        while (i < sql.length && sql(i).isWhitespace) i += 1
        val ns = i
        while (i < sql.length && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        val name = sql.substring(ns, i)
        assert(name.nonEmpty, s"CTE name expected at offset $ns")
        while (i < sql.length && sql(i).isWhitespace) i += 1
        // optional column list
        if (sql(i) == '(') i = skipBalanced(sql, i)
        while (i < sql.length && sql(i).isWhitespace) i += 1
        assert(sql.regionMatches(true, i, "AS", 0, 2), s"AS expected in $name")
        i += 2
        while (i < sql.length && sql(i).isWhitespace) i += 1
        var materialized = false
        if (sql.regionMatches(true, i, "NOT MATERIALIZED", 0, 16)) {
          i += 16
          while (i < sql.length && sql(i).isWhitespace) i += 1
        } else if (sql.regionMatches(true, i, "MATERIALIZED", 0, 12)) {
          materialized = true
          i += 12
          while (i < sql.length && sql(i).isWhitespace) i += 1
        }
        assert(sql(i) == '(', s"CTE body paren expected in $name")
        val bodyStart = i + 1
        i = skipBalanced(sql, i)
        ctes += Cte(name.toLowerCase, materialized,
          sql.substring(bodyStart, i - 1))
        while (i < sql.length && sql(i).isWhitespace) i += 1
        if (i < sql.length && sql(i) == ',') i += 1 else done = true
      }
      (recursive, ctes.result(), sql.substring(i))
    }
  }

  /** Index just past the paren group opening at `open`, skipping
    * single-quoted string literals (regex/format literals contain
    * unbalanced parens). */
  private def skipBalanced(sql: String, open: Int): Int = {
    var i = open
    var depth = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    fail(s"unbalanced parens from offset $open")
  }

  /** Occurrences of `name` as a RELATION reference: word-bounded and
    * not adjacent to a dot on either side (so the qualifier in
    * `e.n_edges` and the column in `s1.sz` don't count as scans of the
    * CTEs `e` / `sz`). */
  private def refCount(body: String, name: String): Int =
    ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(name) + "(?![\\w.])").r
      .findAllIn(body).size

  /** Violations: closure-touching CTEs referenced ≥2 times downstream
    * without MATERIALIZED. */
  private def lint(sql: String): Seq[String] =
    parseWith(sql) match {
      case Some((true, ctes, main)) =>
        val roots = ctes.filter(c => refCount(c.body, c.name) > 0)
          .map(_.name).toSet
        // transitive closure of "references a recursive root" — a CTE
        // can only reference EARLIER CTEs (SQL scoping), so one forward
        // pass suffices and a column alias that happens to collide with
        // a LATER CTE's name can't poison the set
        var touching = roots
        ctes.foreach { c =>
          if (!touching(c.name) &&
              touching.exists(t => refCount(c.body, t) > 0))
            touching += c.name
        }
        ctes.zipWithIndex.collect {
          case (c, idx)
              if touching(c.name) && !roots(c.name) && !c.materialized &&
                (ctes.drop(idx + 1).map(d => refCount(d.body, c.name)).sum +
                  refCount(main, c.name)) >= 2 =>
            c.name
        }
      case _ => Seq.empty // no top-level WITH, or no RECURSIVE closure
    }

  test("every oracle with a RECURSIVE closure materializes each " +
       "closure-touching CTE that is referenced >=2 times downstream " +
       "(the x82/x115 DuckDB inlining spill, made impossible)") {
    val bad = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (q, sql) =>
        val vs =
          try lint(sql)
          catch {
            case e: org.scalatest.exceptions.TestFailedException =>
              fail(s"$q: oracle failed to parse — ${e.getMessage}")
          }
        vs.map(c => s"$q: CTE `$c` touches the recursive closure, " +
          "is multiply referenced, and is not AS MATERIALIZED")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("red team: a seeded violation is caught") {
    val seeded =
      """WITH RECURSIVE
        |cc AS (SELECT 1 AS id UNION ALL SELECT id + 1 FROM cc WHERE id < 3),
        |fit AS (SELECT id, id * 2 AS y FROM cc),
        |a AS (SELECT sum(y) AS s FROM fit),
        |b AS (SELECT max(y) AS m FROM fit)
        |SELECT * FROM a, b""".stripMargin
    assert(lint(seeded) == Seq("fit"))
    val fixed = seeded.replace("fit AS (", "fit AS MATERIALIZED (")
    assert(lint(fixed).isEmpty)
  }

  test("red team: non-touching multiply-referenced CTEs and " +
       "single-reference touching CTEs both pass") {
    val ok =
      """WITH RECURSIVE
        |cc AS (SELECT 1 AS id UNION ALL SELECT id + 1 FROM cc WHERE id < 3),
        |fit AS (SELECT id FROM cc),
        |dim AS (SELECT 1 AS d),
        |a AS (SELECT * FROM fit, dim),
        |b AS (SELECT * FROM dim)
        |SELECT * FROM a, b""".stripMargin
    assert(lint(ok).isEmpty)
  }
}
