package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkTestBase

/** Round-16 crafted-case fences: inputs the synthetic fixture cannot
  * produce — the chi-square degenerate-slice guard (one doc_id parity
  * slice empty) first; the round's new operators add theirs below.
  */
class Round16OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenChisq: a corpus whose docs all land in ONE parity slice " +
       "(t_b = 0) yields 0 contributions, not 0/0 NaN — Spark's " +
       "floor(NaN)=0 vs DuckDB's NaN would otherwise diverge") {
    // every doc_id even → slice B has zero mass in the whole corpus
    val docs = Seq(
      (0L, "w w q", "s"),
      (2L, "w r", "s"))
      .toDF("doc_id", "text", "source")
    val rows = graft.queries.Extensions.tokenChisq(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(3)
      assert(!v.isNaN, s"guarded contribution must never be NaN: $r")
      assert(v === 0.0,
        "zero-mass slice ⇒ e=0 and d=0 ⇒ contribution 0 by convention")
    }
    // the mirror: all-odd doc_ids empty slice A instead
    val odd = Seq((1L, "w w q", "s"), (3L, "w r", "s"))
      .toDF("doc_id", "text", "source")
    graft.queries.Extensions.tokenChisq(odd).collect().foreach { r =>
      assert(r.getDouble(3) === 0.0)
    }
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarkAudit: the first batch is never late (null frontier); " +
       "the frontier is the max of strictly PRIOR batches; a budget " +
       "drops only STRICTLY beyond it (late 7d survives the 7d budget)") {
    val orders = Seq(
      // batch 0: frontier null — the regressing date is NOT late
      (0L, ts("2024-01-10 00:00:00"), "P1"),
      (1L, ts("2024-01-05 00:00:00"), "P1"),
      // batch 1: frontier = 01-10 (prior max, NOT this batch's 02-01);
      // 01-03 → late 7 (survives the 7d budget: strictly-greater rule),
      // 2023-12-01 → late 40 (dropped at 7 AND 30)
      (1000L, ts("2024-02-01 00:00:00"), "P1"),
      (1001L, ts("2024-01-03 00:00:00"), "P1"),
      (1002L, ts("2023-12-01 00:00:00"), "P2"),
      // batch 2: frontier = 02-01 now; on-time arrival
      (2000L, ts("2024-02-02 00:00:00"), "P2"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val out = graft.queries.StreamingQ.watermarkAudit(orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(out("P1") === (4L, 1L, 0L, 0L, 7L))
    assert(out("P2") === (2L, 1L, 1L, 1L, 40L))
    assert(out.size === 2)
  }

  test("streamDedupAudit: exact wins over near (an identical later copy " +
       "counts removed_exact ONLY, though SimHash always flags it); " +
       "kept/exact/near are disjoint and sum to n_docs per source") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, t1, "s1"),                 // first copy → kept
      (2L, t1, "s2"),                 // identical, later → exact ONLY
      (3L, "completely different text about spark streaming state", "s1"))
      .toDF("doc_id", "text", "source")
    val out = graft.queries.StreamingQ.streamDedupAudit(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 3 may or may not band-collide with doc 1 (SimHash is
    // content-dependent) — assert the INVARIANTS plus the crafted
    // exact-precedence cell
    assert(out("s2") === (1L, 0L, 1L, 0L),
      "identical later copy must be exact, never near")
    val (n1, k1, e1, nn1) = out("s1")
    assert(n1 === 2L && e1 === 0L && k1 + nn1 === 2L && k1 >= 1L)
    out.values.foreach { case (n, k, e, nn) => assert(k + e + nn === n) }
  }

  test("streamDedupAudit ≡ nearDupFlags + first-copy recombined on the " +
       "sf0.001 fixture (the rollup invents no rows)") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val audit = graft.queries.StreamingQ.streamDedupAudit(docs).collect()
    val flags = graft.streaming.DocStreams
      .nearDupFlags(docs, "text", "doc_id")
    val base = docs.select(col("doc_id"), col("source"), col("text"))
      .join(flags.select(col("doc_id"), col("is_dup")), "doc_id").collect()
    val firstByText = base.groupBy(_.getString(2))
      .map { case (t, rs) => t -> rs.map(_.getLong(0)).min }
    val expect = base.groupBy(_.getString(1)).map { case (src, rs) =>
      val isx = rs.count(r => firstByText(r.getString(2)) < r.getLong(0))
      val isn = rs.count(r => firstByText(r.getString(2)) >= r.getLong(0) &&
        r.getInt(3) === 1)
      src -> (rs.length.toLong, (rs.length - isx - isn).toLong,
        isx.toLong, isn.toLong)
    }
    val got = audit.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
  }

  test("supplierConcentration: CR prefix sums with (rev desc, suppkey) " +
       "tiebreak; a single-supplier nation is CR4 = 10000 bp; the " +
       "basis-point division truncates") {
    val li = Seq(
      // N1: five suppliers, revenues 50/20/15/10/5 → top1 50, top4 95
      (1L, 50.0, 0.0), (2L, 20.0, 0.0), (3L, 15.0, 0.0),
      (4L, 10.0, 0.0), (5L, 5.0, 0.0),
      // N2: one supplier, with a discount path (10.01·0.97 = 9.7097)
      (6L, 10.01, 0.03),
      // N3: a revenue TIE between suppliers 7 and 8 → suppkey asc puts
      // 7 at rank 1 (top1 reads 7's revenue)
      (7L, 30.0, 0.0), (8L, 30.0, 0.0), (9L, 1.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 2L), (7L, 3L), (8L, 3L), (9L, 3L))
      .toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "N1"), (2L, "N2"), (3L, "N3"))
      .toDF("n_nationkey", "n_name")
    val out = graft.queries.Analytics.supplierConcentration(li, sup, nat)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("N1") === (5L, 1000000L, 500000L, 950000L, 9500L))
    assert(out("N2") === (1L, 97097L, 97097L, 97097L, 10000L))
    // N3: tot 610000, top4 = all → 10000 bp; top1 = supplier 7's 300000
    assert(out("N3") === (3L, 610000L, 300000L, 610000L, 10000L))
    // truncation pin: 950000·10000/1000000 = 9500 exactly here; craft
    // a non-exact one — 1/3 → 3333 bp, never 3334
    val li2 = Seq((1L, 1.0, 0.0), (2L, 2.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val sup2 = Seq((1L, 1L), (2L, 1L)).toDF("s_suppkey", "s_nationkey")
    val one = graft.queries.Analytics.supplierConcentration(
      li2.filter(col("l_suppkey") === 1L), sup2, nat).collect()
    assert(one.head.getLong(5) === 10000L)
    val topOnly = graft.queries.Analytics.supplierConcentration(
      li2, sup2, nat).collect().head
    // top1 = 20000 e4 of 30000 → 6666 bp truncated (6666.67)
    assert(topOnly.getLong(3) === 20000L)
  }

  test("tradeMatrix: directed nation pairs (N1→N2 and N2→N1 are " +
       "distinct rows), exact discounted e4, domestic flag on the " +
       "diagonal only") {
    val li = Seq(
      (100L, 10L, 10.0, 0.0),   // order 100 (cust in N2), supp 10 (N1)
      (100L, 20L, 5.0, 0.1),    // same order, supp 20 (N2) → domestic
      (200L, 10L, 7.0, 0.0))    // order 200 (cust in N1), supp 10 → domestic
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val o = Seq((100L, 2L), (200L, 1L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey")
    val sup = Seq((10L, 1L), (20L, 2L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "N1"), (2L, "N2")).toDF("n_nationkey", "n_name")
    val out = graft.queries.Analytics.tradeMatrix(li, o, cust, sup, nat)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("N1", "N2")) === (100000L, 1L, false))
    assert(out(("N2", "N2")) === (45000L, 1L, true)) // 5.00·0.90 e4
    assert(out(("N1", "N1")) === (70000L, 1L, true))
    assert(out.size === 3)
  }

  test("repeatPurchaseShare: the SECOND shipment of a (customer, part) " +
       "pair is the first repeat; equal shipdates break by (orderkey, " +
       "linenumber); different customers never cross; the bp division " +
       "truncates") {
    val d1 = ts("2024-01-01 00:00:00")
    val d2 = ts("2024-02-01 00:00:00")
    val li = Seq(
      // cust 1, part 5: three lines — two on the SAME date (orderkey
      // tiebreak: order 100 is first), one later → repeats = lines 2,3
      (100L, 5L, 1L, d1, 10.0, 0.0),
      (101L, 5L, 1L, d1, 20.0, 0.0),
      (102L, 5L, 1L, d2, 30.0, 0.0),
      // cust 2, same part 5: its own sequence → first, no repeat
      (200L, 5L, 1L, d1, 40.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate",
        "l_extendedprice", "l_discount")
    val o = Seq((100L, 1L), (101L, 1L), (102L, 1L), (200L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val part = Seq((5L, "B1")).toDF("p_partkey", "p_brand")
    val out = graft.queries.Analytics.repeatPurchaseShare(li, o, part)
      .collect()
    assert(out.length === 1)
    val r = out.head
    // repeats: 20.00 + 30.00 of total 100.00 → 5000 bp exactly
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ===
      ("B1", 4L, 2L, 1000000L, 500000L, 5000L))
    // truncation: repeat 10 of 30 dollars → 3333 bp, never rounded up
    val li2 = Seq(
      (1L, 5L, 1L, d1, 20.0, 0.0), (2L, 5L, 1L, d2, 10.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate",
        "l_extendedprice", "l_discount")
    val o2 = Seq((1L, 1L), (2L, 1L)).toDF("o_orderkey", "o_custkey")
    assert(graft.queries.Analytics.repeatPurchaseShare(li2, o2, part)
      .collect().head.getLong(5) === 3333L)
  }

  test("codeDetect: the 2% symbol boundary is STRICT (1 symbol in 50 " +
       "chars is not code, in 49 it is); the char class counts " +
       "structural symbols only") {
    // 49 chars incl. one '=' → 50 > 49 → code; pad to 50 → not code
    val base = "a" * 24 + "=" + "a" * 24            // 49 chars
    val docs = Seq(
      (1L, base, "s1"),                             // 50 > 49 → code
      (2L, base + "a", "s1"),                       // 50 = 50 → NOT code
      (3L, "plain words, commas. and periods!", "s2")) // 0 symbols
      .toDF("doc_id", "text", "source")
    val out = graft.queries.Extensions.codeDetect(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("s1") === (2L, 1L, 2L, 99L))
    assert(out("s2") === (1L, 0L, 0L, 33L))
  }

  test("numericDensity: only FULL-match digit tokens count ('0;' and " +
       "'x1' are not numeric); the 5% boundary is strict; digit chars " +
       "sum independently") {
    val docs = Seq(
      // 20 tokens, exactly 1 numeric → 20 = 20 → NOT heavy
      (1L, ("w " * 19) + "7", "s1"),
      // 19 tokens, 1 numeric → 20 > 19 → heavy
      (2L, ("w " * 18) + "7", "s1"),
      // negatives: punctuation-attached and alphanumeric tokens
      (3L, "0; x1 v2x 3.5", "s2"))
      .toDF("doc_id", "text", "source")
    val out = graft.queries.Extensions.numericDensity(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("s1") === (2L, 1L, 2L, 2L, 39L))
    // "0; x1 v2x 3.5": 4 tokens, 0 numeric, 5 digit CHARS (0,1,2,3,5)
    assert(out("s2") === (1L, 0L, 0L, 5L, 4L))
  }

  test("injectStructured coverage on the fixture: x128 flags exactly " +
       "the doc_id % 6 = 1 docs, x129 exactly the % 9 = 4 docs, and " +
       "the mod-18 overlap doc carries both") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val inj = graft.queries.Extensions.injectStructured(docs)
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val code = graft.queries.Extensions.codeDetect(inj)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val codeExpect = docs.select("doc_id", "source").collect()
      .filter(_.getLong(0) % 6 == 1L)
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(code.filter(_._2 > 0) === codeExpect)
    val num = graft.queries.Extensions.numericDensity(inj)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val numExpect = docs.select("doc_id", "source").collect()
      .filter(_.getLong(0) % 9 == 4L)
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(num.filter(_._2 > 0) === numExpect)
    assert(ids.exists(i => i % 18 == 13L),
      "fixture must exercise the both-injections overlap")
  }

  test("dedupTokenSavings: kept/saved token masses split on the canon " +
       "identity and the basis-point division truncates") {
    val docs = Seq(
      (1L, "a b c", "s1"),   // canonical → kept, 3 tokens
      (2L, "a b", "s1"),     // removed → saved, 2 tokens
      (3L, "x", "s2"))       // canonical → kept
      .toDF("doc_id", "text", "source")
    val canon = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("doc_id", "canonical_id")
    val out = graft.queries.Extensions.dedupTokenSavings(docs, canon)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // s1: 5 tokens, 3 kept, 2 saved → 2·10000/5 = 4000 bp exactly
    assert(out("s1") === (2L, 5L, 3L, 2L, 4000L))
    assert(out("s2") === (1L, 1L, 1L, 0L, 0L))
    // truncation: 1 of 3 tokens saved → 3333 bp, never 3334
    val docs2 = Seq((1L, "a b", "s"), (2L, "c", "s"))
      .toDF("doc_id", "text", "source")
    val canon2 = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "canonical_id")
    assert(graft.queries.Extensions.dedupTokenSavings(docs2, canon2)
      .collect().head.getLong(5) === 3333L)
  }

  test("langMargin: margin = best − second over the sorted hit array; " +
       "margin ≤ 1 is ambiguous (strict boundary: margin 2 is " +
       "confident), no hits at all is und") {
    val docs = Seq(
      (1L, "the of and", "s1"),      // en 3, rest 0 → margin 3, confident
      (2L, "the the der", "s1"),     // en 2, de 1 → margin 1, ambiguous
      (3L, "the the der zz", "s1"),  // same hits → still ambiguous
      (4L, "la de", "s2"),           // es 2, fr 2 tie → margin 0, ambiguous
      (5L, "zz qq", "s2"),           // no hits → und (margin 0)
      (6L, "the of der", "s2"))      // en 2, de 1 → margin 1, ambiguous
      .toDF("doc_id", "text", "source")
    val out = graft.queries.Extensions.langMargin(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("s1") === (3L, 0L, 2L, 1L, 5L))
    assert(out("s2") === (3L, 1L, 2L, 0L, 1L))
    // the margin-2 boundary: en 3 de 1 → confident
    val b = graft.queries.Extensions.langMargin(
      Seq((7L, "the of and der", "s3")).toDF("doc_id", "text", "source"))
      .collect().head
    assert((b.getLong(4), b.getLong(5)) === (1L, 2L),
      "margin 2 must be confident, not ambiguous")
  }

  test("dedupQualityBias: the 2×2 cells are disjoint, exhaustive, and " +
       "split on the canon identity × the x08 quality gate (a short " +
       "doc fails the 10-token band)") {
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, good, "s1"),          // kept + ok (12 tokens, no punct)
      (2L, good, "s1"),          // removed + ok
      (3L, "too short", "s1"),   // kept (own cluster) + low (2 tokens)
      (4L, good + " x", "s2"))   // kept + ok
      .toDF("doc_id", "text", "source")
    val canon = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "canonical_id")
    val out = graft.queries.Extensions.dedupQualityBias(docs, canon)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("s1") === (3L, 1L, 1L, 1L, 0L))
    assert(out("s2") === (1L, 1L, 0L, 0L, 0L))
    out.values.foreach { case (n, a, b, c, d) => assert(a + b + c + d === n) }
  }

  test("tradeBalance: cross-border flows only (domestic excluded from " +
       "BOTH sides), never-trading sides coalesce to 0, balance sign " +
       "is export minus import") {
    val li = Seq(
      (100L, 10L, 10.0, 0.0),  // N1 supp → N2 cust: N1 exports 100000
      (200L, 10L, 7.0, 0.0),   // N1 supp → N1 cust: DOMESTIC — excluded
      (300L, 20L, 4.0, 0.0))   // N2 supp → N1 cust: N1 imports 40000
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val o = Seq((100L, 2L), (200L, 1L), (300L, 1L))
      .toDF("o_orderkey", "o_custkey")
    val cust = Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey")
    val sup = Seq((10L, 1L), (20L, 2L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "N1"), (2L, "N2")).toDF("n_nationkey", "n_name")
    val out = graft.queries.Analytics.tradeBalance(li, o, cust, sup, nat)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("N1") === (100000L, 40000L, 1L, 1L, 60000L))
    assert(out("N2") === (40000L, 100000L, 1L, 1L, -60000L))
    // a nation that only exports: the import side coalesces to 0
    val li2 = Seq((100L, 10L, 10.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out2 = graft.queries.Analytics.tradeBalance(li2,
      Seq((100L, 2L)).toDF("o_orderkey", "o_custkey"), cust, sup, nat)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(5))).toMap
    assert(out2("N1") === (100000L, 0L, 100000L))
    assert(out2("N2") === (0L, 100000L, -100000L))
  }

  test("supplierRedundancy: k counts DISTINCT suppliers (repeat " +
       "shipments collapse); never-shipped parts report k = 0 off the " +
       "part-dim base") {
    val li = Seq(
      (1L, 10L), (1L, 10L), (1L, 11L), // part 1: suppliers {10, 11}
      (3L, 10L))                       // part 3: supplier {10}
      .toDF("l_partkey", "l_suppkey")
    val part = Seq((1L, "B1"), (2L, "B1"), (3L, "B2"))
      .toDF("p_partkey", "p_brand")
    val out = graft.queries.Analytics.supplierRedundancy(li, part)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(("B1", 0L) -> 1L, ("B1", 2L) -> 1L,
      ("B2", 1L) -> 1L))
  }
}
