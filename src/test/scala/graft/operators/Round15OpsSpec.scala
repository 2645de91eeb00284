package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-15 crafted-case fences: ABC prefix-coverage boundaries (the
  * exact-80% part, the single-part brand, discounted-cents exactness),
  * vocabulary-concentration coverage ranks under ties, and the
  * chi-square contribution arithmetic + vocab-cut tiebreak — each on
  * inputs the synthetic fixture cannot produce.
  */
class Round15OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("abcParts: the part crossing 80% is A, a part STARTING exactly " +
       "at 80% is B, at 95% is C; a single-part brand is A; discounted " +
       "revenue is exact in e4 units") {
    val part = Seq(
      (1L, "BX"), (2L, "BX"), (3L, "BX"),
      (4L, "BY"),
      (5L, "BW"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      // BX: the textbook 80/15/5 split — prefix boundaries land EXACTLY
      (1L, 80.0, 0.0), (2L, 15.0, 0.0), (3L, 5.0, 0.0),
      // BY: single part carries 100% — prev-cum 0 < 80% → A
      (4L, 10.0, 0.0),
      // BW: discount path — 10.01·0.97 = 9.7097 → 97097 e4 exactly,
      // plus 5.00·0.90 = 45000 e4
      (5L, 10.01, 0.03), (5L, 5.0, 0.1))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = graft.queries.Analytics.abcParts(li, part).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // BX: part 1 (prev 0) is A; part 2 starts exactly at 80% → NOT A
    // (strict prev-cum rule) → B; part 3 starts exactly at 95% → C
    assert(out(("BX", "A")) === (1L, 800000L))
    assert(out(("BX", "B")) === (1L, 150000L))
    assert(out(("BX", "C")) === (1L, 50000L))
    assert(out(("BY", "A")) === (1L, 100000L))
    assert(out(("BW", "A")) === (1L, 97097L + 45000L))
    assert(out.size === 5)
  }

  test("vocabConcentration: inclusive-crossing r50/r90, count-desc/" +
       "token-asc rank order under ties, exact top_cnt") {
    val docs = Seq(
      (1L, "a a a b c d", "s1"),
      (2L, "x y z", "s2"),
      (3L, "b b a a c", "s3"))
      .toDF("doc_id", "text", "source")
    val out = graft.queries.Extensions.vocabConcentration(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getLong(5))).toMap
    // s1: 'a'(3) covers exactly half of 6 → r50 = 1 (cum·2 ≥ total
    // inclusive); 90% needs all four ranks (cum 5 at r3 < 5.4)
    assert(out("s1") === (6L, 4L, 1, 4, 3L))
    // s2: all-singleton — r50 = 2 of 3, r90 = 3
    assert(out("s2") === (3L, 3L, 2, 3, 1L))
    // s3: a and b tie on 2 — token asc puts 'a' at rank 1 (top_cnt
    // reads rank 1's count); r50 = 2 (cum 4·2 ≥ 5), r90 = 3
    assert(out("s3") === (5L, 3L, 2, 3, 2L))
  }

  test("tokenChisq: contributions equal the mirrored double arithmetic " +
       "on the 2^-20 grid, ordered (chisq desc, token); the top-V vocab " +
       "cut breaks count ties by token") {
    // doc 0 → slice A: tokens w w q; doc 1 → slice B: tokens w r
    val docs = Seq(
      (0L, "w w q", "s"),
      (1L, "w r", "s"))
      .toDF("doc_id", "text", "source")
    def chiQ(na: Long, nb: Long, ta: Long, tb: Long): Double = {
      val ea = ta.toDouble * (na + nb).toDouble / (ta + tb).toDouble
      val eb = tb.toDouble * (na + nb).toDouble / (ta + tb).toDouble
      val da = na.toDouble - ea
      val db = nb.toDouble - eb
      math.floor((da * da / ea + db * db / eb) * 1048576L + 0.5) / 1048576L
    }
    val rows = graft.queries.Extensions.tokenChisq(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // totals over the full vocab: t_a = 3, t_b = 2; the slice-exclusive
    // tokens score highest, r (rarer slice) above q
    assert(rows.toSeq === Seq(
      ("r", 0L, 1L, chiQ(0, 1, 3, 2)),
      ("q", 1L, 0L, chiQ(1, 0, 3, 2)),
      ("w", 2L, 1L, chiQ(2, 1, 3, 2))))
    // topV = 2: w (count 3) is in; q and r tie on 1 → token asc keeps
    // q, drops r — and the slice totals shrink to the kept vocab
    // (t_a = 3, t_b = 1)
    val cut = graft.queries.Extensions.tokenChisq(docs, topV = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(cut.toSeq === Seq(
      ("q", 1L, 0L, chiQ(1, 0, 3, 1)),
      ("w", 2L, 1L, chiQ(2, 1, 3, 1))))
  }

  test("dedupAudit: kept / removed-exact / removed-near are disjoint " +
       "and sum to n_docs; an unshingleable exact dup (the chain never " +
       "pairs it) stays kept — the documented edge") {
    val docs = Seq(
      // s1: 1 kept, 2 = exact copy of 1 (removed-exact),
      //     3 = near-dup in 1's component (removed-near)
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma delta", "s1"),
      (3L, "alpha beta gamma epsilon", "s1"),
      // s2: 4 and 5 are identical TWO-word docs — no 3-gram shingles,
      // never pair, both canonical ⇒ both KEPT despite being copies
      (4L, "zz yy", "s2"),
      (5L, "zz yy", "s2"))
      .toDF("doc_id", "text", "source")
    val canon = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L))
      .toDF("doc_id", "canonical_id")
    val out = graft.queries.Extensions.dedupAudit(docs, canon).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // (n_docs, n_kept, n_removed_exact, n_removed_near)
    assert(out("s1") === (3L, 1L, 1L, 1L))
    assert(out("s2") === (2L, 2L, 0L, 0L)) // the pinned short-doc edge
    out.values.foreach { case (n, k, e, nr) => assert(k + e + nr === n) }
  }

  test("spearmanLengthVocab: +1 on monotone, -1 on anti-monotone, 0 " +
       "for a single-doc source (den fence), grid-exact under doc_id " +
       "rank ties") {
    val docs = Seq(
      // s1: length and vocab rise together → ρ = +1 (rho_q = 2^20)
      (1L, "a b", "s1"), (2L, "a b c", "s1"), (3L, "a b c d", "s1"),
      // s2: longer doc has FEWER distinct tokens → ρ = −1
      (10L, "x x x", "s2"), (11L, "a b", "s2"),
      // s3: single doc — den fenced to 1, ρ_q = 0 by convention
      (20L, "solo doc here", "s3"),
      // s4: identical metrics — doc_id breaks both rank ties the same
      // way → d = 0 → ρ_q = 2^20
      (30L, "a b", "s4"), (31L, "c d", "s4"))
      .toDF("doc_id", "text", "source")
    val out = graft.queries.Extensions.spearmanLengthVocab(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out("s1") === (3L, 0L, 1048576L))
    assert(out("s2") === (2L, 2L, -1048576L))
    assert(out("s3") === (1L, 0L, 0L))
    assert(out("s4") === (2L, 0L, 1048576L))
  }

  test("segmentMigration: per-nation terciles, class 0 for an absent " +
       "period and for never-ordered customers, cents ties broken by " +
       "custkey") {
    val cust = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 9L), (5L, 8L),
      (6L, 8L)).toDF("ck", "nk")
    val orders = Seq(
      // nation 7, period 1: cents 100 < 200 < 300 → classes 1, 2, 3
      (1L, "1997-05-01", 1.0), (2L, "1997-05-01", 2.0),
      (3L, "1997-05-01", 3.0),
      // nation 7, period 2: only customer 1 orders → its class = 1;
      // customers 2 and 3 take class 0
      (1L, "1998-05-01", 9.0),
      // nation 8, period 1: customers 5 and 6 TIE on cents → custkey
      // order puts 5 in bucket 1, 6 in bucket 2 (ntile(3) of 2 rows)
      (5L, "1997-06-01", 4.0), (6L, "1997-06-01", 4.0))
      .toDF("o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
    val out = graft.queries.Analytics.segmentMigration(orders, cust)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(out((7L, 1, 1)) === 1L) // customer 1: tercile 1 → tercile 1
    assert(out((7L, 2, 0)) === 1L) // customer 2: absent from period 2
    assert(out((7L, 3, 0)) === 1L)
    assert(out((9L, 0, 0)) === 1L) // never ordered at all
    assert(out((8L, 1, 0)) === 1L) // tie → ck 5 takes bucket 1
    assert(out((8L, 2, 0)) === 1L)
    assert(out.values.sum === cust.count())
  }

  test("orderReconciliation: exact-match, discrepancy and no-lines " +
       "cells in all-integer e8 units; the discounted+taxed line value " +
       "is exact") {
    val orders = Seq(
      (1L, "1-URGENT", 100.0),  // two 50.00 lines → exact
      (2L, "1-URGENT", 10.01),  // one 10.01 line, 3% disc, 8% tax
      (3L, "2-HIGH", 25.5))     // no lines at all
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val li = Seq(
      (1L, 50.0, 0.0, 0.0), (1L, 50.0, 0.0, 0.0),
      (2L, 10.01, 0.03, 0.08))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val out = graft.queries.Analytics.orderReconciliation(orders, li)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // order 2: v4 = 10.01·0.97·10000 = 97097 exactly; line_e8 =
    // 97097·(10000+800) = 1,048,647,600; header e8 = 1001·10^6 →
    // diff = 47,647,600 (the 8% tax the header ignores)
    assert(out("1-URGENT") === (2L, 1L, 0L, 47647600L, 47647600L))
    // order 3: no lines → diff = the full header total (2550·10^6)
    assert(out("2-HIGH") === (1L, 0L, 1L, 2550000000L, 2550000000L))
  }

  test("bpeCompression: exact rollup and truncating chars-per-token " +
       "ratio under a crafted (empty) merge table") {
    val docs = Seq(
      (1L, "ab cd", "s1", 5L),
      (2L, "xyz", "s1", 3L),
      (3L, "a b c d", "s2", 7L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = graft.queries.Extensions.bpeCompression(docs, Seq.empty)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // s1: 8 chars / 3 tokens → 8·2^20 div 3 = 2796202 (trunc)
    assert(out("s1") === (2L, 8L, 3L, 0L, 2796202L))
    // s2: 7 chars / 4 tokens → 7·2^20 div 4 = 1835008
    assert(out("s2") === (1L, 7L, 4L, 0L, 1835008L))
  }

  test("minhashCalibration: identical-text candidate pairs land in " +
       "error bucket 0, neither over- nor under-estimated") {
    // two identity clusters; every within-cluster pair has jaccard 1
    // AND identical signatures (lanes 16) → bucket 0 exactly
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "s"),
      (2L, "alpha beta gamma delta epsilon", "s"),
      (3L, "alpha beta gamma delta epsilon", "s"),
      (4L, "omega psi chi phi upsilon", "s"),
      (5L, "omega psi chi phi upsilon", "s"))
      .toDF("doc_id", "text", "source")
    val rows = graft.queries.Extensions.minhashCalibration(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // 3+2 identity clusters → C(3,2) + C(2,2) = 4 bucket-0 pairs; any
    // chance cross-cluster band collision would surface as a high
    // bucket — there is none on these fixed seeds
    assert(rows === Map(0L -> (4L, 0L, 0L)))
  }
}
