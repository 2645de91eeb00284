package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-14 crafted-case fences: PII regex semantics on multi-hit and
  * hit-free texts, the boilerplate df threshold boundary, and RFM
  * ntile tie/short-partition behavior — each on inputs the synthetic
  * fixture cannot produce.
  */
class Round14OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("piiScan: multi-hit docs count every instance; redaction " +
       "shortens to the exact '<PII>' lengths; hit-free text passes " +
       "through untouched") {
    val docs = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org now"),
      (2L, "call 555-1234 or 555-0000 from 10.0.0.1"),
      (3L, "no personal data here at all"),
      (4L, "556-1234 1234-555 10.0.0 1.2.3.4.5 a@b a@b.c"))
      .toDF("doc_id", "text")
    val out = graft.queries.Extensions.piiScan(docs)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc 1: two emails; "<PII>" (5 chars) replaces "a@b.co" (6) and
    // "c.d+x@e-f.org" (13) → clean = 33 - 6 - 13 + 10 = 24
    assert(out(1L) === (2L, 0L, 0L, 33L, 24L, 2L))
    // doc 2: two phones (8 chars each) + one ip (8 chars), each → 5
    // chars: clean = 39 - 3·3 = 30
    assert(out(2L) === (0L, 2L, 1L, 39L, 30L, 3L))
    // doc 3: nothing detected, length unchanged
    assert(out(3L) === (0L, 0L, 0L, 28L, 28L, 0L))
    // doc 4: boundary probes — 556- and -555 are not phones; 10.0.0
    // is not an ip; 1.2.3.4.5 contains ONE leftmost ip match
    // (1.2.3.4); neither a@b (no TLD dot) nor a@b.c (1-letter TLD,
    // pattern needs 2+) is an email.
    val d4 = out(4L)
    assert((d4._1, d4._2, d4._3) === (0L, 0L, 1L))
  }

  test("boilerplateNgrams: a 3-gram shared by exactly minDf docs is " +
       "boilerplate; by minDf-1 docs is not; fractions land on the " +
       "2^-20 grid") {
    // "alpha beta gamma" appears in docs 1-4 (df=4 → boilerplate);
    // "delta epsilon zeta" in docs 1-3 (df=3 → not). Every doc also
    // has a unique 3-gram.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta uniq1x"),
      (2L, "alpha beta gamma delta epsilon zeta uniq2x"),
      (3L, "alpha beta gamma delta epsilon zeta uniq3x"),
      (4L, "alpha beta gamma uniq4x only here"))
      .toDF("doc_id", "text")
    val out = graft.queries.Extensions.boilerplateNgrams(docs, minDf = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // docs 1-3: 5 distinct 3-grams each, exactly 1 boilerplate
    // ("alpha beta gamma"); 1*2^20 div 5 = 209715
    Seq(1L, 2L, 3L).foreach { d =>
      assert(out(d) === (5L, 1L, 209715L), s"doc $d")
    }
    // doc 4: 4 distinct 3-grams, 1 boilerplate → 262144
    assert(out(4L) === (4L, 1L, 262144L))
  }

  test("rfmSegments: a nation with fewer customers than buckets fills " +
       "low buckets only; metric ties break by custkey; cents are " +
       "exact and segment counts sum to the customer count") {
    val cust = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 9L))
      .toDF("ck", "nk")
    val orders = Seq(
      // nation 7: three customers — ntile(5) over 3 rows yields 1,2,3
      (1L, "2024-01-01", 10.0), (1L, "2024-03-01", 10.0),
      (2L, "2024-02-01", 10.0), // ties with 3 on f=1 and cents
      (3L, "2024-02-01", 10.0),
      // nation 9: single customer → every score = 1
      (4L, "2024-03-05", 1.0))
      .toDF("o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("d")))
      .drop("d")
    val rows = graft.queries.Analytics.rfmSegments(orders, cust).collect()
    val seg = rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getInt(3)) -> (r.getLong(4), r.getLong(5))).toMap
    assert(rows.map(_.getLong(4)).sum === 4L, "every customer lands once")
    // nation 9's lone customer: all scores 1 (one row, bucket 1)
    assert(seg((9L, 1, 1, 1)) === (1L, 100L))
    // nation 7, customer 1: most recent (r_days=4 sorts LAST in desc
    // order → bucket 3), f=2 (highest → bucket 3), cents=2000
    // (highest → bucket 3)
    assert(seg((7L, 3, 3, 3)) === (1L, 2000L))
    // customers 2 and 3 tie on (r_days=29, f=1, cents=1000): custkey
    // breaks the tie identically in all three sorts → ck=2 takes the
    // earlier bucket in each (r: desc order puts ties first; f/m: asc)
    assert(seg((7L, 1, 1, 1)) === (1L, 1000L))
    assert(seg((7L, 2, 2, 2)) === (1L, 1000L))
  }
}
