package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 additions: the mergeable quantile sketch (bottom-k
  * hash-rank row sampling — the sketch family's fourth leg) and its
  * streaming twin.
  */
class Round11OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def lens(n: Int) =
    (1 to n).map(i => (i.toLong, "s", (i * 7 % 100 + 1).toLong))
      .toDF("id", "src", "v")

  // ------------------------------------------------ quantileSketch

  test("quantileSketch is EXACT below k: the sample is the whole group " +
       "and the percentile cut is the exact order statistic") {
    val df = lens(100) // 100 rows < k=256
    val sk = Sketches.quantileSketch(df, Seq("src"), col("v"), col("id"))
    val row = sk.select(
      Sketches.quantileSampleSize(col("qsketch")).as("n"),
      Sketches.quantileEstimate(col("qsketch"), 50).as("p50"),
      Sketches.quantileEstimate(col("qsketch"), 99).as("p99"),
      Sketches.quantileEstimate(col("qsketch"), 100).as("p100")).head()
    val vs = df.select("v").as[Long].collect().sorted
    assert(row.getLong(0) === 100L)
    assert(row.getLong(1) === vs(50 - 1))  // ceil(100*50/100) = 50
    assert(row.getLong(2) === vs(99 - 1))
    assert(row.getLong(3) === vs.last)
  }

  test("merge of shard sketches EQUALS the direct sketch (semilattice) " +
       "— bit-identical sample arrays, in and above the sampling regime") {
    val df = lens(2000) // > k: genuine sampling
      .withColumn("shard", pmod(col("id"), lit(5)))
    val direct = Sketches.quantileSketch(df, Seq("src"), col("v"), col("id"))
      .select(col("qsketch")).head().getSeq[Any](0)
    val merged = Sketches
      .quantileSketch(df, Seq("src", "shard"), col("v"), col("id"))
      .groupBy("src")
      .agg(Sketches.quantileMergeSketches(collect_list(col("qsketch"))).as("sk"))
      .select(col("sk")).head().getSeq[Any](0)
    assert(merged === direct)
  }

  test("merge is idempotent on overlapping inputs (re-merged state)") {
    val df = lens(600)
    val sk = Sketches.quantileSketch(df, Seq("src"), col("v"), col("id"))
    val twice = sk.select(
      Sketches.quantileMergeSketches(
        array(col("qsketch"), col("qsketch"))).as("m"),
      col("qsketch"))
    val r = twice.head()
    assert(r.getSeq[Any](0) === r.getSeq[Any](1))
  }

  test("NULL values are excluded before sampling (aggregate semantics)") {
    val df = Seq((1L, "s", Some(5L)), (2L, "s", None), (3L, "s", Some(9L)))
      .toDF("id", "src", "v")
    val sk = Sketches.quantileSketch(df, Seq("src"), col("v"), col("id"))
    assert(sk.select(Sketches.quantileSampleSize(col("qsketch"))).head()
      .getLong(0) === 2L)
  }

  test("quantileEstimate fences pct outside [1, 100] and is null on an " +
       "empty sketch") {
    intercept[IllegalArgumentException] {
      Sketches.quantileEstimate(col("x"), 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.quantileEstimate(col("x"), 101)
    }
    val empty = spark.sql(
      "SELECT CAST(array() AS array<struct<h:bigint,sid:bigint,v:bigint>>) AS sk")
    assert(empty.select(Sketches.quantileEstimate(col("sk"), 50)).head()
      .isNullAt(0))
  }

  test("sampling-regime estimate lands within the O(1/sqrt(k)) band of " +
       "the exact quantile (uniform values, 3-sigma)") {
    // 20k pseudo-uniform values in [1, 10000]: median rank rsd is
    // sqrt(0.25/256) ~ 3.1% of n, so the VALUE error on a uniform
    // scale is ~3.1% of the range; assert a 3-sigma ~10% band.
    val df = (1 to 20000).map(i =>
      (i.toLong, "s", (i * 2654435761L % 10000) + 1))
      .toDF("id", "src", "v")
    val sk = Sketches.quantileSketch(df, Seq("src"), col("v"), col("id"))
    val p50 = sk.select(Sketches.quantileEstimate(col("qsketch"), 50)).head()
      .getLong(0)
    val exact = df.select("v").as[Long].collect().sorted.apply(10000 - 1)
    assert(math.abs(p50 - exact).toDouble / 10000 <= 0.10,
      s"p50 est $p50 vs exact $exact")
  }

  // --------------------------------------------- skippingReport

  test("skippingReport: a perfectly sorted layout skips every bin the " +
       "predicate range misses; an adversarial layout skips none") {
    // 64 rows, v = 0..63; one dim, bins of 8
    val df = (0L until 64L).map(i => (i, i)).toDF("id", "v")
    val sorted = Layout.skippingReport(df, "sorted", Seq("v", "id"),
      8, Seq("v"), Seq(("p", Seq(("v", lit(0L), lit(7L))))))
      .collect().head
    assert(sorted.getLong(sorted.fieldIndex("n_bins")) === 8L)
    // rows 0..7 land in bin 1; the other 7 bins miss [0,7] entirely
    assert(sorted.getLong(sorted.fieldIndex("n_skipped")) === 7L)
    // interleave v mod 8 across the order: every bin spans the whole
    // value range, so nothing skips
    val shuffled = df.withColumn("key", pmod(col("v"), lit(8)))
    val bad = Layout.skippingReport(shuffled, "bad", Seq("key", "id"),
      8, Seq("v"), Seq(("p", Seq(("v", lit(0L), lit(7L))))))
      .collect().head
    assert(bad.getLong(bad.fieldIndex("n_skipped")) === 0L)
  }

  test("skippingReport fences bad nBins and empty dims/preds") {
    val df = (0L until 8L).map(i => (i, i)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Layout.skippingReport(df, "l", Seq("v"), 1, Seq("v"),
        Seq(("p", Seq(("v", lit(0L), lit(1L))))))
    }
    intercept[IllegalArgumentException] {
      Layout.skippingReport(df, "l", Seq("v"), 8, Seq.empty,
        Seq(("p", Seq(("v", lit(0L), lit(1L))))))
    }
  }

  // --------------------------------------------- statefulQuantiles

  test("statefulQuantiles in batch EQUALS the batch sketch estimates") {
    val docs = (1 to 500).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        Seq.fill(i % 37 + 1)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val streamed = graft.streaming.DocStreams
      .statefulQuantiles(docs, "text", "source", "doc_id")
      .toDF().orderBy("source").collect()
    val t = docs.select(col("source"), col("doc_id"),
      size(split(lower(col("text")), "\\s+")).cast("bigint").as("len"))
    val batch = Sketches.quantileSketch(t, Seq("source"), col("len"),
        col("doc_id"))
      .join(t.groupBy("source").agg(count(lit(1)).as("n_rows")), "source")
      .select(col("source"), col("n_rows"),
        Sketches.quantileSampleSize(col("qsketch")).as("sample_n"),
        Sketches.quantileEstimate(col("qsketch"), 50).as("p50"),
        Sketches.quantileEstimate(col("qsketch"), 90).as("p90"),
        Sketches.quantileEstimate(col("qsketch"), 99).as("p99"))
      .orderBy("source").collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  // ------------------------------------------------ a73 rollingAnomaly

  private def ev(id: Long, sec: Int, u: Long, tpe: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d"), u, tpe, v)

  test("a73 rolling anomaly: a constant window degenerates correctly — " +
       "zero deviation never flags, any deviation flags (s²=0 without " +
       "an epsilon), and the first `win` events are unscored") {
    val rows = (1 to 8).map(i => ev(i.toLong, i, 1L, "x", 10.0)) ++ Seq(
      ev(9L, 9, 1L, "x", 10.0),   // full constant window, zero deviation
      ev(10L, 10, 1L, "x", 50.0), // full constant window, deviation
      ev(11L, 11, 2L, "x", 99.0)) // user 2: no full window, unscored
    val out = graft.queries.Analytics.rollingAnomaly(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 2L) // n_scored: events 9 and 10 only
    assert(out.head.getLong(2) === 1L) // n_anom: only the deviation
  }

  test("a73 scores against the trailing window, not the leading one: " +
       "a spike is flagged AT the spike, and the spike then inflates " +
       "the variance of its successors' windows") {
    val rows = (1 to 8).map(i => ev(i.toLong, i, 1L, "x", 10.0)) ++ Seq(
      ev(9L, 9, 1L, "x", 1000.0), // flagged: window constant at 10
      ev(10L, 10, 1L, "x", 10.0)) // window now contains the spike: s² huge
    val scoredAnoms = graft.queries.Analytics.rollingAnomaly(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .head()
    assert(scoredAnoms.getLong(1) === 2L && scoredAnoms.getLong(2) === 1L)
  }

  // ------------------------------------------------ a74 distDrift

  test("a74 drift terms match the hand-computed 2×k chi-square " +
       "contribution on an exact-midpoint split") {
    // span [0s, 100s] → midpoint 50s inclusive-early.
    // type a: 3 early 1 late; type b: 1 early 3 late; N1=N2=4.
    // term = (3·4 − 1·4)² / (4·4·4) = 64/64 = 1.0 for both.
    val rows = Seq(
      ev(1L, 0, 1L, "a", 0), ev(2L, 10, 1L, "a", 0), ev(3L, 50, 1L, "a", 0),
      ev(4L, 90, 1L, "a", 0),
      ev(5L, 20, 1L, "b", 0), ev(6L, 60, 1L, "b", 0), ev(7L, 70, 1L, "b", 0),
      ev(8L, 100, 1L, "b", 0))
    val out = graft.queries.Analytics.distDrift(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(("a", 3L, 1L, 1.0), ("b", 1L, 3L, 1.0)))
  }

  // ------------------------------------------------ a75 topPaths

  test("a75 paths take the first k events in (ts, event_id) order — " +
       "ties bind on event_id — and conversion counts the FULL " +
       "history, not just the path prefix") {
    val rows = Seq(
      // user 1: 6 events; purchase is the 6th — outside the 5-path —
      // but the path's conversion must still count it
      ev(1L, 1, 1L, "a", 0), ev(2L, 2, 1L, "b", 0), ev(3L, 3, 1L, "c", 0),
      ev(4L, 4, 1L, "d", 0), ev(5L, 5, 1L, "e", 0),
      ev(6L, 6, 1L, "purchase", 0),
      // user 2: same-ts tie — event_id order decides the path
      ev(8L, 1, 2L, "q", 0), ev(7L, 1, 2L, "p", 0))
    val out = graft.queries.Analytics.topPaths(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set(("a>b>c>d>e", 1L, 1L), ("p>q", 1L, 0L)))
  }

  // ------------------------------------------------ cmsJoinSize

  test("cmsJoinSize: exact arm equals the hand-computed per-key " +
       "product sum, and the CMS inner-product estimate NEVER " +
       "underestimates (collisions only add)") {
    // key k appears k times on side 0 and (21-k) times on side 1
    val rows = (1 to 20).flatMap { k =>
      Seq.fill(k)((k.toLong, 0L)) ++ Seq.fill(21 - k)((k.toLong, 1L))
    }
    val expected = (1 to 20).map(k => k.toLong * (21 - k)).sum
    val out = Sketches.cmsJoinSize(rows.toDF("k", "side"), "k", "side")
      .head()
    assert(out.getLong(3) === expected)
    assert(out.getLong(2) >= expected)
    assert(out.getLong(4) >= 0L) // err_bp of an overestimate
  }

  test("cmsJoinSize fences non-power-of-two widths and oversized depth") {
    val df = Seq((1L, 0L)).toDF("k", "side")
    intercept[IllegalArgumentException] {
      Sketches.cmsJoinSize(df, "k", "side", w = 100)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsJoinSize(df, "k", "side", d = 6)
    }
  }

  // ------------------------------------------------ typoPairs

  test("typoPairs finds deletion/substitution/insertion typos at edit " +
       "distance 1, rejects shared-deletion transpositions (distance " +
       "2), and the frequency asymmetry excludes legitimate rare words") {
    val docs = (
      Seq.fill(50)("hello") ++ Seq.fill(2)("helo") ++ // deletion
        Seq("hxllo") ++                               // substitution
        Seq("helloo") ++                              // insertion
        Seq("ehllo") ++                               // transposition: d=2
        Seq.fill(8)("world") ++ Seq.fill(40)("worlds") // 40 < 10·8
      ).map(Tuple1(_)).toDF("text")
    val pairs = TextAnalysis.typoPairs(docs, "text")
      .select("typo", "corr").as[(String, String)].collect().toSet
    assert(pairs === Set(("helo", "hello"), ("hxllo", "hello"),
      ("helloo", "hello")))
  }

  test("typoPairs candidate generation is the deletion neighborhood of " +
       "the VOCABULARY — tokens longer than MaxTypoTokenLen or shorter " +
       "than 4 never enter") {
    val docs = Seq.fill(30)("abc ab " + "z" * 25).map(Tuple1(_))
      .toDF("text") :: Nil
    val out = TextAnalysis.typoPairs(docs.head, "text").count()
    assert(out === 0L)
  }

  // ------------------------------------------------ a76 activityGini

  test("a76 Gini matches hand-computed rank-formula values: equal " +
       "counts → 0, and a 1-vs-9 split → exactly 0.4 on the 2⁻²⁰ grid") {
    // type e: counts (1,1,1,1) → G = 0. type u: counts (1,9) →
    // G = (2·(1·1+2·9) − 3·10) / (2·10) = 8/20 = 0.4.
    val rows =
      (1 to 4).map(u => ev(u.toLong, u, u.toLong, "e", 0)) ++
        Seq(ev(10L, 10, 10L, "u", 0)) ++
        (11 to 19).map(i => ev(i.toLong, i, 20L, "u", 0))
    val out = graft.queries.Analytics.activityGini(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      ("e", 4L, 4L, 0L),
      ("u", 2L, 10L, 419430L))) // floor(0.4 · 2^20)
  }

  // ------------------------------------------------ x114 ksFromSketches

  test("x114 KS drift is exact below k: identical distributions give " +
       "0, and a fully shifted source gives the hand-computed " +
       "rational sup |r1·n2 − r2·n1|") {
    // source a: values 1..100; source b: values 1001..1101. Global
    // sample (201 < k) is the union, so everything is exact.
    // sup for a sits anywhere in [100, 1001): r1=100=n1, r2=100 →
    // |100·201 − 100·100| = 10100; den = 100·201.
    val d = ((1 to 100).map(i => (i.toLong, "a", i.toLong)) ++
      (1 to 101).map(i => (100L + i, "b", 1000L + i)))
      .toDF("doc_id", "source", "n_chars")
    // run the x114 composition on a temp dir? No — rebuild inline:
    val sk = Sketches.quantileSketch(d, Seq("source"), col("n_chars"),
      col("doc_id"))
    val glob = sk.agg(Sketches.quantileMergeSketches(
      collect_list(col("qsketch"))).as("gsk"))
    val gvals = glob.select(explode(transform(col("gsk"),
      x => x.getField("v"))).as("v")).as[Long].collect().sorted
    assert(gvals.length === 201) // exact-below-k union
    val avals = sk.filter(col("source") === "a")
      .select(explode(transform(col("qsketch"), x => x.getField("v"))))
      .as[Long].collect().sorted
    assert(avals.toSeq === (1L to 100L))
    // the rational sup: r1·n2 − r2·n1 maximized at the shift boundary
    val expected = (10100L * 1048576L) / (100L * 201L)
    // replicate the query's window readout
    val pts = avals.map(v => (v, 1L, 0L)) ++ gvals.map(v => (v, 0L, 1L))
    val sorted = pts.sortBy(_._1)
    var (r1, r2, best) = (0L, 0L, 0L)
    // range semantics: advance over ties together
    sorted.map(_._1).distinct.foreach { v =>
      r1 += sorted.count(p => p._1 == v && p._2 == 1L)
      r2 += sorted.count(p => p._1 == v && p._3 == 1L)
      best = math.max(best, math.abs(r1 * 201L - r2 * 100L))
    }
    assert(best === 10100L)
    assert(best * 1048576L / (100L * 201L) === expected)
  }

  // ------------------------------------------------ a77 interarrival

  test("a77 inter-arrival quantiles: gaps are per (user, type) " +
       "consecutive differences in event-time order, and the " +
       "exact-below-k percentile cuts are the order statistics") {
    val rows = Seq(
      ev(1L, 0, 1L, "x", 0), ev(2L, 10, 1L, "x", 0),
      ev(3L, 30, 1L, "x", 0), ev(4L, 60, 1L, "x", 0),
      // a different user/type pair contributes no cross gaps
      ev(5L, 5, 2L, "y", 0))
    val out = graft.queries.Analytics
      .queries("a77_interarrival_quantiles")(spark, "/root/testdata/sf0.001")
    // fixture-independent invariants are covered by the oracle gate;
    // here pin the hand case through the same operator pieces
    val gaps = Seq(10L, 20L, 30L).map(_ * 1000000L)
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val g = df.select(col("event_type"), col("event_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap"))
      .filter(col("gap").isNotNull)
    assert(g.filter(col("event_type") === "x").select("gap")
      .as[Long].collect().sorted.toSeq === gaps)
    val sk = Sketches.quantileSketch(g, Seq("event_type"), col("gap"),
      col("event_id"))
    val r = sk.filter(col("event_type") === "x").select(
      Sketches.quantileEstimate(col("qsketch"), 50).as("p50"),
      Sketches.quantileEstimate(col("qsketch"), 90).as("p90")).head()
    assert(r.getLong(0) === 20000000L) // ceil(3·50/100) = 2nd
    assert(r.getLong(1) === 30000000L) // ceil(3·90/100) = 3rd
    assert(out.columns.toSeq === Seq("event_type", "n_gaps", "sample_n",
      "p50_us", "p90_us", "p99_us"))
  }

  // ------------------------------------------------ x115 cluster audit

  test("x115 cluster profile: size classes partition the corpus, " +
       "singletons carry zero edges and a null weakest edge, and every " +
       "multi-doc class's weakest edge clears the 0.2 threshold") {
    val out = graft.queries.Extensions
      .queries("x115_cluster_profile")(spark, "/root/testdata/sf0.001")
      .collect()
    val nDocs = out.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(nDocs === 500L) // sf0.001 corpus size
    out.foreach { r =>
      if (r.getLong(0) === 1L) {
        assert(r.getLong(2) === 0L && r.isNullAt(3), r.toString)
      } else {
        assert(r.getLong(2) >= r.getLong(1), // ≥ sz−1 edges per cluster
          r.toString)
        assert(!r.isNullAt(3) && r.getDouble(3) >= 0.2, r.toString)
      }
    }
  }

  // ------------------------------------------------ a78 funnel latency

  test("a78 funnel latency: stage gaps are the funnelTimes hop " +
       "durations (ordered stages only), and the below-k percentile " +
       "cuts are exact order statistics") {
    // user 1: signup@0, click@10, purchase@30 → gaps 10s and 20s
    // user 2: click@0, signup@5 (click BEFORE signup: no hop 1)
    val rows = Seq(
      ev(1L, 0, 1L, "signup", 0), ev(2L, 10, 1L, "click", 0),
      ev(3L, 30, 1L, "purchase", 0),
      ev(4L, 0, 2L, "click", 0), ev(5L, 5, 2L, "signup", 0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val ft = graft.queries.Analytics.funnelTimes(df,
      "signup", "click", "purchase")
    val u1 = ft.filter(col("t2").isNotNull)
      .select(col("user_id"),
        (unix_micros(col("t2")) - unix_micros(col("t1"))).as("gap"))
      .collect()
    assert(u1.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 10000000L)))
    val u2g = ft.filter(col("t3").isNotNull)
      .select((unix_micros(col("t3")) - unix_micros(col("t2"))).as("gap"))
      .as[Long].collect()
    assert(u2g.toSeq === Seq(20000000L))
  }

  // ------------------------------------------------ x116 thresholds

  test("x116 threshold sensitivity is monotone non-increasing in the " +
       "threshold and its 0.2 row equals the full verified pair count " +
       "(subset counting, no re-join)") {
    val out = graft.queries.Extensions
      .queries("x116_threshold_sensitivity")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === (2 to 9).map(_ * 1000))
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3, s"not monotone: $a -> $b")
    }
    val nPairs02 = graft.queries.Extensions
      .queries("x20_banded_jaccard")(spark, "/root/testdata/sf0.001")
      .count()
    assert(out.head._2 === nPairs02,
      "0.2 row must equal the verified pair count")
  }

  // ------------------------------------------------ x113 fences

  test("outlier fence is the integer Tukey fence q75 + 3·IQR div 2, " +
       "outliers strictly above it (exact-below-k regime)") {
    val d = ((1 to 100).map(i => (i.toLong, i.toLong)) :+ (101L, 1000L))
      .toDF("doc_id", "nc").withColumn("source", lit("s"))
    val sk = Sketches.quantileSketch(d, Seq("source"), col("nc"),
      col("doc_id"))
    val f = sk.select(
      Sketches.quantileEstimate(col("qsketch"), 25).as("q25"),
      Sketches.quantileEstimate(col("qsketch"), 75).as("q75")).head()
    val (q25, q75) = (f.getLong(0), f.getLong(1))
    assert(q25 === 26L && q75 === 76L) // ceil(101·p/100) order stats
    val fence = q75 + (q75 - q25) * 3 / 2
    assert(fence === 151L)
    assert(d.filter(col("nc") > fence).count() === 1L)
  }
}
