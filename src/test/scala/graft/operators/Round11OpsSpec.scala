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
}
