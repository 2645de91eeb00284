package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Accuracy of the deterministic distinct-count sketches across
  * cardinality regimes on synthetic data — the fixed-corpus checks live
  * in QueryBoundsSpec; this sweeps n against the documented bounds.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def estimates(n: Int): (Long, Long) = {
    // ids spread over a wide range so hash inputs aren't trivially dense
    val df = (0 until n).map(i => i.toLong * 2654435761L).toDF("id")
      .withColumn("g", lit("all"))
    val hll = Sketches.hllDistinct(df, Seq("g"), col("id"), "est")
      .collect()(0).getLong(1)
    val kmv = df.groupBy("g").agg(Sketches.kmvDistinct(col("id")).as("est"))
      .collect()(0).getLong(1)
    (hll, kmv)
  }

  test("KMV is exact below k and within 3·rsd above; HLL within 3·rsd past ~3m") {
    Seq(100, 1000, 10000, 100000).foreach { n =>
      val (hll, kmv) = estimates(n)
      val kmvErr = math.abs(kmv - n).toDouble / n
      val hllErr = math.abs(hll - n).toDouble / n
      info(f"n=$n%6d  hll=$hll%7d ($hllErr%.4f)  kmv=$kmv%7d ($kmvErr%.4f)")
      if (n < Sketches.KmvK) assert(kmv == n, s"KMV must be exact below k at n=$n")
      else assert(kmvErr <= 3 * (1.0 / math.sqrt(Sketches.KmvK - 2)), s"KMV err $kmvErr at n=$n")
      if (n >= 3 * (1 << Sketches.HllP)) // raw HLL bias zone ends ~3m
        assert(hllErr <= 3 * (1.04 / math.sqrt(1 << Sketches.HllP)), s"HLL err $hllErr at n=$n")
    }
  }

  test("KMV excludes NULLs from the sketch — count(DISTINCT) semantics, " +
       "not hash(NULL)=seed phantom value (r9 ADVICE)") {
    val df = Seq[java.lang.Long](1L, 2L, 2L, null, null, null).toDF("id")
      .withColumn("g", lit("all"))
    val kmv = df.groupBy("g").agg(Sketches.kmvDistinct(col("id")).as("est"))
      .collect()(0).getLong(1)
    assert(kmv === 2L, "3 NULL rows must not register as a distinct value")
    // all-NULL input: sketch stays empty (0 distinct), no crash
    val allNull = Seq[java.lang.Long](null, null).toDF("id")
      .withColumn("g", lit("all"))
    val kmv0 = allNull.groupBy("g")
      .agg(Sketches.kmvDistinct(col("id")).as("est")).collect()(0).getLong(1)
    assert(kmv0 === 0L)
  }

  test("count-min estimates dominate exact counts and collisions stay within the grid bound") {
    // 40 tokens with zipf-ish counts into w=16 buckets per row forces
    // collisions; min-over-d must keep every estimate >= exact and
    // within exact + N (trivial bound) — the real assertion is the
    // overcount structure, not a probabilistic tail
    val docs = (0 until 40).flatMap { t =>
      Seq.fill(1 + 200 / (t + 1))(s"tok$t")
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(docs, "text", d = 4, w = 16, minShareBp = 0)
      .collect()
    val n = out.map(_.getLong(2)).sum
    assert(out.length == 40, "minShareBp=0 keeps every candidate")
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"CMS must never undercount: $r")
      assert(r.getLong(1) <= r.getLong(2) + n, s"estimate above trivial bound: $r")
    }
    // with 40 tokens in 16 buckets, at least one estimate must overcount
    assert(out.exists(r => r.getLong(1) > r.getLong(2)),
      "collisions should be observable at w=16")
    // a generous grid resolves every collision via min-over-rows
    val wide = Sketches.cmsHeavyHitters(docs, "text", d = 4, w = 4096, minShareBp = 0)
      .collect()
    assert(wide.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("count-min heavy-hitter cut keeps exactly the tokens at or above the share") {
    val docs = (Seq.fill(90)("hot") ++ Seq.fill(9)("warm") ++ Seq("cold"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // 100 tokens; 5% cut = est >= 5. exact: hot 90, warm 9, cold 1 —
    // w=4096 → no collisions → est == exact → hot and warm survive
    val kept = Sketches.cmsHeavyHitters(docs, "text", d = 4, w = 4096,
        minShareBp = 500)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("hot", "warm"))
  }

  test("materialized KMV sketch: merge(partial sketches) == direct sketch " +
       "bit-for-bit, and the estimate matches the KmvDistinctAgg aggregate") {
    val k = Sketches.KmvK
    val df = (0 until 3000)
      .map(i => (if (i % 2 == 0) "hist" else "delta", i.toLong * 2654435761L))
      .toDF("seg", "id").withColumn("g", lit("all"))
    val parts = Sketches.kmvSketch(df, Seq("g", "seg"), col("id"), k)
    val mergedRow = parts.groupBy("g")
      .agg(Sketches.kmvMergeSketches(collect_list(col("sketch")), k).as("sk"))
      .select(col("sk"), Sketches.kmvEstimate(col("sk"), k).as("est"))
      .collect()(0)
    val direct = Sketches.kmvSketch(df, Seq("g"), col("id"), k)
      .select(col("sketch"), Sketches.kmvEstimate(col("sketch"), k).as("est"))
      .collect()(0)
    // the semilattice claim: merged STATE equals direct state, not just
    // the estimate — an incremental rollup is indistinguishable from a
    // full recompute
    assert(mergedRow.getSeq[Long](0) == direct.getSeq[Long](0))
    assert(mergedRow.getLong(1) == direct.getLong(1))
    val agg = df.groupBy("g")
      .agg(Sketches.kmvDistinct(col("id"), k).as("est")).collect()(0).getLong(1)
    assert(mergedRow.getLong(1) == agg,
      "materialized-sketch estimate must equal the typed aggregate's")
  }

  test("materialized KMV sketch excludes NULLs (same sentinel discipline " +
       "as the aggregate)") {
    val df = Seq[java.lang.Long](1L, 2L, 2L, null, null).toDF("id")
      .withColumn("g", lit("all"))
    val sk = Sketches.kmvSketch(df, Seq("g"), col("id"))
      .collect()(0).getSeq[Long](1)
    assert(sk.length == 2, s"NULLs must not enter the sketch: $sk")
  }

  test("KMV overlap matrix is EXACT below k and within estimator error " +
       "above it (Beyer et al. set-operation estimator vs known truth)") {
    val k = Sketches.KmvK
    // exact regime: |A|=100, |B|=100, overlap 50 → union 150 < k
    val small = ((0 until 100).map(i => ("a", i.toLong)) ++
      (50 until 150).map(i => ("b", i.toLong)))
      .toDF("src", "id")
    val ex = Sketches.kmvOverlapMatrix(small, "src", col("id"), k)
      .collect()(0)
    assert(ex.getAs[Long]("m_sz") == 150L)
    assert(ex.getAs[Long]("n_common") == 50L)
    assert(ex.getAs[Long]("union_est") == 150L)
    assert(ex.getAs[Double]("jaccard") == 50.0 / 150.0)
    assert(ex.getAs[Long]("inter_est") == 50L)
    // estimation regime: |A|=|B|=10000, overlap 5000 → union 15000,
    // true J=1/3. Jaccard rsd ≈ sqrt(J(1-J)/k): 3σ ≈ 0.09 absolute.
    val big = ((0 until 10000).map(i => ("a", i.toLong * 2654435761L)) ++
      (5000 until 15000).map(i => ("b", i.toLong * 2654435761L)))
      .toDF("src", "id")
    val est = Sketches.kmvOverlapMatrix(big, "src", col("id"), k)
      .collect()(0)
    val j = est.getAs[Double]("jaccard")
    val inter = est.getAs[Long]("inter_est")
    info(f"jaccard=$j%.4f (true 0.3333)  inter=$inter (true 5000)")
    assert(math.abs(j - 1.0 / 3.0) <= 0.09, s"jaccard off: $j")
    assert(math.abs(inter - 5000.0) / 5000.0 <= 0.35, s"intersection off: $inter")
  }

  test("sketches are merge-consistent: estimate of a union never below either part") {
    val a = (0 until 5000).map(i => i.toLong).toDF("id").withColumn("g", lit("all"))
    val b = (2500 until 7500).map(i => i.toLong).toDF("id").withColumn("g", lit("all"))
    def est(df: org.apache.spark.sql.DataFrame): Long =
      Sketches.hllDistinct(df, Seq("g"), col("id"), "est").collect()(0).getLong(1)
    val u = est(a.union(b))
    // union has 7500 distinct; parts 5000 each — monotonicity of the
    // register-max construction (not a float artifact)
    assert(u > est(a) * 0.9 && u > est(b) * 0.9)
    assert(math.abs(u - 7500).toDouble / 7500 < 0.2)
  }

  test("cmsJoinSize on DISJOINT key sets reads est = 0 (not NULL, not " +
       "an overstated min over co-populated rows) — the d×w spine fix " +
       "(r11 ADVICE); dominance est >= exact still holds") {
    // sides share no keys: exact join size is 0
    val df = ((0 until 200).map(i => (s"a$i", 0L)) ++
      (0 until 200).map(i => (s"b$i", 1L))).toDF("k", "side")
    val r = Sketches.cmsJoinSize(df, "k", "side").collect()(0)
    assert(r.getAs[Long]("exact") == 0L)
    // collisions can only ADD cross terms, so est >= 0 and NON-NULL;
    // with w=256 and 200 keys/side a fully-collision-free row is
    // possible, so only the >= 0 + non-null contract is pinned
    assert(!r.isNullAt(r.fieldIndex("est")), "est must not be NULL")
    assert(r.getAs[Long]("est") >= 0L)
  }

  test("cmsJoinSize with one empty side reads est = exact = 0") {
    val df = (0 until 100).map(i => (s"k$i", 0L)).toDF("k", "side")
    val r = Sketches.cmsJoinSize(df, "k", "side").collect()(0)
    assert(r.getAs[Long]("est") == 0L)
    assert(r.getAs[Long]("exact") == 0L)
  }
}
