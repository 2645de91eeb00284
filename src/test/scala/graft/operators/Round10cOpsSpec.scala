package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-10 final additions: KMV rolling actives (a70), the A/B z²
  * readout (a71), and MMR diversity re-ranking (x106). Invariant-level
  * tests on known inputs — the oracle gate certifies the full fixture
  * replay.
  */
class Round10cOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------- KMV sketch algebra

  test("kmvMergeSketches is the bottom-k semilattice: merging per-part " +
       "sketches equals the one-shot sketch of the union") {
    val a = (1L to 400L).map(v => ("p1", v * 7919L))
    val b = (250L to 700L).map(v => ("p2", v * 7919L))
    val df = (a ++ b).toDF("part", "v")
    val union = Sketches.kmvSketch(
      df.select(lit("all").as("g"), col("v")), Seq("g"), col("v"))
      .select("sketch").as[Seq[Long]].head()
    val merged = Sketches.kmvSketch(df, Seq("part"), col("v"))
      .agg(Sketches.kmvMergeSketches(collect_list(col("sketch")))
        .as("sk"))
      .select("sk").as[Seq[Long]].head()
    assert(merged === union)
  }

  test("kmvEstimate is exact below k and inside the error band above") {
    val small = Sketches.kmvSketch(
      (1L to 100L).map(v => ("g", v)).toDF("g", "v"), Seq("g"), col("v"))
      .select(Sketches.kmvEstimate(col("sketch"))).as[Long].head()
    assert(small === 100L)
    val big = Sketches.kmvSketch(
      (1L to 5000L).map(v => ("g", v * 104729L)).toDF("g", "v"),
      Seq("g"), col("v"))
      .select(Sketches.kmvEstimate(col("sketch"))).as[Long].head()
    // rsd ≈ 1/sqrt(k-2) ≈ 6 % at k=256; 3σ band
    assert(math.abs(big - 5000L) <= 1000L, s"estimate $big vs 5000")
  }

  // --------------------------------------------------------- abTest (a71)

  private def ev(rows: Seq[(Long, String, String)]) =
    rows.map { case (u, t, ts) => (u, t, Timestamp.valueOf(ts)) }
      .toDF("user_id", "event_type", "ts")

  test("abTest: a degenerate pooled rate (everyone converts) reports " +
       "z2=0 instead of an ANSI divide-by-zero") {
    val frame = ev((1L to 20L).flatMap(u => Seq(
      (u, "click", "2024-01-01 10:00:00"),
      (u, "purchase", "2024-01-01 12:00:00"))))
    val r = graft.queries.Analytics.abTest(frame).collect().head
    assert(r.getAs[Double]("rate_a") === 1.0)
    assert(r.getAs[Double]("rate_b") === 1.0)
    assert(r.getAs[Double]("z2") === 0.0)
  }

  test("abTest: conversion is purchase-within-1-day-of-first-event, " +
       "counts split by the deterministic murmur3 arm, z² matches the " +
       "two-proportion formula recomputed from the reported counts") {
    // users 1..40: odd users purchase 2 h after their first click,
    // even users purchase 3 days later (no conversion)
    val frame = ev((1L to 40L).flatMap { u =>
      val p = if (u % 2 == 1) "2024-01-01 12:00:00"
              else "2024-01-04 10:00:00"
      Seq((u, "click", "2024-01-01 10:00:00"), (u, "purchase", p))
    })
    val r = graft.queries.Analytics.abTest(frame).collect().head
    val (na, ca) = (r.getAs[Long]("n_a"), r.getAs[Long]("c_a"))
    val (nb, cb) = (r.getAs[Long]("n_b"), r.getAs[Long]("c_b"))
    assert(na + nb === 40L)
    assert(ca + cb === 20L)
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val se2 = (pp * (1.0 - pp)) * (1.0 / na + 1.0 / nb)
    val z2 = if (se2 == 0.0) 0.0 else ((pa - pb) * (pa - pb)) / se2
    assert(r.getAs[Double]("z2") === z2)
    // deterministic: the same frame reproduces the same split
    val r2 = graft.queries.Analytics.abTest(frame).collect().head
    assert(r2.getAs[Long]("n_a") === na && r2.getAs[Long]("c_a") === ca)
  }

  // ------------------------------------ markovRemovalEffect (a72)

  test("markovRemovalEffect: hand-computed chain — removing the relay " +
       "channel halves conversion, removing the entry channel kills it") {
    // u1: A -> B -> purchase; u2: A -> purchase
    // p(A,B)=p(A,purchase)=0.5, p(B,purchase)=1, everyone starts at A.
    // base conv = 1.0; without B only the direct path survives (0.5);
    // without A no mass ever enters the chain (0.0).
    val frame = ev(Seq(
      (1L, "A", "2024-01-01 10:00:00"),
      (1L, "B", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      (2L, "A", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00")))
      .withColumn("event_id", monotonically_increasing_id())
    val out = graft.queries.Analytics.markovRemovalEffect(
        frame, Seq("A", "B", "purchase"), "purchase", horizon = 3)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(out === Seq(
      ("A", 1.0, 0.0, 1.0),
      ("B", 1.0, 0.5, 0.5)))
  }

  test("markovRemovalEffect: fences the state count, horizon, and conv " +
       "membership") {
    val frame = ev(Seq((1L, "A", "2024-01-01 10:00:00")))
      .withColumn("event_id", lit(1L))
    intercept[IllegalArgumentException] {
      graft.queries.Analytics.markovRemovalEffect(frame,
        (1 to 17).map("s" + _), "s1")
    }
    intercept[IllegalArgumentException] {
      graft.queries.Analytics.markovRemovalEffect(frame,
        Seq("A", "B"), "C")
    }
    intercept[IllegalArgumentException] {
      graft.queries.Analytics.markovRemovalEffect(frame,
        Seq("A", "B"), "A", horizon = 33)
    }
  }

  // ------------------------------------------------------ mmrRerank (x106)

  private def emb(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("mmrRerank: rank 1 is the pure-relevance winner; rank 2 prefers " +
       "a diverse candidate over a higher-relevance near-duplicate of " +
       "the first pick") {
    val vecs = emb(Seq(
      0L -> Seq(1.0f, 0.0f),            // query
      1L -> Seq(0.95f, 0.31f),          // top relevance
      2L -> Seq(0.95f, 0.32f),          // near-dup of 1, rel rank 2
      3L -> Seq(0.6f, -0.7f)))          // diverse, rel rank 3
    val out = Similarity.mmrRerank(vecs, vecs.filter(col("vec_id") === 0L),
        "embedding", "vec_id", pool = 3, k = 3)
      .orderBy("sel_rank").collect()
      .map(r => (r.getAs[Int]("sel_rank"), r.getAs[Long]("cand_id")))
    assert(out.toSeq === Seq((1, 1L), (2, 3L), (3, 2L)))
  }

  test("mmrRerank: emits min(k, pool-size) rows per query with distinct " +
       "ranks, and rank-1 mmr equals the top relevance cosine") {
    val vecs = emb((0L to 30L).map(i =>
      i -> Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        (0.1f * (i % 5)))))
    val out = Similarity.mmrRerank(vecs,
      vecs.filter(col("vec_id") < 2L), "embedding", "vec_id",
      pool = 10, k = 4).collect()
    assert(out.length === 8)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("sel_rank")).sorted.toSeq === Seq(1, 2, 3, 4))
    }
  }

  // --------------------------------------------- HilbertIndex2D (x108)

  private def hilbertGrid(bits: Int) = {
    graft.functions.GraftFunctions.register(spark)
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    cells.toDF("x", "y")
      .withColumn("h",
        graft.functions.GraftFunctions.hilbert2d(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
  }

  test("hilbert2d: bijection onto 0..4^bits-1 and the DEFINING curve " +
       "invariant — consecutive indices are Manhattan-adjacent cells " +
       "(unit steps, no Z-order jumps)") {
    val walk = hilbertGrid(4)
    assert(walk.map(_._1).toSeq === (0L until 256L))
    walk.sliding(2).foreach { case Array((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"jump at index $d2: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert2d beats mortonInterleave on shard locality: the total " +
       "bounding-box surface over consecutive-index shards (the min/max " +
       "pruning cost a file layout pays) is strictly smaller, aligned " +
       "or not") {
    // semiperimeter sum over consecutive-index shards = how much (x,y)
    // area file-level min/max stats claim; smaller = tighter pruning.
    // Shard size 20 deliberately misaligns with the quadrant structure
    // — exactly where Z-order's diagonal seams (e.g. (7,7)->(8,0))
    // inflate boxes and Hilbert's unit-step walk cannot.
    def boxSum(walk: Seq[(Long, (Long, Long))], shard: Int): Long =
      walk.grouped(shard).map { s =>
        val xs = s.map(_._2._1); val ys = s.map(_._2._2)
        (xs.max - xs.min) + (ys.max - ys.min)
      }.sum
    val hWalk = hilbertGrid(4).toSeq
    val n = 1 << 4
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val zWalk = cells.toDF("x", "y")
      .withColumn("z", Layout.mortonInterleave(col("x"), col("y"), bits = 4))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1).toSeq
    // Quadrant-ALIGNED power-of-two shards tie exactly — both curves
    // decompose into the same aligned blocks there; real compaction
    // targets a byte size, not an aligned cell count, and at every
    // misaligned size Hilbert is strictly tighter.
    assert(boxSum(hWalk, 16) === boxSum(zWalk, 16))
    for (shard <- Seq(20, 24, 40)) {
      val h = boxSum(hWalk, shard); val z = boxSum(zWalk, shard)
      assert(h < z, s"shard=$shard: hilbert box sum $h vs morton $z")
    }
  }

  test("hilbert2d: matches a reference driver walk on corners and " +
       "mixed cases at bits=16, and floor-mod-wraps out-of-grid inputs") {
    graft.functions.GraftFunctions.register(spark)
    def ref(x0: Long, y0: Long, bits: Int): Long = {
      val m = 1L << bits
      var x = java.lang.Math.floorMod(x0, m)
      var y = java.lang.Math.floorMod(y0, m)
      var d = 0L; var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 2L), (-3L, 7L))
    val got = cases.toDF("x", "y")
      .withColumn("h",
        graft.functions.GraftFunctions.hilbert2d(col("x"), col("y"), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) === ref(x, y, 16), s"hilbert($x, $y)")
    }
  }

  // ------------------------------------------- clusterTopTerms (x107)

  test("clusterTopTerms: each cluster's top term is its distinctive " +
       "vocabulary, shared filler ranks at lift≈1 below it, and the " +
       "minCount floor drops one-off terms") {
    val docs = (
      (1L to 10L).map(i => (i, "alpha filler common words here")) ++
      (11L to 20L).map(i => (i, "beta filler common words here")) ++
      Seq((21L, "gamma filler common words here"))  // 'gamma' once: floored
    ).toDF("doc_id", "text")
    val asg = (
      (1L to 10L).map(i => (100L, i)) ++
      (11L to 21L).map(i => (200L, i))
    ).toDF("cell", "doc_id")
    val out = TextAnalysis.clusterTopTerms(docs, asg, "text", "doc_id",
      k = 2, minCount = 5L).collect()
    val top = out.filter(_.getAs[Int]("rk") == 1)
      .map(r => (r.getAs[Long]("cell"), r.getAs[String]("term"))).toMap
    assert(top === Map(100L -> "alpha", 200L -> "beta"))
    assert(!out.exists(_.getAs[String]("term") == "gamma"))
    // distinctive terms over-represent (lift > 1); the cluster-split
    // filler sits at lift ≈ cluster-share-normalized 1
    val alphaLift = out.find(r => r.getAs[String]("term") == "alpha").get
      .getAs[Double]("lift")
    assert(alphaLift > 1.5, s"alpha lift $alphaLift")
  }

  test("clusterTopTerms: lift is exactly (n_tc·N)/(tok_c·cnt_t) with " +
       "double casts before the products") {
    val docs = Seq((1L, "a a b"), (2L, "b c c")).toDF("doc_id", "text")
    val asg = Seq((10L, 1L), (20L, 2L)).toDF("cell", "doc_id")
    val out = TextAnalysis.clusterTopTerms(docs, asg, "text", "doc_id",
      k = 3, minCount = 1L).collect()
    // corpus: N=6; cell 10 = {a:2, b:1} tok=3; cell 20 = {b:1, c:2} tok=3
    val aRow = out.find(r =>
      r.getAs[Long]("cell") == 10L && r.getAs[String]("term") == "a").get
    assert(aRow.getAs[Double]("lift") === (2.0 * 6.0) / (3.0 * 2.0))
    val bRow = out.find(r =>
      r.getAs[Long]("cell") == 10L && r.getAs[String]("term") == "b").get
    assert(bRow.getAs[Double]("lift") === (1.0 * 6.0) / (3.0 * 2.0))
  }

  test("mmrRerank: fences an unbounded pool collect (queries·pool over " +
       "the codebook bound)") {
    val vecs = emb((0L until 300L).map(i =>
      i -> Seq((i % 7).toFloat + 1f, (i % 11).toFloat)))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(vecs, vecs, "embedding", "vec_id",
        pool = 299, k = 2).collect()
    }
    assert(e.getMessage.contains("MaxCodebookEntries"))
  }
}
