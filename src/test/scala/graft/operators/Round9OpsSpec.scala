package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-9 operator pins: the estimate-grade KMV profiler (x78b). */
class Round9OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("profileApprox is exact below k and carries the plain stats") {
    val df = (1 to 100).map(i => (i.toLong, (i % 10).toLong))
      .toDF("id", "tens")
    val out = Profile.profileApprox(df, Seq(
      "id" -> col("id"), "tens" -> col("tens")), k = 256)
      .orderBy("col_name").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("id", "tens"))
    val id = out(0)
    assert((id.getLong(1), id.getLong(2), id.getLong(3)) === ((100L, 0L, 100L)))
    assert((id.getString(4), id.getString(5)) === (("1", "100")))
    val tens = out(1)
    assert(tens.getLong(3) === 10L, "NDV below k must be exact")
  }

  test("profileApprox counts nulls and keeps them out of min/max") {
    val df = Seq[java.lang.Long](1L, null, 3L, null, 5L).toDF("v")
    val out = Profile.profileApprox(df, Seq("v" -> col("v"))).collect()
    assert(out(0).getLong(1) === 5L)
    assert(out(0).getLong(2) === 2L)
    assert((out(0).getString(4), out(0).getString(5)) === (("1", "5")))
  }

  test("profileApprox estimate lands within the KMV error band above k") {
    val n = 20000L
    val df = spark.range(n).select((col("id") * 2654435761L % 1000003L).as("v"))
    val exact = df.select(countDistinct("v")).head.getLong(0)
    val out = Profile.profileApprox(df, Seq("v" -> col("v")), k = 256).collect()
    val est = out(0).getLong(3)
    // rsd ≈ 1/sqrt(k-2) ≈ 6.3 %; assert a generous 4σ band
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"est=$est exact=$exact")
  }

  test("x87 embedding audit: hand-checked norms, zero flag, min/max") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),
      (2L, Seq(3.0f, 4.0f, 0.0f)),
      (3L, Seq(-2.0f, 0.5f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingAudit(df, "embedding", "vec_id")
      .orderBy("vec_id").collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(3, 3, 3))
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.0, 25.0, 5.25))
    assert(out.map(_.getBoolean(3)).toSeq === Seq(true, false, false))
    assert(out.map(r => (r.getDouble(4), r.getDouble(5))).toSeq ===
      Seq((0.0, 0.0), (0.0, 4.0), (-2.0, 1.0)))
  }

  test("a58 rolling 7-day active equals the brute-force window on real data") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.Analytics.queries("a58_rolling_active")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // brute force: for every observed day, distinct users with any
    // event in [d-6, d]
    val ud = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val expect = days.map { d =>
      d.toString -> ud.filter { case (_, ed) =>
        !ed.isAfter(d) && !ed.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
    }.toMap
    assert(got === expect)
  }

  test("profileApprox plans one aggregate pass with NO Expand") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("m"))
    val plan = Profile.profileApprox(df, Seq(
      "id" -> col("id"), "m" -> col("m")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    // since round 12 the exact profiler avoids Expand too (per-column
    // single-distinct subtrees over one cached projection); what still
    // separates x78b is ONE pass and O(k) state vs |specs|+1 cache
    // passes with exact-NDV hash state
    val exactPlan = Profile.profile(df, Seq(
      "id" -> col("id"), "m" -> col("m")))
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"))
  }

  test("triangleCounts: K4 gives every node 3 triangles; a path gives none; " +
       "direction/duplicate/self-loop inputs canonicalize away") {
    // K4 on {1,2,3,4} fed as a messy multigraph: reversed duplicates,
    // a self-loop, a repeated edge
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 4L), (2L, 4L), (4L, 2L), (3L, 3L)).toDF("a", "b")
    val out = Graph.triangleCounts(k4, "a", "b")
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)),
      "K4 has C(4,3)=4 triangles, each node in exactly 3")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.triangleCounts(path, "a", "b").count() === 0L)
  }

  test("triangleCounts: hub star plus one closing edge yields exactly " +
       "one triangle (the orientation never wedges at the hub)") {
    // hub 100 connected to 1..10, plus edge (1,2): one triangle
    val star = (1L to 10L).map(i => (100L, i)) :+ ((1L, 2L))
    val out = Graph.triangleCounts(star.toDF("a", "b"), "a", "b")
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L), (100L, 1L)))
  }

  test("tokenBudgetMix: small sources fit whole, large ones cap at the " +
       "common level; zero and ample budgets hit the boundary branches") {
    // srcA: 2 docs x 2 tokens = 4; srcB: 3 docs x 4 = 12; srcC: 1 doc x 30
    val docs = Seq(
      (1L, "w w", "A"), (2L, "w w", "A"),
      (3L, "w w w w", "B"), (4L, "w w w w", "B"), (5L, "w w w w", "B"),
      (6L, Seq.fill(30)("w").mkString(" "), "C")).toDF("doc_id", "text", "source")
    // budget 20: A(4) <= 20/3=6 fits; B(12) > (20-4)/2=8 caps at 8; C caps at 8
    val out = Sampling.tokenBudgetMix(docs, "text", "doc_id", "source", 20L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) === (("A", 4L, 4L, 2L, 4L)), "A fits whole")
    assert(out(1)._3 === 8L, "B allocation is the fixed level (20-4)/2")
    assert(out(1)._5 <= 8L && out(1)._5 % 4 === 0L, "B keeps whole docs under the level")
    assert(out(2) === (("C", 30L, 8L, 0L, 0L)),
      "C's single 30-token doc straddles the level and is dropped, never split")
    // ample budget: everything kept
    val all = Sampling.tokenBudgetMix(docs, "text", "doc_id", "source", 1000L)
      .agg(sum("kept_tokens"), sum("total_tokens")).head
    assert(all.getLong(0) === all.getLong(1))
    // zero budget: nothing kept
    val none = Sampling.tokenBudgetMix(docs, "text", "doc_id", "source", 0L)
      .agg(sum("kept_tokens")).head
    assert(none.getLong(0) === 0L)
  }

  test("x89 ann recall: per-query rows bounded in [0,1], full-probe IVF " +
       "achieves perfect recall against brute force") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Extensions.queries("x89_ann_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    out.foreach { case (q, h, rec) =>
      assert(h >= 0 && h <= 10 && rec === h / 10.0, s"query $q")
    }
    // nProbe = cells ⇒ IVF == brute force ⇒ recall 1.0 everywhere
    val emb = graft.tables.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", k = 10)
      .select("query_id", "cand_id")
    val full = Similarity.ivfTopKSampled(emb, q, "embedding", "vec_id",
        k = 10, cells = 16, nProbe = 16)
      .select("query_id", "cand_id")
    assert(full.exceptAll(bf).count() === 0L && bf.exceptAll(full).count() === 0L)
  }

  test("a61 degree profile: buckets replay length(bin(d)) and cover " +
       "every node exactly once") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Analytics.queries("a61_degree_profile")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (b, _, mn, mx) =>
      assert(mn >= (1L << (b - 1)) && mx < (1L << b),
        s"bucket $b must hold degrees in [2^${b - 1}, 2^$b)")
      assert(mn <= mx)
    }
    // bucket node counts sum to the graph's node count
    val baskets = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = baskets.as("x").join(baskets.as("y"), "ok")
      .filter(col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val nNodes = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .distinct().count()
    assert(out.map(_._2).sum === nNodes)
  }

  test("gramMatrix: hand-checked sums on crafted vectors, upper " +
       "triangle only, diagonal carries the quantized square sums") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(0.5f, -1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.gramMatrix(df, "embedding")
      .orderBy("i", "j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // exact grid values: products are representable multiples of 2^-20
    assert(out((0, 0)) === 1.0 + 0.25)
    assert(out((0, 1)) === 2.0 + -0.5)
    assert(out((1, 1)) === 4.0 + 1.0)
    assert(out.size === 3, "lower triangle must not appear")
  }

  test("pcaPowerIteration: recovers the dominant axis of an anisotropic " +
       "cloud, unit norm up to grid error, Rayleigh quotient dominates") {
    // 200 vectors stretched 10x along axis 0, noise elsewhere:
    // deterministic integers so the fixture is reproducible
    val vecs = (0 until 200).map { r =>
      (r.toLong, Seq.tabulate(8) { c =>
        if (c == 0) (10.0 + (r % 7)).toFloat
        else ((r * 31 + c * 17) % 5 - 2).toFloat
      })
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.pcaPowerIteration(df, "embedding", iters = 5)
      .orderBy("i").collect()
    val v = out.map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    assert(math.abs(v(0)) > 0.98, s"axis 0 must dominate: ${v.toSeq}")
    val norm2 = v.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"norm2=$norm2")
    // Rayleigh quotient of the top direction ~ sum of squares along
    // axis 0 = 200 * E[(10..16)^2] — far above any noise axis
    assert(lambda > 0.8 * vecs.map(t => math.pow(t._2.head, 2)).sum)
    // x90 gram diag sanity: G[0,0] equals the quantized square sums
    val g00 = Similarity.gramMatrix(df, "embedding")
      .filter(col("i") === 0 && col("j") === 0).head.getDouble(2)
    assert(math.abs(g00 - vecs.map(t => math.pow(t._2.head, 2)).sum) < 1e-3)
  }

  test("removeTopComponent: residual is orthogonal to the removed " +
       "direction up to grid error, energy splits Pythagoras-style, " +
       "and the removal pass plans ZERO exchanges") {
    val vecs = (0 until 200).map { r =>
      (r.toLong, Seq.tabulate(8) { c =>
        if (c == 0) (10.0 + (r % 7)).toFloat
        else ((r * 31 + c * 17) % 5 - 2).toFloat
      })
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.removeTopComponent(df, "embedding", "vec_id", iters = 5)
      .orderBy("vec_id").collect()
    val u = Similarity.pcaPowerIteration(df, "embedding", iters = 5)
      .orderBy("i").collect().map(_.getDouble(1))
    vecs.zip(out).foreach { case ((id, v), row) =>
      assert(row.getLong(0) === id)
      val coef = row.getDouble(1)
      val resid = row.getDouble(2)
      val dot = v.zip(u).map { case (x, w) => x * w }.sum
      assert(math.abs(coef - dot) < 1e-3, s"vec $id coef")
      val norm2 = v.map(x => x.toDouble * x).sum
      // ||v||^2 = coef^2 + resid (orthogonal split), up to grid error
      assert(math.abs(norm2 - (coef * coef + resid)) < 0.05,
        s"vec $id energy split: $norm2 vs ${coef * coef + resid}")
      // residual re-projected onto u is ~0
      val rvec = v.zip(u).map { case (x, w) => x - coef * w }
      assert(math.abs(rvec.zip(u).map { case (x, w) => x * w }.sum) < 1e-3)
    }
    val plan = Similarity.removeTopComponent(df, "embedding", "vec_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"removal must be a pure scan-side pass:\n$plan")
  }

  test("a59 last-touch: in-window touch attributes, stale touch and " +
       "touchless purchases fall to (none), errors never attribute") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val evs = Seq(
      // user 1: click then purchase 2 days later -> click
      (1L, t("2024-01-01 10:00:00"), 1L, "click", 10.0),
      (2L, t("2024-01-03 10:00:00"), 1L, "purchase", 100.0),
      // user 2: view 10 days before purchase -> (none)
      (3L, t("2024-01-01 10:00:00"), 2L, "view", 5.0),
      (4L, t("2024-01-11 10:00:00"), 2L, "purchase", 50.0),
      // user 3: error right before purchase, view before that -> view
      (5L, t("2024-01-05 09:00:00"), 3L, "view", 1.0),
      (6L, t("2024-01-05 09:30:00"), 3L, "error", 1.0),
      (7L, t("2024-01-05 10:00:00"), 3L, "purchase", 25.0),
      // user 4: purchase with no history -> (none)
      (8L, t("2024-01-02 10:00:00"), 4L, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("a59").toString
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Analytics.queries("a59_last_touch")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("click") === ((1L, 100.0)))
    assert(out("view") === ((1L, 25.0)))
    assert(out("(none)") === ((2L, 57.0)))
    assert(!out.contains("error"))
  }
}
