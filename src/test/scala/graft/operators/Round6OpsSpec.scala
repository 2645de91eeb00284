package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.tables.{Tables => T}

/** Semantics + blocking-exactness tests for the round-6 operators:
  * word-boundary containment dedup and BM25 retrieval scoring.
  */
class Round6OpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- x51

  test("containmentPairs: word-run containment found; char-substring " +
       "without word boundary rejected; strict-shorter orientation") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "yesterday the quick brown fox jumped over the fence"),
      // "he quick brown fo" is a char substring of doc 0 but not a word
      // run; "thequick brownfox" shares no word boundary either
      (2L, "catalog of thequick brownfox entries and more padding words"),
      (3L, "the quick brown fox"), // identical to 0 → not strictly shorter
      (4L, "an unrelated page about spark adaptive query execution"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (3L, 1L)),
      s"expected exactly the two word-run containments, got $got")
  }

  test("containmentPairs: whitespace + case normalization, and docs under " +
       "n words never pair (the shingle-less convention)") {
    val docs = Seq(
      (0L, "  The   Quick\tBrown FOX  "),
      (1L, "prefix the quick brown fox suffix words here"),
      (2L, "tiny doc"), // 2 words < n=3: no head shingle, never pairs
      (3L, "prefix tiny doc suffix with several more words"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L)), s"got $got")
  }

  test("containmentPairs: head-shingle blocking EQUALS the unblocked " +
       "all-pairs definition on the sf0.001 corpus") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val norm = docs.select(col("doc_id"),
      trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("t"))
    val d = norm.collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      a <- d; b <- d
      if a._1 != b._1 && a._2.length < b._2.length
      if a._2.split(" ").length >= 3
      if (" " + b._2 + " ").contains(" " + a._2 + " ")
    } yield (a._1, b._1)).toSet
    val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth,
      s"blocking lost/invented pairs: missing=${truth -- got} extra=${got -- truth}")
    assert(truth.nonEmpty, "fixture has no containment pairs — test is vacuous")
  }

  test("containmentPairs plan: equi-join on the shingle anchor, no " +
       "cartesian node") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val plan = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"containment blocking degenerated to all-pairs:\n$plan")
  }

  // ---------------------------------------------------------------- x52

  test("bm25: more hits of a rarer term outranks fewer; n_terms counts " +
       "distinct matched terms; k bounds rows") {
    // "rare" df=1, "common" df=3 → idf(rare) >> idf(common); equal dl
    // across docs so length normalization cancels.
    val docs = Seq(
      (0L, "rare rare common pad1 pad2 pad3"),
      (1L, "common common common pad1 pad2 pad3"),
      (2L, "common pad0 pad1 pad2 pad3 pad4"),
      (3L, "pad0 pad1 pad2 pad3 pad4 pad5"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "text", "doc_id",
        terms = Seq("rare", "common"), k = 2)
      .orderBy("rank").collect()
    assert(out.length === 2, "k must bound the row count")
    assert(out(0).getLong(0) === 0L,
      "doc hitting the rare term must outrank the common-only docs")
    assert(out(0).getLong(2) === 2L, "doc 0 hits both terms")
    assert(out(1).getLong(0) === 1L,
      "among common-only docs, higher tf wins")
    assert(out(0).getDouble(3) > out(1).getDouble(3))
  }

  test("bm25: length normalization — same tf scores lower in a longer doc") {
    val docs = Seq(
      (0L, "term pad1 pad2 pad3"),
      (1L, "term " + (1 to 40).map(i => s"p$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "text", "doc_id",
        terms = Seq("term"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(0L) > out(1L),
      s"b=0.75 must penalize the longer doc: $out")
  }

  test("bm25 plan: token explode filtered to query terms before the " +
       "aggregation, top-k via TakeOrderedAndProject (no global window)") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val q = TextAnalysis.bm25(docs, "text", "doc_id",
      terms = Seq("query", "join"), k = 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be sort+limit, not a one-partition window:\n$plan")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("query") && optimized.contains("join"),
      "the isin(term) literal filter should appear in the optimized plan")
  }

  // ---------------------------------------------------------------- x53

  test("shuffleShard: a permutation (every id exactly once, dense 0-based " +
       "positions per shard) that is invariant under input partitioning") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val out = Sampling.shuffleShard(docs, col("doc_id"), nShards = 8)
      .select("shard_id", "shard_pos", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).distinct.length === 500, "every doc exactly once")
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val pos = rows.map(_._2).sorted
      assert(pos.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions not dense: ${pos.take(5).toSeq}...")
    }
    // the permutation is a pure function of the data, not the layout
    val re = Sampling.shuffleShard(docs.repartition(7), col("doc_id"), 8)
      .select("shard_id", "shard_pos", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(re.toSet === out.toSet, "repartitioning changed the permutation")
    // murmur3 spreads: no shard is empty or hoards >2x the fair share
    val sizes = out.groupBy(_._1).view.mapValues(_.length).values.toSeq
    assert(sizes.size === 8 && sizes.max <= 2 * (500 / 8),
      s"shard sizes degenerate: $sizes")
  }

  // ---------------------------------------------------------------- x54

  test("temperatureMixture: rare strata upsampled vs proportional, common " +
       "strata downsampled, thresholds bounded by the bucket count") {
    import spark.implicits._
    // 3 strata with counts 900 / 90 / 10: proportional keep-rate is 0.5
    // for everyone; sqrt-temperature shifts share toward the rare ones.
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1090).map(i => (i.toLong, "mid")) ++
      (2001 to 2010).map(i => (i.toLong, "rare"))).toDF("doc_id", "src")
    val rates = Sampling.temperatureMixtureRates(df, "src")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // thr/buckets is the realized keep rate; proportional would be 5000
    assert(rates("rare") === 10000L, s"rare stratum should clamp at 1.0: $rates")
    assert(rates("mid") > 5000L, s"mid stratum should exceed proportional: $rates")
    assert(rates("big") < 5000L, s"big stratum should fall below proportional: $rates")
    val kept = Sampling.temperatureMixture(df, col("doc_id"), "src")
    val keptBySrc = kept.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBySrc("rare") === 10L, "clamped stratum keeps everything")
    // weight column reports the realized rate
    val w = kept.filter(col("src") === "rare").select("mix_weight")
      .distinct().collect().map(_.getDouble(0)).toSeq
    assert(w === Seq(1.0))
  }

  test("plan shapes: shuffleShard = ONE hash exchange (no global sort " +
       "structure); temperatureMixture = broadcast rates, no data-side " +
       "sort-merge; importanceResample = zero exchanges (scan-side)") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val shard = Sampling.shuffleShard(docs, col("doc_id"), 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(shard).size === 1,
      s"shuffleShard must shuffle exactly once (on shard_id):\n$shard")
    assert(!shard.contains("rangepartitioning") && !shard.contains("SinglePartition"),
      s"shuffleShard must not build a global ordering:\n$shard")

    val mix = Sampling.temperatureMixture(docs, col("doc_id"), "source")
      .queryExecution.executedPlan.toString
    assert(mix.contains("BroadcastHashJoin") && !mix.contains("SortMergeJoin"),
      s"mixing table must broadcast onto the scan:\n$mix")

    val imp = Sampling.importanceResample(docs, col("doc_id"), lit(0.5))
      .queryExecution.executedPlan.toString
    assert(!imp.contains("Exchange"),
      s"importanceResample must stay scan-side (no shuffle):\n$imp")
  }

  // ---------------------------------------------------------------- x56

  test("importanceResample: weight 1 keeps all, 0 keeps none, realized " +
       "rate tracks the weight, weights clamped to [0,1]") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
    assert(Sampling.importanceResample(df, col("id"), lit(1.0)).count() === 2000L)
    assert(Sampling.importanceResample(df, col("id"), lit(0.0)).count() === 0L)
    assert(Sampling.importanceResample(df, col("id"), lit(7.5)).count() === 2000L,
      "weights above 1 clamp to keep-everything")
    val kept = Sampling.importanceResample(df, col("id"), lit(0.3)).count()
    assert(math.abs(kept - 600L) < 100, s"realized rate off: $kept of 2000 at w=0.3")
    // per-row weights: even ids weight 1, odd ids weight 0
    val mixed = Sampling.importanceResample(df, col("id"),
        when(col("id") % 2 === 0, 1.0).otherwise(0.0))
      .select("id").as[Long].collect()
    assert(mixed.forall(_ % 2 == 0) && mixed.length === 1000)
  }

  // ---------------------------------------------------------------- x55

  test("pageRank: 2-cycle fixed point stays at 1/2; star hub outranks " +
       "spokes; ranks sum to ~1 on a graph with no dangling nodes") {
    import spark.implicits._
    val cycle = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val cr = Graph.pageRank(cycle, "src", "dst", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cr("a") === 0.5 && cr("b") === 0.5,
      s"uniform is the 2-cycle fixed point: $cr")
    // hub-and-spokes with return edges: hub must dominate, mass conserved
    val star = (Seq.tabulate(4)(i => (s"s$i", "hub")) ++
      Seq.tabulate(4)(i => ("hub", s"s$i"))).toDF("src", "dst")
    val sr = Graph.pageRank(star, "src", "dst", iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sr("hub") > sr("s0") * 2, s"hub should dominate: $sr")
    val total = sr.values.sum
    assert(math.abs(total - 1.0) < 1e-3,
      s"no dangling nodes => mass conserved, got $total")
    // spokes are symmetric => identical ranks
    assert(Seq("s0", "s1", "s2", "s3").map(sr).distinct.size === 1)
  }

  test("pageRank: 30 iterations run with bounded plan depth (periodic " +
       "localCheckpoint) and stay at the 2-cycle fixed point") {
    import spark.implicits._
    val cycle = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = Graph.pageRank(cycle, "src", "dst", iterations = 30)
    val r = out.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("a") === 0.5 && r("b") === 0.5, s"fixed point drifted: $r")
    // lineage was truncated: each round contributes 4 joins (edge×rank,
    // ×deg, nodes-left-join, count crossJoin), so an untruncated plan
    // would carry 120; after the round-24 checkpoint only the last 6
    // rounds (24 joins) may remain
    val plan = out.queryExecution.optimizedPlan.toString
    val joins = "Join".r.findAllIn(plan).size
    assert(joins <= 32, s"plan still chains every round: $joins joins\n")
  }

  test("pageRank: dangling authority outranks its sources, mass leaks " +
       "(documented simplified semantics), self-loops/dup edges ignored") {
    import spark.implicits._
    // 6 teleport-only sources all point at one DANGLING sink (no
    // out-edges after the self-loop is dropped); a duplicate edge and a
    // self-loop thrown in on purpose. No cycles => the power iteration
    // is exact after 2 rounds, no bipartite oscillation.
    val edges = (Seq.tabulate(6)(i => (s"n$i", "sink")) ++
      Seq(("n1", "sink"), ("sink", "sink"))).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 8)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.size === 7, "self-loop must not create extra nodes")
    val srcRanks = (0 to 5).map(i => r(s"n$i")).distinct
    assert(srcRanks.size === 1, s"teleport-only sources must tie: $r")
    assert(r("sink") > 4 * srcRanks.head,
      s"sink absorbs six sources' rank: $r")
    // sink has no out-edge: its rank leaks each round, so total < 1 —
    // the documented non-redistributing variant
    assert(r.values.sum < 0.9, s"dangling mass should leak: ${r.values.sum}")
  }

  // ---------------------------------------------------------------- x57

  test("semanticDedup: identical vectors collapse to the min id; one-hop " +
       "domination drops a chain without transitive closure") {
    import spark.implicits._
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
                               math.sin(math.toRadians(deg)).toFloat)
    // a(0°) ~ b(20°): cos ≈ .940; b ~ c(40°): .940; a !~ c: .766 < .9
    val emb = Seq((1L, v(0)), (2L, v(20)), (3L, v(40)), (4L, v(0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "embedding", "vec_id",
        cells = 1, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toMap
    assert(out(1L) === (None, true), s"smallest id always survives: $out")
    assert(out(2L) === (Some(1L), false), s"b dominated by a: $out")
    // c's only above-threshold smaller-id neighbor is b — one-hop, so
    // dup_of is b even though b itself was dropped (documented rule)
    assert(out(3L) === (Some(2L), false), s"c dominated by b, not a: $out")
    assert(out(4L) === (Some(1L), false), s"exact dup collapses to min id: $out")
  }

  test("semanticDedup: cell-partitioned — near-dups in DIFFERENT cells both " +
       "survive; pair join is a shuffle, never a broadcast of the corpus") {
    import spark.implicits._
    // 8 spread-out unit vectors; with cells = 8 every vector is its own
    // center, so even the identical pair (id 7, id 8) lands apart only
    // if assigned to different cells — instead pin behavior structurally:
    // threshold > 1 makes NO pair dominate, so everything is kept.
    val emb = (1L to 8L).map(i =>
      (i, Array(math.cos(i.toDouble).toFloat, math.sin(i.toDouble).toFloat)))
      .toDF("vec_id", "embedding")
    val all = Similarity.semanticDedup(emb, "embedding", "vec_id",
      cells = 4, threshold = 1.1)
    assert(all.filter(col("kept")).count() === 8)
    val plan = all.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"pair join must shuffle on cell:\n$plan")
  }

  // ---------------------------------------------------------------- x58

  private def spans(docs: org.apache.spark.sql.DataFrame, w: Int = 3) =
    Dedup.duplicateSpans(docs, "text", "doc_id", window = w, minCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet

  test("duplicateSpans: cross-doc shared run found with exact boundaries; " +
       "unique doc emits no spans") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f z"),
      (3L, "q w r t u i o p")).toDF("doc_id", "text")
    // shared run "a b c d e f": 4 duplicated 3-grams per doc, one span
    // each — doc 1 tokens [1,6], doc 2 tokens [3,8].
    assert(spans(docs) === Set(
      (1L, 1, 6, 6, 4L),
      (2L, 3, 8, 6, 4L)))
  }

  test("duplicateSpans: self-repeat counts as duplication; spans split " +
       "across a unique stretch wider than the window") {
    val docs = Seq(
      (1L, "p q r m1 m2 m3 m4 p q r"),
      (2L, "p q r")).toDF("doc_id", "text")
    // "p q r" occurs 3× (doc 1 pos 1 and 8, doc 2 pos 1); doc 1's two
    // occurrences are separated by 4 unique tokens > window → 2 islands.
    assert(spans(docs) === Set(
      (1L, 1, 3, 3, 1L),
      (1L, 8, 10, 3, 1L),
      (2L, 1, 3, 3, 1L)))
  }

  test("duplicateSpans: touching coverage merges — maximal contiguous " +
       "run of duplicated TOKENS, not of identical substrings") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c"),
      (3L, "d e f")).toDF("doc_id", "text")
    // doc 1: gram [1,3] dups doc 2, gram [4,6] dups doc 3 — different
    // substrings, adjacent coverage → one span over tokens [1,6].
    assert(spans(docs) === Set(
      (1L, 1, 6, 6, 2L),
      (2L, 1, 3, 3, 1L),
      (3L, 1, 3, 3, 1L)))
  }

  // ---------------------------------------------------------------- x60

  test("perplexityBuckets: per-language tertile invariants — tail holds " +
       "≥ 1/3, tail+middle ≥ 2/3, classes ordered by bucket") {
    val out = TextAnalysis.perplexityBuckets(
      T.documents(spark, "/root/testdata/sf0.001"), "text", "doc_id").cache()
    try {
      assert(out.count() === 500)
      val perLang = out.groupBy("pred_lang").agg(
        count(lit(1)).as("n"),
        sum(when(col("ppl_bucket") === "tail", 1).otherwise(0)).as("nt"),
        sum(when(col("ppl_bucket") =!= "head", 1).otherwise(0)).as("ntm"),
        max(when(col("ppl_bucket") === "tail", col("fam_bucket"))).as("maxT"),
        min(when(col("ppl_bucket") === "middle", col("fam_bucket"))).as("minM"),
        max(when(col("ppl_bucket") === "middle", col("fam_bucket"))).as("maxM"),
        min(when(col("ppl_bucket") === "head", col("fam_bucket"))).as("minH"))
        .collect()
      assert(perLang.nonEmpty)
      perLang.foreach { r =>
        val (lang, n, nt, ntm) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        assert(nt * 3 >= n, s"$lang: tail < 1/3")
        assert(ntm * 3 >= n * 2, s"$lang: tail+middle < 2/3")
        def g(i: Int): Option[Long] =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        for (a <- g(4); b <- g(5)) assert(a < b, s"$lang: tail/middle overlap")
        for (a <- g(6); b <- g(7)) assert(a < b, s"$lang: middle/head overlap")
      }
    } finally out.unpersist()
  }

  test("perplexityBuckets: cutoffs are PER LANGUAGE — a language whose " +
       "scores all sit below another's still gets its own head") {
    import spark.implicits._
    // en docs: one massively-shared phrase → very high familiarity.
    // de docs: three separated familiarity levels (shared-heavy /
    // half-shared / unique), ALL far below the en scores — a GLOBAL
    // tertile would dump every de doc into tail; per-language cutoffs
    // give de its own head/middle/tail.
    val p = "das ist ein gutes haus"
    val en = Seq.tabulate(4)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again " * 8))
    val de = Seq(
      (10L, (p + " ") * 4),                         // shared-heavy → de head
      (11L, p + " qwv zxv pfl mnb krt"),            // half shared → de middle
      (12L, "das qwert zuiop mmnbv xcvbn eerrtt"))  // unique → de tail
    val docs = (en ++ de).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(docs, "text", "doc_id", bucketWidth = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    assert(out.forall(r => r._2 == "en" || r._2 == "de"), out.mkString(","))
    val de3 = out.filter(_._2 == "de").sortBy(_._1).map(_._3).toSeq
    assert(de3 === Seq("head", "middle", "tail"),
      s"de must span its own tertiles, got ${out.mkString(",")}")
  }

  test("perplexityBuckets plan: cutoff join-back broadcasts the tiny " +
       "cuts table; the corpus-keyed score join shuffles") {
    val out = TextAnalysis.perplexityBuckets(
      T.documents(spark, "/root/testdata/sf0.001"), "text", "doc_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cuts must broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"familiarity/lang join must shuffle:\n$plan")
  }

  // ---------------------------------------------------------------- x59

  test("clusterSplit: no cluster straddles splits — even when member " +
       "docs' OWN hash buckets land in different splits") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.bandedJaccardMinhash(docs, "text", "doc_id",
        n = 3, threshold = 0.2, numHashes = 16, bands = 8)
      .select("d1", "d2")
    val labeled = Dedup.connectedComponentsKeepOne(docs, "doc_id", pairs)
    val split = Sampling.clusterSplit(labeled, "canonical_id").cache()
    try {
      val straddlers = split.groupBy("canonical_id")
        .agg(countDistinct(col("split")).as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assert(straddlers === 0)
      // the guarantee is non-vacuous: some multi-doc cluster exists whose
      // members' doc-level buckets disagree on the split — doc-hashing
      // WOULD have leaked it across splits.
      val docLevel = Sampling.clusterSplit(
        split.drop("split_bucket", "split"), "doc_id")
      val wouldLeak = docLevel.groupBy("canonical_id")
        .agg(countDistinct(col("split")).as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assert(wouldLeak > 0,
        "corpus has no cluster that doc-hashing would split — test is vacuous")
      // all three splits populated at 80/10/10 on this corpus
      assert(split.select("split").distinct().count() === 3)
    } finally split.unpersist()
  }

  test("clusterSplit plan: scan-side — adds no exchange beyond the " +
       "labeled input's own plan") {
    import spark.implicits._
    val labeled = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "canonical_id")
    val split = Sampling.clusterSplit(labeled, "canonical_id")
    val exchanges = split.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "split must not shuffle")
    assert(split.filter(col("doc_id") === 1L).select("split").collect() ===
      split.filter(col("doc_id") === 2L).select("split").collect(),
      "same cluster, same split")
  }

  // ---------------------------------------------------------------- x64

  test("packBinsNfd: exact next-fit-decreasing trace on one shard; " +
       "oversized doc sits alone in its bin") {
    import spark.implicits._
    def words(n: Int, tag: String) = Seq.fill(n)(tag).mkString(" ")
    // capacity 10, lens desc: 12(oversized), 7, 5, 4, 3, 3, 2
    val docs = Seq(
      (1L, words(7, "a")), (2L, words(5, "b")), (3L, words(4, "c")),
      (4L, words(3, "d")), (5L, words(3, "e")), (6L, words(2, "f")),
      (7L, words(12, "g"))).toDF("doc_id", "text")
    val got = Packing.packBinsNfd(docs, "text", "doc_id",
        capacity = 10, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    // NFD order: 12 → bin0 (oversized, alone); 7 overflows → bin1;
    // 5 overflows → bin2; 4 fits (9); 3 overflows → bin3; 3 fits (6);
    // 2 fits (8).
    assert(got === Set(
      (7L, 0L, 12L), (1L, 1L, 7L), (2L, 2L, 5L), (3L, 2L, 9L),
      (4L, 3L, 3L), (5L, 3L, 6L), (6L, 3L, 8L)))
  }

  test("packBinsNfd: corpus invariants — capacity respected except " +
       "singleton oversized bins; NF 2-competitive bound per shard") {
    val out = Packing.packBinsNfd(
      T.documents(spark, "/root/testdata/sf0.001"), "text", "doc_id",
      capacity = 256, nShards = 8).cache()
    try {
      assert(out.count() === 500)
      val badBins = out.groupBy("shard_id", "bin_id")
        .agg(sum(col("len")).as("load"), count(lit(1)).as("n"))
        .filter(col("load") > 256 && col("n") > 1).count()
      assert(badBins === 0, "multi-doc bin over capacity")
      out.groupBy("shard_id")
        .agg(sum(col("len")).as("total"),
          (max(col("bin_id")) + 1).as("n_bins"))
        .collect().foreach { r =>
          val (sh, total, nBins) = (r.getInt(0), r.getLong(1), r.getLong(2))
          val opt = (total + 255) / 256
          assert(nBins <= 2 * opt + 1, s"shard $sh: $nBins bins vs opt $opt")
        }
    } finally out.unpersist()
  }

  // ---------------------------------------------------------------- x62

  test("int8Quantize: codes bounded by ±127 and hit ±127 at the max " +
       "element; dequantization error ≤ qscale/2; zero vector → zero") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(-0.002f, 0.001f)),
      (3L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.int8Quantize(emb, "embedding", "vec_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2))))
      .toMap
    val origs = Map(
      1L -> Seq(0.5, -1.0, 0.25, 0.0), 2L -> Seq(-0.002, 0.001),
      3L -> Seq(0.0, 0.0, 0.0))
    rows.foreach { case (id, (qscale, codes)) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"$id out of range")
      if (id != 3L) assert(codes.exists(c => math.abs(c) == 127), s"$id max")
      codes.zip(origs(id)).foreach { case (c, v) =>
        assert(math.abs(c * qscale - v) <= qscale / 2 + 1e-6,
          s"$id dequant err: code $c qscale $qscale orig $v")
      }
    }
    assert(rows(3L)._1 === 0.0 && rows(3L)._2.forall(_ == 0))
  }

  test("int8Quantize plan: scan-side — no exchange at all") {
    val q = Similarity.int8Quantize(
      graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "embedding", "vec_id")
    val exchanges = q.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "quantization must not shuffle")
  }

  test("scan-side nearest-cell election equals the window election on " +
       "random vectors (the round-7 argmin refactor's semantic pin)") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions
    import graft.tables.Exact
    (1 to 5).foreach { trial =>
      val rnd = new scala.util.Random(1000L + trial)
      val emb = (0 until 40).map { id =>
        (id.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
      }.toDF("vec_id", "embedding")
      // the argmin path, via semanticDedup's exposed cell column
      // (threshold 2.0 keeps every vector so only assignment matters)
      val got = Similarity.semanticDedup(emb, "embedding", "vec_id",
          cells = 6, threshold = 2.0)
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: the pre-round-7 rk=1 window election, rebuilt here
      val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
      val codebook = c
        .withColumn("hu",
          hash(col("cand_id")).cast("bigint").bitwiseAND(lit(4294967295L)))
        .orderBy(col("hu"), col("cand_id")).limit(6)
        .select(col("cand_id").as("cell"), col("cvec").as("centroid"))
      val w = Window.partitionBy(col("cand_id"))
        .orderBy(col("cell_sim").desc, col("cell"))
      val ref = c.crossJoin(broadcast(codebook))
        .withColumn("cell_sim",
          Exact.round6(GraftFunctions.cosineSim(col("cvec"), col("centroid"))))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("cand_id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === ref, s"trial $trial: election diverged")
    }
  }

  test("int8QuantizeLong: cell-for-cell equal to the wide format, " +
       "n·dim rows, and still exchange-free after the posexplode") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(-0.002f, 0.001f)),
      (3L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val wide = Similarity.int8Quantize(emb, "embedding", "vec_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2))))
      .toMap
    val long = Similarity.int8QuantizeLong(emb, "embedding", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    assert(long.length === wide.values.map(_._2.size).sum)
    long.foreach { case (id, qscale, pos, code) =>
      assert(qscale === wide(id)._1, s"$id qscale")
      assert(code === wide(id)._2(pos.toInt), s"$id[$pos]")
    }
    val q = Similarity.int8QuantizeLong(
      graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "embedding", "vec_id")
    val exchanges = q.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "long-format quantization must not shuffle")
  }

  // ---------------------------------------------------------------- x63

  test("evalContamination: exact fractions — full copy 1.0/dirty, " +
       "disjoint 0.0/clean, partial overlap the exact ratio") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "a b c d e"),
      (101L, "strange unrelated corpus content here")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b c d e"),        // all 3 shingles hit → 1.0
      (2L, "x y z w v"),        // none hit → 0.0
      (3L, "a b c y z w")).toDF("doc_id", "text")
    // doc 3 shingles: "a b c"(hit), "b c y", "c y z", "y z w" → 1/4
    val got = Dedup.evalContamination(corpus, eval, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSet
    assert(got === Set(
      (1L, 3L, 3L, 1.0, false),
      (2L, 3L, 0L, 0.0, true),
      (3L, 4L, 1L, 0.25, false)))
  }

  test("evalContamination plan: corpus streams through broadcast joins " +
       "— the corpus side is never built or broadcast") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val rep = Dedup.evalContamination(docs.filter(col("doc_id") >= 20),
      docs.filter(col("doc_id") < 20), "text", "doc_id")
    assert(rep.count() === 20)
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$plan")
  }

  // ---------------------------------------------------------------- x61

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("removeDuplicateSpans: covered tokens cut, remainder reassembled " +
       "in order; untouched and sub-window docs kept whole") {
    val docs = Seq(
      (1L, "a b c d e f g h"),     // span [1,6] → keeps "g h"
      (2L, "x y a b c d e f z"),   // span [3,8] → keeps "x y z"
      (3L, "q w r t u i o p"),     // no duplicated grams → kept whole
      (4L, "ti ny")).toDF("doc_id", "text") // < window → no grams → whole
    val got = Dedup.removeDuplicateSpans(docs, "text", "doc_id", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, 8L, 6L, md5hex("g h")),
      (2L, 9L, 6L, md5hex("x y z")),
      (3L, 8L, 0L, md5hex("q w r t u i o p")),
      (4L, 2L, 0L, md5hex("ti ny"))))
  }

  test("removeDuplicateSpans: fully-duplicated docs empty out (the " +
       "paper's self-repeat cut), signature of the empty string") {
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "text", "doc_id", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, 3L, 3L, md5hex("")),
      (2L, 3L, 3L, md5hex(""))))
  }

  test("removeDuplicateSpans plan: coverage anti-join and reassembly " +
       "join-back shuffle — no broadcast of corpus-derived sides") {
    val df = Dedup.removeDuplicateSpans(
      T.documents(spark, "/root/testdata/sf0.001"), "text", "doc_id")
    assert(df.filter(col("n_removed") > 0).count() > 0,
      "corpus must have removable spans")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"must shuffle:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"no corpus-derived side may broadcast:\n$plan")
  }

  test("duplicateSpans plan: duplicated-gram join-back is a shuffle — " +
       "never a broadcast of either explode-fed side") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val df = Dedup.duplicateSpans(docs, "text", "doc_id")
    assert(df.count() > 0, "sf0.001 corpus must contain duplicated 5-grams")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"join-back must shuffle on the gram:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"no corpus-derived side may broadcast:\n$plan")
  }
}
