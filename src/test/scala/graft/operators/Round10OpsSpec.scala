package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-10 operators: CDC chunking, exact length quantiles,
  * collocation lift, per-source dup profile, min-label propagation.
  */
class Round10OpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- x96

  test("cdcChunks: chunk lengths tile the document exactly and hashes " +
       "are the md5 of each chunk substring") {
    val text = ("the quick brown fox jumps over the lazy dog and then " +
      "some more text to make boundaries likely appear somewhere in this " +
      "longer string of words repeated the quick brown fox jumps over " +
      "the lazy dog")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Chunking.cdcChunks(df, "text", "doc_id")
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("chunk_len")).sum === text.length)
    // reassemble: consecutive substrings hash to the reported md5s
    var off = 0
    out.foreach { r =>
      val len = r.getAs[Int]("chunk_len")
      val chunk = text.substring(off, off + len)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("chunk_hash") === md)
      off += len
    }
    assert(off === text.length)
  }

  test("cdcChunks: edit locality — changing the head does not re-chunk " +
       "the tail (the CDC property fixed-size blocks lack)") {
    val tail = ("the common tail of both documents continues for long " +
      "enough to contain several content-defined boundaries in it ") * 8
    val a = "PREFIX-A " + tail
    val b = "a totally different and longer prefix B " + tail
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val ch = Chunking.cdcChunks(df, "text", "doc_id")
    val ha = ch.filter($"doc_id" === 1L).select("chunk_hash")
      .collect().map(_.getString(0)).toSet
    val hb = ch.filter($"doc_id" === 2L).select("chunk_hash")
      .collect().map(_.getString(0)).toSet
    // after the first shared boundary the chunkings coincide — the two
    // docs must share at least one identical chunk despite different
    // prefixes (re-chunking is local to the edit)
    assert((ha intersect hb).nonEmpty,
      s"no shared chunk between shifted copies: a=$ha b=$hb")
  }

  test("cdcChunks: short and sub-window docs yield one whole-doc chunk") {
    val df = Seq((1L, "tiny"), (2L, "1234567")).toDF("doc_id", "text")
    val out = Chunking.cdcChunks(df, "text", "doc_id").collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Int]("chunk_idx") == 0))
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_len")))
      .toSet === Set((1L, 4), (2L, 7)))
  }

  test("cdcDupReport: duplicated tails dedupe at chunk level") {
    val tail = "shared content block " * 20
    val df = Seq((1L, "alpha " + tail, "s1"), (2L, "beta " + tail, "s1"),
        (3L, "unique text entirely its own", "s2"))
      .toDF("doc_id", "text", "source")
    val rep = Chunking.cdcDupReport(df, "text", "doc_id", "source")
      .orderBy("source").collect()
    val s1 = rep(0)
    assert(s1.getAs[String]("source") === "s1")
    assert(s1.getAs[Long]("dup_chunks") > 0L,
      "identical tails must produce duplicate chunks")
    val s2 = rep(1)
    assert(s2.getAs[Long]("dup_chunks") === 0L)
  }

  // --------------------------------------------------------------- x100

  test("cdcIncremental: chunks shared with history count as reused " +
       "bytes; novel docs report zero reuse") {
    val tail = ("the shared tail that already lives in the store and " +
      "is long enough to contain several chunk boundaries inside it ") * 8
    val history = Seq((1L, "old version prefix " + tail)).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "brand new prefix of the edited file " + tail),
      (101L, "an entirely novel document with none of its content in " +
        "the store at all, not a single shared chunk anywhere"))
      .toDF("doc_id", "text")
    val out = Chunking.cdcIncremental(batch, history, "text", "doc_id")
      .orderBy("doc_id").collect()
    val edited = out(0)
    assert(edited.getAs[Long]("new_chars") < edited.getAs[Long]("total_chars"),
      "the shared tail must dedupe at chunk level")
    assert(edited.getAs[Long]("reuse_rate_q") > 0L)
    val novel = out(1)
    assert(novel.getAs[Long]("n_new_chunks") === novel.getAs[Long]("n_chunks"))
    assert(novel.getAs[Long]("reuse_rate_q") === 0L)
  }

  // ---------------------------------------------------------------- x97

  test("winnowingPairs: documents sharing a long passage share a " +
       "selected fingerprint (the winnowing guarantee) and pair up") {
    val passage = "this exact shared passage is long enough that the " +
      "winnowing window must select at least one common fingerprint from it"
    val docs = Seq(
      (1L, "first document header " + passage),
      (2L, passage + " trailing content of the second document"),
      (3L, "entirely unrelated text with no overlap whatsoever here"))
      .toDF("doc_id", "text")
    val pairs = Chunking.winnowingPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"copy pair (1,2) missing from $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated doc paired: $pairs")
  }

  test("winnowingPairs: boilerplate fingerprints above maxDf are pruned " +
       "before pair mining (the quadratic-hot-bucket fence)") {
    // the same passage in 6 docs with maxDf=4: every fingerprint from it
    // has df 6 > 4 → no pairs at all
    val passage = "common boilerplate footer text appearing everywhere " +
      "in this synthetic corpus of documents"
    val docs = (1L to 6L).map(i => (i, s"doc $i " + passage)).toDF("doc_id", "text")
    val pruned = Chunking.winnowingPairs(docs, "text", "doc_id", maxDf = 4)
    assert(pruned.count() === 0L, "df-pruned fingerprints must not pair")
    // and with the fence above the df the pairs appear
    val kept = Chunking.winnowingPairs(docs, "text", "doc_id", maxDf = 6)
    assert(kept.count() > 0L)
  }

  // ---------------------------------------------------------------- x98

  test("vocabCoverage: coverage is the exact in-vocab token share on a " +
       "hand-checked corpus") {
    val docs = Seq(
      ("a a b c", "s1"),   // 4 tokens; vocab(2)={a(3+?),...}
      ("a b b d", "s2"))   // counts: a=3, b=3, c=1, d=1 → vocab2 = {a, b}
      .toDF("text", "source")
    val out = TextAnalysis.vocabCoverage(docs, "text", "source", vocabSize = 2)
      .orderBy("source").collect()
    assert(out(0).getAs[Long]("n_tokens") === 4L)
    assert(out(0).getAs[Long]("n_in_vocab") === 3L) // a a b
    assert(out(0).getAs[Long]("coverage_q") === 786432L) // 0.75 · 2^20
    assert(out(1).getAs[Long]("n_in_vocab") === 3L) // a b b
  }

  // ---------------------------------------------------------------- x99

  test("simhashCandidatePrecision: bucket denominators cover EVERY " +
       "candidate pair and exact dups land true at hamming 0") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.tables.Tables.documents(spark, sf)
    val cand = Dedup.simhashCandidates(docs, "text", "doc_id").count()
    val rep = Dedup.simhashCandidatePrecision(docs, "text", "doc_id")
      .collect()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum === cand,
      "every candidate must appear in exactly one hamming bucket")
    val h0 = rep.find(_.getAs[Int]("hamming") == 0)
    h0.foreach { r =>
      // hamming-0 pairs on this corpus are exact dups → all true
      assert(r.getAs[Long]("n_true") === r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("precision_q") === 1048576L)
    }
    rep.foreach { r =>
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_pairs"))
    }
  }

  // ---------------------------------------------------------------- x93

  test("lengthQuantiles: exact disc quantiles on a known distribution") {
    // lengths 1..10 (one doc each): p25=3, p50=5, p75=8, p90=9, p99=10
    val docs = (1 to 10).map(n => (("w " * n).trim, "s")).toDF("text", "source")
    val r = TextAnalysis.lengthQuantiles(docs, "text", "source").collect()(0)
    assert(r.getAs[Long]("n_docs") === 10L)
    assert(r.getAs[Long]("p25") === 3L)
    assert(r.getAs[Long]("p50") === 5L)
    assert(r.getAs[Long]("p75") === 8L)
    assert(r.getAs[Long]("p90") === 9L)
    assert(r.getAs[Long]("p99") === 10L)
  }

  // ---------------------------------------------------------------- x94

  test("collocations: a bound phrase outranks a free pair; marginals " +
       "are the bigram contingency counts") {
    // "san francisco" always together (5×); "the city" with "the" also
    // heading many other bigrams → lower lift
    val docs = Seq.fill(5)("the city of san francisco by the bay") ++
      Seq("the bay", "the city", "the fog", "the hill")
    val out = TextAnalysis.collocations(docs.toDF("text"), "text",
      minCount = 2L, k = 10).collect()
    val sf = out.find(r => r.getString(0) == "san" && r.getString(1) == "francisco")
    assert(sf.nonEmpty, "san-francisco must survive the support prune")
    assert(sf.get.getAs[Long]("c_bi") === 5L)
    assert(sf.get.getAs[Long]("c_head") === 5L, "'san' heads only this bigram")
    val theCity = out.find(r => r.getString(0) == "the" && r.getString(1) == "city")
    assert(theCity.forall(r =>
      r.getAs[Double]("lift") < sf.get.getAs[Double]("lift")),
      "free combination must not outrank the bound phrase")
  }

  // ---------------------------------------------------------------- x95

  test("dupProfile: counts, max cluster, and grid rate on synthetic dups") {
    val docs = Seq(("a", "s1"), ("a", "s1"), ("a", "s1"), ("b", "s1"),
        ("c", "s2")).toDF("text", "source")
    val rows = Profile.dupProfile(docs, "text", "source")
      .orderBy("source").collect()
    val s1 = rows(0)
    assert(s1.getAs[Long]("n_docs") === 4L)
    assert(s1.getAs[Long]("n_distinct") === 2L)
    assert(s1.getAs[Long]("dup_docs") === 2L)
    assert(s1.getAs[Long]("max_cluster") === 3L)
    assert(s1.getAs[Long]("dup_rate_q") === 524288L) // 0.5 on the 2^-20 grid
    assert(rows(1).getAs[Long]("dup_docs") === 0L)
  }

  // ---------------------------------------------------------------- a63

  test("minLabelPropagation: components within k hops converge to the " +
       "component minimum; separate components keep separate labels") {
    // component A: 1-2-3 triangle; component B: 10-11; isolated via no edges
    val edges = Seq((2L, 1L), (2L, 3L), (1L, 3L), (10L, 11L))
      .toDF("a", "b")
    val lbl = Graph.minLabelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(1L) === 1L && lbl(2L) === 1L && lbl(3L) === 1L)
    assert(lbl(10L) === 10L && lbl(11L) === 10L)
  }

  test("minLabelPropagation: bounded rounds — a path longer than k hops " +
       "does NOT fully converge (the documented k-hop semantic)") {
    // path 1-2-3-4-5-6: node 6 is 5 hops from node 1; after 3 rounds its
    // label is min over its 3-hop ball = 3, not 1
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val lbl = Graph.minLabelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(6L) === 3L, "3 rounds reach exactly the 3-hop minimum")
    assert(lbl(4L) === 1L)
    // and with enough rounds the full path converges
    val full = Graph.minLabelPropagation(edges, "a", "b", rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.values.toSet === Set(1L))
  }
}
