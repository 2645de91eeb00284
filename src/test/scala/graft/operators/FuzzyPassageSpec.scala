package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Unit tests for the round-5 continuation operators: edit-distance
  * fuzzy dedup, passage-level exact dedup, survivorship, normalization,
  * Gopher-style quality filtering, and the trigram familiarity model.
  */
class FuzzyPassageSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzzyPairs: finds prefix-blocked near dups, drops distant texts") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy cat tonight"), // 3 edits from 0
      (2L, "the quick brown fox leaps over seventeen lazy dogs and then rests"),
      (3L, "a wholly unrelated document about spark physical plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.fuzzyPairs(docs, "text", "doc_id",
        prefixLen = 12, lenBand = 24, maxDist = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 1L)) === 3)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
    // doc 2 shares the prefix but is > 5 edits from both
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("fuzzyPairs: pair straddling a length-bucket boundary still meets") {
    // len("x " * 11 + pad)… build two texts whose lengths are 23 and 25 so
    // floor(len/24) differs (0 vs 1) but |diff| ≤ 24: the ±1 bucket explode
    // must recover the pair.
    val t1 = "abcdefghijkl 0123456789"        // 23 chars
    val t2 = "abcdefghijkl 0123456789ab"      // 25 chars, 2 edits
    val docs = Seq((0L, t1), (1L, t2)).toDF("doc_id", "text")
    val pairs = Dedup.fuzzyPairs(docs, "text", "doc_id",
        prefixLen = 12, lenBand = 24, maxDist = 5).collect()
    assert(pairs.length === 1 && pairs.head.getInt(2) === 2)
  }

  test("passageDedup: full duplicate loses every passage; partial overlap loses shared span") {
    val a = (1 to 10).map(i => s"w$i").mkString(" ")   // one 10-token passage
    val b = (11 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, s"$a $b"),  // passages [a, b]
      (1L, s"$a $b"),  // exact dup: loses both
      (2L, s"$b $a"))  // reversed: passage b and a both seen → loses both
      .toDF("doc_id", "text")
    val out = Dedup.passageDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 0L, 0L)) // n_kept
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L, 2L)) // n_pass
  }

  test("passageDedup: unique tail passage survives on the later doc") {
    val a = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, a),
      (1L, s"$a unique tail tokens here"))
      .toDF("doc_id", "text")
    val out = Dedup.passageDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 1L)       // doc 0 keeps its passage
    assert(out(1).getLong(2) === 1L)       // doc 1 keeps only the tail passage
    assert(out(1).getString(3) === md5Hex("unique tail tokens here"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("passageDedup properties: kept ≤ total, kept passages globally unique, distinct corpus is identity") {
    import org.scalacheck.{Gen, rng}
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docGen = Gen.listOfN(25, Gen.choose(0, vocab.size - 1)).map(_.map(vocab).mkString(" "))
    (1 to 5).foreach { i =>
      val texts = Gen.listOfN(12, docGen)
        .pureApply(Gen.Parameters.default, rng.Seed(7L + i))
      val docs = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.passageDedup(docs, "text", "doc_id").collect()
      // invariants: every doc reports, kept ≤ total, totals = ceil(25/10)
      assert(out.length === texts.size)
      out.foreach(r => assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) === 3L))
      // global uniqueness: total kept == number of DISTINCT passages in the corpus
      val distinctPassages = texts.flatMap(_.split(" ").grouped(10).map(_.mkString(" "))).distinct.size
      assert(out.map(_.getLong(2)).sum === distinctPassages.toLong)
    }
    // fully distinct corpus → identity (each doc keeps everything)
    val uniq = (0 until 8).map(i => (i.toLong,
      (0 until 20).map(j => s"u${i}w$j").mkString(" "))).toDF("doc_id", "text")
    val outU = Dedup.passageDedup(uniq, "text", "doc_id").collect()
    outU.foreach(r => assert(r.getLong(2) === r.getLong(1)))
  }

  test("keepBestPerCluster: max score wins, ties go to smallest id") {
    val rows = Seq(
      ("c1", 10L, 5.0), ("c1", 11L, 9.0), ("c1", 12L, 9.0),
      ("c2", 20L, 1.0))
      .toDF("cluster_key", "id", "score")
    val out = Dedup.keepBestPerCluster(rows, "cluster_key", "id", "score")
      .orderBy("cluster").collect()
    assert(out(0).getLong(1) === 11L && out(0).getLong(2) === 3L)
    assert(out(1).getLong(1) === 20L && out(1).getLong(2) === 1L)
  }

  test("normalize: case, punctuation and whitespace runs collapse") {
    val docs = Seq((0L, "  Hello,   WORLD!!  it's 42 ")).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(docs, "text").select("norm_head").head()
    assert(out.getString(0) === "hello world it s 42")
  }

  test("gopherQuality: each rule fires on a constructed offender") {
    // 15 distinct 4-char + 15 distinct 5-char words → mwl 4.5, in range.
    val good = ((1 to 15).map(i => f"ab$i%02d") ++ (1 to 15).map(i => f"abc$i%02d"))
      .mkString(" ")
    val docs = Seq(
      (0L, good),
      (1L, "tiny doc"),                                    // too_short
      (2L, (1 to 100).map(_ => "steady").mkString(" ")),   // too_long + repetitive
      (3L, (1 to 30).map(_ => "ab").mkString(" ")))        // short_words + repetitive
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "text")
      .select("doc_id", "fail_reasons", "keep")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(out(0) === (("", true)))
    assert(out(1)._1.contains("too_short") && !out(1)._2)
    assert(out(2)._1.contains("too_long") && out(2)._1.contains("repetitive"))
    assert(out(3)._1.contains("short_words") && !out(3)._2)
  }

  test("productQuantize: when every vector is a codeword, each encodes as itself with zero error") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 2f, 0f, 0f, 0f)),
      (1L, Array(0f, 3f, 0f, 0f, 0f, 4f, 0f, 0f)),
      (2L, Array(0f, 0f, 5f, 0f, 0f, 0f, 6f, 0f)))
      .toDF("vec_id", "embedding")
    // ks >= corpus size → the codebook is the whole corpus
    val out = Similarity.productQuantize(emb, "embedding", "vec_id", m = 2, ks = 8)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size === 6) // 3 vectors × 2 subspaces
    out.foreach { case ((vid, _), (code, qerr)) =>
      assert(code === vid && qerr === 0.0)
    }
  }

  test("productQuantize: distinct subvectors map to the nearest codeword") {
    val emb = Seq(
      (0L, Array(10f, 0f, 0f, 0f)),
      (1L, Array(0f, 10f, 0f, 0f)),
      (2L, Array(9f, 1f, 0f, 1f)))  // sub0 nearer 0's, sub1 could tie → code order
      .toDF("vec_id", "embedding")
    val out = Similarity.productQuantize(emb, "embedding", "vec_id", m = 2, ks = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // codebook = hash-min 2 of {0,1,2}; whatever the sample, vector 2's
    // first subvector [9,1] must pick the codeword closest to it
    val cb = out.values.toSet
    assert(cb.size <= 2)
    assert(out.contains((2L, 0)) && out.contains((2L, 1)))
  }

  test("negativeSamples: deterministic, no self-draws, partner labels joined") {
    val items = (0L until 20L).map(i => (i, (i % 3).toInt)).toDF("vec_id", "label")
    val a = Sampling.negativeSamples(items, "vec_id", "label", k = 4)
      .orderBy("vec_id", "i").collect()
    val b = Sampling.negativeSamples(items, "vec_id", "label", k = 4)
      .orderBy("vec_id", "i").collect()
    assert(a.toSeq === b.toSeq)                       // pure function of ids
    assert(a.forall(r => r.getLong(0) != r.getLong(2))) // no self-pairs
    assert(a.length <= 20 * 4 && a.length >= 20 * 4 - 20) // ≤1 self-draw dropped per item expected scale
    a.foreach { r =>
      // true_negative consistent with the joined labels
      assert(r.getBoolean(5) === (r.getInt(3) != r.getInt(4)))
      // partner label is the partner's actual label
      assert(r.getInt(4) === (r.getLong(2) % 3).toInt)
    }
  }

  test("trigramFamiliarity: shared trigrams score above unique ones") {
    val docs = Seq(
      (0L, "ababab"),
      (1L, "ababab"),   // identical: same trigram multiset, high corpus freq
      (2L, "qwerty"))   // unique trigrams: freq 1 each
      .toDF("doc_id", "text")
    val out = TextAnalysis.trigramFamiliarity(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(0) === out(1))
    assert(out(0) > out(2))
    assert(out(2) === 1.0)  // every trigram of the unique doc occurs once
  }
}
