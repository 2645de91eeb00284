package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-12 operator semantics: the delta-frontier min-label
  * propagation must be BIT-IDENTICAL to the naive synchronous
  * unrolling at every round count (the a63 oracle replays the naive
  * form, so equivalence is the correctness contract, not a nicety).
  */
class Round12OpsSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: synchronous min-label propagation. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val und = edges.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val nbrs = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl = nbrs.keys.map(v => v -> v).toMap
    (1 to rounds).foreach { _ =>
      lbl = lbl.map { case (v, l) =>
        v -> math.min(l, nbrs(v).map(lbl).min)
      }
    }
    lbl
  }

  test("delta-frontier minLabelPropagation == naive synchronous " +
       "unrolling on random graphs at every round count 1..4") {
    val rnd = new scala.util.Random(1234)
    (1 to 6).foreach { trial =>
      val n = 20 + rnd.nextInt(60)
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val df = edges.toDF("a", "b")
      (1 to 4).foreach { rounds =>
        val got = Graph.minLabelPropagation(df, "a", "b", rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = reference(edges, rounds)
        assert(got == want,
          s"trial $trial rounds $rounds: got $got want $want")
      }
    }
  }

  test("cdcChunks on multi-byte text (fence lifted, r11 ADVICE): " +
       "boundaries are char-aligned, chunk lengths tile the char " +
       "count, and chunk hashes are the md5 of the char slices — " +
       "byte/char agreement proven against a byte-walk reference") {
    val texts = Seq(
      "héllo wörld — ünïcodé 漢字テスト répéated and répéated and répéated",
      "plain ascii text that is long enough to chunk into several pieces",
      "éééééééééééééééééééééééééééééééééééééééééééééééééééééééé",
      "mixéd ascii and àccénts interleaved ünevenly 漢字 across the 漢字 text",
      // 4-byte (astral) sequences: emoji are 1 codepoint / 2 UTF-16
      // units / 4 UTF-8 bytes — the refChunks reference counts
      // codepoints, so agreement here pins the whole width ladder
      "emoji mix 😀 and 🍺 across the text 😀🍺 tail of ascii chunks")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Chunking.cdcChunks(docs, "text", "doc_id")
      .orderBy("doc_id", "chunk_idx").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.toSeq).toMap

    def refChunks(s: String): Seq[(Long, String)] = {
      val b = s.getBytes("UTF-8")
      val p7 = 27512614111L
      var h = 0L
      var q = 0
      val bnds = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- b.indices) {
        h = if (i < 8) h * 31L + (b(i) & 0xffL)
            else (h - (b(i - 8) & 0xffL) * p7) * 31L + (b(i) & 0xffL)
        if (i == b.length - 1 || (b(i + 1) & 0xC0) != 0x80) {
          q += 1
          if (i >= 7 && h % 64 == 0) bnds += q
        }
      }
      val nChars = s.codePointCount(0, s.length)
      val ends = (bnds :+ nChars).distinct.sorted
      val starts = 0 +: ends.dropRight(1)
      starts.zip(ends).map { case (cs, ce) =>
        val a = s.offsetByCodePoints(0, cs)
        val e = s.offsetByCodePoints(0, ce)
        val slice = s.substring(a, e)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        ((ce - cs).toLong, md)
      }.toSeq
    }

    texts.zipWithIndex.foreach { case (t, i) =>
      val want = refChunks(t)
      val rows = got(i.toLong)
        .map(r => (r.getAs[Number](r.fieldIndex("chunk_len")).longValue,
          r.getString(r.fieldIndex("chunk_hash"))))
      assert(rows == want, s"doc $i: $rows vs $want")
      assert(rows.map(_._1).sum == t.codePointCount(0, t.length).toLong)
    }
  }

  test("cdcChunks multi-byte edit locality: a multi-byte head edit does " +
       "not re-chunk the tail (the CDC property, now past the fence)") {
    val base = "ünïcodé 漢字テスト shared tail содержание that should " +
      "keep its chunk boundaries stable across a head edit 0123456789 " +
      "and some more shared téxt to guarantee several chunks"
    val docs = Seq((1L, base), (2L, "préfix édit → " + base))
      .toDF("doc_id", "text")
    val out = Chunking.cdcChunks(docs, "text", "doc_id").collect()
    val h1 = out.filter(_.getLong(0) == 1L)
      .map(_.getString(3)).toSet // chunk_hash ordinal: doc_id, idx, len, hash
    val h2 = out.filter(_.getLong(0) == 2L).map(_.getString(3)).toSet
    assert((h1 & h2).nonEmpty,
      s"edited doc shares no chunks with the original: $h1 vs $h2")
  }

  test("round 1 needs NO join: the rounds=1 plan is one partial-" +
       "aggregatable min straight off the edge frame (labels are still " +
       "identities) — the join only enters at delta rounds 2+") {
    val edges = (1L to 50L).map(i => (i, i % 7)).toDF("a", "b")
    val r1 = Graph.minLabelPropagation(edges, "a", "b", rounds = 1)
    val s1 = r1.queryExecution.executedPlan.toString
    assert(!s1.contains("Join"), s"round 1 must not join:\n$s1")
    assert(s1.contains("partial_min"), s"round 1 must partial-agg:\n$s1")
    val r2 = Graph.minLabelPropagation(edges, "a", "b", rounds = 2)
    val s2 = r2.queryExecution.executedPlan.toString
    assert(s2.contains("Join"), s"round 2 is the first join:\n$s2")
  }
}
