package graft.operators

import graft.SparkTestBase

/** Batched BPE election (r8 verdict ask 7): the maximal mutually
  * symbol-disjoint ranking prefix per round, stopping at the FIRST
  * conflict, must reproduce the sequential learn exactly on these
  * corpora — including rounds where the prefix is forced down to one
  * merge and rounds where it applies several.
  */
class BpeBatchSpec extends SparkTestBase {
  import spark.implicits._

  private def seqMerges(docs: Seq[(Long, String)], steps: Int) =
    TextAnalysis.bpeMergeSeq(docs.toDF("doc_id", "text"), "text", steps)

  private def batMerges(docs: Seq[(Long, String)], steps: Int, batch: Int) =
    TextAnalysis.bpeMergeSeqBatched(docs.toDF("doc_id", "text"), "text", steps, batch)

  private val handCorpus = Seq(
    (1L, "a a a"),
    (2L, "a b a b x"),
    (3L, "c a b c a b"))

  test("batch=1 degenerates to the sequential learn") {
    assert(batMerges(handCorpus, 4, 1) === seqMerges(handCorpus, 4))
  }

  test("batched equals sequential on the hand-checked corpus at several widths") {
    val expect = seqMerges(handCorpus, 4)
    for (b <- Seq(2, 4, 8))
      assert(batMerges(handCorpus, 4, b) === expect, s"batch=$b")
  }

  test("a fully disjoint top-2 applies both merges in one round and matches") {
    // two-token docs only: pair vocabulary is {(a,b):3, (c,d):2} — no
    // reverse pairs, so the round-1 ranking prefix (a,b),(c,d) is
    // mutually disjoint and the batched learn applies BOTH at once;
    // the sequential learn takes two rounds to the same table.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"),
      (4L, "c d"), (5L, "c d"))
    val expect = seqMerges(docs, 3)
    assert(expect.map(m => (m._2, m._3)) === Seq(("a", "b"), ("c", "d")))
    for (b <- Seq(2, 4))
      assert(batMerges(docs, 3, b) === expect, s"batch=$b")
  }

  test("conflicting runner-up forces a one-merge prefix and still matches") {
    // "a b c d a b c d": counts (a,b)=2, (b,c)=2, (c,d)=2, (d,a)=1 —
    // ranking (a,b),(b,c),(c,d). The prefix must STOP at (b,c) (shares
    // b) rather than skip to (c,d): after merging (a,b) the (b,c)
    // adjacency is destroyed and sequential round 2 elects (c,d) — but
    // skip-and-continue would have applied (c,d) in round 1 on the
    // strength of a ranking position it only holds because (b,c) dies.
    val docs = Seq((1L, "a b c d a b c d"))
    val expect = seqMerges(docs, 3)
    for (b <- Seq(2, 4))
      assert(batMerges(docs, 3, b) === expect, s"batch=$b")
  }

  test("step cap truncates the applied prefix mid-round") {
    // wide batch, tiny step budget: the table must stop exactly at
    // `steps` rows and match the sequential prefix
    val expect = seqMerges(handCorpus, 2)
    assert(batMerges(handCorpus, 2, 8) === expect)
  }

  test("exhaustion: corpora run dry identically") {
    val docs = Seq((1L, "a b"))
    assert(batMerges(docs, 5, 4) === seqMerges(docs, 5))
  }
}
