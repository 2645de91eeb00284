package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-10 late additions: bounded k-core peeling and signed feature
  * hashing. Invariant-level tests — the oracle gate certifies the full
  * fixture replay; these pin the operator semantics on known inputs.
  */
class Round10bOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------- kCorePeel

  test("kCorePeel: a pendant edge peels off a triangle at k=2 and the " +
       "core is then stable") {
    // triangle 1-2-3 (degree 2 each) + pendant 3-4 (node 4 degree 1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("a", "b")
    val out = Graph.kCorePeel(edges, "a", "b", k = 2, rounds = 2)
      .orderBy("round").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0, 4L, 4L), (1, 3L, 3L), (2, 3L, 3L)))
  }

  test("kCorePeel: cascade — a chain peels one layer per round until " +
       "nothing survives k=2") {
    // path 1-2-3-4-5: endpoints have degree 1; each round removes the
    // current endpoints, so the survivor curve shrinks by 2 edges/round
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Graph.kCorePeel(edges, "a", "b", k = 2, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // round 1 drops the endpoints; round 2 leaves only node 3 with no
    // incident edges, and the node set (= surviving-edge endpoints) is
    // empty from then on
    assert(out === Seq((0, 5L, 4L), (1, 3L, 2L), (2, 0L, 0L), (3, 0L, 0L)))
  }

  test("kCorePeel: dedupes directions and self-loops before round 0") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L)).toDF("a", "b")
    val out = Graph.kCorePeel(edges, "a", "b", k = 1, rounds = 1)
      .orderBy("round").collect()
    // k=1 keeps every node with an edge; round 0 must already be the
    // canonicalized simple graph: edges {1-2, 2-3}
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 2L)
    assert(out(1).getLong(1) === 3L && out(1).getLong(2) === 2L)
  }

  test("kCorePeel: fences bad k and unbounded rounds") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Graph.kCorePeel(edges, "a", "b", k = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.kCorePeel(edges, "a", "b", k = 2, rounds = 65)
    }
  }

  // ----------------------------------------------------------- featureHash

  test("featureHash: a single repeated token lands in one bucket with " +
       "the exact signed weight — norm and nnz independent of the hash " +
       "value") {
    val docs = Seq((1L, "x x x x"), (2L, "y"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, "text", "doc_id", dim = 256)
      .orderBy("doc_id").collect()
    // doc 3 has no tokens → absent (the Spark and DuckDB sides agree)
    assert(out.length === 2)
    val d1 = out(0)
    assert(d1.getLong(1) === 4L)        // n_tok
    assert(d1.getLong(2) === 1L)        // nnz: one bucket
    assert(d1.getLong(3) === 16L)       // (±4)² regardless of sign
    val d2 = out(1)
    assert((d2.getLong(1), d2.getLong(2), d2.getLong(3)) === ((1L, 1L, 1L)))
  }

  test("featureHash: norm_sq >= nnz (every surviving bucket weighs at " +
       "least 1) and nnz <= min(n_tok, dim) on real-ish text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs and more words here"),
      (3L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, "text", "doc_id", dim = 64)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (nTok, nnz, norm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(norm >= nnz, s"norm $norm < nnz $nnz")
      assert(nnz <= math.min(nTok, 64L))
      assert(nTok > 0L)
    }
  }

  test("featureHash: case folding — tokens differing only by case " +
       "collide into the same bucket with the same sign") {
    val docs = Seq((1L, "Hello hello HELLO")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, "text", "doc_id", dim = 256)
      .collect()
    assert(out.length === 1)
    // all three fold to "hello": one bucket, weight ±3
    assert(out(0).getLong(2) === 1L && out(0).getLong(3) === 9L)
  }

  test("featureHash: fences non-power-of-two and oversized dims") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.featureHash(docs, "text", "doc_id", dim = 100)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.featureHash(docs, "text", "doc_id", dim = 1 << 21)
    }
  }
}
