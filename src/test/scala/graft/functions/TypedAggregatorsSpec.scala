package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TypedAggregators.KmvDistinctAgg

/** Buffer-level semantics of the KMV bottom-k aggregator: reduce/merge
  * must equal brute-force "sorted distinct bottom-k" on any input split,
  * and the estimator formula must be the documented integer arithmetic.
  */
class TypedAggregatorsSpec extends AnyFunSuite {

  private val k = 8
  private val agg = new KmvDistinctAgg(k)

  private def reduceAll(vs: Seq[Long]) =
    vs.foldLeft(agg.zero)(agg.reduce)

  private def live(b: TypedAggregators.KmvBuf): Seq[Long] =
    b.hashes.take(b.size).toSeq

  test("reduce keeps the k smallest distinct values, in order") {
    val vs = Seq[Long](9, 3, 9, 14, 0, 3, 27, 5, 1, 8, 2, 11, 2, 6, 7)
    val expected = vs.distinct.sorted.take(k)
    assert(live(reduceAll(vs)) == expected)
  }

  test("merge of split buffers equals reduce of the whole (random splits)") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val vs = Seq.fill(n)(rnd.nextInt(30).toLong)
      val cut = rnd.nextInt(n + 1)
      val (a, b) = vs.splitAt(cut)
      val merged = agg.merge(reduceAll(a), reduceAll(b))
      assert(live(merged) == vs.distinct.sorted.take(k))
    }
  }

  test("finish: exact below k, integer estimator at k") {
    assert(agg.finish(reduceAll(Seq(5L, 1L, 5L))) == 2L)
    val vs = (1L to 20L).map(_ * 1000000L)
    val kth = vs.distinct.sorted.apply(k - 1)
    assert(agg.finish(reduceAll(vs)) == (k - 1).toLong * 4294967296L / kth)
  }

  test("merge with empty buffers is identity") {
    val b = reduceAll(Seq(3L, 1L))
    assert(live(agg.merge(b, agg.zero)) == Seq(1L, 3L))
    assert(live(agg.merge(agg.zero, b)) == Seq(1L, 3L))
  }

  test("KmvSketchAgg finish returns the live sorted prefix (same machine)") {
    val sk = new TypedAggregators.KmvSketchAgg(k)
    val vs = Seq[Long](9, 3, 9, 14, 0, 3, 27, 5, 1, 8, 2, 11, 2, 6, 7)
    val b = vs.foldLeft(sk.zero)(sk.reduce)
    assert(sk.finish(b) == vs.distinct.sorted.take(k))
  }

  // --- QuantileSketchAgg: bottom-k MULTISET of (h, sid, v) triples ---

  import TypedAggregators.{QsEntry, QuantileSketchAgg}
  private val qagg = new QuantileSketchAgg(k)

  private def qreduce(vs: Seq[QsEntry]) = vs.foldLeft(qagg.zero)(qagg.reduce)

  private implicit val qsOrd: Ordering[QsEntry] =
    Ordering.by(e => (e.h, e.sid, e.v))

  test("quantile reduce keeps the k lexicographically-smallest triples, " +
       "duplicates preserved (the rank-window multiset semantics)") {
    val vs = Seq(QsEntry(3, 1, 10), QsEntry(1, 2, 20), QsEntry(3, 1, 10),
      QsEntry(0, 9, 5), QsEntry(1, 2, 20), QsEntry(2, 0, 7),
      QsEntry(5, 5, 5), QsEntry(0, 1, 1), QsEntry(4, 4, 4),
      QsEntry(1, 1, 30), QsEntry(0, 9, 4))
    assert(qagg.finish(qreduce(vs)) == vs.sorted.take(k))
  }

  test("quantile merge of split buffers equals reduce of the whole " +
       "(random splits, random duplicates — the partial-agg contract)") {
    val rnd = new scala.util.Random(7)
    (1 to 80).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val vs = Seq.fill(n)(QsEntry(rnd.nextInt(6).toLong,
        rnd.nextInt(6).toLong, rnd.nextInt(6).toLong))
      val cut = rnd.nextInt(n + 1)
      val (a, b) = vs.splitAt(cut)
      val merged = qagg.merge(qreduce(a), qreduce(b))
      assert(qagg.finish(merged) == vs.sorted.take(k),
        s"split at $cut of $vs")
    }
  }

  test("quantile merge with empty buffers is identity") {
    val b = qreduce(Seq(QsEntry(2, 2, 2), QsEntry(1, 1, 1)))
    assert(qagg.finish(qagg.merge(b, qagg.zero)) ==
      Seq(QsEntry(1, 1, 1), QsEntry(2, 2, 2)))
    assert(qagg.finish(qagg.merge(qagg.zero, b)) ==
      Seq(QsEntry(1, 1, 1), QsEntry(2, 2, 2)))
  }
}
