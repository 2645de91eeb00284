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
}
