package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators (`Aggregator[IN, BUF, OUT]`) — the public custom-
  * aggregation API (SURVEY §7.3), used through `.toColumn` or
  * `udaf(...)`. Exact integer-cents arithmetic so results are
  * reproducible and oracle-checkable (no float accumulation order
  * dependence).
  */
object TypedAggregators {

  final case class MoneyStats(n: Long, min_cents: Long, max_cents: Long, sum_cents: Long)

  /** One-pass exact stats over a 2-decimal money column stored as
    * double: values are converted to integer cents with deterministic
    * half-up rounding, so min/max/sum are exact longs.
    */
  object MoneyStatsAgg extends Aggregator[Double, MoneyStats, MoneyStats] {
    private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

    override def zero: MoneyStats = MoneyStats(0L, Long.MaxValue, Long.MinValue, 0L)

    override def reduce(b: MoneyStats, v: Double): MoneyStats = {
      val c = cents(v)
      MoneyStats(b.n + 1, math.min(b.min_cents, c), math.max(b.max_cents, c), b.sum_cents + c)
    }

    override def merge(a: MoneyStats, b: MoneyStats): MoneyStats =
      MoneyStats(a.n + b.n, math.min(a.min_cents, b.min_cents),
        math.max(a.max_cents, b.max_cents), a.sum_cents + b.sum_cents)

    override def finish(r: MoneyStats): MoneyStats = r

    override def bufferEncoder: Encoder[MoneyStats] = Encoders.product[MoneyStats]
    override def outputEncoder: Encoder[MoneyStats] = Encoders.product[MoneyStats]
  }

  /** Bottom-k buffer: `hashes` ascending, distinct, at most k live
    * entries (`size`). Mutated in place — Spark keeps the buffer object
    * between per-partition reduce calls and only encodes it at shuffle
    * boundaries, so in-place updates are safe and allocation-free.
    */
  final case class KmvBuf(var hashes: Array[Long], var size: Int)

  /** Shared bottom-k-of-distinct-hashes state machine: the KMV insert
    * (binary-search dedup) and sorted-array merge, parameterized on the
    * finish step so the DISTINCT-COUNT estimator ([[KmvDistinctAgg]])
    * and the MATERIALIZED-SKETCH form ([[KmvSketchAgg]]) share one
    * implementation. Both are partial-aggregatable: each map task ships
    * at most k longs per key, so the exchange is O(partitions·groups·k)
    * regardless of input row count.
    */
  sealed abstract class KmvBottomK[OUT](k: Int)
      extends Aggregator[Long, KmvBuf, OUT] {
    require(k >= 2, s"k=$k too small")

    final override def zero: KmvBuf = KmvBuf(new Array[Long](k), 0)

    final override def reduce(b: KmvBuf, hu: Long): KmvBuf = {
      if (hu < 0) return b // NULL sentinel from kmvDistinct — not a hash
      if (b.size == k && hu >= b.hashes(k - 1)) return b // above current k-th min
      var lo = 0
      var hi = b.size
      while (lo < hi) { // lower-bound binary search
        val mid = (lo + hi) >>> 1
        if (b.hashes(mid) < hu) lo = mid + 1 else hi = mid
      }
      if (lo < b.size && b.hashes(lo) == hu) return b // duplicate hash
      val newSize = math.min(b.size + 1, k)
      System.arraycopy(b.hashes, lo, b.hashes, lo + 1, newSize - lo - 1)
      b.hashes(lo) = hu
      b.size = newSize
      b
    }

    final override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      if (b.size == 0) return a
      if (a.size == 0) return b
      val out = new Array[Long](k)
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        val v =
          if (j >= b.size || (i < a.size && a.hashes(i) <= b.hashes(j))) {
            val x = a.hashes(i); i += 1; x
          } else { val x = b.hashes(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      KmvBuf(out, n)
    }

    final override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  }

  /** KMV (k-minimum-values / bottom-k) distinct-count sketch over
    * unsigned-32-bit hash values carried as longs.
    *
    * Estimator: with U_k the k-th smallest of the distinct hashes,
    * n ≈ (k-1)·2³²/U_k, floor-divided — pure integer arithmetic, so the
    * DuckDB oracle reproduces it bit-exactly (no libm, no float
    * accumulation). When fewer than k distinct hashes exist the sketch
    * IS the exact distinct count. rsd ≈ 1/sqrt(k-2) (~6 % at k=256).
    *
    * Duplicate hashes are dropped on insert (binary search), so the
    * input needs no pre-distinct pass. State is O(k) and merge is a
    * sorted-array merge — partial-aggregatable, O(groups·k) on the
    * wire at any input scale.
    */
  final class KmvDistinctAgg(k: Int) extends KmvBottomK[Long](k) {
    override def finish(b: KmvBuf): Long =
      if (b.size < k) b.size.toLong
      else {
        val kth = b.hashes(k - 1)
        if (kth == 0L) k.toLong else (k - 1).toLong * 4294967296L / kth
      }

    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** The MATERIALIZED bottom-k sketch itself (ascending distinct hash
    * array, ≤ k entries) — the state [[graft.operators.Sketches
    * .kmvSketch]] stores for incremental rollups (x101/a70). Same
    * insert/merge machine as [[KmvDistinctAgg]]; only the finish step
    * differs. Because merge is the bottom-k semilattice, the final
    * array is bit-identical to a global distinct + rank ≤ k + sort —
    * the window formulation this aggregate replaces — while shipping
    * at most k longs per key per map task instead of every distinct
    * (key, hash) row of the corpus.
    */
  final class KmvSketchAgg(k: Int) extends KmvBottomK[Seq[Long]](k) {
    override def finish(b: KmvBuf): Seq[Long] =
      b.hashes.take(b.size).toSeq

    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** One kept element of the quantile sketch: the bottom-k membership
    * key (h, sid) plus the carried value v. Field ORDER matters — the
    * output array sorts and merges under the (h, sid, v) lexicographic
    * total order, the same order `sort_array` applies to the struct.
    */
  final case class QsEntry(h: Long, sid: Long, v: Long)

  /** Bottom-k triple buffer: three parallel sorted arrays (kept in
    * (h, sid, v) lexicographic order), `size` live entries. Parallel
    * long arrays instead of an Array[QsEntry] so the buffer encoder is
    * flat primitive arrays (no per-element struct codec at shuffle).
    */
  final case class QsBuf(var hs: Array[Long], var sids: Array[Long],
                         var vs: Array[Long], var size: Int)

  /** Mergeable quantile-sketch state (the [[graft.operators.Sketches
    * .quantileSketch]] bottom-k hash-rank ROW SAMPLE) as a typed
    * aggregate: per group, keep the k elements smallest under the
    * (h, sid, v) total order, preserving duplicates — exactly the
    * multiset a `row_number ≤ k` rank window keeps, so the output array
    * is bit-identical to the window formulation (ties beyond rank k
    * drop identical multisets either way). Unlike the window, the
    * aggregate is partial+final: each map task ships ≤ k triples per
    * key instead of every corpus row crossing the rank exchange.
    *
    * `sid` is row-unique within the group by the quantileSketch
    * contract, so the multiset-vs-set distinction never bites in
    * practice; multiset semantics is kept anyway to match the rank
    * window bit-for-bit on contract-violating input.
    */
  final class QuantileSketchAgg(k: Int)
      extends Aggregator[QsEntry, QsBuf, Seq[QsEntry]] {
    require(k >= 2, s"k=$k too small")

    override def zero: QsBuf =
      QsBuf(new Array[Long](k), new Array[Long](k), new Array[Long](k), 0)

    // strict (h1,s1,v1) < (h2,s2,v2) under the lexicographic total order
    @inline private def lt(h1: Long, s1: Long, v1: Long,
                           h2: Long, s2: Long, v2: Long): Boolean =
      h1 < h2 || (h1 == h2 && (s1 < s2 || (s1 == s2 && v1 < v2)))

    override def reduce(b: QsBuf, e: QsEntry): QsBuf = {
      if (b.size == k &&
          !lt(e.h, e.sid, e.v, b.hs(k - 1), b.sids(k - 1), b.vs(k - 1)))
        return b // not strictly below the current k-th element
      var lo = 0
      var hi = b.size
      while (lo < hi) { // upper-bound search: insert AFTER equal triples
        val mid = (lo + hi) >>> 1
        if (lt(e.h, e.sid, e.v, b.hs(mid), b.sids(mid), b.vs(mid))) hi = mid
        else lo = mid + 1
      }
      val newSize = math.min(b.size + 1, k)
      System.arraycopy(b.hs, lo, b.hs, lo + 1, newSize - lo - 1)
      System.arraycopy(b.sids, lo, b.sids, lo + 1, newSize - lo - 1)
      System.arraycopy(b.vs, lo, b.vs, lo + 1, newSize - lo - 1)
      b.hs(lo) = e.h
      b.sids(lo) = e.sid
      b.vs(lo) = e.v
      b.size = newSize
      b
    }

    override def merge(a: QsBuf, b: QsBuf): QsBuf = {
      if (b.size == 0) return a
      if (a.size == 0) return b
      val hs = new Array[Long](k)
      val sids = new Array[Long](k)
      val vs = new Array[Long](k)
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        // take from a when a ≤ b (stable; duplicates preserved)
        val takeA = j >= b.size || (i < a.size &&
          !lt(b.hs(j), b.sids(j), b.vs(j), a.hs(i), a.sids(i), a.vs(i)))
        if (takeA) {
          hs(n) = a.hs(i); sids(n) = a.sids(i); vs(n) = a.vs(i); i += 1
        } else {
          hs(n) = b.hs(j); sids(n) = b.sids(j); vs(n) = b.vs(j); j += 1
        }
        n += 1
      }
      QsBuf(hs, sids, vs, n)
    }

    override def finish(b: QsBuf): Seq[QsEntry] =
      (0 until b.size).map(i => QsEntry(b.hs(i), b.sids(i), b.vs(i)))

    override def bufferEncoder: Encoder[QsBuf] = Encoders.product[QsBuf]
    override def outputEncoder: Encoder[Seq[QsEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
