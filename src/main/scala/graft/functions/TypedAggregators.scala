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
  final class KmvDistinctAgg(k: Int) extends Aggregator[Long, KmvBuf, Long] {
    require(k >= 2, s"k=$k too small")

    override def zero: KmvBuf = KmvBuf(new Array[Long](k), 0)

    override def reduce(b: KmvBuf, hu: Long): KmvBuf = {
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

    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
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

    override def finish(b: KmvBuf): Long =
      if (b.size < k) b.size.toLong
      else {
        val kth = b.hashes(k - 1)
        if (kth == 0L) k.toLong else (k - 1).toLong * 4294967296L / kth
      }

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
