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
}
