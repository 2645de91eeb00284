package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Skew-mitigation evidence on a measured METRIC (shuffle bytes read per
  * task), not wall time: a fixture where one key holds 50 % of the rows.
  *
  * The join is the operator where salting must show up in bytes: without
  * it every hot-key row shuffles to ONE reducer. (A plain count/sum
  * groupBy is already skew-proof — map-side partial aggregation collapses
  * the hot key to one row per map partition before the shuffle — so the
  * assertion there is result equality, not bytes.)
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  /** per-task shuffle-read bytes for all tasks triggered by `action` */
  private def measureShuffleRead(action: => Unit): Seq[Long] = {
    val bytes = ArrayBuffer.empty[Long]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) bytes.synchronized {
          bytes += te.taskMetrics.shuffleReadMetrics.totalBytesRead
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // listener bus is async: poll until the event stream quiesces
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val n = bytes.synchronized(bytes.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.synchronized(bytes.toSeq)
  }

  // 50% of rows on key 0, the rest uniform over 99 other keys; an
  // incompressible per-row payload (md5 hex) so shuffle bytes track row
  // volume instead of vanishing into lz4
  private lazy val skewedFact = spark.range(0, 100000)
    .select(
      when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(99)) + 1).as("k"),
      md5(col("id").cast("string")).as("v"))
  private lazy val dim = spark.range(0, 100)
    .select(col("id").as("k"), concat(lit("dim"), col("id")).as("d"))

  test("salted join spreads the hot key: max shuffle-bytes-per-task drops") {
    val restore = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.shuffle.partitions" -> spark.conf.get("spark.sql.shuffle.partitions"))
    // AQE off so its skew-join splitting can't rescue the PLAIN join —
    // the point is to measure what salting does on its own; broadcast
    // off so the join actually shuffles both sides
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      // the aggregate consumes the payload, so column pruning cannot
      // strip it from the join shuffle — bytes reflect the real fact rows
      val plain = measureShuffleRead {
        skewedFact.join(dim, "k").agg(sum(length(col("v")))).collect()
      }
      val salted = measureShuffleRead {
        Skew.saltedJoinSmall(skewedFact, dim, "k", saltBuckets = 16)
          .agg(sum(length(col("v")))).collect()
      }
      val plainMax = plain.max
      val saltedMax = salted.max
      info(s"max shuffle-read/task: plain=$plainMax salted=$saltedMax " +
        s"(tasks: ${plain.count(_ > 0)} vs ${salted.count(_ > 0)})")
      assert(plainMax >= 2 * saltedMax,
        s"salting should at least halve the hottest task ($plainMax vs $saltedMax)")
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted join and salted agg return exactly the plain results") {
    val plainJoin = skewedFact.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val saltedJoin = Skew.saltedJoinSmall(skewedFact, dim, "k", saltBuckets = 16)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(saltedJoin === plainJoin)

    val plainAgg = skewedFact.groupBy("k").agg(count(lit(1)).as("n"), sum(length(col("v"))).as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val saltedAgg = Skew.saltedCountSum(skewedFact, Seq("k"), length(col("v")), "s")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(saltedAgg === plainAgg)
  }
}
