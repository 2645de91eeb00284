package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property test: AsOfJoin.asofBackward against a brute-force reference
  * over randomly generated trades/quotes (seeded, deterministic).
  */
class AsOfJoinPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val gen = for {
    nLeft <- Gen.choose(5, 40)
    nRight <- Gen.choose(0, 40)
    left <- Gen.listOfN(nLeft, for {
      key <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 1000L)
    } yield (key, t))
    right <- Gen.listOfN(nRight, for {
      key <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 1000L); v <- Gen.choose(0, 9999)
    } yield (key, t, v.toDouble))
  } yield (left, right)

  private def ts(t: Long) = new Timestamp(1700000000000L + t * 1000)

  test("asof backward equals the brute-force definition on random inputs") {
    (1 to 8).foreach { i =>
      val (left, right) = gen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val leftDf = left.zipWithIndex
        .map { case ((k, t), idx) => (idx.toLong, k, ts(t)) }
        .toDF("row_id", "k", "ts")
      // unique (key, ts, seq) on the right so the tie-break is total
      val rightDf = right.zipWithIndex
        .map { case ((k, t, v), idx) => (k, ts(t), v, idx.toLong) }
        .toDF("k", "ts", "v", "seq")

      val got = AsOfJoin.asofBackward(leftDf, rightDf, "k", "ts", "ts",
          Map("v" -> "matched_v", "seq" -> "matched_seq"), tieBreak = Some("seq"))
        .select("row_id", "matched_seq")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      // brute force: latest right row (ts <=, max ts, then max seq)
      val expected = left.zipWithIndex.map { case ((k, t), idx) =>
        val cands = right.zipWithIndex.filter { case ((rk, rt, _), _) => rk == k && rt <= t }
        val best = if (cands.isEmpty) None
          else Some(cands.maxBy { case ((_, rt, _), seq) => (rt, seq.toLong) }._2.toLong)
        idx.toLong -> best
      }.toMap

      assert(got === expected, s"sample $i mismatch")
    }
  }
}
