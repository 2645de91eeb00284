package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof backward: latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, t("2024-01-01 10:00:05"), "T1"),
      (1L, t("2024-01-01 10:00:10"), "T2"),
      (2L, t("2024-01-01 10:00:03"), "T3"),
      (3L, t("2024-01-01 10:00:03"), "T4")) // key with no quotes at all
      .toDF("acct", "ts", "trade_id")
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:01"), 100.0),
      (1L, t("2024-01-01 10:00:05"), 101.0),  // ts-equal to T1 → matches (>=)
      (1L, t("2024-01-01 10:00:07"), 102.0),
      (2L, t("2024-01-01 10:00:04"), 200.0))  // after T3 → no match
      .toDF("acct", "ts", "quote")

    val out = AsOfJoin.asofBackward(trades, quotes, "acct", "ts", "ts",
        Map("quote" -> "last_quote"))
      .select("trade_id", "last_quote")
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    assert(out("T1") === Some(101.0)) // equal-ts quote matches
    assert(out("T2") === Some(102.0))
    assert(out("T3") === None)        // only later quotes exist
    assert(out("T4") === None)        // key absent from right side
  }

  test("asof backward: null right timestamps never match nor shadow") {
    val left = Seq((1L, t("2024-01-01 00:00:10"), "L1"),
                   (2L, t("2024-01-01 00:00:10"), "L2")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, None, 999.0),                                // null ts: must be ignored
      (1L, Some(t("2024-01-01 00:00:05")), 1.0),
      (2L, None, 999.0))                                // only a null-ts row → no match
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asofBackward(left, right, "k", "ts", "ts", Map("v" -> "mv"))
      .select("tag", "mv")
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out("L1") === Some(1.0)) // not 999.0: null-ts row must not carry forward
    assert(out("L2") === None)
  }

  test("asof backward: equal-ts right duplicates resolved by tie-break") {
    val left = Seq((1L, t("2024-01-01 00:00:10"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 00:00:05"), 1L, "first"),
      (1L, t("2024-01-01 00:00:05"), 2L, "second"))
      .toDF("k", "ts", "seq", "val")
    val out = AsOfJoin.asofBackward(left, right, "k", "ts", "ts",
        Map("val" -> "matched"), tieBreak = Some("seq"))
      .select("matched").head().getString(0)
    assert(out === "second") // highest tie-break wins deterministically
  }
}
