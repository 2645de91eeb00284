package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (backward as-of) join — an operator Spark lacks
  * natively: for each left row, attach the payload of the latest right
  * row with the same key and `rightTs <= leftTs`.
  *
  * Implemented by composition (preference (a) of the build rules): tag
  * both sides, union them, and carry the right payload forward with
  * `last(_, ignoreNulls)` over a (key, ts)-ordered running window; left
  * rows then read the most recent right payload at or before their
  * timestamp. At equal timestamps the right row sorts first, so
  * ties match (>= semantics, like DuckDB's ASOF JOIN).
  *
  * Scale: ONE shuffle on the key plus a per-partition sort — no range
  * condition, so no nested-loop/range-join blowup; state per key is a
  * single payload struct. This is the same shape a 1000-executor
  * backfill wants: key-partitioned, merge-sorted, streaming-friendly.
  */
object AsOfJoin {

  /** Left as-of-backward join. Right payload columns arrive null when no
    * right row precedes the left row (left-join semantics).
    *
    * @param tieBreak extra right-side ordering column for deterministic
    *                 choice among equal-timestamp right rows.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   payload: Map[String, String],
                   tieBreak: Option[String] = None): DataFrame = {
    val payloadStruct = struct(
      (payload.map { case (src, dst) => right(src).as(dst) }.toSeq ++
        tieBreak.map(t => right(t).as("__tie"))): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType

    val leftCols = left.columns.toSeq
    val lpayType = left.select(struct(leftCols.map(left(_)): _*)).schema.head.dataType

    // SQL join semantics: a null key never matches, and a null right
    // timestamp can never satisfy rightTs <= leftTs — drop both, so such
    // rows neither match nor (nulls-first) shadow every left row.
    val r = right.filter(right(key).isNotNull && right(rightTs).isNotNull).select(
      right(key).as("__key"),
      right(rightTs).as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(lpayType).as("__lpay"),
      payloadStruct.as("__rpay"))
    val l = left.select(
      left(key).as("__key"),
      left(leftTs).as("__ts"),
      lit(1).as("__side"),
      struct(leftCols.map(left(_)): _*).as("__lpay"),
      lit(null).cast(payloadType).as("__rpay"))

    // right rows sort before left rows at equal ts (>= match); among
    // equal-ts right rows the tie-break decides which payload survives.
    val order: Seq[Column] = col("__ts") +: col("__side") +:
      tieBreak.map(_ => col("__rpay.__tie")).toSeq
    val w = Window.partitionBy(col("__key"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = r.unionByName(l)
      .withColumn("__matched", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outCols = leftCols.map(c => col(s"__lpay.$c").as(c)) ++
      payload.values.map(dst => col(s"__matched.$dst").as(dst))
    matched.select(outCols: _*)
  }
}
