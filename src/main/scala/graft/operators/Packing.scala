package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-stream packing (concatenate-and-chunk): the standard prep
  * step that turns variable-length documents into fixed-capacity
  * context windows by concatenating each shard's documents into one
  * token stream and slicing it every `capacity` tokens. Rather than
  * materializing the concatenation, the operator computes each
  * document's *position* in its shard's stream with a running-sum
  * window, from which the context-window (bin) assignment is pure
  * integer arithmetic:
  *
  *   stream_pos   tokens before this doc in the shard stream
  *   bin          stream_pos div capacity — the window the doc starts in
  *   bin_offset   stream_pos mod capacity — where in that window
  *   bins_spanned how many windows the doc crosses
  *
  * 100 TB: one shuffle on the shard key for the sort-based window;
  * the within-shard prefix sum is the inherently sequential part of
  * packing, so shards must be sized to a worker (hash-bucket the
  * corpus into O(cores) shards — here the shard key is a caller
  * choice). All outputs are exact integers: bit-deterministic, and
  * the oracle replays the same window SQL.
  */
object Packing {

  /** One row per document with its packed position. Ordering within a
    * shard is by `idCol` — deterministic and incremental (appending
    * new docs with higher ids never reassigns old positions).
    */
  def packTokens(docs: DataFrame, textCol: String, idCol: String,
                 shardCol: String, capacity: Int = 2048): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tok",
        size(split(lower(col(textCol)), "\\s+")).cast("long"))
      .withColumn("stream_pos", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"stream_pos div $capacity"))
      .withColumn("bin_offset", col("stream_pos") % capacity)
      .withColumn("bins_spanned",
        expr(s"(stream_pos + n_tok - 1) div $capacity") - col("bin") + 1)
  }
}
