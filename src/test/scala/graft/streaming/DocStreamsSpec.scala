package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

case class Doc(doc_id: Long, text: String)

/** st12: the streaming near-dup ingest filter — keyed band state in the
  * stream, bounded cross-band combine outside it (the windowQuantiles
  * hand-off), certified stream ≡ batch on an id-ordered arrival.
  */
class DocStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    Doc(1L, "the quick brown fox jumps over the lazy dog again and again"),
    Doc(2L, "the quick brown fox jumps over the lazy dog again and again"),  // exact dup of 1
    Doc(3L, "completely different text about spark streaming state stores"),
    Doc(4L, "the quick brown fox jumps over the lazy dog again and AGAIN"),  // near dup of 1/2
    Doc(5L, "another unrelated document mentioning parquet and shuffles"))

  test("batch semantics: exact dup flags the earliest partner; chained " +
       "dups flag the ORIGINAL (state keeps dups); uniques pass") {
    val out = DocStreams.nearDupFlags(docs.toDF(), "text", "doc_id")
      .orderBy("doc_id").collect()
    val flags = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(flags(1L) === None)
    assert(flags(2L) === Some(1L), "exact dup must flag the earliest")
    assert(flags(3L) === None)
    // doc 4's earliest Hamming<=3 partner over any shared band is doc 1
    // (dup-of-dup chains to the original because dups stay in state)
    assert(flags(4L) === Some(1L))
    assert(flags(5L) === None)
    assert(out.map(_.getInt(2)).toSeq === Seq(0, 1, 0, 1, 0))
  }

  test("stream (MemoryStream, id-ordered arrival) band flags + batch " +
       "combine EQUALS the batch operator") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Doc]
    input.addData(docs)
    val q = DocStreams.nearDupBandFlags(input.toDF(), "text", "doc_id")
      .toDF()
      .writeStream.format("memory").queryName("st12_flags")
      .outputMode(OutputMode.Update())
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = DocStreams.combineBandFlags(spark.table("st12_flags"))
      .orderBy("doc_id").collect().toSeq
    val batch = DocStreams.nearDupFlags(docs.toDF(), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
  }

  test("cross-micro-batch state: a dup arriving in a LATER batch still " +
       "flags against the first batch's fingerprints") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = DocStreams.nearDupBandFlags(input.toDF(), "text", "doc_id")
      .toDF()
      .writeStream.format("memory").queryName("st12_flags2")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3)) // docs 4 (near dup of 1) and 5
      q.processAllAvailable()
    } finally q.stop()
    val combined = DocStreams.combineBandFlags(spark.table("st12_flags2"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(combined(4L) === Some(1L),
      "state must survive the micro-batch boundary")
    assert(combined(5L) === None)
  }

  test("st16 bloom first-seen: exact dup blooms AND verifies; stream " +
       "across micro-batches equals batch; no false negatives") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = DocStreams.bloomFirstSeenProbes(input.toDF(), "text", "doc_id")
      .toDF()
      .writeStream.format("memory").queryName("st16_probes")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    // combine the streamed probe sink exactly like the batch composition
    val probes = spark.table("st16_probes")
    val mb = probes.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("hit"), 1).otherwise(0))
        .as("bloom_maybe"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = DocStreams.bloomFirstSeenFlags(docs.toDF(), "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(batch.map(r => r._1 -> r._2).toMap === mb,
      "streamed probe state must reproduce the batch bloom flags")
    val byId = batch.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) === ((0, 0)), "first copy is clean")
    assert(byId(2L) === ((1, 1)), "exact dup of 1 blooms and verifies")
    assert(byId(4L)._2 === 0, "near-dup (different digest) is NOT an exact dup")
    batch.foreach { case (id, maybe, dup) =>
      assert(maybe >= dup, s"doc $id: bloom false negative")
    }
  }

  test("st20 cdc first-seen: exact dup reuses 100% of its bytes; stream " +
       "across micro-batches equals the batch report") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = DocStreams.cdcFirstSeenProbes(input.toDF(), "text", "doc_id")
      .toDF()
      .writeStream.format("memory").queryName("st20_probes")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3)) // doc 4 near-dups 1 across the batch gap
      q.processAllAvailable()
    } finally q.stop()
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val streamed = spark.table("st20_probes")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(!col("hit"), 1L).otherwise(0L)).as("n_new_chunks"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = DocStreams.cdcFirstSeenReport(docs.toDF(), "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(batch.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap === streamed,
      "streamed chunk state must reproduce the batch report")
    val byId = batch.map(r => r.getLong(0) -> r).toMap
    // doc 2 is an exact copy of doc 1: every chunk already in the store
    assert(byId(2L).getAs[Long]("n_new_chunks") === 0L)
    assert(byId(2L).getAs[Long]("new_chars") === 0L)
    assert(byId(2L).getAs[Long]("reuse_rate_q") === 1048576L)
    // doc 1 seeds the store: all chunks new, zero reuse
    assert(byId(1L).getAs[Long]("n_new_chunks") === byId(1L).getAs[Long]("n_chunks"))
    assert(byId(1L).getAs[Long]("reuse_rate_q") === 0L)
  }
}
