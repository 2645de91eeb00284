package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{array_distinct, col, explode, expr, posexplode}

/** Content-defined chunking (CDC) — the storage-layer dedup primitive
  * (LBFS/FastCDC family): chunk boundaries are chosen where a rolling
  * hash of the LAST `Window` characters hits a mask condition, so an
  * insertion or deletion only reshapes the chunks it touches — unlike
  * fixed-size blocks, where one shifted byte re-chunks the whole tail.
  * Cross-document identical passages then dedupe at the CHUNK level
  * even when the containing documents differ — the blob/shard dedup
  * companion to the token-level passage dedup (x38).
  *
  * Determinism (cross-engine replayable, no seeded fingerprint tables):
  * the boundary hash ending at byte e is the window polynomial
  * `Σ_{j=0..7} byte(e−j)·31^j` — a pure function of the window's UTF-8
  * BYTES, which both engines compute identically (max magnitude
  * 8·255·31⁷ ≈ 5.6·10¹³ — long-exact, no wrap). Boundary candidates are
  * CHARACTER ends only ([[graft.functions.CdcCharHashes]] — the
  * codegen'd incremental recurrence sampled where the next byte is not
  * a UTF-8 continuation), so chunk slicing stays in the character
  * domain on both engines (DuckDB has no blob substring/md5) and
  * multilingual text chunks correctly; on single-byte text every byte
  * position is a char end, making this bit-identical to the historical
  * byte-position stream. The DuckDB ORACLE evaluates the same closed
  * form per char end (hex(encode(text)) byte access for multi-byte
  * rows, the plain codepoint form on ASCII rows — equal exact
  * integers). A char end is a boundary when its hash ≡ 0 (mod
  * [[Chunking.AvgChunk]]) → expected chunk length ≈ AvgChunk. Chunk
  * identity is md5 of the chunk text (the x10 fingerprint); chunk
  * lengths are measured in CHARACTERS.
  *
  * 100 TB: chunking is a pure scan-side higher-order-function pass
  * (one filter + one zip_with per document, no UDF, no shuffle); only
  * (doc_id, idx, len, 32-hex hash) rows leave the scan — document text
  * never crosses an exchange. Downstream chunk-level dedup is an
  * ordinary hash-keyed aggregation.
  */
object Chunking {

  /** Rolling window width in characters. */
  val Window = 8

  /** Expected chunk length: boundary when hash ≡ 0 (mod AvgChunk). */
  val AvgChunk = 64

  /** One row per chunk: (doc_id, [passthrough...], chunk_idx,
    * chunk_len, chunk_hash). Boundary positions are 1-based
    * end-of-window indices; the final chunk always ends at the document
    * end. `passthrough` columns (e.g. source) ride the scan so
    * downstream rollups need no join back to the corpus.
    */
  def cdcChunks(docs: DataFrame, textCol: String, idCol: String,
                passthrough: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val keep = passthrough.map(col)
    graft.tables.Tables.spread(docs) // byte-rolling hash is the scan cost
      .select(col(idCol).as("doc_id") +: col(textCol).as("t") +: keep: _*)
      // The hash stream is byte-domain (the rolling window slides over
      // UTF-8 bytes) but SAMPLED at character ends
      // ([[graft.functions.CdcCharHashes]] — codegen'd, one
      // multiply-add + one continuation-mask test per byte): kh element
      // q ↔ character q, so boundary positions are CHARACTER positions
      // and the char-indexed substring below is exact on ANY text —
      // multilingual corpora chunk correctly where the pre-round-12
      // ASCII fence had to fail loudly. On single-byte text this is
      // bit-identical to the former byte-position stream (every byte
      // position is a char end), so existing chunk hashes are unchanged.
      .withColumn("kh",
        graft.functions.GraftFunctions.cdcCharHashes(col("t")))
      .withColumn("bnds", expr(
        s"""CASE WHEN size(kh) = 0 THEN array()
            ELSE filter(sequence(1, size(kh)),
                 q -> element_at(kh, q) % $AvgChunk = 0) END"""))
      // chunk END positions: boundaries plus the document end (distinct
      // keeps ascending order — bnds is ascending and ≤ length)
      .withColumn("ends",
        expr("array_distinct(concat(bnds, array(length(t))))"))
      .withColumn("starts",
        expr("concat(array(0), slice(ends, 1, size(ends) - 1))"))
      .select(col("doc_id") +: keep :+
        posexplode(expr(
          """zip_with(starts, ends, (s, e) ->
               struct(e - s AS chunk_len,
                      md5(substring(t, s + 1, e - s)) AS chunk_hash))"""))
          .as(Seq("chunk_idx", "c")): _*)
      .select(col("doc_id") +: keep :+ col("chunk_idx") :+
        col("c.chunk_len").as("chunk_len") :+
        col("c.chunk_hash").as("chunk_hash"): _*)
  }

  /** Incremental chunk-level dedup against a HISTORY corpus — the
    * x27/x31 ingest pattern at CDC-chunk granularity: per new document,
    * how many of its chunks (and how many of its CHARACTERS — chunk
    * lengths are character counts since the round-12 char-domain
    * switch, see the [[Chunking]] header) already exist in the store.
    * This is the volume a dedup store actually saves on ingest —
    * sub-document reuse across documents that are nowhere near
    * duplicates at document granularity (a changed file shares its
    * unedited chunks with yesterday's version).
    *
    * 100 TB: the history index is the distinct chunk-hash table
    * (hash-keyed, partial-agg built, incrementally maintainable); the
    * probe is one equi-join on the 32-hex hash — O(batch chunks +
    * colliding history), never a text comparison. reuse_rate_q is
    * length-weighted in characters (chunk lengths ride the scan),
    * 2^-20-grid.
    */
  def cdcIncremental(batch: DataFrame, history: DataFrame,
                     textCol: String, idCol: String): DataFrame = {
    val grid = 1048576L // 2^20
    val hist = cdcChunks(history, textCol, idCol)
      .select(col("chunk_hash")).distinct()
      .withColumn("seen", F.lit(1))
    cdcChunks(batch, textCol, idCol)
      .join(hist, Seq("chunk_hash"), "left")
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n_chunks"),
        F.sum(F.when(col("seen").isNull, 1L).otherwise(0L)).as("n_new_chunks"),
        F.sum(col("chunk_len")).as("total_chars"),
        F.sum(F.when(col("seen").isNull, col("chunk_len")).otherwise(F.lit(0)))
          .cast("bigint").as("new_chars"))
      // an empty document is one zero-length chunk → total_chars = 0;
      // 0/0 would be NaN here but a DuckDB CAST(floor(NaN)) ERROR on the
      // oracle side — define the reuse rate of zero length as 0 on BOTH
      // engines (the oracle carries the matching CASE guard)
      .withColumn("reuse_rate_q",
        F.when(col("total_chars") === 0, 0L).otherwise(
          F.floor((col("total_chars") - col("new_chars")).cast("double")
            / col("total_chars").cast("double") * grid + F.lit(0.5))
            .cast("long")))
      .select("doc_id", "n_chunks", "n_new_chunks", "total_chars",
        "new_chars", "reuse_rate_q")
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS copy-detection algorithm): over the same
    * per-position rolling-hash stream as [[cdcChunks]], slide a window
    * of `winnowW` consecutive hashes and keep each window's MINIMUM —
    * the guarantee is that any shared substring of length ≥
    * `Window + winnowW - 1` contributes at least one IDENTICAL selected
    * fingerprint to both documents, while storage is ~2/(winnowW+1) of
    * the k-gram count. The copy-detection companion to md5/simhash:
    * local (per-passage) where simhash is global.
    *
    * Two scale fences, both standard winnowing practice:
    *  - fingerprints whose document frequency exceeds `maxDf` are
    *    dropped as boilerplate BEFORE pair mining (they would otherwise
    *    be quadratic hot buckets — the x19/x20 banding-family shape);
    *  - pair evidence counts shared fingerprints, never positions.
    *
    * 100 TB: fingerprinting is scan-side HOFs (no UDF); what shuffles
    * is (fingerprint, doc) longs; the df prune is one
    * partial-aggregatable count; pair mining is the standard
    * bucket-join on the fingerprint key. Returns (d1 < d2, n_shared)
    * pairs — callers threshold/rank.
    */
  def winnowingPairs(docs: DataFrame, textCol: String, idCol: String,
                     winnowW: Int = 4, maxDf: Int = 64): DataFrame = {
    require(winnowW >= 1, s"winnowW must be >= 1, got $winnowW")
    require(maxDf >= 2, s"maxDf < 2 can never form a pair, got $maxDf")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val fps = graft.tables.Tables.spread(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
      // same codegen'd stream as cdcChunks — the k-gram hashing is the
      // scan-dominant cost and now rides whole-stage codegen
      .withColumn("kh",
        graft.functions.GraftFunctions.cdcHashes(col("t")))
      // sliding_min (r17): the transform/slice HOF was CodegenFallback
      // and allocated a w-element slice per window; the native form is
      // one codegen'd pass (empty for size<w, so no CASE guard needed)
      .withColumn("fp", explode(array_distinct(
        graft.functions.GraftFunctions.slidingMin(col("kh"), winnowW))))
      .select("doc_id", "fp")
    // df prune as a partial-aggregatable count + semi-join — NOT a
    // count().over(partitionBy(fp)) window, which would full-sort every
    // fp partition of the corpus-sized (doc, fp) frame just to attach a
    // count. fps is persisted once (the text hashing is the scan-
    // dominant cost); the rare-fp set and both self-join arms read the
    // cache.
    val fpsCached = graft.Caches.persistOnce(fps)
    val rareFp = fpsCached.groupBy("fp")
      .agg(F.count(F.lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val kept = fpsCached.join(rareFp, Seq("fp"), "left_semi")
    kept.select(col("fp"), col("doc_id").as("d1"))
      .join(kept.select(col("fp"), col("doc_id").as("d2")), "fp")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(F.count(F.lit(1)).as("n_shared"))
  }

  /** Per-source chunk-level dedup report over [[cdcChunks]]: total
    * chunks, distinct chunk hashes, duplicated chunks, and the
    * 2^-20-grid dup rate — "how much of this source's byte volume is
    * redundant at chunk granularity", the signal that sizes a
    * dedup-store. The source label rides the scan as a passthrough
    * column (no join back to the corpus); one (source, hash)
    * partial-agg + a source rollup.
    */
  def cdcDupReport(docs: DataFrame, textCol: String, idCol: String,
                   sourceCol: String): DataFrame = {
    val grid = 1048576L // 2^20
    cdcChunks(docs, textCol, idCol, Seq(sourceCol))
      .withColumnRenamed(sourceCol, "source")
      .groupBy("source", "chunk_hash").agg(F.count(F.lit(1)).as("c"))
      .groupBy("source")
      .agg(F.sum(col("c")).as("n_chunks"),
        F.count(F.lit(1)).as("n_distinct"),
        F.max(col("c")).as("max_cluster"))
      .withColumn("dup_chunks", col("n_chunks") - col("n_distinct"))
      .withColumn("dup_rate_q",
        F.floor(col("dup_chunks").cast("double")
          / col("n_chunks").cast("double") * grid + F.lit(0.5)).cast("long"))
      .select("source", "n_chunks", "n_distinct", "dup_chunks",
        "max_cluster", "dup_rate_q")
  }
}
