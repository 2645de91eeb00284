package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, call_function, col, count, datediff, lit, greatest, max, min, sha2, sum, to_date, unix_micros, when}
import org.apache.spark.sql.expressions.Window
import graft.streaming.{DocStreams, EventStreams}
import graft.tables.{Tables => T}

/** Streaming-shaped transformations run in batch over the `events` table.
  * The same EventStreams functions power the Structured Streaming surface
  * (watermarked variants, tested with MemoryStream in
  * EventStreamsSpec) — the batch oracle here checks the shared semantics.
  */
object StreamingQ {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "st01_tumbling_window" -> ((s, dir) =>
      EventStreams.tumblingCounts(T.events(s, dir), "1 hour")
        .orderBy("w_start", "event_type")),

    "st02_sliding_window" -> ((s, dir) =>
      EventStreams.slidingCounts(T.events(s, dir), "1 hour", "30 minutes")
        .orderBy("w_start", "event_type")),

    "st03_session_window" -> ((s, dir) =>
      EventStreams.sessionize(T.events(s, dir), "10 minutes")
        .orderBy("user_id", "s_start")),

    "st04_first_events" -> ((s, dir) =>
      EventStreams.firstEvents(T.events(s, dir))
        .orderBy("user_id", "event_type")),

    // Custom keyed state (transformWithState ValueState); in batch ≡
    // plain agg.
    "st05_stateful_stats" -> ((s, dir) =>
      EventStreams.statefulUserStats(T.events(s, dir))
        .toDF()
        .orderBy("user_id")),

    // Streaming quantiles composition: histogram-sketch grid maintained
    // IN the stream (bounded, additive state — the a41 sketch made
    // streaming), p50/p90 extracted from the sketch with exact integer
    // ranks. Batch ≡ stream on the grid (EventStreamsSpec).
    "st07_window_quantiles" -> ((s, dir) =>
      EventStreams.windowQuantiles(T.events(s, dir), "1 hour", grid = 5.0)
        .orderBy("w_start", "event_type")),

    // Custom keyed-state sessionization (transformWithState ValueState):
    // gap rule + per-session sequence numbers — state logic
    // session_window can't express. Batch ≡ the a39 window formulation,
    // certified here.
    "st08_stateful_sessions" -> ((s, dir) =>
      EventStreams.statefulSessionize(T.events(s, dir), gapMinutes = 30)
        .toDF()
        .orderBy("user_id", "session_seq")),

    // Spark 4 transformWithState (the modern arbitrary-state API):
    // per-user MapState keyed by event type, exact-cents totals. In
    // batch each key processes once ≡ plain groupBy, certified here.
    "st09_transform_with_state" -> ((s, dir) =>
      EventStreams.statefulTypeStats(T.events(s, dir))
        .toDF()
        .orderBy("user_id", "event_type")),

    // Stream-stream interval join (click → purchase by the same user
    // within 30 minutes); batch ≡ range-condition join, certified here.
    "st06_stream_join" -> ((s, dir) => {
      val ev = T.events(s, dir)
      EventStreams.intervalJoin(
          ev.filter(org.apache.spark.sql.functions.col("event_type") === "click"),
          ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"),
          within = "30 minutes")
        .orderBy("src_id", "dst_id")
    }),

    // Streaming distinct-count composition: HLL registers maintained IN
    // the stream (bounded additive state — the a23 sketch made
    // streaming), harmonic estimate extracted on the sketch. Batch ≡
    // stream on the registers (EventStreamsSpec).
    "st10_window_distinct" -> ((s, dir) =>
      EventStreams.windowDistinctUsers(T.events(s, dir), "1 hour")
        .orderBy("w_start", "event_type")),

    // Stream-static enrichment: events joined to the customer dimension
    // (broadcast — the stream never shuffles for the join), windowed
    // counts per market segment. Streaming variant certified equal in
    // EventStreamsSpec.
    "st11_stream_enrich" -> ((s, dir) =>
      EventStreams.enrichedSegmentCounts(T.events(s, dir),
          T.customer(s, dir), "1 hour")
        .orderBy("w_start", "c_mktsegment", "event_type")),

    // Streaming near-dup ingest filter: x19's SimHash banding as ONE
    // keyed-state operator (per-band fingerprint state) + the bounded
    // cross-band combine — the "dedup the crawl as it arrives" shape.
    // Stream ≡ batch certified in DocStreamsSpec.
    "st12_stream_neardup" -> ((s, dir) =>
      DocStreams.nearDupFlags(T.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")),

    // Live conversion funnel: a55's ordered-funnel semantics as keyed
    // stream state (3 timestamps per user; monotone slots). In batch
    // each user processes once over full history ⇒ rows are final.
    // Stream ≡ batch certified in EventStreamsSpec.
    "st13_stream_funnel" -> ((s, dir) =>
      EventStreams.statefulFunnel(T.events(s, dir))
        .toDF()
        .orderBy("user_id")),

    // Streaming EWMA anomaly flags per (user, event type): α=½ so the
    // running average is one rounding + one exact halving per event —
    // the whole state replays bit-identically in the oracle's ordered
    // fold. One output row per event. Stream ≡ batch certified in
    // EventStreamsSpec.
    "st14_stream_ewma" -> ((s, dir) =>
      EventStreams.statefulEwma(T.events(s, dir))
        .toDF()
        .orderBy("user_id", "event_type", "event_id")),

    // Live retention cohorts: a57's matrix as keyed stream state — the
    // stateful op emits each (user, week_offset) exactly once; the
    // rollup runs OUTSIDE the stream (the st12 combine hand-off). In
    // batch each key processes once over full history, so the rollup
    // equals the a57 window formulation (stream≡batch certified in
    // EventStreamsSpec).
    "st15_stream_cohorts" -> ((s, dir) =>
      EventStreams.statefulCohorts(T.events(s, dir))
        .toDF()
        .groupBy("cohort_wk", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_wk", "week_offset")),

    // Streaming Bloom first-seen filter: x31's membership prefilter as
    // keyed stream state (one long per bit position — mBits longs of
    // state TOTAL), per-doc AND + exact verify outside the stream (the
    // st12 combine hand-off). bloom_maybe ≥ is_dup on every row; the
    // gap rows are the live FP tail.
    "st16_stream_bloom" -> ((s, dir) =>
      DocStreams.bloomFirstSeenFlags(T.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")),

    // Streaming KMV distinct-user counter per event type: a23/x78b's
    // deterministic bottom-k sketch as keyed stream state (≤ k longs +
    // a counter per key). Bottom-k union is a semilattice, so stream
    // state equals the batch fold under ANY arrival order and the
    // estimate replays bit-exactly.
    "st17_stream_kmv" -> ((s, dir) =>
      EventStreams.statefulKmvDistinct(T.events(s, dir))
        .toDF()
        .orderBy("event_type")),

    // Event-time throttle ("at most one alert per user+type per hour")
    // with WATERMARK-EVICTED state — the state-lifecycle demonstration:
    // EventTimeTimeout removes a key's row once the watermark passes
    // last_kept + gap, so state tracks active keys, not keys ever seen.
    "st18_stream_throttle" -> ((s, dir) =>
      EventStreams.statefulThrottle(T.events(s, dir))
        .toDF()
        .orderBy("event_id")),

    // Streaming per-window leaderboard: top-3 users by event count per
    // tumbling hour on transformWithState (MapState per window; total
    // order count desc, user asc). Batch ≡ the SQL rank, certified
    // here; unbounded key domains route to the CMS sketch instead.
    "st19_window_topk" -> ((s, dir) =>
      EventStreams.statefulWindowTopk(T.events(s, dir), k = 3)
        .toDF()
        .orderBy("w_start", "rank")),

    // Streaming CDC chunk-level first-seen: x100's dedup-store probe as
    // live keyed ingest state (the state IS the chunk index); per-doc
    // byte-weighted reuse combined outside the stream. Batch ≡ the
    // min-doc-per-hash SQL, certified here.
    "st20_stream_cdc" -> ((s, dir) =>
      DocStreams.cdcFirstSeenReport(
          graft.queries.Extensions.injectNonAscii(T.documents(s, dir)),
          "text", "doc_id")
        .orderBy("doc_id")),

    // Streaming SCD2 run-close: the a65 interval build as live keyed
    // state — one ValueState open-run row per user; a run emits exactly
    // once, when the attribute changes. Open runs never emit (batch
    // equivalent = a65's windows WHERE valid_to IS NOT NULL).
    "st21_stream_scd" -> ((s, dir) =>
      EventStreams.statefulScdRuns(T.events(s, dir))
        .toDF()
        .orderBy("user_id", "version")),

    // Stream-stream LEFT OUTER interval join (clicks that converted AND
    // clicks that didn't, in one result): the streaming variant buffers
    // each click until the watermark proves no purchase can still
    // arrive, then emits the null-padded row — the outer result is
    // produced BY state eviction, the lifecycle st06's inner join never
    // exercises. Batch ≡ plain left join with the range condition;
    // stream ≡ batch certified in EventStreamsSpec.
    "st22_stream_outer_join" -> ((s, dir) => {
      val ev = T.events(s, dir)
      EventStreams.intervalJoinOuter(
          ev.filter(org.apache.spark.sql.functions.col("event_type") === "click"),
          ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"),
          within = "30 minutes")
        .orderBy("src_id", "dst_id")
    }),

    // Live per-source length quantiles (x109's streaming dual): keyed
    // state = the bottom-k hash-rank quantile-sketch sample — a
    // semilattice, so stream state after any arrival order equals the
    // batch sketch and the integer percentile readout replays in the
    // x109-shaped oracle. State ≤ k triples + a counter per source.
    "st24_stream_quantile" -> ((s, dir) =>
      DocStreams.statefulQuantiles(T.documents(s, dir), "text", "source",
          "doc_id")
        .toDF()
        .orderBy("source")),

    // Live event transition matrix (a66's streaming dual): keyed state
    // = the user's last event type; the stream emits one (from, to)
    // pair per consecutive event, the count/probability rollup runs
    // over the emitted pairs outside the stream (the st16/st20
    // hand-off). Stream ≡ batch certified in EventStreamsSpec.
    "st23_stream_transitions" -> ((s, dir) => {
      val tr = EventStreams.statefulTransitions(T.events(s, dir)).toDF()
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      tr.withColumn("p",
          col("n") / sum(col("n")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("from_type")))
        .orderBy("from_type", "to_type")
    }),

    // Live rolling anomaly detection (a73's streaming dual): keyed
    // state = the user's trailing-8 grid-value ring; each full-window
    // arrival is scored by the identical cross-multiplied integer
    // z² > 3² test (BigInt ≡ DECIMAL(38,0) ≡ HUGEINT), flags chain
    // across micro-batches through the stored ring. The per-type
    // rollup runs over the emitted hits outside the stream (the
    // st16/st20 hand-off); the oracle is a73's SQL verbatim — stream ≡
    // batch certified in EventStreamsSpec.
    "st25_stream_anomaly" -> ((s, dir) =>
      EventStreams.statefulAnomaly(T.events(s, dir)).toDF()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_scored"),
          sum(col("anom")).as("n_anom"))
        .withColumn("anom_rate",
          col("n_anom").cast("double") / col("n_scored"))
        .orderBy("event_type"))
    ,

    // Live CMS join-size grids (x111's streaming dual): keyed state =
    // one (ca, cb) counter pair per grid cell — 2·d·w longs TOTAL, the
    // CMS property; counters are additive so stream state ≡ the batch
    // grid (certified in EventStreamsSpec). The est = min_r Σ ca·cb
    // readout and the exact arm run OUTSIDE the stream (st16/st20
    // hand-off); in production the early/late cutover is configured —
    // here it derives from the batch bounds so the oracle is x111's
    // SQL verbatim.
    "st26_stream_cms" -> ((s, dir) => {
      val ev = T.events(s, dir)
      val bounds = ev.agg(
        min(unix_micros(col("ts"))).as("us_min"),
        max(unix_micros(col("ts"))).as("us_max"))
      val tagged = graft.Caches.persistOnce(
        ev.crossJoin(broadcast(bounds))
          .select(col("user_id"),
            when(unix_micros(col("ts")) <= call_function("div",
              col("us_min") + col("us_max"), lit(2L)), 0L)
              .otherwise(1L).as("side")))
      val cells = EventStreams.statefulCmsGrid(tagged, "user_id", "side")
        .toDF()
      val est = cells.groupBy("r")
        .agg(sum(col("ca") * col("cb")).as("est_r"))
        .agg(min(col("est_r")).as("est"))
      val exact = tagged
        .groupBy(col("user_id"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("nb"))
        .agg(sum(col("na") * col("nb")).as("exact"))
      est.crossJoin(exact)
        .select(lit(4).as("d"), lit(256).as("w"), col("est"), col("exact"),
          call_function("div", (col("est") - col("exact")) * 10000L,
            greatest(col("exact"), lit(1L))).as("err_bp"))
    }),

    // Live daily ingest counters + CUSUM changepoint readout (a80's
    // streaming dual): keyed state = one MapState[day, count] per
    // event type — calendar-bounded, additive, so state after any
    // micro-batch split equals the batch daily rollup. The CUSUM scan
    // needs the type's FULL series total for its drift allowance, so
    // it runs OUTSIDE the stream over the latest cells (st16/st20
    // hand-off) — the readout is Analytics.cusumReadout VERBATIM and
    // the oracle is a80's SQL verbatim (stream ≡ batch certified).
    "st27_stream_cusum" -> ((s, dir) =>
      graft.queries.Analytics.cusumReadout(
        EventStreams.statefulDailyCounts(T.events(s, dir)).toDF())),

    // Live sessionization (a83's streaming dual): keyed state = two
    // longs per user (session index, last event µs); each event emits
    // exactly once tagged with its session — the per-day rollup runs
    // OUTSIDE the stream (st16/st20 hand-off) and is
    // Analytics.sessionDailyStats VERBATIM, so a83's oracle certifies
    // stream ≡ batch (the a80/st27 lockstep discipline).
    "st28_stream_sessionize" -> ((s, dir) =>
      graft.queries.Analytics.sessionDailyStats(
        EventStreams.statefulSessionAssign(T.events(s, dir)).toDF())),

    // Live temporal (as-of) enrichment — Flink's temporal-table join
    // as keyed stream state: each click is enriched with the same
    // user's latest purchase at or before the click (>= ties, exact
    // cents), null payload when none precedes. ONE user_id shuffle
    // feeds the three-long state; in batch the fold over full history
    // IS the as-of window rule, which the oracle replays directly
    // (EventStreamsSpec additionally cross-checks the fold against the
    // independent AsOfJoin.asofBackward formulation and certifies
    // cross-micro-batch equivalence).
    "st29_temporal_enrich" -> ((s, dir) =>
      EventStreams.temporalEnrich(T.events(s, dir))
        .toDF()
        .orderBy("event_id")),

    // Streaming windowed first-event dedup (x45's streaming dual):
    // one survivor per (user, event type, 5-min tumbling window) — the
    // earliest by (ts, event_id) — maintained as a two-long best
    // cursor per key, emitting only on first sight or improvement
    // (the latest emission per key IS the x45 row). In batch each key
    // folds once over full history ⇒ exactly one emission per key, so
    // x45's oracle certifies both surfaces verbatim (the st25/a73
    // lockstep discipline).
    "st30_window_first_dedup" -> ((s, dir) =>
      EventStreams.statefulWindowFirst(T.events(s, dir))
        .toDF()
        .orderBy("user_id", "event_type", "w_start")),

    // Per-user inter-arrival gap profile as keyed stream state — the
    // live readout that sizes the session gap and watermark horizon
    // knobs (st03/st28's 6 h, the sink's lateness budget). Six-long
    // state folded in (tu, event_id) order; single-event users report
    // null gaps (the lag-window convention). In batch the fold over
    // full history IS the lag formulation the oracle replays.
    "st31_gap_profile" -> ((s, dir) =>
      EventStreams.statefulGapProfile(T.events(s, dir))
        .toDF()
        .orderBy("user_id")),

    // Watermark late-drop accounting (the dual of st31: st31 measures
    // the gaps a lateness budget must cover, this COUNTS what a given
    // budget would drop) — over the orders-INGEST stream, where the
    // fixture has real event-time disorder (o_orderdate regresses up
    // to ~2400 days against o_orderkey arrival order; the events
    // stream arrives in-order, late count 0 — measured, not assumed).
    // The frontier is batch-quantized exactly like Spark's watermark:
    // the watermark a row meets is the max event time of PRIOR
    // micro-batches (minus the delay), so late = date < frontier of
    // its arrival batch, dropped at budget D = late by MORE than D
    // days. Per priority class: arrivals, late, dropped at 7d/30d,
    // max lateness.
    // 100 TB: the per-batch max partial-aggregates on the batch key;
    // the running-max window runs over #BATCHES rows (bounded by
    // ingest cadence — a year of minutely micro-batches is 526 k rows
    // — never by data volume); the frontier broadcast-joins back; the
    // priority rollup partial-aggregates. No corpus-sized window.
    "st32_watermark_audit" -> ((s, dir) =>
      watermarkAudit(T.orders(s, dir))),

    // Per-source dedup governance over the STREAMING near-dup state —
    // x124's audit readout recast on st12's semantics: a doc is
    // removed-exact when an identical text arrived earlier (stream
    // arrival order = doc_id, the st12 convention), removed-near when
    // st12's banded SimHash state flags an earlier partner (identical
    // docs always collide on every band, so the two removal classes
    // are disjoint by construction), kept otherwise. Differs from
    // x124 deliberately: x124 audits the BATCH connected-component
    // canon (cluster-elected survivors); this audits the streaming
    // first-seen-wins filter — the two governance readouts a crawl
    // pipeline publishes side by side.
    // 100 TB: rides st12's machinery (one fingerprint scan, band-key
    // candidate join — never all-pairs) + one content-hash rollup
    // (32-byte keys on the wire) + doc_id-keyed joins + the source
    // rollup. Stream ≡ batch inherits st12's DocStreamsSpec
    // certification; the rollup is additive counters.
    "st33_dedup_audit" -> ((s, dir) =>
      streamDedupAudit(T.documents(s, dir)))
  )

  /** Arrival micro-batch grain for [[watermarkAudit]]: 1000 order keys
    * per ingest batch — the fixture-scale stand-in for a micro-batch
    * id column a real ingest log carries.
    */
  private[graft] val IngestBatchKeys = 1000L

  /** st32's batch-quantized watermark audit over an orders-shaped
    * frame — extracted so the frontier rule (strictly PRIOR batches;
    * first batch never late) and the budget edges (late at 1 day,
    * dropped only when strictly beyond the budget) are unit-testable
    * on crafted frames (Round16OpsSpec).
    */
  private[graft] def watermarkAudit(orders: DataFrame): DataFrame = {
    val o = orders.select(
      call_function("div", col("o_orderkey"), lit(IngestBatchKeys)).as("b"),
      to_date(col("o_orderdate")).as("d"),
      col("o_orderpriority"))
    val batchMax = o.groupBy("b").agg(max(col("d")).as("bd"))
    // running max over strictly-prior batches: #batches rows (see the
    // st32 entry's scale note), so the unpartitioned window is legal
    val frontier = batchMax.withColumn("front",
      max(col("bd")).over(Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)))
    o.join(broadcast(frontier.select("b", "front")), "b")
      .withColumn("late_days",
        when(col("front").isNotNull && col("d") < col("front"),
          datediff(col("front"), col("d")).cast("long")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("late_days").isNotNull, 1L).otherwise(0L))
          .as("n_late"),
        sum(when(col("late_days") > 7, 1L).otherwise(0L))
          .as("n_drop_7d"),
        sum(when(col("late_days") > 30, 1L).otherwise(0L))
          .as("n_drop_30d"),
        max(col("late_days")).as("max_late_days"))
      .orderBy("o_orderpriority")
  }

  /** st33's per-source audit of the streaming dedup decisions —
    * extracted so the disjoint kept/exact/near convention (exact wins;
    * identical docs always band-collide so near never double-counts
    * them) is unit-testable on crafted frames (Round16OpsSpec).
    */
  private[graft] def streamDedupAudit(docs: DataFrame): DataFrame = {
    val flags = DocStreams.nearDupFlags(docs, "text", "doc_id")
    // content-hash first-copy (the x124 route: 32-byte keys on the
    // wire, never raw text)
    val firsts = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("first_id"))
    docs.select(col("doc_id"), col("source"), sha2(col("text"), 256).as("h"))
      .join(firsts, "h")
      .join(flags.select(col("doc_id"), col("is_dup")), "doc_id")
      .select(col("source"),
        (col("doc_id") > col("first_id")).cast("long").as("isx"),
        col("is_dup").cast("long").as("isn"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("isx") === 0 && col("isn") === 0, 1L).otherwise(0L))
          .as("n_kept"),
        sum(col("isx")).as("n_removed_exact"),
        sum(when(col("isx") === 0 && col("isn") === 1, 1L).otherwise(0L))
          .as("n_removed_near"))
      .orderBy("source")
  }

  val oracle: Map[String, String] = Map(
    // st25: a73's oracle VERBATIM — the stream's trailing-8 ring state
    // replayed as the batch window is exactly the stream ≡ batch claim,
    // and sharing the SQL string keeps the two surfaces in lockstep by
    // construction.
    "st25_stream_anomaly" ->
      graft.queries.Analytics.oracle("a73_anomaly_zscore"),
    // st26: x111's oracle VERBATIM — additive counters make the
    // stream's grid state equal the batch grid, so the same SQL
    // certifies both surfaces (the st25/a73 lockstep discipline).
    "st26_stream_cms" ->
      graft.queries.Extensions.oracle("x111_join_size_cms"),
    // st28: a83's oracle VERBATIM — the keyed-state fold over the
    // (tu, event_id) order is the window assignment, and the daily
    // rollup is sessionDailyStats shared verbatim, so one SQL
    // certifies both surfaces (the st25/a73 lockstep discipline).
    "st28_stream_sessionize" ->
      graft.queries.Analytics.oracle("a83_sessionize"),
    // st29: the as-of rule as the standard union + last_value(IGNORE
    // NULLS) running window (the AsOfJoin.asofBackward formulation):
    // purchases sort before clicks at equal timestamps (>= semantics),
    // the larger event_id wins among equal-time purchases, and both
    // payload columns read the SAME chosen row because the frame order
    // is total and purchase rows are never null in either column.
    // ROWS (not the default RANGE) so equal-ts peers don't leak ahead.
    // st30: x45's oracle VERBATIM — the keyed best-cursor fold over
    // full history emits exactly the windowed (ts, event_id) minimum,
    // which is x45's row_number() = 1 row, so one SQL certifies the
    // batch query and (via EventStreamsSpec's cross-micro-batch run)
    // the streaming surface.
    "st30_window_first_dedup" ->
      graft.queries.Extensions.oracle("x45_event_dedup_window"),
    // st31: the keyed gap fold over the (tu, event_id) total order IS
    // the lag window over the same order; aggregates over an empty gap
    // set are NULL on both engines (single-event users).
    "st31_gap_profile" ->
      """WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tu,
             event_id FROM events),
         g AS (SELECT user_id,
             tu - lag(tu) OVER (PARTITION BY user_id
               ORDER BY tu, event_id) AS gap
           FROM e)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap_us,
           CAST(max(gap) AS BIGINT) AS max_gap_us,
           CAST(sum(gap) AS BIGINT) AS sum_gap_us
         FROM g GROUP BY user_id ORDER BY user_id""",
    "st29_temporal_enrich" ->
      """WITH u AS (
           SELECT user_id, 0 AS side, event_id, ts,
                  CAST(coalesce(floor(value * 100 + 0.5), 0) AS BIGINT)
                    AS cents
             FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, 1 AS side, event_id, ts,
                  CAST(NULL AS BIGINT) AS cents
             FROM events WHERE event_type = 'click'
         ), m AS (
           SELECT user_id, side, event_id, ts,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER w AS p_event_id,
             last_value(cents IGNORE NULLS) OVER w AS p_cents
           FROM u
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )
         SELECT user_id, event_id, ts, p_event_id, p_cents
         FROM m WHERE side = 1 ORDER BY event_id""",
    // st27: a80's oracle VERBATIM — additive daily counters make the
    // stream's MapState equal the batch rollup, and the readout is the
    // shared cusumReadout, so one SQL certifies both surfaces.
    "st27_stream_cusum" ->
      graft.queries.Analytics.oracle("a80_changepoint"),
    // st24: the stream's per-source sketch state recomputed as the
    // direct bottom-k over the whole table (murmur3 CTEs on doc_id) —
    // equality IS the sample semilattice; percentile cut =
    // ⌈n·pct/100⌉-th order statistic, integer arithmetic only.
    "st24_stream_quantile" -> {
      val k = graft.operators.Sketches.QsK
      val (ctes, hc) =
        Murmur3Sql.hashLongCtes("qt", Seq("source", "len", "doc_id"), "sqh")
      s"""WITH qt AS (SELECT source,
             CAST(len(regexp_split_to_array(lower(text), '\\s+'))
               AS BIGINT) AS len,
             doc_id, doc_id AS v FROM documents),
         $ctes
         r AS (SELECT source, len,
                 row_number() OVER (PARTITION BY source
                   ORDER BY hu, doc_id, len) AS rk
               FROM $hc),
         s AS (SELECT source, list(len ORDER BY len) AS vs,
                 CAST(count(*) AS BIGINT) AS n
               FROM r WHERE rk <= $k GROUP BY source),
         c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows
               FROM qt GROUP BY 1)
         SELECT s.source, c.n_rows, s.n AS sample_n,
           vs[(n*50+99)//100] AS p50,
           vs[(n*90+99)//100] AS p90,
           vs[(n*99+99)//100] AS p99
         FROM s JOIN c USING (source) ORDER BY source"""
    },

    // st20: the x100 chunk CTE; a chunk instance is NEW iff its hash's
    // earliest carrier is this document (min-doc == doc ⟺ no strictly
    // earlier doc has it).
    "st20_stream_cdc" ->
      s"""WITH ${graft.queries.Extensions.cdcInjectCte},
         ${graft.queries.Extensions.cdcBoundaryCtes},
         e AS (SELECT doc_id, text,
             list_sort(list_distinct(list_append(bnds, length(text)))) AS ends
           FROM b0),
         ch AS (SELECT doc_id,
             unnest(list_transform(range(1, len(ends) + 1), i ->
               {'clen': ends[i] - (CASE WHEN i = 1 THEN 0
                                        ELSE ends[i - 1] END),
                'h': md5(text[(CASE WHEN i = 1 THEN 0
                               ELSE ends[i - 1] END) + 1 : ends[i]])}),
               recursive := true)
           FROM e),
         f AS (SELECT h, min(doc_id) AS first_id FROM ch GROUP BY 1)
         SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN f.first_id = ch.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_new_chunks,
           CAST(sum(clen) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN f.first_id = ch.doc_id THEN clen ELSE 0 END)
             AS BIGINT) AS new_chars,
           CASE WHEN sum(clen) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(CAST(sum(CASE WHEN f.first_id < ch.doc_id
                                          THEN clen ELSE 0 END) AS DOUBLE)
                    / CAST(sum(clen) AS DOUBLE) * 1048576 + 0.5) AS BIGINT)
           END AS reuse_rate_q
         FROM ch JOIN f USING (h)
         GROUP BY 1 ORDER BY 1""",

    // st19: exact per-window rank over grouped counts; the processor's
    // (count desc, user asc) total order is the window's ORDER BY.
    "st19_window_topk" ->
      """WITH c AS (SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP))
                      AS TIMESTAMP) AS w_start, user_id,
                    CAST(count(*) AS BIGINT) AS n_events
                    FROM events GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY w_start
                 ORDER BY n_events DESC, user_id) AS rk FROM c)
         SELECT w_start, CAST(rk AS INTEGER) AS rank, user_id, n_events
         FROM r WHERE rk <= 3 ORDER BY 1, 2""",

    // st17: the KMV replay — distinct murmur3 user hashes per type
    // (staged hashLong CTEs), kth-smallest via row_number, the exact
    // KmvDistinctAgg.finish arithmetic ((k-1)*2^32 = 1095216660480).
    "st17_stream_kmv" -> {
      val (hashCtes, hu) =
        graft.queries.Murmur3Sql.hashLongCtes("sk0", Seq("event_type"), "skh")
      s"""WITH sk0 AS (SELECT event_type, user_id AS v FROM events),
         $hashCtes
         dh AS (SELECT DISTINCT event_type, hu FROM $hu),
         rn AS (SELECT event_type, hu, row_number() OVER (
                  PARTITION BY event_type ORDER BY hu) AS rn FROM dh),
         km AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(max(CASE WHEN rn = 256 THEN hu END) AS BIGINT) AS kth
                FROM rn GROUP BY 1),
         ne AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1)
         SELECT ne.event_type, ne.n_events,
           CASE WHEN km.cnt < 256 THEN km.cnt
                WHEN km.kth = 0 THEN CAST(256 AS BIGINT)
                ELSE 1095216660480 // km.kth END AS est_users
         FROM ne JOIN km USING (event_type) ORDER BY event_type"""
    },

    // st18: the greedy throttle fold replayed per key (the st14
    // list_reduce recipe) — strict-prefix fold to the last kept micros,
    // keep iff this event clears it by more than the gap. The sentinel
    // init makes the first event always keep (no overflow: adding the
    // gap to it stays far below any real timestamp).
    "st18_stream_throttle" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                      CAST(ts AS TIMESTAMP) AS ts FROM events),
         g AS (SELECT user_id, event_type,
                 list(epoch_us(ts) ORDER BY ts, event_id) AS ms,
                 list(event_id ORDER BY ts, event_id) AS ids,
                 list(ts ORDER BY ts, event_id) AS tss
               FROM e GROUP BY 1, 2),
         x AS (SELECT user_id, event_type,
                 unnest(ids) AS event_id, unnest(tss) AS ts,
                 unnest(range(1, len(ids) + 1)) AS i, ms
               FROM g),
         k AS (SELECT *, list_reduce(
                 list_prepend(CAST(-9223372036854775807 AS BIGINT),
                              ms[1:i-1]),
                 (a, m) -> CASE WHEN m > a + 3600000000 THEN m
                                ELSE a END) AS acc
               FROM x)
         SELECT event_id, user_id, event_type, ts FROM k
         WHERE ms[i] > acc + 3600000000
         ORDER BY event_id""",

    // st16: probe hit ⇔ the position's first setter has a smaller id
    // (in batch each position group processes ids ascending, so
    // "earlier set" = min setter < prober); exact dup = an earlier doc
    // with the same sha256.
    "st16_stream_bloom" ->
      """WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
         p AS (SELECT doc_id,
             CAST(concat('0x', substr(h, 1 + 12*r, 12)) AS BIGINT) % 16384 AS pos
           FROM d, range(4) t(r)),
         fs AS (SELECT pos, min(doc_id) AS first_id FROM p GROUP BY 1),
         mb AS (SELECT p.doc_id,
             CAST(min(CASE WHEN fs.first_id < p.doc_id THEN 1 ELSE 0 END)
               AS INTEGER) AS bloom_maybe
           FROM p JOIN fs USING (pos) GROUP BY 1),
         fh AS (SELECT h, min(doc_id) AS first_h FROM d GROUP BY 1)
         SELECT d.doc_id, mb.bloom_maybe,
           CAST(CASE WHEN fh.first_h < d.doc_id THEN 1 ELSE 0 END
             AS INTEGER) AS is_dup
         FROM d JOIN mb ON mb.doc_id = d.doc_id JOIN fh ON fh.h = d.h
         ORDER BY d.doc_id""",
    // st15: the a57 retention matrix (each (user, offset) emits exactly
    // once in batch, so the stateful rollup equals the window form).
    "st15_stream_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         w AS (SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM e),
         c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY 1)
         SELECT c.cohort_wk,
           CAST(datediff('day', CAST(c.cohort_wk AS DATE), CAST(w.wk AS DATE)) // 7
             AS INTEGER) AS week_offset,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
         FROM w JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // st14: the α=½ EWMA recurrence replayed as an ordered list fold —
    // list_reduce over the (ts, event_id)-sorted value prefix; the
    // spike gate reads the PRE-event fold. (a+v)/2 is one IEEE
    // addition + one exact halving in both engines.
    "st14_stream_ewma" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
                      CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         g AS (SELECT user_id, event_type,
                 list(value ORDER BY ts, event_id) AS vs,
                 list(event_id ORDER BY ts, event_id) AS ids
               FROM e GROUP BY 1, 2),
         x AS (SELECT user_id, event_type,
                 unnest(ids) AS event_id,
                 unnest(range(1, len(ids) + 1)) AS i, vs
               FROM g)
         SELECT user_id, event_type, event_id,
           vs[i] AS value,
           list_reduce(vs[1:i], (a, v) -> (a + v) / 2.0) AS ewma,
           CASE WHEN i > 1 AND
                vs[i] > 2 * list_reduce(vs[1:greatest(i - 1, 1)],
                                        (a, v) -> (a + v) / 2.0)
                THEN true ELSE false END AS spike
         FROM x ORDER BY user_id, event_type, event_id""",
    // st13: the a55 conditional-min chain per user — first signup,
    // first click strictly after it, first purchase strictly after
    // that — with the reached stage derived from which slots filled.
    "st13_stream_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
         us AS (SELECT DISTINCT user_id FROM e),
         u1 AS (SELECT user_id, min(ts) AS t1 FROM e
                WHERE event_type = 'signup' GROUP BY 1),
         u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN u1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1),
         u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN u2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1)
         SELECT us.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS stage,
           t1, t2, t3
         FROM us LEFT JOIN u1 USING (user_id) LEFT JOIN u2 USING (user_id)
           LEFT JOIN u3 USING (user_id)
         ORDER BY us.user_id""",
    // st12: the x19 banded-candidate machinery (shared simhash CTEs)
    // with the Hamming gate and a per-doc min-earlier-partner reduce —
    // the relational statement of the keyed-state semantics. The CTE
    // block is [[neardupFlagCtes]], shared verbatim with st33's audit
    // so the two surfaces cannot drift.
    "st12_stream_neardup" ->
      s"""WITH $neardupFlagCtes
         SELECT doc_id, dup_of, is_dup
         FROM fl ORDER BY doc_id""",

    // st33: st12's flag CTEs VERBATIM (lockstep by construction) + the
    // x124-style text-partition first-copy window + the disjoint
    // kept/exact/near rollup per source (exact wins; identical docs
    // always band-collide, so `near` never double-counts them).
    "st33_dedup_audit" ->
      s"""WITH $neardupFlagCtes,
         ex AS (SELECT doc_id,
             min(doc_id) OVER (PARTITION BY text) AS first_id
           FROM documents),
         j AS (SELECT dd.source,
             CASE WHEN e.first_id < e.doc_id THEN 1 ELSE 0 END AS isx,
             fl.is_dup AS isn
           FROM documents dd JOIN ex e ON dd.doc_id = e.doc_id
             JOIN fl ON dd.doc_id = fl.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN isx = 0 AND isn = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(sum(isx) AS BIGINT) AS n_removed_exact,
           CAST(sum(CASE WHEN isx = 0 AND isn = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_removed_near
         FROM j GROUP BY 1 ORDER BY 1""",

    // st32: the batch-quantized frontier replayed — per-batch maxima,
    // the strictly-prior running max, the same (late, >7, >30) day
    // arithmetic on DATEs in both engines.
    "st32_watermark_audit" ->
      s"""WITH o AS (SELECT o_orderkey // $IngestBatchKeys AS b,
             CAST(o_orderdate AS DATE) AS d, o_orderpriority
           FROM orders),
         bm AS (SELECT b, max(d) AS bd FROM o GROUP BY 1),
         f AS (SELECT b, max(bd) OVER (ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS front
           FROM bm),
         j AS (SELECT o.o_orderpriority,
             CASE WHEN front IS NOT NULL AND d < front
                  THEN CAST(date_diff('day', d, front) AS BIGINT)
             END AS late_days
           FROM o JOIN f USING (b))
         SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN late_days IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late,
           CAST(sum(CASE WHEN late_days > 7 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_7d,
           CAST(sum(CASE WHEN late_days > 30 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_30d,
           CAST(max(late_days) AS BIGINT) AS max_late_days
         FROM j GROUP BY 1 ORDER BY 1""",
    "st11_stream_enrich" ->
      """SELECT CAST(time_bucket(INTERVAL 1 HOUR, e.ts) AS TIMESTAMP) AS w_start,
           c.c_mktsegment, e.event_type, CAST(count(*) AS BIGINT) AS n
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2, 3 ORDER BY w_start, c_mktsegment, event_type""",
    "st08_stateful_sessions" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         f AS (SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT user_id, ts,
                sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
               FROM f)
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
         FROM s GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
    "st06_stream_join" ->
      """SELECT a.user_id, a.event_id AS src_id, b.event_id AS dst_id,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS lag_seconds
         FROM events a JOIN events b ON a.user_id = b.user_id
         WHERE a.event_type = 'click' AND b.event_type = 'purchase'
           AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
         ORDER BY src_id, dst_id""",
    // st23: a66's lead-window pair derivation — the keyed-state fold
    // emits exactly the consecutive pairs the window sees, in the same
    // (ts, event_id) order; probability via the identical forced-double
    // division.
    "st23_stream_transitions" ->
      """WITH tr AS (SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
           FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
         FROM c ORDER BY from_type, to_type""",

    // st22: the same interval condition as a LEFT join — unmatched
    // clicks keep null dst/lag, exactly the rows the streaming variant
    // emits on watermark eviction.
    "st22_stream_outer_join" ->
      """SELECT a.user_id, a.event_id AS src_id, b.event_id AS dst_id,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS lag_seconds
         FROM (SELECT * FROM events WHERE event_type = 'click') a
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
           ON a.user_id = b.user_id
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
         ORDER BY src_id, dst_id""",
    "st01_tumbling_window" ->
      """SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS w_start,
           event_type, CAST(count(*) AS BIGINT) AS n,
           min(value) AS min_v, max(value) AS max_v
         FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""",
    "st02_sliding_window" ->
      """SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP) AS w_start,
             event_type FROM events
           UNION ALL
           SELECT CAST(time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS TIMESTAMP),
             event_type FROM events)
         GROUP BY w_start, event_type ORDER BY w_start, event_type""",
    "st03_session_window" ->
      """WITH flagged AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS s_start,
           CAST(max(ts) + INTERVAL 10 MINUTE AS TIMESTAMP) AS s_end,
           CAST(count(*) AS BIGINT) AS n_events
         FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""",
    "st04_first_events" ->
      """SELECT user_id, event_type, CAST(min(ts) AS TIMESTAMP) AS first_ts
         FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""",
    "st09_transform_with_state" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
         FROM events GROUP BY user_id, event_type
         ORDER BY user_id, event_type""",
    "st05_stateful_stats" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS first_ts,
           CAST(max(ts) AS TIMESTAMP) AS last_ts
         FROM events GROUP BY user_id ORDER BY user_id""",
    "st07_window_quantiles" ->
      """WITH sk AS (
           SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS w_start,
             event_type, CAST(floor(value / 5.0) AS BIGINT) AS bucket,
             count(*) AS c
           FROM events GROUP BY 1, 2, 3),
         cum AS (
           SELECT w_start, event_type, bucket, c,
             sum(c) OVER (PARTITION BY w_start, event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY w_start, event_type) AS n
           FROM sk)
         SELECT w_start, event_type, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= ceil(n * 0.5) THEN bucket END) AS p50_bucket,
           min(CASE WHEN cum >= ceil(n * 0.9) THEN bucket END) AS p90_bucket
         FROM cum GROUP BY 1, 2 ORDER BY w_start, event_type""",
    "st10_window_distinct" -> windowDistinctSql,

    // st21: the a65 window build over events, CLOSED intervals only —
    // a streaming run emits exactly when its successor's first row
    // arrives, so valid_to = lead(valid_from) and open runs are absent.
    "st21_stream_scd" ->
      """WITH obs AS (SELECT user_id, ts, event_id,
             event_type AS attr FROM events),
         chg AS (SELECT user_id, ts, attr,
             CASE WHEN lag(attr) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id)
                  IS DISTINCT FROM attr THEN 1 ELSE 0 END AS c,
             event_id
           FROM obs),
         runs AS (SELECT user_id, ts, attr,
             CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS BIGINT) AS version
           FROM chg),
         iv AS (SELECT user_id, version, min(attr) AS attr,
             min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_obs
           FROM runs GROUP BY user_id, version),
         closed AS (SELECT user_id, version, attr, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to, n_obs
           FROM iv)
         SELECT user_id, version, attr, valid_from, valid_to, n_obs
         FROM closed WHERE valid_to IS NOT NULL
         ORDER BY user_id, version"""
  )

  /** The st12 near-dup flag machinery as a reusable CTE block ending in
    * `fl(doc_id, dup_of, is_dup)` — shared verbatim by st12 and st33 so
    * the streaming dedup semantics and its governance audit cannot
    * drift (the bpeEncodeCtes discipline).
    */
  private lazy val neardupFlagCtes: String =
    s"""${Extensions.simhashUnsignedSql},
         banded AS (
           SELECT doc_id, hu, bb.b AS band,
             (hu >> CAST(16 * bb.b AS INTEGER)) % 65536 AS key
           FROM fpu, (SELECT unnest(range(0, 4)) AS b) bb),
         cand AS (
           SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
             a.hu AS h1, b.hu AS h2
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         dups AS (
           SELECT d2 AS doc_id, min(d1) AS dup_of
           FROM cand
           WHERE CAST(bit_count(xor(h1, h2)) AS INTEGER) <= 3
           GROUP BY d2),
         fl AS (
           SELECT f.doc_id, d.dup_of,
             CASE WHEN d.dup_of IS NULL THEN 0 ELSE 1 END AS is_dup
           FROM fpu f LEFT JOIN dups d USING (doc_id))"""

  /** st10's oracle: the a23 HLL arithmetic (murmur3 hashLong CTEs,
    * register max-rank, harmonic estimate) grouped by the st01 window
    * convention, PLUS Flajolet's small-range correction exactly as
    * [[graft.streaming.EventStreams.distinctFromSketch]] applies it:
    * when raw ≤ 5m/2 and some registers are empty, linear counting
    * floor(m·ln(m/V)) read from the SAME precomputed integer table
    * ([[graft.streaming.EventStreams.hllLinearCountTable]]) embedded
    * here as a list literal — neither engine evaluates a
    * transcendental. The per-hour-window groups sit squarely in the
    * small range (≈3 distinct users each), so the correction decides
    * nearly every output row. Integer math until the single final
    * division.
    */
  private lazy val windowDistinctSql: String = {
    import graft.operators.Sketches
    val p = Sketches.HllP
    val m = 1L << p
    val rmax = 33 - p
    val pow = 1L << (32 - p)
    val c = Sketches.hllNumerator(p)
    val lc = graft.streaming.EventStreams.hllLinearCountTable(p)
      .mkString("[", ", ", "]")
    val (hashCtes, huCte) =
      Murmur3Sql.hashLongCtes("ev", Seq("w_start", "event_type"), "wh")
    s"""WITH ev AS (
         SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS w_start,
           event_type, user_id AS v
         FROM events),
       $hashCtes
       br AS (SELECT w_start, event_type, hu // $pow AS bucket,
                hu % $pow AS w
              FROM $huCte),
       rk AS (SELECT w_start, event_type, bucket,
                CASE WHEN w = 0 THEN $rmax
                     ELSE $rmax - length(bin(CAST(w AS BIGINT))) END AS rank
              FROM br),
       regs AS (SELECT w_start, event_type, bucket, max(rank) AS mj
                FROM rk GROUP BY 1, 2, 3),
       agg AS (SELECT w_start, event_type,
                CAST(sum(CAST(1 AS BIGINT) << ($rmax - mj))
                     + ($m - count(*)) * (CAST(1 AS BIGINT) << $rmax)
                  AS BIGINT) AS s,
                CAST($m - count(*) AS BIGINT) AS v
               FROM regs GROUP BY 1, 2),
       est AS (SELECT w_start, event_type, v,
                CAST(floor($c / s) AS BIGINT) AS raw
               FROM agg)
       SELECT w_start, event_type,
         CASE WHEN raw <= ${5L * m / 2} AND v > 0
              THEN ($lc)[CAST(v AS INTEGER)]
              ELSE raw END AS distinct_users
       FROM est ORDER BY w_start, event_type"""
  }
}
