"""Harness entries for the Structured Streaming twins (streaming/core.py).

Each entry runs a genuine streaming query (readStream → stateful transform →
memory sink, Trigger.AvailableNow) and returns the result as a batch
DataFrame, so the driver's DuckDB oracle can verify that the streaming
operator computes exactly what the batch twin computes on the same data —
the strongest available correctness statement for a streaming operator on a
finite input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aci_export_spark.harness import register
from aci_export_spark.harness_llm import _SQL_CHUNKS, _SQL_WINNOW_SEL
from aci_export_spark import streaming as ST


@register(
    "streaming_hourly_agg",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1, 2
""",
    doc="streaming twin of events_hourly_agg: readStream → watermarked "
    "tumbling-window groupBy → memory sink (complete mode, AvailableNow); "
    "oracle equals the batch aggregation (COUNT DISTINCT excluded — not "
    "expressible in bounded streaming state)",
)
def streaming_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = ST.read_events_stream(spark, sf_dir)
    agg = ST.hourly_agg_stream(events, watermark="1 hour")
    return ST.run_stream_to_table(agg, spark, output_mode="complete")


@register(
    "streaming_session_window",
    """
WITH gaps AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                     OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, ts,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
    FROM gaps
), agg AS (
    SELECT user_id, session_no,
           MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_no
)
SELECT user_id, session_no,
       strftime(s_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(s_end, '%Y-%m-%d %H:%M:%S') AS session_end,
       n_events
FROM agg
WHERE s_end + INTERVAL 30 MINUTE <= (SELECT MAX(ts) FROM events)
""",
    # Two conventions mirrored exactly from session_window's semantics:
    # (a) the >= break condition — an event extends a session iff its
    # distance to the last event is < gap (the custom stateful twin breaks
    # on >, differing only on exact-30:00 ties); (b) append mode emits only
    # sessions CLOSED by the end-of-feed watermark (0s delay → max event
    # time), i.e. s_end + gap <= max(ts) — per-user open sessions are a
    # suffix, so the closed prefix's numbering is unaffected. Still-open
    # sessions are genuinely not final in a live stream; emitting them is
    # the update-mode twin's job (streaming_sessionization).
    doc="JVM-native session windows (F.session_window): the built-in "
    "stateful operator for gap sessionization with aggregative per-session "
    "results — no Python state, no per-group Arrow round trips (the "
    "applyInPandasWithState twin's ~1.8s machinery floor); append mode "
    "emits each session exactly once when the watermark closes it; oracle "
    "equals the batch lag+cumsum sessionization restricted to "
    "watermark-closed sessions",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = ST.read_events_stream(spark, sf_dir)
    snapshots = ST.session_window_stream(events, gap="30 minutes", watermark="0 seconds")
    landed = ST.run_stream_to_table(snapshots, spark, output_mode="append")
    return ST.reconcile_session_windows(landed)


@register(
    "streaming_sessionization",
    """
WITH gaps AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                     OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, ts,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
    FROM gaps
)
SELECT user_id, session_no,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_no
""",
    doc="streaming twin of events_sessionization: applyInPandasWithState "
    "keyed by user (one open-session tuple of state per user), session "
    "snapshots reconciled to the final table; oracle equals the batch "
    "lag+cumsum sessionization",
)
def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = ST.read_events_stream(spark, sf_dir)
    snapshots = ST.sessionize_stream(events)
    # 16 partitions, not the streaming default of 4: the Python-stateful
    # operators are bottlenecked on per-group Arrow round trips, so extra
    # parallel Python workers pay off where the JVM-stateful streams don't
    # (A/B at sf0.1: 4→3.2s, 8→2.3s, 16→2.0s, 32→2.1s)
    landed = ST.run_stream_to_table(
        snapshots, spark, output_mode="update", shuffle_partitions=16
    )
    return ST.reconcile_session_snapshots(landed)


@register(
    "streaming_interval_join",
    """
WITH clicks AS (
    SELECT event_id AS click_id, user_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
), views AS (
    SELECT event_id AS view_id, user_id, ts AS view_ts
    FROM events WHERE event_type = 'view'
)
SELECT c.click_id, c.user_id,
       strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       v.view_id,
       strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM clicks c JOIN views v
  ON v.user_id = c.user_id
 AND v.view_ts <= c.click_ts
 AND v.view_ts >= c.click_ts - INTERVAL 30 MINUTE
""",
    doc="stream-stream interval join: clicks × views of the same user within "
    "a 30-min lookback, both sides watermarked so join state is bounded to "
    "the horizon; oracle equals the batch range join on the same data",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = ST.read_events_stream(spark, sf_dir)
    joined = ST.interval_join_stream(events, lookback="30 minutes")
    return ST.run_stream_to_table(joined, spark, output_mode="append")


@register(
    "streaming_distinct_users",
    "SELECT DISTINCT user_id FROM events",
    doc="streaming distinct-within-horizon: dropDuplicatesWithinWatermark "
    "keyed on user_id (state bounded by the horizon); horizon covers the "
    "test span so the result equals batch SELECT DISTINCT",
)
def streaming_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = ST.read_events_stream(spark, sf_dir)
    return ST.run_stream_to_table(
        ST.distinct_users_stream(events, horizon="35 days"),
        spark,
        output_mode="append",
    )


@register(
    "streaming_stream_static_join",
    """
SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts
FROM events e JOIN customer c ON c.c_custkey = e.user_id
WHERE e.event_type = 'purchase'
""",
    doc="stream-static join: the event stream enriched against a static "
    "dimension (broadcast, re-read per micro-batch — the streaming "
    "dimension-enrichment pattern); oracle equals the batch join",
)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aci_export_spark.sources import read_table
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    events = ST.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    joined = events.join(broadcast(customer), on="user_id").select(
        "event_id",
        "user_id",
        "c_name",
        "c_mktsegment",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )
    return ST.run_stream_to_table(joined, spark, output_mode="append")


@register(
    "streaming_dq_monitor",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       COUNT(*) AS n_events,
       CAST(COUNT(*) FILTER (value > 90) AS BIGINT) AS n_value_over_90,
       CAST(COUNT(*) FILTER (value IS NULL OR value <= 0) AS BIGINT) AS n_value_nonpositive,
       CAST(COUNT(*) FILTER (json_extract(props, '$.k') IS NULL) AS BIGINT) AS n_props_missing_k
FROM events GROUP BY 1
""",
    doc="streaming data-quality monitor: watermarked hourly windows of "
    "fused CASE-sum violation counters (value range, non-positive/null, "
    "missing JSON key) — bounded state (one row per open window), the "
    "always-on twin of the batch dq_check_report gate; oracle equals the "
    "batch aggregation over the same feed",
)
def streaming_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = ST.read_events_stream(spark, sf_dir)
    agg = ST.dq_monitor_stream(events, watermark="1 hour")
    return ST.run_stream_to_table(agg, spark, output_mode="complete")


@register(
    "streaming_funnel",
    """
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1),
s4 AS (SELECT e.user_id, MIN(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1)
SELECT s1.user_id,
       strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS t_signup,
       strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS t_view,
       strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS t_click,
       strftime(s4.t4, '%Y-%m-%d %H:%M:%S') AS t_purchase,
       CAST(CASE WHEN s4.t4 IS NOT NULL THEN 4
            WHEN s3.t3 IS NOT NULL THEN 3
            WHEN s2.t2 IS NOT NULL THEN 2
            ELSE 1 END AS INTEGER) AS stage_reached
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        LEFT JOIN s4 USING (user_id)
""",
    doc="streaming twin of events_funnel_steps: applyInPandasWithState "
    "keyed by user with a 4-slot write-once chain state (signup→view→"
    "click→purchase), monotone snapshots reconciled by max(); oracle "
    "equals the batch min-with-predicate funnel",
)
def streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = ST.read_events_stream(spark, sf_dir)
    snapshots = ST.funnel_stream(events)
    # 16 partitions for the Python-stateful operator (see
    # streaming_sessionization for the A/B)
    landed = ST.run_stream_to_table(
        snapshots, spark, output_mode="update", shuffle_partitions=16
    )
    return ST.reconcile_funnel_snapshots(landed)


@register(
    "streaming_funnel_native",
    """
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1),
s4 AS (SELECT e.user_id, MIN(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1)
SELECT s1.user_id,
       strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS t_signup,
       strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS t_view,
       strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS t_click,
       strftime(s4.t4, '%Y-%m-%d %H:%M:%S') AS t_purchase,
       CAST(CASE WHEN s4.t4 IS NOT NULL THEN 4
            WHEN s3.t3 IS NOT NULL THEN 3
            WHEN s2.t2 IS NOT NULL THEN 2
            ELSE 1 END AS INTEGER) AS stage_reached
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        LEFT JOIN s4 USING (user_id)
""",
    doc="JVM-native streaming funnel: foreachBatch incremental chain merge "
    "— filled chain slots re-enter the next micro-batch as synthetic "
    "events, so each batch runs the ordinary batch min-with-predicate "
    "funnel over (state ∪ batch), all JVM joins/aggregates, no per-group "
    "Arrow round trips (the applyInPandasWithState twin's ~1.8s floor); "
    "oracle equals the batch funnel, identical to the Python-stateful "
    "twin's",
)
def streaming_funnel_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events = ST.read_events_stream(spark, sf_dir)
    final = ST.funnel_foreach_batch(events, spark)
    return final.select(
        "user_id",
        *[
            F.date_format(f"t_{s}", "yyyy-MM-dd HH:mm:ss").alias(f"t_{s}")
            for s in ST.core.FUNNEL_STEPS
        ],
        "stage_reached",
    )


@register(
    "streaming_gram_index",
    """
WITH toks AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS t
    FROM documents
), grams AS (
    SELECT doc_id, array_to_string(list_slice(t, i, i + 7), ' ') AS gram
    FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
    WHERE len(t) >= 8
)
SELECT gram,
       COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_occurrences
FROM grams
GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= 2
""",
    doc="streaming twin of the exact-substring dedup INDEX: the corpus "
    "arrives as a multi-file drop stream (maxFilesPerTrigger=1, disjoint "
    "doc_id ranges) and every foreachBatch merges the batch's gram stats "
    "into the maintained index (merge_gram_stats — the same "
    "delta-proportional merge the incremental batch query proves); the "
    "final index filtered to n_docs >= 2 must equal the batch rebuild "
    "over the full corpus, which is the oracle. Raises if the ingest "
    "collapsed to one micro-batch (a single-batch run would not exercise "
    "the merge). State = the index itself, bounded by distinct grams",
)
def streaming_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.gram_index_stream(spark, sf_dir, n=8, min_docs=2, n_files=5)


@register(
    "streaming_chunk_index",
    f"""
WITH {_SQL_CHUNKS}
SELECT chunk_hash,
       COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_occurrences
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= 2
""",
    doc="streaming twin of the RAG chunk-dedup INDEX: the corpus arrives "
    "as a multi-file drop stream (maxFilesPerTrigger=1, disjoint doc_id "
    "ranges) and every foreachBatch merges the batch's chunk stats into "
    "the maintained (chunk_hash, n_docs, n_occurrences) table — "
    "singletons kept so later occurrences promote them; counts add "
    "exactly because chunking is per-doc and batch doc sets are "
    "disjoint. Final index filtered to n_docs >= 2 must equal the batch "
    "rebuild; the oracle is built FROM the same _SQL_CHUNKS constant "
    "llm_chunk_dedup uses, so the two stay in lockstep. Raises if the "
    "ingest collapsed to one micro-batch. State = the index, bounded by "
    "distinct chunks",
)
def streaming_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.chunk_index_stream(
        spark, sf_dir, chunk_tokens=64, stride=48, min_docs=2, n_files=5
    )


@register(
    "streaming_winnow_index",
    f"""
WITH {_SQL_WINNOW_SEL}
SELECT fp_hash,
       COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_selections
FROM sel
GROUP BY fp_hash
HAVING COUNT(DISTINCT doc_id) >= 2
""",
    doc="streaming twin of the winnowing POSTING index: the corpus arrives "
    "as a multi-file drop stream and every foreachBatch merges the "
    "batch's (fp_hash, n_docs, n_selections) stats into the maintained "
    "table — winnowing selection is per-document, so batch boundaries "
    "cannot change any doc's selected set and disjoint-doc counts add "
    "exactly. Final index filtered to n_docs >= 2 equals the batch "
    "rebuild; the oracle is built FROM the same _SQL_WINNOW_SEL constant "
    "the batch winnow queries use, so selection retunes propagate. "
    "Raises on a single-batch collapse",
)
def streaming_winnow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.winnow_index_stream(spark, sf_dir, k=24, w=8, min_docs=2, n_files=5)


@register(
    "streaming_hll_index",
    """
WITH t0 AS (
    SELECT lang,
           string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS t
    FROM documents
), toks AS (SELECT lang, u.tok AS tok FROM t0, unnest(t) AS u(tok)),
h AS (
    SELECT lang, ('0x' || substr(md5('hll:' || tok), 1, 15))::BIGINT AS h64
    FROM toks
), reg AS (
    SELECT lang,
           h64 // 2251799813685248 AS register,
           h64 % 2251799813685248 AS w
    FROM h
), rho AS (
    SELECT lang, register,
           CASE WHEN w = 0 THEN 52 ELSE 51 - length(bin(w)) + 1 END AS rho
    FROM reg
), m AS (
    SELECT lang, register, MAX(rho)::BIGINT AS max_rho FROM rho GROUP BY 1, 2
), fold AS (
    SELECT lang, COUNT(*)::BIGINT AS n_registers,
           (SUM(1::BIGINT << (52 - max_rho)::INTEGER)
            + (512 - COUNT(*)) * (1::BIGINT << 52))::BIGINT AS z_scaled
    FROM m GROUP BY 1
)
SELECT lang, n_registers, z_scaled,
       CAST((719783::HUGEINT * 262144 * 4503599627370496)
            // (z_scaled::HUGEINT * 1000000) AS BIGINT) AS hll_estimate
FROM fold
""",
    doc="streaming maintenance of the per-language HLL REGISTER index "
    "over the corpus vocabulary (file-drop stream, maxFilesPerTrigger=1, "
    "foreachBatch merge): registers merge by MAX — the strongest merge "
    "law in the index family, needing NO disjointness contract (max is "
    "idempotent: re-delivered or overlapping batches cannot corrupt "
    "state), so the sketch survives at-least-once delivery where the "
    "count-based gram/chunk/winnow merges rely on exactly-once disjoint "
    "ingest. State = <= langs x 512 rows FOREVER regardless of stream "
    "length. The final estimate fold must equal the batch rebuild over "
    "the whole corpus — the oracle recomputes exactly that; raises on a "
    "single-batch collapse",
)
def streaming_hll_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.hll_index_stream(spark, sf_dir, n_files=5)
