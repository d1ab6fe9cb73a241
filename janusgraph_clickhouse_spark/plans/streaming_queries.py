"""Streaming-semantics queries, oracle-checked in their batch form.

Spark's unified API means the exact transformations used by the streaming
operators (janusgraph_clickhouse_spark.streaming.ops) also run on batch
DataFrames — so the DuckDB oracle checks the *semantics* (window
alignment, session gap rules, dedup-keep-first) while pytest separately
runs the true streaming path (file source → availableNow → memory sink)
and asserts it equals the batch answer.

Window alignment note: Spark tumbling windows align to the epoch; DuckDB
`time_bucket` with minute-scale widths aligns to an origin that is itself
epoch-aligned for widths dividing 10 minutes, so starts agree.  Outputs
carry `unix_timestamp(start)` BIGINT rather than raw timestamps to stay
out of ns-vs-µs precision mismatches (events.ts is TIMESTAMP_NS parquet;
Spark truncates to µs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from ..streaming.ops import (session_stats, sliding_counts,
                             trending_topk, tumbling_counts)
from .registry import query


@query(
    "s01_tumbling_window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT)
             AS window_start,
           event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def s01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type — identical code path as
    the streaming operator (unified API)."""
    events = load_table(spark, sf_dir, "events")
    return tumbling_counts(events)


@query(
    "s02_sliding_window",
    oracle="""
    SELECT window_start, count(*) AS cnt FROM (
      SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT)
               AS window_start
      FROM events
      UNION ALL
      SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts,
                                    INTERVAL '5 minutes')) AS BIGINT)
      FROM events
    ) GROUP BY window_start
    """,
)
def s02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min width / 5 min slide): every event falls in
    exactly two windows; the oracle reproduces that as two offset
    tumbling bucketings unioned."""
    events = load_table(spark, sf_dir, "events")
    return sliding_counts(events)


@query(
    "s03_session_window",
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS MATERIALIZED (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM d
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def s03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) per user.  The oracle
    sessionizes relationally (lag + gap-flag + running sum) — same
    semantics Spark's session_window implements in state.  Boundary:
    Spark MERGES at exact equality (an event at last_ts + gap extends
    the session — measured on 4.1.2, r15), so the gap-flag is strict
    `>`; the fixtures have zero exact-gap adjacent pairs at any SF, so
    this is result-identical to the old `>=` form on fixture data."""
    events = load_table(spark, sf_dir, "events")
    out = session_stats(events)
    # session_start from session_window.start is the first event's ts
    return out.select("user_id",
                      F.col("session_start").cast("bigint").alias("session_start"),
                      "n_events", "sum_value")


@query(
    "s04_dedup_keep_first",
    oracle="""
    SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
           user_id, event_type, value FROM (
      SELECT event_id, ts, user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def s04_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user, event_type) — the deterministic batch
    analog of dropDuplicatesWithinWatermark (whose streaming form keeps
    the first *arrival*; here first by event time with id tiebreak).
    Timestamps surface as epoch seconds: events.ts is ns-precision
    parquet, which Spark truncates to µs — raw values would diverge."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (events.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_id",
                    F.unix_timestamp("ts").alias("ts_sec"),
                    "user_id", "event_type", "value"))


@query(
    "s05_asof_join",
    oracle="""
    WITH v AS MATERIALIZED (SELECT user_id, ts, value FROM events
               WHERE event_type = 'view'),
         p AS MATERIALIZED (SELECT user_id, ts, event_id, value FROM events
               WHERE event_type = 'purchase'),
    -- explicit argmax, NOT native ASOF: DuckDB's ASOF JOIN picks an
    -- ARBITRARY row among right rows tied on ts, while the Spark
    -- operator deterministically carries the max (ts, value) struct —
    -- the oracle must express the same tiebreak or a tied fixture
    -- regen turns into a nondeterministic parity flake
    best AS MATERIALIZED (
      SELECT event_id, vts, vval FROM (
        SELECT p.event_id, v.ts AS vts, v.value AS vval,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts DESC, v.value DESC)
                 AS rn
        FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts)
      WHERE rn = 1)
    SELECT p.event_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_sec,
           round(p.value, 2) AS purchase_value,
           CAST(floor(epoch(b.vts)) AS BIGINT) AS matched_ts_sec,
           round(b.vval, 2) AS last_view_value
    FROM p LEFT JOIN best b ON b.event_id = p.event_id
    """,
)
def s05_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (each purchase matched to the user's latest prior view)
    — an operator Spark lacks; implemented as the union-merge single-
    shuffle pattern (operators.temporal.as_of_join), oracle-checked
    against DuckDB's native ASOF JOIN."""
    from ..operators.temporal import as_of_join
    ev = load_table(spark, sf_dir, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", "ts", F.col("value").alias("view_value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id", "value"))
    joined = as_of_join(purchases, views, key="user_id", ts="ts",
                        right_cols=["view_value"])
    return joined.select(
        "event_id",
        F.unix_timestamp("ts").alias("ts_sec"),
        F.round("value", 2).alias("purchase_value"),
        F.unix_timestamp("matched_ts").alias("matched_ts_sec"),
        F.round("view_value", 2).alias("last_view_value"))


@query(
    "s06_time_rollup",
    oracle="""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts))) AS BIGINT) AS h,
           CAST(floor(epoch(time_bucket(INTERVAL '1 day', ts))) AS BIGINT) AS d,
           event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
    """,
)
def s06_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: HOURLY rows (d NULL)
    and DAILY rows (h NULL) from one scan via grouping sets
    (operators.temporal.time_rollup).  r7 fix: the original cumulative
    sets grouped the 'daily' rows by (h, d) — still hourly, since each
    aligned hour determines its day — so the coarse grain never
    actually materialized; the oracle mirrored the bug and parity hid
    it.  Both sides now aggregate each grain alone."""
    from ..operators.temporal import time_rollup
    ev = load_table(spark, sf_dir, "events")
    return time_rollup(
        ev, "ts", grains={"h": "1 hour", "d": "1 day"},
        group_extra=["event_type"],
        aggs=["count(*) AS cnt", "round(sum(value), 2) AS sum_value"])


@query(
    "s07_interval_join",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           a.user_id AS user_id,
           CAST(floor(epoch(a.ts)) AS BIGINT) AS ts_a_sec,
           CAST(floor(epoch(b.ts)) AS BIGINT) AS ts_b_sec
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
    """,
)
def s07_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream self-join semantics (click↔purchase attribution
    shape), oracle-checked in batch form: pair events on the same user
    within a 5-minute event-time interval.  The identical transformation
    runs as a true watermarked stream-stream join in
    streaming.ops.self_join_within (pytest: stream == batch); the time
    bound is what lets the streaming state store evict — without it
    state grows forever."""
    from ..streaming.ops import self_join_within
    ev = load_table(spark, sf_dir, "events")
    out = self_join_within(ev, "user_id", interval="5 minutes")
    return out.select(
        "id_a", "id_b",
        F.col("k").alias("user_id"),
        F.unix_timestamp("ts_a").alias("ts_a_sec"),
        F.unix_timestamp("ts_b").alias("ts_b_sec"))


@query(
    "s08_trending_topk",
    oracle="""
    WITH counts AS MATERIALIZED (
      SELECT window_start, event_type, count(*) AS cnt FROM (
        SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT)
                 AS window_start, event_type
        FROM events
        UNION ALL
        SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts,
                                      INTERVAL '5 minutes')) AS BIGINT),
               event_type
        FROM events
      ) GROUP BY window_start, event_type)
    SELECT window_start, event_type, cnt,
           row_number() OVER (PARTITION BY window_start
                              ORDER BY cnt DESC, event_type) AS rk
    FROM counts
    QUALIFY rk <= 3
    """,
)
def s08_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-3 event types per 10-minute sliding window (5-minute
    slide): the stream-safe watermarked count stage plus a per-window
    rank (total order: cnt desc, event_type asc).  In true streaming
    the rank runs in foreachBatch at the sink (append mode cannot rank
    a running aggregate); tests/test_streaming.py pins stream==batch.
    The oracle reproduces the slide as two offset tumbling bucketings
    unioned (the s02 recipe) and ranks with QUALIFY."""
    events = load_table(spark, sf_dir, "events")
    return trending_topk(events, k=3)


@query(
    "s09_interval_left_join",
    oracle="""
    SELECT a.event_id AS id_a, a.user_id,
           CAST(floor(epoch(a.ts)) AS BIGINT) AS ts_a_sec,
           b.event_id AS id_b,
           CAST(floor(epoch(b.ts)) AS BIGINT) AS ts_b_sec
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON b.user_id = a.user_id AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL '5 minutes'
    """,
)
def s09_interval_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution with the unconverted side kept: every click LEFT
    OUTER joined to same-user purchases in the following 5 minutes —
    null purchase legs where none arrived.  The streaming form is the
    watermark-evicted outer interval join (null rows emit when the
    watermark passes click.ts + interval); batch runs the identical
    plan.  Epoch seconds via unix_timestamp / floor(epoch()) — the
    CLAUDE.md rounding trap."""
    from ..streaming.ops import left_join_within
    ev = load_table(spark, sf_dir, "events")
    out = left_join_within(ev)
    return out.select(
        "id_a", F.col("k").alias("user_id"),
        F.unix_timestamp("ts_a").alias("ts_a_sec"),
        "id_b", F.unix_timestamp("ts_b").alias("ts_b_sec"))


@query(
    "s10_scd2_versions",
    oracle="""
    WITH ordered AS MATERIALIZED (
      SELECT user_id, event_type, ts, event_id,
             -- NULL-safe (IS DISTINCT FROM) with first-row detection
             -- on the never-null event_id, mirroring scd2_versions'
             -- r7 fix: a non-NULL->NULL state transition must open a
             -- new version, not absorb into the previous run
             CASE WHEN lag(event_id) OVER w IS NULL
                    OR lag(event_type) OVER w
                       IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    versioned AS MATERIALIZED (
      SELECT user_id, event_type, ts,
             -- DuckDB windowed sum over INTEGER yields HUGEINT; cast so
             -- the version column (exposed in the output, directly or as
             -- state_version) matches Spark's BIGINT.  The r6 driver red
             -- on s10 was purely this type in the hashed output.
             CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS version
      FROM ordered),
    runs AS MATERIALIZED (
      SELECT user_id, version, min(event_type) AS state,
             min(ts) AS vfrom, count(*) AS n_events
      FROM versioned GROUP BY user_id, version)
    SELECT user_id, version, state,
           CAST(floor(epoch(vfrom)) AS BIGINT) AS valid_from_sec,
           CAST(floor(epoch(lead(vfrom) OVER
             (PARTITION BY user_id ORDER BY version))) AS BIGINT)
             AS valid_to_sec,
           n_events,
           lead(vfrom) OVER (PARTITION BY user_id ORDER BY version)
             IS NULL AS is_current
    FROM runs
    """,
)
def s10_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the event change-log: per user,
    one row per maximal run of identical event_type with
    [valid_from, valid_to) effective bounds and is_current on the open
    run — the CDC→warehouse shape the reference's txlog store feeds.
    One key shuffle + windows + one aggregate (streaming.ops
    .scd2_versions); epoch seconds via unix_timestamp / floor(epoch())
    (the CLAUDE.md rounding trap).  Both sides aggregate the run state
    with min(), equal to any-value because runs are constant-state by
    construction."""
    from ..streaming.ops import scd2_versions
    ev = load_table(spark, sf_dir, "events")
    return scd2_versions(ev)


@query(
    "s11_stateful_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def s11_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-stateful-operator surface (applyInPandasWithState),
    driver-checked end to end: a REAL availableNow streaming query runs
    inside this builder — file source over the events fixture, per-user
    (n_events, sum_value) state updated per micro-batch, memory sink —
    and the emitted final state must equal the batch GROUP BY the
    oracle computes.  Update-mode emissions are monotone in n_events,
    so the final state per user is the max-n_events row (one window);
    with availableNow's single batch that dedupe is a no-op guard.

    State is a fixed-width tuple per key — store size O(#users), the
    shape windowed aggregates can't express (fraud counters, rate
    limiters).  tune_session ships the package to Python workers (the
    CLAUDE.md mapInPandas trap)."""
    import os
    import shutil
    import tempfile
    from pyspark.sql import Window
    from ..session import tune_session
    from ..streaming.ops import (events_stream, run_to_memory,
                                 running_user_totals)
    tune_session(spark)
    src = os.path.join(sf_dir, "events.parquet")
    d = tempfile.mkdtemp(prefix="s11_events_")
    try:
        if os.path.isdir(src):
            # directory-shaped events (the production shape; Spark
            # writes tables as directories named *.parquet): stream
            # from the copied directory ITSELF — a file stream over
            # the PARENT would neither list the nested part files nor
            # probe their footers (the r11 scale-study s11@x10 find)
            stream_path = os.path.join(d, "events.parquet")
            shutil.copytree(src, stream_path)
        else:
            shutil.copy(src, d)
            stream_path = d
        # the stream terminates inside run_to_memory and the sink is
        # in-memory, so the fixture copy can be deleted immediately —
        # no per-invocation /tmp leak
        out = run_to_memory(
            running_user_totals(events_stream(spark, stream_path)),
            mode="update")
    finally:
        shutil.rmtree(d, ignore_errors=True)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


@query(
    "s12_incremental_rollup",
    oracle="""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts)))
                AS BIGINT) AS h,
           event_type, count(*) AS cnt,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY h, event_type
    """,
)
def s12_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse materialized-view maintenance, driver-checked end to
    end: the events log is split into 3 chunk files, streamed
    availableNow with maxFilesPerTrigger=1 (3 real micro-batches), and
    each foreachBatch MERGES its batch aggregate into the persisted
    hourly rollup (read + union + re-aggregate + atomic swap —
    streaming.ops.incremental_rollup).  The final rollup must equal the
    oracle's one-shot GROUP BY: counts/sums are associative, so the
    incremental path is exactly equivalent no matter how the log was
    chunked.  Sums stay RAW in the table and round once at this read
    edge (never round additive state)."""
    import os
    import shutil
    import tempfile
    from ..streaming.ops import incremental_rollup, read_rollup
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="s12_rollup_")
    try:
        chunks = os.path.join(work, "chunks")
        ev.repartition(3).write.parquet(chunks)
        rollup = os.path.join(work, "rollup")
        incremental_rollup(spark, chunks, rollup,
                           os.path.join(work, "ckpt"),
                           max_files_per_trigger=1)
        # localCheckpoint materializes the small rollup into executor
        # storage so the fixture-sized work dir can be deleted now
        # instead of leaking per invocation
        out = (read_rollup(spark, rollup)
               .select("h", "event_type", "cnt",
                       F.round("sum_raw", 2).alias("sum_value"))
               .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "s13_decayed_score",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) - 1 AS k
      FROM events)
    SELECT user_id, count(*) AS n_scored,
           CAST(sum(cents * CAST(2.0 ** (30 - k) AS BIGINT)) AS BIGINT)
             AS score_fixed
    FROM r WHERE k <= 30 GROUP BY user_id
    """,
)
def s13_decayed_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-decayed engagement score (the ClickHouse
    exponentialMovingAverage idiom, event-indexed): newest event at
    full weight, each older event halved, hard 31-rank horizon.
    Exact by design — cents quantization + power-of-two weights make
    the score an integer Σ cents·2^(30-k): no float, no summation
    order, bit-identical everywhere (streaming.ops.decayed_score).
    One key shuffle + one window + one aggregate."""
    from ..streaming.ops import decayed_score
    ev = load_table(spark, sf_dir, "events")
    return decayed_score(ev)


@query(
    "s14_gap_fill",
    oracle="""
    WITH obs AS MATERIALIZED (
      SELECT event_type AS k,
             CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) % 600 AS b,
             count(*) AS cnt,
             -- CAST: DuckDB sum(BIGINT) yields HUGEINT, which would
             -- ride last_value() into the exposed filled_sum_cents
             -- (the s10 r6 driver-red type trap).
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM events GROUP BY 1, 2),
    axis AS MATERIALIZED (
      SELECT k, unnest(generate_series(lo, hi, 600)) AS b
      FROM (SELECT k, min(b) AS lo, max(b) AS hi FROM obs GROUP BY k)),
    j AS MATERIALIZED (
      SELECT a.k, a.b, coalesce(o.cnt, 0) AS cnt,
             o.cnt IS NULL AS is_gap, o.sum_cents
      FROM axis a LEFT JOIN obs o ON o.k = a.k AND o.b = a.b)
    SELECT k, b, cnt, is_gap,
           last_value(sum_cents IGNORE NULLS) OVER (
             PARTITION BY k ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_sum_cents
    FROM j
    """,
)
def s14_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY ... WITH FILL`` + ``INTERPOLATE`` analog:
    per event_type, every 10-minute bucket between that type's first
    and last observation — gap buckets emitted with cnt=0 and the
    last-observed sum carried forward (LOCF).  The dense time axis is
    GENERATED per key via sequence()+explode (rows ∝ span/width, never
    a cross join); cents quantization keeps the carried value integer-
    exact (operators.temporal.gap_fill_locf).  Epoch math via
    unix_timestamp / floor(epoch()) — the CLAUDE.md rounding trap."""
    from ..operators.temporal import gap_fill_locf
    ev = load_table(spark, sf_dir, "events")
    return gap_fill_locf(ev, "event_type", "ts", "value", width_sec=600)


@query(
    "s15_pit_enrich",
    oracle="""
    WITH browse AS MATERIALIZED (
      SELECT * FROM events
      WHERE event_type IN ('view', 'click', 'signup')),
    ordered AS MATERIALIZED (
      SELECT user_id, event_type, ts, event_id,
             -- NULL-safe (IS DISTINCT FROM) with first-row detection
             -- on the never-null event_id, mirroring scd2_versions'
             -- r7 fix: a non-NULL->NULL state transition must open a
             -- new version, not absorb into the previous run
             CASE WHEN lag(event_id) OVER w IS NULL
                    OR lag(event_type) OVER w
                       IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM browse
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    versioned AS MATERIALIZED (
      SELECT user_id, event_type, ts,
             -- DuckDB windowed sum over INTEGER yields HUGEINT; cast so
             -- the version column (exposed in the output, directly or as
             -- state_version) matches Spark's BIGINT.  The r6 driver red
             -- on s10 was purely this type in the hashed output.
             CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS version
      FROM ordered),
    runs AS MATERIALIZED (
      SELECT user_id, version, min(event_type) AS state,
             min(ts) AS vfrom
      FROM versioned GROUP BY user_id, version),
    dim AS MATERIALIZED (
      SELECT user_id, version, state,
             CAST(floor(epoch(vfrom)) AS BIGINT) AS valid_from_sec,
             CAST(floor(epoch(lead(vfrom) OVER
               (PARTITION BY user_id ORDER BY version))) AS BIGINT)
               AS valid_to_sec
      FROM runs),
    facts AS MATERIALIZED (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type
      FROM events WHERE event_type IN ('purchase', 'error'))
    SELECT f.event_id, f.user_id, f.ts_sec, f.event_type,
           d.state AS browse_state, d.version AS state_version
    FROM facts f
    LEFT JOIN dim d
      ON d.user_id = f.user_id AND f.ts_sec >= d.valid_from_sec
         AND (d.valid_to_sec IS NULL OR f.ts_sec < d.valid_to_sec)
    """,
)
def s15_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension — the
    warehouse join every feature pipeline needs to avoid label leakage:
    purchase/error facts LEFT-joined to the browsing-state version
    (SCD2 built from view/click/signup events, streaming.ops
    .scd2_versions) whose [valid_from, valid_to) interval contains the
    fact's timestamp; facts before the user's first browse keep a NULL
    state leg.  Spark shape: equi-join on user + interval range
    predicate — key co-location makes it one shuffle pair, the range
    filter applied post-probe; no time-axis explosion.  Bounds compare
    at epoch-second granularity on BOTH sides (sub-second state flips
    yield empty [s,s) intervals consistently)."""
    from ..streaming.ops import scd2_versions
    ev = load_table(spark, sf_dir, "events")
    dim = (scd2_versions(ev.filter(
        F.col("event_type").isin("view", "click", "signup")))
        .select("user_id", "version", "state",
                "valid_from_sec", "valid_to_sec"))
    facts = (ev.filter(F.col("event_type").isin("purchase", "error"))
             .select("event_id", "user_id",
                     F.unix_timestamp("ts").alias("ts_sec"),
                     "event_type"))
    return (facts.alias("f")
            .join(dim.alias("d"),
                  (F.col("d.user_id") == F.col("f.user_id"))
                  & (F.col("f.ts_sec") >= F.col("d.valid_from_sec"))
                  & (F.col("d.valid_to_sec").isNull()
                     | (F.col("f.ts_sec") < F.col("d.valid_to_sec"))),
                  "left")
            .select("f.event_id", "f.user_id", "f.ts_sec", "f.event_type",
                    F.col("d.state").alias("browse_state"),
                    F.col("d.version").alias("state_version")))


@query(
    "s16_lttb_downsample",
    oracle="""
    WITH pts AS MATERIALIZED (
      SELECT event_type AS k,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             event_id AS tb,
             CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) % 600 AS b
      FROM events),
    bs AS MATERIALIZED (
      SELECT k, b, count(*) AS n, sum(c) AS sc FROM pts GROUP BY 1, 2),
    an AS MATERIALIZED (
      SELECT k, b,
             lag(b) OVER w + 300 AS px,
             CAST(floor(lag(sc) OVER w / lag(n) OVER w) AS BIGINT) AS py,
             lead(b) OVER w + 300 AS nx,
             CAST(floor(lead(sc) OVER w / lead(n) OVER w) AS BIGINT) AS ny
      FROM bs WINDOW w AS (PARTITION BY k ORDER BY b)),
    j AS MATERIALIZED (
      SELECT p.k, p.b, p.t, p.c, p.tb,
             CASE WHEN a.px IS NULL THEN 'first'
                  WHEN a.nx IS NULL THEN 'last' ELSE 'area' END AS rule,
             CASE WHEN a.px IS NOT NULL AND a.nx IS NOT NULL
                  THEN abs((a.px - a.nx) * (p.c - a.py)
                           - (a.px - p.t) * (a.ny - a.py))
                  ELSE 0 END AS area
      FROM pts p JOIN an a ON a.k = p.k AND a.b = p.b)
    SELECT k, b, t AS ts_sec, c AS cents, rule FROM (
      SELECT *, row_number() OVER (
        PARTITION BY k, b ORDER BY
          CASE WHEN rule = 'last' THEN -t
               WHEN rule = 'area' THEN -area ELSE 0 END,
          CASE WHEN rule = 'last' THEN -tb ELSE t END,
          CASE WHEN rule = 'last' THEN 0 ELSE tb END) AS rn
      FROM j) WHERE rn = 1
    """,
)
def s16_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (ClickHouse
    largestTriangleThreeBuckets) in the parallel bucket-average-anchor
    variant: one representative point per event_type per 10-minute
    bucket, chosen by max triangle area against the neighbor buckets'
    anchors; first/last buckets keep their endpoints.  Epoch-second ×
    cents arithmetic makes every area an exact int64 — the argmax is
    bit-identical across engines (operators.temporal.lttb_downsample).
    One (key,bucket) aggregate + one per-key window over BUCKETS + one
    per-bucket window."""
    from ..operators.temporal import lttb_downsample
    ev = load_table(spark, sf_dir, "events")
    return lttb_downsample(ev, "event_type", "ts", "value", "event_id",
                           width_sec=600)


@query(
    "s17_sequence_match",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'signup' THEN 's' WHEN 'purchase' THEN 'p'
                          WHEN 'error' THEN 'e' ELSE '?' END,
                        '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
           regexp_matches(seq, 'p.*e') AS m_error_after_purchase,
           regexp_matches(seq, 'v.*c.*p') AS m_funnel,
           regexp_matches(seq, 's.*p') AS m_signup_purchase
    FROM s
    """,
)
def s17_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse sequenceMatch analog (operators.temporal
    .sequence_match): per user the event stream renders to a letter
    string in (ts, event_id) order and each funnel condition is one
    regex over it — view→click→purchase, signup→purchase,
    error-after-purchase — no self-joins, one hash aggregate, state
    bounded by per-user event count.  Patterns use the Java∩RE2 core
    so the oracle replays them byte-identically."""
    from ..operators.temporal import sequence_match
    ev = load_table(spark, sf_dir, "events")
    return sequence_match(
        ev, "user_id", "ts", "event_id", "event_type",
        letters={"view": "v", "click": "c", "signup": "s",
                 "purchase": "p", "error": "e"},
        patterns={"m_funnel": "v.*c.*p",
                  "m_signup_purchase": "s.*p",
                  "m_error_after_purchase": "p.*e"})


@query(
    "s18_sequence_count",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'signup' THEN 's' WHEN 'purchase' THEN 'p'
                          WHEN 'error' THEN 'e' ELSE '?' END,
                        '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'cp')) AS BIGINT)
             AS n_click_purchase,
           CAST(len(regexp_extract_all(seq, 'v[vc]*p')) AS BIGINT)
             AS n_journeys,
           CAST(len(regexp_extract_all(seq, 'e')) AS BIGINT) AS n_errors
    FROM s
    """,
)
def s18_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse sequenceCount analog (operators.temporal
    .sequence_count): per user, how many non-overlapping times each
    event-order pattern occurs — adjacent click→purchase conversions,
    complete view→(views/clicks)→purchase journeys, raw error count —
    one aggregate + codegen regex counting, no self-joins."""
    from ..operators.temporal import sequence_count
    ev = load_table(spark, sf_dir, "events")
    return sequence_count(
        ev, "user_id", "ts", "event_id", "event_type",
        letters={"view": "v", "click": "c", "signup": "s",
                 "purchase": "p", "error": "e"},
        patterns={"n_click_purchase": "cp",
                  "n_journeys": "v[vc]*p",
                  "n_errors": "e"})


@query(
    "s19_stream_enrich",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment, e.event_type,
           count(*) AS cnt,
           CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def s19_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, driver-checked END TO END (the s11
    pattern): a REAL availableNow streaming query runs inside this
    builder — file source over the events fixture, each micro-batch
    LEFT-joined against the broadcast customer dimension
    (streaming.ops.enrich_stream — the static side re-resolves per
    batch, so slowly-changing dims pick up updates without a restart)
    — lands in a memory sink, and the enriched rows are then rolled up
    per (market segment, event type).  The oracle is the plain batch
    join+GROUP BY; equality proves the per-micro-batch join drops or
    duplicates nothing across batch boundaries."""
    import os
    import shutil
    import tempfile
    from ..streaming.ops import (enrich_stream, events_stream,
                                 run_to_memory)
    customer = load_table(spark, sf_dir, "customer")
    dim = customer.select(F.col("c_custkey").alias("user_id"),
                          "c_mktsegment")
    src = os.path.join(sf_dir, "events.parquet")
    d = tempfile.mkdtemp(prefix="s19_events_")
    try:
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(d, "events.parquet"))
        else:
            shutil.copy(src, d)
        stream = events_stream(spark, d, max_files_per_trigger=1)
        out = run_to_memory(enrich_stream(stream, dim, "user_id"),
                            mode="append")
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return (out.groupBy(F.col("c_mktsegment").alias("mktsegment"),
                        "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                       .cast("long")).alias("sum_cents")))


@query(
    "s20_incremental_hll",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts)))
                  AS BIGINT) AS h,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hh,
             user_id
      FROM events),
    b AS MATERIALIZED (
      SELECT h, hh % 256 AS bucket,
             CASE WHEN (hh >> 8) > 0 THEN 53 - length(bin(hh >> 8))
                  ELSE 53 END AS rank
      FROM r),
    reg AS MATERIALIZED (
      SELECT h, bucket, max(rank) AS m FROM b GROUP BY h, bucket),
    z AS MATERIALIZED (
      SELECT h,
             CAST(sum(CAST(2.0 ** (53 - m) AS BIGINT)) AS BIGINT)
             + (256 - count(*)) * 9007199254740992 AS z
      FROM reg GROUP BY h),
    ex AS MATERIALIZED (
      SELECT h, count(DISTINCT user_id) AS n_exact FROM r GROUP BY h)
    SELECT z.h, round(4.2399330249068963e+20 / z.z, 4) AS uniq_estimate,
           ex.n_exact
    FROM z JOIN ex ON ex.h = z.h
    """,
)
def s20_incremental_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming uniqState maintenance, driver-checked end to end (the
    s12 discipline applied to SKETCH state): the events log streams as
    3 real micro-batches (availableNow, maxFilesPerTrigger=1), each
    foreachBatch sketches only its batch into per-hour HLL registers
    and merges by per-bucket MAX into the persisted state
    (streaming.ops.incremental_hll_rollup).  The folded estimates must
    equal the oracle's one-shot register rederivation — register merge
    is associative AND idempotent, so the chunking (and any
    at-least-once replay) cannot change a single register.  State per
    hour is ≤256 rows forever: the distinct-count rollup whose state
    does NOT grow with cardinality."""
    import os
    import shutil
    import tempfile
    from ..functions.sketches import hll_estimate_from_registers
    from ..streaming.ops import incremental_hll_rollup, read_rollup
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="s20_hll_")
    try:
        chunks = os.path.join(work, "chunks")
        ev.repartition(3).write.parquet(chunks)
        state = os.path.join(work, "state")
        incremental_hll_rollup(spark, chunks, state,
                               os.path.join(work, "ckpt"),
                               max_files_per_trigger=1)
        est = hll_estimate_from_registers(
            read_rollup(spark, state), ["h"])
        ex = (ev.withColumn(
            "h", F.unix_timestamp(F.date_trunc("hour", F.col("ts"))))
            .groupBy("h")
            .agg(F.countDistinct("user_id").alias("n_exact")))
        out = est.join(ex, "h").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "s21_interval_full_join",
    oracle="""
    SELECT a.event_id AS id_a,
           coalesce(a.user_id, b.user_id) AS user_id,
           CAST(floor(epoch(a.ts)) AS BIGINT) AS ts_a_sec,
           b.event_id AS id_b,
           CAST(floor(epoch(b.ts)) AS BIGINT) AS ts_b_sec
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON b.user_id = a.user_id AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL '5 minutes'
    """,
)
def s21_interval_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution RECONCILIATION: clicks FULL OUTER joined to
    same-user purchases in the following 5 minutes — unconverted
    clicks AND unattributable purchases both keep null legs
    (streaming.ops.full_join_within; the streaming form evicts each
    side at its own watermark horizon).  Completes the stream-stream
    join matrix beside s07 (inner) and s09 (left outer)."""
    from ..streaming.ops import full_join_within
    ev = load_table(spark, sf_dir, "events")
    out = full_join_within(ev)
    return out.select(
        "id_a", F.col("k").alias("user_id"),
        F.unix_timestamp("ts_a").alias("ts_a_sec"),
        "id_b", F.unix_timestamp("ts_b").alias("ts_b_sec"))


@query(
    "s22_incremental_scd1",
    oracle="""
    SELECT user_id, event_type AS last_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS last_cents,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_id
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def s22_incremental_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-1 current-state dimension maintained over 3 real
    micro-batches (streaming.ops.incremental_scd1; the s12/s20
    discipline): each foreachBatch reduces its batch to one
    argMax-(ts, event_id) row per user and struct-MAX-merges into the
    persisted state — which must equal the oracle's one-shot window
    argMax no matter how the log was chunked (merge associative +
    idempotent).  The keep-only-latest counterpart of s10's SCD2
    version build."""
    import os
    import shutil
    import tempfile
    from ..streaming.ops import incremental_scd1, read_rollup
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="s22_scd1_")
    try:
        chunks = os.path.join(work, "chunks")
        ev.repartition(3).write.parquet(chunks)
        state = os.path.join(work, "state")
        incremental_scd1(spark, chunks, state,
                         os.path.join(work, "ckpt"),
                         max_files_per_trigger=1)
        out = (read_rollup(spark, state)
               .select("user_id",
                       F.col("event_type").alias("last_type"),
                       F.col("cents").alias("last_cents"),
                       F.unix_timestamp("ts").alias("ts_sec"),
                       "event_id")
               .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out
