"""Temporal operators Spark lacks natively: as-of join and
multi-granularity time rollups (the 'hypertable' surface).

As-of join is the canonical time-series operator (match each left row to
the LATEST right row at-or-before it, per key).  Spark has no ASOF join;
the naive formulation (inequality join + argmax) is a quadratic
per-key cross product.  This implementation uses the union-merge trick:

    tag both sides → union → one window sorted by (ts, side) →
    last non-null right value carried forward → keep left rows

— a single shuffle on the key, linear in input size, no UDF, and the
window state is one row.  That is the shape that survives 100 TB of
ticks joined to quotes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, key: str, ts: str,
               right_cols: list[str] | None = None,
               tolerance_seconds: float | None = None) -> DataFrame:
    """For each left row: values from the latest right row with
    right.ts <= left.ts and matching key (ties include the right row).

    right_cols: columns carried from the right side (default: all except
    key/ts).  tolerance_seconds: matches older than this are nulled (the
    ASOF tolerance clause).
    Output: all left columns + right_cols (+ `matched_ts`).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts)]
    lcols = left.columns
    # loud collision guard: a carried right column sharing a left name
    # would emit two identical-named output columns and break every
    # downstream reference with AMBIGUOUS_REFERENCE — at the first
    # select, not here.  (Same-schema inputs hit this by DEFAULT via
    # the all-but-key/ts right_cols default.)
    clash = [c for c in right_cols if c in lcols]
    if clash:
        raise ValueError(
            f"as_of_join: right_cols {clash} collide with left columns; "
            f"alias the right side first (e.g. "
            f"right.withColumnRenamed('{clash[0]}', 'right_{clash[0]}'))")
    # NULL keys never match (SQL ASOF semantics, and the s05 oracle's
    # ON equality): Window.partitionBy would otherwise group NULL-key
    # left rows WITH NULL-key right rows and carry matches between
    # them.  NULL-key left rows still emit — with NULL legs.
    null_left = None
    if any(f.name == key and f.nullable for f in left.schema.fields):
        null_left = left.filter(F.col(key).isNull())
        left = left.filter(F.col(key).isNotNull())
    right = right.filter(F.col(key).isNotNull())

    # Carry ALL right columns + the right ts as ONE struct so every carried
    # value (and matched_ts) comes from the same right row — per-column
    # last(ignorenulls) could stitch values from different rows when a
    # right row holds NULL in one column.
    #
    # Tiebreaking: when several right rows share (key, ts), the window
    # orders them by a SECOND struct `__tb` holding only the ORDERABLE
    # right columns (maps — and arrays/structs containing maps — are not
    # orderable in Spark and would fail analysis if sorted).  last() then
    # deterministically picks the row with the max orderable projection;
    # rows identical in every orderable column but differing in a map
    # column remain engine-order ties.  (Determinism note: round 1 broke
    # ties per-column via last(ignorenulls); this struct form can pick a
    # different — but now stable — winner for (key, ts) ties.)
    rv = F.struct(F.col(ts).alias("__mts"),
                  *[F.col(c) for c in right_cols]).alias("__rv")
    rv_type = right.select(rv).schema[0].dataType.simpleString()

    def _orderable(dt) -> bool:
        from pyspark.sql import types as T
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    tb_cols = [c for c in right_cols if _orderable(rtypes[c])]
    tb = F.struct(F.col(ts).alias("__mts"),
                  *[F.col(c) for c in tb_cols]).alias("__tb")
    tb_type = right.select(tb).schema[0].dataType.simpleString()

    l = left.select(*lcols,
                    F.lit(None).cast(rv_type).alias("__rv"),
                    F.lit(None).cast(tb_type).alias("__tb"),
                    F.lit(1).alias("__side"))
    ltypes = dict(left.dtypes)
    r = right.select(
        *[F.col(c).alias(c) if c in (key, ts)
          else F.lit(None).cast(ltypes[c]).alias(c)
          for c in lcols],
        rv, tb, F.lit(0).alias("__side"))
    unioned = l.unionByName(r)

    # right rows sort before left rows at equal ts (__side 0 < 1) so ties
    # are inclusive; among right ties the orderable struct orders them
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts).asc(), F.col("__side").asc(),
                  F.col("__tb").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last("__rv", ignorenulls=True).over(w).alias("__c")

    out = (unioned.select(*lcols, F.col("__side"), carried)
           .filter(F.col("__side") == 1))
    if tolerance_seconds is not None:
        # sub-second exact: compare raw epoch DOUBLES — unix_timestamp
        # truncates to whole seconds, which mis-decides any fractional
        # tolerance in both directions on µs-precision event times
        in_tol = (F.col(ts).cast("double")
                  - F.col("__c.__mts").cast("double")
                  <= tolerance_seconds)
        out = out.select(
            *lcols,
            F.when(in_tol, F.col("__c.__mts")).alias("matched_ts"),
            *[F.when(in_tol, F.col(f"__c.{c}")).alias(c)
              for c in right_cols])
    else:
        out = out.select(*lcols, F.col("__c.__mts").alias("matched_ts"),
                         *[F.col(f"__c.{c}").alias(c) for c in right_cols])
    if null_left is not None:
        nulls = null_left.select(
            *lcols,
            F.lit(None).cast(dict(out.dtypes)["matched_ts"])
            .alias("matched_ts"),
            *[F.lit(None).cast(rtypes[c].simpleString()).alias(c)
              for c in right_cols])
        out = out.unionByName(nulls)
    return out


def time_rollup(df: DataFrame, ts: str, grains: dict[str, str],
                group_extra: list[str], aggs: list) -> DataFrame:
    """Multi-granularity time rollup ('continuous aggregate' /
    hypertable shape): one pass producing every grain via grouping sets
    over precomputed bucket columns.  grains: output_col -> window width
    (e.g. {"h": "1 hour", "d": "1 day"}).  Coarser grains come from the
    SAME scan — no per-grain re-read.

    Each grouping set is ONE grain column (+ extras): a grain-i row
    aggregates at grain-i granularity with the other grain columns
    NULL.  (The original cumulative-PREFIX sets were a bug this round's
    review caught: grouping by (h, d) is still HOURLY — every aligned
    hour determines its day — so the 'daily' rows were hourly
    aggregates duplicated and the coarse grain never materialized; the
    s06 oracle mirrored the same mistake, which is why parity hid it.)

    The temp view is per-call unique and dropped after plan
    construction, so concurrent rollups on one session can't resolve
    against each other's input."""
    import uuid

    out = df
    grain_cols = []
    for col_name, width in grains.items():
        out = out.withColumn(
            col_name, F.unix_timestamp(F.window(ts, width)["start"]))
        grain_cols.append(col_name)
    sets = ", ".join(
        f"({', '.join([g] + group_extra)})" for g in grain_cols)
    view = f"__rollup_in_{uuid.uuid4().hex[:12]}"
    out.createOrReplaceTempView(view)
    agg_sql = ", ".join(aggs)
    grain_sql = ", ".join(grain_cols + group_extra)
    try:
        return out.sparkSession.sql(
            f"SELECT {grain_sql}, {agg_sql} FROM {view} "
            f"GROUP BY GROUPING SETS ({sets})")
    finally:
        out.sparkSession.catalog.dropTempView(view)


def delta_sum(df: DataFrame, key: str, ts: str, value: str,
              order_extra: str | None = None) -> DataFrame:
    """ClickHouse deltaSum / runningDifference analog, made bit-exact:
    per key, order by time and sum only the POSITIVE differences
    between consecutive values (monotone-counter increase extraction —
    the idiom for metrics that reset).

    Values are quantized to cents (floor(v*100 + 0.5), the s13
    discipline) BEFORE differencing, so every diff and the sum are
    exact integers — no float summation order on either engine.

    Scale shape: one key shuffle + one window pass + one aggregate;
    no self-join."""
    order = [ts] + ([order_extra] if order_extra else [])
    w = Window.partitionBy(key).orderBy(*order)
    cents = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("long")
    d = cents - F.lag(cents).over(w)
    inc = F.when(d > 0, d).otherwise(F.lit(0))
    return (df.withColumn("__d", d).withColumn("__inc", inc)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.col("__d") > 0, 1).otherwise(0))
                  .cast("long").alias("n_increases"),
                 F.sum("__inc").cast("long").alias("delta_sum_cents")))


def gap_fill_locf(df: DataFrame, key: str, ts: str, value: str,
                  width_sec: int = 600) -> DataFrame:
    """ClickHouse ``ORDER BY ... WITH FILL`` + ``INTERPOLATE`` analog:
    per key, bucket events to `width_sec` windows, then emit EVERY
    bucket between that key's first and last — observed buckets carry
    their aggregate, gap buckets carry cnt=0 and the last-observed
    value carried forward (LOCF).

    Spark shape: aggregate → per-key min/max → one `sequence()` +
    explode generates the dense time axis (rows ∝ span/width per key,
    never a cross join) → left join observations back → one window
    pass with `last(ignorenulls)` for the carry-forward.  Two key
    shuffles total; the dense axis is generated, not scanned.

    Sum is quantized to cents before LOCF so the carried value is an
    exact integer on both engines.

    Contract note (r7 review): a bucket whose events ALL carry NULL
    value has is_gap=false (events were observed) but its own
    sum_cents is NULL, so filled_sum_cents still carries the previous
    bucket's sum — is_gap marks MISSING BUCKETS, not missing values;
    consumers needing 'this bucket's own sum' should read the raw
    aggregate, not the LOCF column."""
    bucket = (F.unix_timestamp(ts) - F.unix_timestamp(ts) % width_sec)
    obs = (df.select(F.col(key).alias("k"), bucket.alias("b"),
                     F.floor(F.col(value) * 100 + F.lit(0.5))
                     .cast("long").alias("cents"))
           .groupBy("k", "b")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.sum("cents").alias("sum_cents")))
    axis = (obs.groupBy("k").agg(F.min("b").alias("lo"),
                                 F.max("b").alias("hi"))
            .select("k", F.explode(F.sequence(
                F.col("lo"), F.col("hi"), F.lit(width_sec))).alias("b")))
    w = (Window.partitionBy("k").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (axis.join(obs, ["k", "b"], "left")
            .select("k", "b",
                    F.coalesce("cnt", F.lit(0)).alias("cnt"),
                    (F.col("cnt").isNull()).alias("is_gap"),
                    F.last("sum_cents", ignorenulls=True).over(w)
                    .alias("filled_sum_cents")))


def lttb_downsample(df: DataFrame, key: str, ts: str, value: str,
                    id_col: str, width_sec: int = 600) -> DataFrame:
    """Largest-Triangle-Three-Buckets time-series downsampling
    (Steinarsson 2013; ClickHouse largestTriangleThreeBuckets), in the
    PARALLEL anchor variant: one representative point per `width_sec`
    bucket per key — the point maximizing the triangle area against
    the NEIGHBOR BUCKETS' average anchors.  Classic LTTB anchors on
    the previously SELECTED point, a sequential dependency; anchoring
    on the previous bucket's average instead makes every bucket
    independent (one window pass), the standard trade for distributed
    execution.  First/last observed buckets keep their first/last
    point (LTTB's endpoint rule).

    Exactness: timestamps as epoch seconds, values as cents, anchors
    as (bucket midpoint, floor(mean cents)) — the area comparison
    |(Px−Nx)(y−Py) − (Px−x)(Ny−Py)| is pure int64 arithmetic, so the
    argmax is bit-identical across engines (ties → earliest ts, then
    id).  Scale shape: one (key,bucket) aggregate, one per-key window
    over BUCKETS (rows ∝ span/width), one join back to points, one
    per-bucket window."""
    half = width_sec // 2
    t = F.unix_timestamp(ts)
    pts = df.select(F.col(key).alias("k"), t.alias("t"),
                    F.floor(F.col(value) * 100 + F.lit(0.5))
                    .cast("long").alias("c"),
                    F.col(id_col).alias("tb"),
                    (t - t % width_sec).alias("b"))
    bs = (pts.groupBy("k", "b")
          .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("sc")))
    wb = Window.partitionBy("k").orderBy("b")
    anchors = bs.select(
        "k", "b",
        (F.lag("b").over(wb) + half).alias("px"),
        F.floor(F.lag("sc").over(wb) / F.lag("n").over(wb))
         .cast("long").alias("py"),
        (F.lead("b").over(wb) + half).alias("nx"),
        F.floor(F.lead("sc").over(wb) / F.lead("n").over(wb))
         .cast("long").alias("ny"))
    j = pts.join(anchors, ["k", "b"])
    area = F.abs((F.col("px") - F.col("nx")) * (F.col("c") - F.col("py"))
                 - (F.col("px") - F.col("t"))
                 * (F.col("ny") - F.col("py")))
    rule = (F.when(F.col("px").isNull(), F.lit("first"))
            .when(F.col("nx").isNull(), F.lit("last"))
            .otherwise(F.lit("area")))
    scored = j.select("k", "b", "t", "c", "tb", rule.alias("rule"),
                      F.when(rule == "area", area).otherwise(F.lit(0))
                      .alias("area"))
    wp = Window.partitionBy("k", "b").orderBy(
        F.when(F.col("rule") == "last", -F.col("t")).otherwise(
            F.when(F.col("rule") == "area", -F.col("area"))
            .otherwise(F.lit(0))),
        F.when(F.col("rule") == "last", -F.col("tb"))
         .otherwise(F.col("t")),
        F.when(F.col("rule") == "last", F.lit(0)).otherwise(F.col("tb")))
    return (scored.withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select("k", "b", F.col("t").alias("ts_sec"),
                    F.col("c").alias("cents"), "rule"))


def _letter_seq(df: DataFrame, key: str, ts: str, tie: str,
                type_col: str, letters: dict[str, str]) -> DataFrame:
    """Shared sequence-string builder for sequence_match/sequence_count:
    per key, the event stream rendered as a letter string in (ts, tie)
    order via ONE collect_list aggregate; unmapped types render '?' so
    patterns can't accidentally match them.  Returns (key, seq)."""
    letter = F.lit("?")
    for t, ch in sorted(letters.items()):
        letter = F.when(F.col(type_col) == t, F.lit(ch)).otherwise(letter)
    ev = df.select(F.col(key), F.col(ts).alias("_ts"),
                   F.col(tie).alias("_tie"), letter.alias("_ch"))
    seq = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(
                F.struct(F.col("_ts"), F.col("_tie"), F.col("_ch")))),
            lambda s: s._ch), "")
    return ev.groupBy(key).agg(seq.alias("seq"))


def sequence_match(df: DataFrame, key: str, ts: str, tie: str,
                   type_col: str, letters: dict[str, str],
                   patterns: dict[str, str]) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t>..)(?2)...')`` analog
    (reference users drive funnel/event-order checks through it): per
    key, the event-type stream is rendered as a compact letter string
    in (ts, tie) order and each named pattern becomes one regex match
    over that string — arbitrary event-order conditions (gaps allowed
    via ``.*``) without self-joins.

    Scale shape: ONE hash aggregate (collect_list of (ts, tie,
    letter) structs), per-key sort inside `sort_array`, then pure
    codegen string ops — state is bounded by per-key event count
    (exactly ClickHouse's sequenceMatch memory model), never by corpus
    size; no shuffle beyond the one groupBy.  Unmapped event types
    render as '?' so patterns can't accidentally match them.  Regexes
    must stick to the Java∩RE2 common core ('.', '*', literals) so a
    DuckDB oracle replays them byte-identically."""
    out = _letter_seq(df, key, ts, tie, type_col, letters)
    cols = [F.col(key), F.length("seq").cast("long").alias("seq_len")]
    for name, rx in sorted(patterns.items()):
        cols.append(F.col("seq").rlike(rx).alias(name))
    return out.select(*cols)


def sequence_count(df: DataFrame, key: str, ts: str, tie: str,
                   type_col: str, letters: dict[str, str],
                   patterns: dict[str, str]) -> DataFrame:
    """ClickHouse ``sequenceCount`` analog: like sequence_match, but
    each named pattern yields the COUNT of non-overlapping matches in
    the per-key letter string (greedy left-to-right — the semantics
    Java's Matcher.find loop and RE2's findall share, so a DuckDB
    oracle counts identically).  Same scale shape as sequence_match:
    one aggregate (shared _letter_seq builder), codegen regex, no
    self-joins."""
    out = _letter_seq(df, key, ts, tie, type_col, letters)
    cols = [F.col(key), F.length("seq").cast("long").alias("seq_len")]
    for name, rx in sorted(patterns.items()):
        cols.append(F.regexp_count("seq", F.lit(rx)).cast("long")
                    .alias(name))
    return out.select(*cols)
