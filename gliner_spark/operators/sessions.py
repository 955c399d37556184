"""Gap-based sessionization over an event stream — the classic windowed
operator a transcript/event pipeline needs (conversation boundaries from
inactivity gaps when conv_id isn't trusted, user sessions over `events`).

Pure window functions: lag → gap indicator → running sum = session index.
Shuffles once on the partition key; at 10^12 events the key (user/conv)
is the natural partitioning and AQE splits skewed users. The session id
is deterministic: xxhash64(key, session_index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ input columns + (session_idx, session_id).

    A new session starts when the gap to the previous event of the same
    key exceeds `gap_seconds`. `order_cols` break ordering ties after the
    timestamp (pass the event id for full determinism)."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    out = events.withColumn("_new", new_session).withColumn(
        "session_idx",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return out.drop("_new").withColumn(
        "session_id", F.xxhash64(F.col(key_col), F.col("session_idx"))
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session aggregates: bounds, duration, event count."""
    return sessions.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel / sequence match (the ClickHouse `windowFunnel`
    shape): per key, how far through `steps` did the entity progress,
    where step k must occur STRICTLY AFTER the matched step k−1 event
    (the earliest valid chain: each stage greedily takes its earliest
    admissible timestamp — earliest-first is optimal here, so greedy ==
    "did any chain exist") → (key, stage, ts_first, ts_last):
    stage ∈ [0, len(steps)] completed prefix length, ts_first = the
    matched first-step time, ts_last = completion time of the deepest
    matched step (NULL when stage=0).

    ONE shuffle: events pre-filtered to the step types, grouped per
    key into one sorted per-step timestamp array each (map-side
    combining collect_list + array_sort — per-key event counts are
    session-scale, the same boundedness sessionize assumes), then the
    chain walk is a pure array expression: t_k = array_min(filter(
    arr_k, x > t_{k-1})). Keys with no step-0 event report stage 0.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.where(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("_t"),
        us.alias("_us"),
    )
    arrs = [
        F.array_sort(
            F.collect_list(F.when(F.col("_t") == s, F.col("_us")))
        ).alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    g = base.groupBy("key").agg(*arrs)
    t_prev = None
    t_cols = []
    for i in range(len(steps)):
        if t_prev is None:
            # array_min == first element of the sorted array; element_at
            # would THROW on empty arrays under ANSI mode
            expr = F.array_min(F.col(f"_a{i}"))
        else:
            # single-parameter lambda only: pyspark reads a second
            # parameter (even a defaulted one) as the (element, index)
            # HOF variant and passes the array index into it. F.filter
            # consumes the lambda eagerly, so closing over t_prev is
            # safe despite the loop rebinding.
            bound = t_prev
            expr = F.array_min(
                F.filter(F.col(f"_a{i}"), lambda x: x > bound)
            )
        g = g.withColumn(f"_s{i}", expr)
        t_prev = F.col(f"_s{i}")
        t_cols.append(f"_s{i}")
    stage = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in t_cols),
        F.lit(0),
    )
    # the chain breaks at the first missing step: later non-null t_k
    # cannot exist (filter on a NULL bound yields NULL), so stage ==
    # completed prefix length by construction
    last = F.coalesce(*[F.col(c) for c in reversed(t_cols)])
    return g.select(
        F.col("key").alias(key_col),
        stage.cast("int").alias("stage"),
        F.col("_s0").alias("ts_first_us"),
        F.when(stage > 0, last).alias("ts_last_us"),
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
) -> DataFrame:
    """Cohort retention matrix: entities grouped by their FIRST-seen
    period (the cohort), tracked by which later periods they were
    active in → (cohort, period, n_active, n_cohort, retention) —
    the standard activation/churn report over any event feed.

    Three map-side-combining hash aggs and one broadcast-friendly
    join: per-key first period, distinct (key, period) activity,
    per-cohort size, then the (cohort, period) distinct-active count;
    retention = n_active/n_cohort is a ratio of exact ints, bit-stable
    cross-engine. The (key, period) distinct runs FIRST so no later
    stage sees more than one row per key-period."""
    day = F.date_trunc(period, F.col(ts_col).cast("timestamp"))
    act = (
        events.where(F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), day.alias("period"))
        .distinct()
    )
    first = act.groupBy("key").agg(F.min("period").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        act.join(first, "key")
        .groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cohort")
        .select(
            "cohort",
            "period",
            "n_active",
            "n_cohort",
            (
                F.col("n_active").cast("double") / F.col("n_cohort")
            ).alias("retention"),
        )
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """First-order transition matrix over per-key event sequences →
    (from_type, to_type, n, p): how often does `to_type` immediately
    follow `from_type` within the same key's timeline — the user-flow
    /sankey report and the Markov baseline for next-event prediction.
    p = n / Σ_to n (row-normalized), a ratio of exact ints.

    One window shuffle on the key (lead over (ts, order_cols…)) + one
    map-side-combining (from, to) count + a broadcast-sized row-total
    join. Pass the event id in `order_cols` for a fully deterministic
    sequence under timestamp ties."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    seq = events.where(F.col(ts_col).isNotNull()).select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("_tot")).alias("p"),
    )
