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
