"""Temporal operators Spark lacks as built-ins: as-of join and
multi-level time rollup.

as_of_join    enrich each left row with the most recent right row
              (right.ts ≤ left.ts) per key — the classic event-state
              enrichment (latest config before a failure, last heartbeat
              before an error). Spark has no ASOF JOIN; the naive theta
              join (r.ts <= l.ts + max-per-group) is quadratic per key.
              This is the scalable UNION-SORT-FILL formulation: tag both
              sides, union, and window-fill the latest right payload with
              last(ignorenulls) over (key ORDER BY ts, side) — exactly
              ONE shuffle on the key, linear in rows, AQE-skew-splittable.
              DuckDB's native ASOF JOIN is the oracle.

time_rollup   multi-granularity rollup (the hypertable continuous-
              aggregate shape): GROUP BY ROLLUP over (dims…, bucket) —
              Catalyst's native `rollup` produces all grouping-set
              levels in one pass with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    matched_ts_col: str = "matched_ts",
    tolerance_us: int | None = None,
) -> DataFrame:
    """→ left columns + value_cols (latest right values at-or-before the
    left row's timestamp) + matched_ts_col; unmatched rows keep NULLs
    (left-join semantics).

    A right row at EXACTLY the left timestamp matches (≤, not <): the
    union is ordered by (ts, side) with right rows first, so the window
    fill sees them. Equal-timestamp rows within the RIGHT side for one
    key are the caller's ambiguity to resolve (dedup first), same as any
    ASOF implementation.

    `tolerance_us` drops matches older than the given age (the match
    becomes NULL, not the row).

    NULL keys: the window formulation groups NULL keys together, so a
    NULL-keyed left row CAN match a NULL-keyed right row — SQL equi-join
    (and DuckDB ASOF) semantics would not. Filter NULL keys first when
    that distinction matters; the oracle query's key column is
    non-nullable."""
    lcols = left.columns
    payload = F.struct(
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        payload.alias("_rv"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
    )
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(None).cast(
            right.select(payload.alias("s")).schema["s"].dataType
        ).alias("_rv"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        r.unionByName(l)
        .withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    match = F.col("_match")
    if tolerance_us is not None:
        # cast: parquet timestamps may arrive as TIMESTAMP_NTZ, which
        # unix_micros rejects
        age = F.unix_micros(F.col("_ts").cast("timestamp")) - F.unix_micros(
            match.getField("_rts").cast("timestamp")
        )
        match = F.when(age <= tolerance_us, F.col("_match"))
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in lcols]
    out_cols += [match.getField(c).alias(c) for c in value_cols]
    out_cols.append(match.getField("_rts").alias(matched_ts_col))
    return filled.select(*out_cols)


def time_rollup(
    df: DataFrame,
    dims: tuple[str, ...],
    ts_col: str = "ts",
    granularity: str = "hour",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """GROUP BY ROLLUP over (dims…, time bucket): every prefix level in
    one pass — (dim, bucket), (dim), and the grand total — with NULLs
    marking rolled-up columns, exactly the SQL ROLLUP contract. One
    map-side-combining aggregation; no per-level rescans."""
    if aggs is None:
        aggs = [F.count(F.lit(1)).alias("n")]
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
    return df.rollup(*[F.col(d) for d in dims], bucket).agg(*aggs)
