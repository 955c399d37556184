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

interval_join points × intervals on start ≤ ts ≤ end (+ optional
              equality keys). Spark plans a pure range predicate as a
              BroadcastNestedLoopJoin — O(|P|·|I|) and a driver OOM the
              moment neither side broadcasts. This is the bucketized
              formulation: quantize time into fixed-width buckets,
              explode each interval to the buckets it covers, equi-join
              on (keys…, bucket), then apply the exact range filter.
              Each (point, interval) pair meets in EXACTLY one bucket
              (the point's), so no dedup pass is needed. Cost is one
              hash-partitioned equi-join with fan-out Σ(lenᵢ/W + 1) —
              pick W near the median interval length (the default
              measures it with one approx_percentile scalar job).
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


def _us(c: Column, dtype) -> Column:
    """Timestamp-ish column → int64 microseconds (numeric types pass
    through as-is — the join only needs a consistent monotone axis)."""
    name = dtype.typeName()
    if name.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long")


def _bucket_of(us_col: Column, width_us: int) -> Column:
    # floor-division via pmod so pre-epoch (negative) micros still land
    # in the right bucket; the division is exact (numerator is a
    # multiple of width, quotient magnitude ≪ 2^53)
    return (
        (us_col - F.pmod(us_col, F.lit(int(width_us)))) / F.lit(int(width_us))
    ).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    key_cols: tuple[str, ...] = (),
    value_cols: tuple[str, ...] = ("interval_id",),
    bucket_us: int | None = None,
) -> DataFrame:
    """Inner range join: every (point, interval) pair with
    interval.start ≤ point.ts ≤ interval.end (both bounds inclusive)
    and equality on `key_cols` → point columns + `value_cols` carried
    from the matched interval (caller aliases collisions away).

    Intervals with end < start are invalid and dropped (zero-length
    start == end intervals match points at exactly that instant).
    NULL keys/timestamps never match, standard equi-join semantics.

    `bucket_us=None` measures the median interval length with one
    approx_percentile scalar job and uses max(median, 1µs) — points
    then fan out 1×, intervals ~2× on average. Skewed interval-length
    mixes (a few giants over mostly-short intervals) deserve an
    explicit wider bucket: a giant interval explodes to len/W rows.
    """
    pdt = dict(zip(points.schema.names, [f.dataType for f in points.schema]))
    idt = dict(
        zip(intervals.schema.names, [f.dataType for f in intervals.schema])
    )
    su = _us(F.col(start_col), idt[start_col])
    eu = _us(F.col(end_col), idt[end_col])
    pu = _us(F.col(point_ts), pdt[point_ts])

    iv = intervals.where(eu >= su)
    if bucket_us is None:
        row = iv.select(
            F.approx_percentile(eu - su, F.lit(0.5)).alias("m")
        ).first()
        bucket_us = max(int(row["m"] or 0), 1)

    pcols = points.columns
    p = points.where(F.col(point_ts).isNotNull()).select(
        F.struct(*pcols).alias("_prow"),
        *[F.col(c).alias(f"_k_{i}") for i, c in enumerate(key_cols)],
        pu.alias("_pu"),
        _bucket_of(pu, bucket_us).alias("_b"),
    )
    i = iv.select(
        *[F.col(c).alias(f"_k_{i}") for i, c in enumerate(key_cols)],
        su.alias("_su"),
        eu.alias("_eu"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_ival"),
        F.explode(
            F.sequence(_bucket_of(su, bucket_us), _bucket_of(eu, bucket_us))
        ).alias("_b"),
    )
    keys = [f"_k_{i}" for i in range(len(key_cols))] + ["_b"]
    joined = p.join(i, keys, "inner").where(
        (F.col("_pu") >= F.col("_su")) & (F.col("_pu") <= F.col("_eu"))
    )
    out = [F.col(f"_prow.{c}").alias(c) for c in pcols]
    out += [F.col(f"_ival.{c}").alias(c) for c in value_cols]
    return joined.select(*out)


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


def coalesce_intervals(
    intervals: DataFrame,
    key_cols: tuple[str, ...] = ("key",),
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping/touching intervals per key into maximal
    disjoint spans (gaps-and-islands) → key cols + (island, start,
    end, n_merged). The temporal-KG maintenance op: per-evidence
    validity windows collapse into an edge's effective validity
    ranges; also the generic "merge maintenance windows / sessions
    with known bounds" shape. Touching intervals (next.start ==
    prev.end) merge; invalid rows (end < start) are dropped.

    ONE shuffle (window by key ordered by start): island id =
    running count of gap starts, where a gap start is
    start > max(end) over all preceding rows — the running-max
    handles containment (a short interval inside a long one must not
    end the island). Then one hash agg per (key, island).
    """
    idt = dict(
        zip(intervals.schema.names, [f.dataType for f in intervals.schema])
    )
    su = _us(F.col(start_col), idt[start_col])
    eu = _us(F.col(end_col), idt[end_col])
    base = intervals.where(eu >= su).select(
        *[F.col(c) for c in key_cols],
        su.alias("_su"),
        eu.alias("_eu"),
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_su").asc(), F.col("_eu").asc()
    )
    prev_max_end = F.max("_eu").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    gap = F.when(
        prev_max_end.isNull() | (F.col("_su") > prev_max_end), 1
    ).otherwise(0)
    islands = base.withColumn("_g", gap).withColumn(
        "island",
        F.sum("_g").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy(*key_cols, "island").agg(
        F.min("_su").alias("start_us"),
        F.max("_eu").alias("end_us"),
        F.count(F.lit(1)).alias("n_merged"),
    )
