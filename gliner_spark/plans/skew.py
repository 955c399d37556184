"""Explicit skew-handling utilities (north rule: "handles conv_id skew via
salting + AQE skew-join hints and explicit repartitioning").

AQE's skew-join splitting (on in plans/session.py) handles most cases at
runtime; these helpers cover the two places AQE cannot:

 * salted_aggregate — a skewed groupBy (power-law conv_id: one
   conversation with 10^8 turns lands on one reducer). Two-phase: partial
   aggregate on (key, salt) — xxhash64 of a spread column mod S — then
   final aggregate on key. Classic map-side salting; correct for any
   algebraic aggregate (the caller supplies partial + merge expressions).
 * salted_key / explicit repartition — pre-shuffle key decoration for
   joins against a skewed build side where AQE's split is unavailable
   (e.g. a broadcast-unfriendly self-join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_key(key: Column, spread: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) derived from a spread column
    (e.g. turn_idx) — NOT random, so retries/resumes are stable."""
    return F.pmod(F.xxhash64(spread), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    spread_col: str,
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    partial_aggs run per (key, salt); merge_aggs combine the partials per
    key. Example — count + sum over conv_id skewed by conversation length:

        salted_aggregate(
            turns, ["conv_id"], "turn_idx",
            partial_aggs=[F.count(F.lit(1)).alias("n"),
                          F.sum("n_tokens").alias("s")],
            merge_aggs=[F.sum("n").alias("n"), F.sum("s").alias("s")])
    """
    salted = df.withColumn(
        "_salt", salted_key(F.col(key_cols[0]), F.col(spread_col), n_salts)
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)
