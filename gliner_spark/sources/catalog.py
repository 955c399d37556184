"""Table IO: Iceberg when available, parquet otherwise — one code path.

The north rule targets Iceberg tables. This sandbox has no Iceberg runtime
jar on the classpath, so `iceberg_available()` detects at session build and
the writer transparently falls back to partitioned parquet under a
directory catalog; the LOGICAL layout (partition spec, snapshot-style
overwrite, stable table names) is identical, and the lineage table
(sinks.py) plays the role of snapshot ids for resume. On a real cluster
with `spark.sql.catalog.*` configured, the same calls hit Iceberg
`writeTo(...).createOrReplace()` with `bucket(conv_id)` partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    out_dir: str,
    name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write a named table; returns its path (or identifier)."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in out_dir:
        writer = df.writeTo(f"{out_dir}.{name}")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return f"{out_dir}.{name}"
    path = os.path.join(out_dir, name)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and sorted) on the join key — the
    co-located-join layout for repeated large⋈large joins.

    Two tables bucketed identically on the same key join WITHOUT an
    Exchange on either side (Spark reads each bucket pair directly), which
    at 10^12 rows removes the dominant shuffle from e.g.
    entities ⋈ triples ⋈ transcripts pipelines that all key on conv_id.
    The Iceberg equivalent is a `bucket(N, conv_id)` partition transform;
    this is the portable parquet-table form (metastore-registered, so the
    bucketing metadata survives and the reader can exploit it).
    """
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    if iceberg_available(spark) and "/" not in out_dir:
        return spark.read.table(f"{out_dir}.{name}")
    return spark.read.parquet(os.path.join(out_dir, name))


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 8,
) -> DataFrame:
    """Append `_zkey`: the Morton/Z-order interleave of each column's
    `bits`-bit rank bucket — the multi-column data-skipping layout key
    (Delta OPTIMIZE ZORDER BY, Iceberg sort orders). Sorting files by
    one column makes its min/max footer ranges narrow but leaves every
    OTHER column's ranges full-width; sorting by the Z-curve makes
    ALL participating columns' per-file ranges narrow simultaneously,
    so predicate-pushdown row-group pruning works on any of them.

    Buckets come from `ntile(2^bits)` per column (rank-based, so skew
    and outliers cannot stretch a bucket) — one window per column over
    its natural sort; the interleave itself is a pure bit expression.
    """
    if not cols or len(cols) > 4:
        raise ValueError("1..4 z-order columns supported")
    from pyspark.sql import Window as _W

    n = 1 << bits
    out = df
    for i, c in enumerate(cols):
        out = out.withColumn(
            f"_zb{i}",
            (F.ntile(n).over(_W.orderBy(F.col(c))) - 1).cast("long"),
        )
    m = len(cols)
    # interleave bit b of column i at position b*m + i
    parts = []
    for i in range(m):
        expr = F.lit(0).cast("long")
        for b in range(bits):
            expr = expr + (
                F.shiftleft(
                    F.shiftright(F.col(f"_zb{i}"), b) % 2, b * m + i
                )
            )
        parts.append(expr)
    zkey = parts[0]
    for p in parts[1:]:
        zkey = zkey + p
    return out.withColumn("_zkey", zkey).drop(
        *[f"_zb{i}" for i in range(m)]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write `df` as `n_files` parquet files range-partitioned and
    sorted along the Z-curve of `cols`: every file covers a compact
    Z-range, so its parquet footer min/max for EACH participating
    column is narrow and a selective predicate on any of them prunes
    most files before reading a row. The `_zkey` column is dropped
    from the output — it is a layout device, not data.

    Note the ntile windows make the KEY assignment a global sort of
    (col) pairs per column — the same cost class as the final
    range-partitioned write itself (a layout-optimization job is
    expected to be sort-bound; it runs once per table, not per
    query)."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(int(n_files), F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
