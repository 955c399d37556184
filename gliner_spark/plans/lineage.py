"""Checkpoint-resume via a lineage table + per-partition metrics.

The reference has no resumability (SURVEY §2.10); the north rule requires
"checkpoint-resumable with per-partition lineage and metrics tables". The
mechanism, batch-idempotent rather than Structured-Streaming state:

 * every pipeline stage writes its output table ATOMICALLY (parquet
   overwrite / Iceberg replace), then appends one lineage row
   (stage, fingerprint, n_rows, n_files, wall_s, completed_at);
 * the fingerprint hashes the stage name + config + upstream fingerprints,
   so any input/config change invalidates exactly the downstream suffix of
   the DAG — the same contract as Iceberg snapshot-id based incremental
   jobs, emulated portably;
 * on rerun, a stage whose (name, fingerprint) already has a COMPLETE
   lineage row is skipped and its persisted output is read back — an
   anti-join of the plan against the lineage table, done driver-side
   because the lineage table is tiny;
 * per-partition METRICS rows (stage, partition_id, n_rows) are captured
   from the stage output with spark_partition_id() — the observability
   hook the north rule asks for, and the skew diagnostic for free.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_partitions", T.IntegerType(), False),
        T.StructField("wall_s", T.DoubleType(), False),
        T.StructField("completed_at", T.TimestampType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)


def fingerprint(stage: str, *parts: object) -> str:
    blob = json.dumps([stage, *[repr(p) for p in parts]], sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class StageRunner:
    """Runs named stages with skip-if-complete resume semantics."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        self.lineage_path = os.path.join(out_dir, "_lineage")
        self.metrics_path = os.path.join(out_dir, "_metrics")

    # ------------------------------------------------------------- lineage
    def _completed(self, stage: str, fp: str) -> bool:
        if not os.path.exists(self.lineage_path):
            return False
        rows = (
            self.spark.read.schema(LINEAGE_SCHEMA)
            .parquet(self.lineage_path)
            .where(
                (F.col("stage") == stage)
                & (F.col("fingerprint") == fp)
                & (F.col("status") == "complete")
            )
            .limit(1)
            .count()
        )
        return rows > 0

    def _append_lineage(self, row: Row) -> None:
        self.spark.createDataFrame([row], LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.lineage_path)

    def _append_metrics(self, stage: str, fp: str, out: DataFrame) -> None:
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(
                F.lit(stage).alias("stage"),
                F.lit(fp).alias("fingerprint"),
                F.col("partition_id").cast("int"),
                F.col("n_rows").cast("long"),
            )
        )
        per_part.coalesce(1).write.mode("append").parquet(self.metrics_path)

    # --------------------------------------------------------------- stages
    def run_stage(
        self,
        stage: str,
        fp: str,
        produce,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """produce: () -> DataFrame. Writes out_dir/<stage> unless a
        complete lineage row for (stage, fp) already exists, in which case
        the persisted output is read back untouched (resume)."""
        import datetime

        path = os.path.join(self.out_dir, stage)
        # the stage path is OVERWRITTEN per run while lineage rows are
        # append-only, so a complete lineage row alone can point at data a
        # LATER run with a different config wrote. The marker file pins
        # which fingerprint the bytes on disk actually belong to; resume
        # only when both agree (else recompute — correct, just slower).
        marker = os.path.join(path, "_FINGERPRINT")
        if self._completed(stage, fp) and os.path.exists(path):
            try:
                with open(marker) as fh:
                    on_disk_fp = fh.read().strip()
            except OSError:
                on_disk_fp = None
            if on_disk_fp == fp:
                return self.spark.read.parquet(path)

        t0 = time.time()
        df = produce()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        with open(marker, "w") as fh:
            fh.write(fp)
        out = self.spark.read.parquet(path)
        n_rows = out.count()
        n_parts = out.rdd.getNumPartitions()
        self._append_metrics(stage, fp, out)
        self._append_lineage(
            Row(
                stage=stage,
                fingerprint=fp,
                status="complete",
                n_rows=n_rows,
                n_partitions=n_parts,
                wall_s=time.time() - t0,
                completed_at=datetime.datetime.now(),
            )
        )
        return out

    def lineage(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_path)

    def metrics(self) -> DataFrame:
        return self.spark.read.schema(METRICS_SCHEMA).parquet(self.metrics_path)
