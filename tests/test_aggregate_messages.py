"""aggregate_messages (GraphFrames-parity triplet messaging): degree
counting, pagerank's contribution step, and one LPA round re-derived
through the generic primitive and checked against the dedicated
operators / hand math."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gliner_spark.operators.graph import (
    aggregate_messages,
    label_propagation,
)

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]


def _edges(spark):
    return spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in EDGES]
    )


def test_degrees_via_messages(spark):
    # in+out degree: send 1 both ways, sum per vertex
    got = {
        r.id: r.deg
        for r in aggregate_messages(
            _edges(spark),
            send_to_dst=F.lit(1),
            send_to_src=F.lit(1),
            agg=F.sum("_msg").alias("deg"),
        ).collect()
    }
    assert got == {0: 3, 1: 2, 2: 4, 3: 1}


def test_pagerank_contribution_step(spark):
    # one power-iteration inflow pass: rank/out_deg pushed along edges
    verts = spark.createDataFrame(
        [Row(id=i, rank=r, deg=d)
         for i, r, d in [(0, 0.4, 2), (1, 0.2, 1), (2, 0.3, 1),
                         (3, 0.1, 1)]]
    )
    got = {
        r.id: r.inflow
        for r in aggregate_messages(
            _edges(spark),
            vertices=verts,
            send_to_dst=F.col("src_rank") / F.col("src_deg"),
            agg=F.sum("_msg").alias("inflow"),
        ).collect()
    }
    assert got[1] == pytest.approx(0.2)            # from 0
    assert got[2] == pytest.approx(0.2 + 0.2 + 0.1)  # 0, 1, 3
    assert got[0] == pytest.approx(0.3)            # from 2


def test_lpa_round_via_messages_matches_operator(spark):
    # one synchronous LPA round re-derived: send the sender's label
    # along the undirected view, take the most frequent (min ties)
    e = _edges(spark)
    ud = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    verts = ud.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    msgs = aggregate_messages(
        ud,
        vertices=verts,
        send_to_dst=F.col("src_label"),
        agg=F.collect_list("_msg").alias("ls"),
    )
    picked = {
        r.id: min(
            ((-(r.ls.count(v)), v) for v in set(r.ls))
        )[1]
        for r in msgs.collect()
    }
    want = {
        r.id: r.label
        for r in label_propagation(e, max_iter=1).collect()
    }
    assert picked == want


def test_requires_message_and_agg(spark):
    with pytest.raises(ValueError):
        aggregate_messages(_edges(spark), agg=F.sum("_msg"))
    with pytest.raises(ValueError):
        aggregate_messages(_edges(spark), send_to_dst=F.lit(1))
