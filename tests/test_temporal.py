"""Temporal operators: as-of join (vs brute-force oracle, incl. equal-ts
and tolerance semantics) and multi-level time rollup."""

import datetime

from pyspark.sql import functions as F

from gliner_spark.operators.temporal import as_of_join, time_rollup


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_as_of_join_matches_bruteforce(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:10")),
            (2, 10, _ts("2024-01-01 00:01:00")),
            (3, 10, _ts("2024-01-01 00:00:01")),  # before any right row
            (4, 11, _ts("2024-01-01 00:05:00")),
            (5, 12, _ts("2024-01-01 00:00:30")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:05"), 1.0),
            (10, _ts("2024-01-01 00:00:10"), 2.0),  # EQUAL ts → matches id 1
            (10, _ts("2024-01-01 00:00:59"), 3.0),
            (11, _ts("2024-01-01 00:00:00"), 4.0),
        ],
        "user_id long, ts timestamp, v double",
    )
    got = {
        r.event_id: (r.v, r.matched_ts)
        for r in as_of_join(left, right, "user_id", "ts", ("v",)).collect()
    }
    assert got[1] == (2.0, _ts("2024-01-01 00:00:10"))  # ≤, not <
    assert got[2] == (3.0, _ts("2024-01-01 00:00:59"))
    assert got[3] == (None, None)  # left row before any right row
    assert got[4] == (4.0, _ts("2024-01-01 00:00:00"))
    assert got[5] == (None, None)  # unmatched key survives (left join)
    assert len(got) == 5


def test_as_of_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 01:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:00"), 7.0)],
        "user_id long, ts timestamp, v double",
    )
    loose = as_of_join(left, right, "user_id", "ts", ("v",)).collect()[0]
    assert loose.v == 7.0
    tight = as_of_join(
        left, right, "user_id", "ts", ("v",), tolerance_us=60_000_000
    ).collect()[0]
    assert tight.v is None and tight.matched_ts is None  # match too old


def test_as_of_join_one_shuffle(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:10"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:05"), 1.0)],
        "user_id long, ts timestamp, v double",
    )
    plan = (
        as_of_join(left, right, "user_id", "ts", ("v",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union-sort-fill: exactly one exchange (the window partitioning),
    # and no join operator at all
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_time_rollup_levels(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:10:00"), 1.0),
            ("a", _ts("2024-01-01 00:50:00"), 2.0),
            ("a", _ts("2024-01-01 01:10:00"), 4.0),
            ("b", _ts("2024-01-01 00:20:00"), 8.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = time_rollup(
        df, ("k",), "ts", "hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
    ).collect()
    rows = {(r.k, r.bucket): (r.n, r.s) for r in out}
    h0, h1 = _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")
    assert rows[("a", h0)] == (2, 3.0)
    assert rows[("a", h1)] == (1, 4.0)
    assert rows[("b", h0)] == (1, 8.0)
    assert rows[("a", None)] == (3, 7.0)   # per-key subtotal
    assert rows[("b", None)] == (1, 8.0)
    assert rows[(None, None)] == (4, 15.0)  # grand total
    assert len(rows) == 6


def test_as_of_join_fuzz_vs_duckdb_asof(spark):
    """Property fuzz (VERDICT r02 #9): randomized keys (incl. NULLs),
    coarse timestamps that force duplicates, and tolerances — non-null
    keys compared against DuckDB's native ASOF LEFT JOIN; NULL-keyed
    rows against a python brute force with the DOCUMENTED null-groups-
    match semantics (window partitioning groups NULLs; SQL ASOF would
    not). Right side deduped on (key, ts) first — the caller contract
    for deterministic ties."""
    import random

    import duckdb
    import pandas as pd

    base = _ts("2024-01-01 00:00:00")
    rng = random.Random(17)
    for trial, tol_us in enumerate([None, 120_000_000, 1]):
        keys = ["a", "b", "c", None]
        left_rows = [
            (
                i,
                rng.choice(keys),
                base + datetime.timedelta(seconds=60 * rng.randrange(0, 40)),
            )
            for i in range(120)
        ]
        right_raw = [
            (
                rng.choice(keys),
                base + datetime.timedelta(seconds=60 * rng.randrange(0, 40)),
                float(rng.randrange(0, 1000)),
            )
            for _ in range(80)
        ]
        # caller-contract dedup: max value per (key, ts)
        dedup: dict = {}
        for k, ts, v in right_raw:
            key = (k, ts)
            dedup[key] = max(dedup.get(key, float("-inf")), v)
        right_rows = [(k, ts, v) for (k, ts), v in dedup.items()]

        left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp")
        right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
        got = {
            r.id: (r.v, r.matched_ts)
            for r in as_of_join(
                left, right, "k", "ts", ("v",), tolerance_us=tol_us
            ).collect()
        }
        assert len(got) == len(left_rows)

        # DuckDB oracle over the non-null-key rows
        con = duckdb.connect()
        con.register(
            "l", pd.DataFrame(
                [r for r in left_rows if r[1] is not None],
                columns=["id", "k", "ts"],
            )
        )
        con.register(
            "r", pd.DataFrame(
                [r for r in right_rows if r[0] is not None],
                columns=["k", "ts", "v"],
            )
        )
        oracle = {
            row[0]: (row[1], row[2])
            for row in con.execute(
                """
                select l.id, r.v, r.ts as mts
                from l asof left join r
                  on l.k = r.k and l.ts >= r.ts
                """
            ).fetchall()
        }
        for lid, lk, lts in left_rows:
            if lk is None:
                # documented deviation: NULL keys group together
                cands = [
                    (ts, v) for k, ts, v in right_rows
                    if k is None and ts <= lts
                ]
                exp = max(cands) if cands else None
            else:
                v, mts = oracle[lid]
                exp = (mts, v) if v is not None else None
            if exp is not None and tol_us is not None:
                age = (lts - exp[0]) / datetime.timedelta(microseconds=1)
                if age > tol_us:
                    exp = None
            got_v, got_mts = got[lid]
            if exp is None:
                assert got_v is None and got_mts is None, (trial, lid)
            else:
                assert (got_mts, got_v) == exp, (trial, lid, exp, got[lid])


# ------------------------------------------------------- interval_join


def _rng_pairs(seed=7, n_pts=400, n_iv=120, keys=3, span=10_000):
    import random

    r = random.Random(seed)
    pts = [
        (j, r.randrange(keys), r.randrange(span))
        for j in range(n_pts)
    ]
    ivs = []
    for j in range(n_iv):
        s = r.randrange(span)
        ln = r.choice([0, 1, 5, 50, 500, 3000])
        ivs.append((j, r.randrange(keys), s, s + ln))
    # a few invalid (end < start) intervals that must be dropped
    ivs += [(n_iv + j, r.randrange(keys), 100 + j, 90 + j) for j in range(4)]
    return pts, ivs


def _expected(pts, ivs):
    return sorted(
        (pid, iid)
        for pid, pk, ts in pts
        for iid, ik, s, e in ivs
        if pk == ik and s <= e and s <= ts <= e
    )


def test_interval_join_matches_bruteforce(spark):
    from gliner_spark.operators.temporal import interval_join

    pts, ivs = _rng_pairs()
    p = spark.createDataFrame(pts, "pid long, k long, ts long")
    i = spark.createDataFrame(ivs, "iid long, k long, s long, e long")
    for bucket in (1, 7, 100, 4096, None):
        got = interval_join(
            p, i, "ts", "s", "e", key_cols=("k",),
            value_cols=("iid",), bucket_us=bucket,
        )
        rows = sorted((r["pid"], r["iid"]) for r in got.collect())
        assert rows == _expected(pts, ivs), f"bucket={bucket}"


def test_interval_join_no_keys_and_boundaries(spark):
    from gliner_spark.operators.temporal import interval_join

    p = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 21), (3, 9)], "pid long, ts long"
    )
    i = spark.createDataFrame([(0, 10, 20)], "iid long, s long, e long")
    got = interval_join(
        p, i, "ts", "s", "e", value_cols=("iid", "s", "e"), bucket_us=3
    )
    rows = sorted((r["pid"], r["iid"]) for r in got.collect())
    assert rows == [(0, 0), (1, 0)]  # both bounds inclusive
    assert set(got.columns) == {"pid", "ts", "iid", "s", "e"}


def test_interval_join_timestamp_columns(spark):
    from gliner_spark.operators.temporal import interval_join
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    p = spark.createDataFrame(
        [(j, base + dt.timedelta(seconds=j * 30)) for j in range(10)],
        "pid long, ts timestamp",
    )
    i = spark.createDataFrame(
        [(0, base + dt.timedelta(seconds=45),
          base + dt.timedelta(seconds=150))],
        "iid long, s timestamp, e timestamp",
    )
    got = interval_join(p, i, "ts", "s", "e", value_cols=("iid",))
    assert sorted(r["pid"] for r in got.collect()) == [2, 3, 4, 5]


def test_interval_join_plan_is_equi_join(spark):
    from gliner_spark.operators.temporal import interval_join

    p = spark.range(1000).select(
        F.col("id").alias("pid"), (F.col("id") * 13 % 9973).alias("ts")
    )
    i = spark.range(300).select(
        F.col("id").alias("iid"),
        (F.col("id") * 31 % 9973).alias("s"),
        (F.col("id") * 31 % 9973 + 50).alias("e"),
    )
    got = interval_join(p, i, "ts", "s", "e", value_cols=("iid",),
                        bucket_us=64)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------- coalesce_intervals


def _coalesce_py(rows):
    import collections

    by_key = collections.defaultdict(list)
    for k, s, e in rows:
        if e >= s:
            by_key[k].append((s, e))
    out = []
    for k, ivs in by_key.items():
        ivs.sort()
        cur_s, cur_e, n = None, None, 0
        for s, e in ivs:
            if cur_s is None:
                cur_s, cur_e, n = s, e, 1
            elif s > cur_e:
                out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        if cur_s is not None:
            out.append((k, cur_s, cur_e, n))
    return sorted(out)


def test_coalesce_intervals_matches_python(spark):
    from gliner_spark.operators.temporal import coalesce_intervals

    import random

    r = random.Random(3)
    rows = []
    for i in range(400):
        s = r.randrange(1000)
        rows.append((i % 7, s, s + r.choice([0, 1, 5, 40, 200])))
    rows += [(0, 50, 40), (1, 10, 5)]  # invalid, dropped
    df = spark.createDataFrame(rows, "key long, start long, end long")
    got = sorted(
        (r2["key"], r2["start_us"], r2["end_us"], r2["n_merged"])
        for r2 in coalesce_intervals(df, ("key",), "start", "end").collect()
    )
    assert got == _coalesce_py(rows)


def test_coalesce_touching_and_contained(spark):
    from gliner_spark.operators.temporal import coalesce_intervals

    rows = [
        (0, 0, 10), (0, 10, 20),        # touching -> one island
        (0, 30, 100), (0, 40, 50),      # contained
        (0, 60, 200),                   # overlaps via containment walk
        (0, 300, 301),
    ]
    df = spark.createDataFrame(rows, "key long, start long, end long")
    got = sorted(
        (r["start_us"], r["end_us"], r["n_merged"])
        for r in coalesce_intervals(df, ("key",), "start", "end").collect()
    )
    assert got == [(0, 20, 2), (30, 200, 3), (300, 301, 1)]
