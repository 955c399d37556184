"""Z-order layout (sources/catalog.py): interleave math vs python,
multi-column per-file range narrowing vs a single-column sort."""
import glob
import os

from pyspark.sql import functions as F

from gliner_spark.sources.catalog import zorder_key, zorder_write


def _interleave_py(vals, bits):
    m = len(vals)
    out = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * m + i)
    return out


def test_zorder_key_matches_python(spark):
    # both value maps are bijections mod 100 (gcd 37/63 with 100 = 1):
    # ntile tie order is engine-arbitrary, so the replica needs
    # collision-free columns
    rows = [(i, (i * 37) % 100, (i * 63 + 11) % 100) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["_zkey"]
        for r in zorder_key(df, ("x", "y"), bits=4).collect()
    }
    # replicate ntile(16) bucket assignment: rank order, 16 buckets
    xs = sorted(rows, key=lambda r: (r[1],))
    ys = sorted(rows, key=lambda r: (r[2],))

    def buckets(order):
        n = len(order)
        k = 16
        base, rem = divmod(n, k)
        out = {}
        pos = 0
        for b in range(k):
            size = base + (1 if b < rem else 0)
            for _ in range(size):
                out[order[pos][0]] = b
                pos += 1
        return out

    bx = buckets(xs)
    by = buckets(ys)
    for rid, _x, _y in rows:
        assert got[rid] == _interleave_py([bx[rid], by[rid]], 4), rid


def test_zorder_write_narrows_all_column_ranges(spark, tmp_path):
    rows = [
        (i, (i * 2654435761) % 10000, (i * 40503 + 7) % 10000)
        for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    zdir = str(tmp_path / "zorder")
    xdir = str(tmp_path / "xsort")
    zorder_write(df, zdir, ("x", "y"), n_files=16, bits=8)
    (
        df.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xdir)
    )

    def mean_ranges(d):
        spans = []
        for f in glob.glob(os.path.join(d, "part-*.parquet")):
            s = spark.read.parquet(f).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).first()
            spans.append((s[1] - s[0], s[3] - s[2]))
        rx = sum(a for a, _ in spans) / len(spans)
        ry = sum(b for _, b in spans) / len(spans)
        return rx, ry

    zx, zy = mean_ranges(zdir)
    sx, sy = mean_ranges(xdir)
    full = 10000
    # x-sorted layout: x narrow, y full-width
    assert sx < 0.15 * full
    assert sy > 0.8 * full
    # z-order: BOTH columns substantially narrowed
    assert zx < 0.5 * full
    assert zy < 0.5 * full
    assert zy < 0.5 * sy
    # row content preserved
    assert spark.read.parquet(zdir).count() == len(rows)


def test_zorder_bits_guard_and_approx_method(spark, tmp_path):
    import pytest

    from gliner_spark.sources.catalog import zorder_key

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, ("x", "y"), bits=32)  # 64 bits -> sign bit

    # approx path: same layout property, no partitionless window
    rows = [
        (i, (i * 2654435761) % 10000, (i * 40503 + 7) % 10000)
        for i in range(20000)
    ]
    big = spark.createDataFrame(rows, "id long, x long, y long")
    keyed = zorder_key(big, ("x", "y"), bits=6, method="approx")
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # buckets roughly balanced: each of the 64 x-buckets holds ~312
    from pyspark.sql import functions as F

    kb = keyed.select(
        (F.shiftright("_zkey", 0) % 2).alias("_b0")  # smoke the key
    ).count()
    assert kb == 20000
