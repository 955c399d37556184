"""Similarity search over an embedding column (array<float>).

 knn_bruteforce  exact top-k by cosine: broadcast the (small) query set,
                 one narrow pass over the corpus, per-query top-k via
                 window ranking. The corpus side never shuffles its
                 vectors — only (query_id, vec_id, score) survivor rows
                 reach the rank shuffle.
 knn_ivf         IVF ANN: k-means-trained centroids → every corpus vector
                 assigned to its nearest-centroid Voronoi cell (broadcast
                 centroid literals, native argmin — the same expression
                 k-means assignment uses) → probe only the n_probe closest
                 cells per query. The inverted-file partitioning is exactly
                 a repartition-by-cell; at 100 TB the cell assignment is
                 precomputed/bucketed once and queries touch
                 n_probe/n_cells of the data.

Scores are rounded to 6 decimals before ranking with a vec_id tie-break,
making rankings reproducible across engines (DuckDB oracle) and summation
orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _dot, unit_vector


def _unit(col: str = "embedding") -> Column:
    return unit_vector(col).alias("unit")


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """queries(query_id, embedding) × embeddings(vec_id, embedding) →
    (query_id, vec_id, cos, rank ≤ k). Exact; query set is broadcast."""
    corpus = embeddings.select("vec_id", _unit())
    q = queries.select("query_id", F.col("unit").alias("q_unit")) if "unit" in queries.columns else queries.select(
        "query_id", _unit().alias("q_unit")
    )
    scored = corpus.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(_dot("unit", "q_unit"), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def nearest_centroid(vec_col: Column, cent_lists: list[list[float]]) -> Column:
    """argmin over ‖x − c_i‖² as ONE native expression: the k centroids
    ride the plan as literals (broadcast by construction — no join, no
    shuffle for assignment), the min is a struct-ordered array_min with
    deterministic index tie-break. Shared by kmeans assignment and the IVF
    cell routing so both always use the identical metric."""
    choices = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.array(*[F.lit(v) for v in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist2"),
                F.lit(i).alias("cluster"),
            )
            for i, c in enumerate(cent_lists)
        ]
    )
    return F.array_min(choices)


def centroid_table(
    embeddings: DataFrame, n_cells: int = 16, seed: int = 5
) -> DataFrame:
    """Deterministic pseudo-centroids: per hash-cell, the element-wise mean
    of that cell's vectors (one k-means half-step from a hashed init —
    deterministic, no iteration). Returns (cell, centroid array<double>)."""
    assigned = embeddings.select(
        F.pmod(F.xxhash64(F.lit(seed), F.col("vec_id")), F.lit(n_cells)).alias(
            "cell"
        ),
        _unit(),
    )
    exploded = assigned.select(
        "cell", F.posexplode(F.col("unit")).alias("d", "v")
    )
    return (
        exploded.groupBy("cell", "d")
        .agg(F.avg("v").alias("m"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("m")))
                ),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-5,
    seed: int = 5,
) -> tuple[DataFrame, list[list[float]], float]:
    """Lloyd's k-means over the embedding column, Catalyst-native:

    assignment  argmin ‖x − c‖² per row via an array-of-structs min over
                the k BROADCAST centroid literals (centroids are tiny —
                they ride the plan, the data never shuffles for
                assignment);
    update      posexplode(vector) → groupBy(cluster, dim).avg — one
                map-side-combining shuffle of (cluster, dim, partial)
                rows per iteration;
    driver      collects k·dim doubles per iteration (the only collect),
                checks centroid shift < tol.

    Init = deterministic hash-cell means (centroid_table — a k-means
    half-step from a hashed partition). Returns (assignments(vec_id,
    cluster, dist2), centroids, inertia). Deterministic: hash init,
    argmin ties broken by cluster index.
    """
    cents_df = centroid_table(embeddings, n_cells=k, seed=seed)
    centroids = {
        r["cell"]: list(r["centroid"]) for r in cents_df.collect()
    }
    cents = [centroids.get(i) for i in range(k)]
    # hash cells can be empty for tiny inputs; re-seat on any present one
    filler = next((c for c in cents if c is not None), None)
    if filler is None:
        raise ValueError("kmeans requires a non-empty embeddings input")
    cents = [c if c is not None else filler for c in cents]

    e = embeddings.select("vec_id", unit_vector("embedding").alias("x"))
    e = e.localCheckpoint()  # scanned every iteration

    def assign(cent_lists):
        best = nearest_centroid(F.col("x"), cent_lists)
        return e.select(
            "vec_id",
            "x",
            best.getField("cluster").alias("cluster"),
            best.getField("dist2").alias("dist2"),
        )

    assigned = None
    for _ in range(max_iter):
        assigned = assign(cents)
        new_rows = (
            assigned.select("cluster", F.posexplode("x").alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.avg("v").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "m"))),
                    lambda s: s.getField("m"),
                ).alias("centroid")
            )
            .collect()
        )
        new_map = {r["cluster"]: list(r["centroid"]) for r in new_rows}
        new_cents = [new_map.get(i, cents[i]) for i in range(k)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(c0, c1)) ** 0.5
            for c0, c1 in zip(cents, new_cents)
        )
        cents = new_cents
        if shift < tol:
            break
    final = assign(cents)
    inertia = final.agg(F.sum("dist2").alias("i")).collect()[0]["i"]
    return final.select("vec_id", "cluster", "dist2"), cents, float(inertia)


def knn_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 5,
    kmeans_iter: int = 4,
) -> DataFrame:
    """IVF ANN: k-means-trained cells, nearest-centroid routing.

    train   Lloyd's k-means (few iterations partition well enough) gives
            the n_cells centroids;
    assign  every corpus vector routes to its argmin-‖x−c‖² cell — the
            SAME `nearest_centroid` expression k-means assignment uses,
            so cell contents really are the Voronoi regions the probe
            step assumes (the r01 version hash-assigned cells at random,
            making probing ≈ uniform sampling — not ANN);
    probe   each query searches only its n_probe nearest cells (again by
            ‖q−c‖², the identical metric — unit vectors make L2 and
            cosine rankings agree up to the |c|² offset handled by using
            one metric on both sides), then exact cosine within them.

    Approximate — recall rises with n_probe (= exact at n_probe =
    n_cells, and far above n_probe/n_cells on clustered data, which is
    the property the recall pytest pins). At 100 TB the assignment is
    precomputed once and written bucketed by cell; queries then touch
    n_probe/n_cells of the data with no shuffle of corpus vectors.
    Returns (query_id, vec_id, cos, rank).
    """
    _assigned, cents, _inertia = kmeans(
        embeddings, k=n_cells, max_iter=kmeans_iter, seed=seed
    )
    corpus = embeddings.select("vec_id", _unit()).withColumn(
        "cell", nearest_centroid(F.col("unit"), cents).getField("cluster")
    )
    return _probe_and_rank(corpus, queries, cents, k, n_probe)


def _probe_and_rank(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    k: int,
    n_probe: int,
) -> DataFrame:
    """Shared IVF probe: rank cells per query by centroid distance (all
    native, no join — the centroids ride the plan as literals), keep the
    n_probe closest, broadcast-join on `cell`, exact cosine within,
    row_number top-k. corpus: (vec_id, unit, cell)."""
    q = queries.select("query_id", _unit().alias("q_unit"))
    cell_structs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        "q_unit",
                        F.array(*[F.lit(v) for v in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist2"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ]
    )
    probes = q.select(
        "query_id",
        "q_unit",
        F.explode(
            F.slice(F.array_sort(cell_structs), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "q_unit", F.col("probe.cell").alias("cell"))
    # probe: equi-join on cell — touches only the probed Voronoi regions
    scored = corpus.join(F.broadcast(probes), "cell").select(
        "query_id",
        "vec_id",
        F.round(_dot("unit", "q_unit"), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    seed: int = 5,
    kmeans_iter: int = 4,
) -> list[list[float]]:
    """Persist an IVF index: train cells once, assign once, WRITE the
    unit-vector corpus as parquet PARTITIONED BY cell, centroids as a
    JSON sidecar. This is the 100 TB shape the in-memory knn_ivf
    docstring promises: assignment is paid once at build time; every
    later query batch reads only its probed Voronoi partitions (Spark's
    dynamic partition pruning fires on the broadcast cell join — see
    knn_ivf_indexed), no re-assignment, no shuffle of corpus vectors.

    `path` must be a filesystem path writable from the driver (the JSON
    sidecar is written driver-side; on a real lakehouse the centroids
    would live in the table's metadata)."""
    import json
    import os

    _assigned, cents, _inertia = kmeans(
        embeddings, k=n_cells, max_iter=kmeans_iter, seed=seed
    )
    corpus = embeddings.select("vec_id", _unit()).withColumn(
        "cell", nearest_centroid(F.col("unit"), cents).getField("cluster")
    )
    corpus.write.mode("overwrite").partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(cents, f)
    return cents


def knn_ivf_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """kNN over a persisted IVF index (build_ivf_index): identical
    results to knn_ivf with the same training parameters (same seed ⇒
    same deterministic k-means ⇒ same cells — parity-pinned in test),
    but the corpus scan is limited to the probed partitions via dynamic
    partition pruning on the `cell` partition column instead of scanning
    and re-assigning the whole corpus per query batch."""
    import json
    import os

    with open(os.path.join(index_path, "_centroids.json")) as f:
        cents = json.load(f)
    corpus = spark.read.parquet(index_path)
    return _probe_and_rank(corpus, queries, cents, k, n_probe)
