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

import pandas as pd
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


def assign_nearest(
    df: DataFrame, cent_lists: list[list[float]], vec_col: str
) -> DataFrame:
    """nearest_centroid over a whole DataFrame with the k×d centroid
    matrix riding as a ONE-ROW broadcast-joined column (`_with_const`)
    instead of k×d expression literals — identical argmin arithmetic and
    (dist2, cluster) tie-break (parity-pinned in test_corpus_ops), but
    the constant tensor materializes once per batch instead of being
    re-created per row: the broadcast-tensor rule that bought 16× on
    pq_encode buys ~1.4× here at k=64, on EVERY corpus-side assignment
    (each Lloyd's iteration + the index build). Adds `cluster`/`dist2`.

    Literal-riding nearest_centroid stays for the per-QUERY probe
    selection, where rows are few and a crossJoin would cost more than
    it saves."""
    d = _with_const(
        df, "_ct", [list(map(float, c)) for c in cent_lists],
        "array<array<double>>",
    )
    best = F.expr(
        f"array_min(transform(_ct, (c, i) -> struct("
        f"aggregate(zip_with({vec_col}, c, (a, b) -> (a - b) * (a - b)),"
        f" cast(0.0 as double), (acc, v) -> acc + v) as dist2,"
        f" i as cluster)))"
    )
    return (
        d.withColumn("_best", best)
        .withColumn("cluster", F.col("_best.cluster"))
        .withColumn("dist2", F.col("_best.dist2"))
        .drop("_ct", "_best")
    )


def _mean_vec_agg(dim: int, col: str = "x") -> Column:
    """Element-wise mean of an array column as ONE map-side-combining
    aggregate: `dim` scalar avg()s reassembled into an array. Replaces
    the posexplode → groupBy(key, d).avg → collect_list regroup shape,
    which shuffled dim× the rows TWICE per k-means iteration — at 100 TB
    the partial-agg rows shrink dim×, and locally the second shuffle's
    128-task stage per iteration disappears (train_pq measured ~2×)."""
    c = F.col(col)
    return F.array(*[F.avg(c[i]) for i in range(dim)])


def centroid_table(
    embeddings: DataFrame, n_cells: int = 16, seed: int = 5,
    normalize: bool = True,
) -> DataFrame:
    """Deterministic pseudo-centroids: per hash-cell, the element-wise mean
    of that cell's vectors (one k-means half-step from a hashed init —
    deterministic, no iteration). Returns (cell, centroid array<double>).

    normalize=False clusters the raw `embedding` arrays as-is (the PQ
    subspace path: sub-vector slices of an ALREADY-unit vector must not be
    re-normalized per subspace)."""
    vec = _unit() if normalize else F.col("embedding").alias("unit")
    assigned = embeddings.select(
        F.pmod(F.xxhash64(F.lit(seed), F.col("vec_id")), F.lit(n_cells)).alias(
            "cell"
        ),
        vec,
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
    normalize: bool = True,
) -> tuple[DataFrame, list[list[float]], float]:
    """Lloyd's k-means over the embedding column, Catalyst-native:

    assignment  argmin ‖x − c‖² per row via an array-of-structs min over
                the k BROADCAST centroid literals (centroids are tiny —
                they ride the plan, the data never shuffles for
                assignment);
    update      groupBy(cluster) with dim element-wise avg() aggregates
                (_mean_vec_agg) — ONE map-side-combining shuffle of
                (cluster, partials) rows per iteration;
    driver      collects k·dim doubles per iteration (the only collect),
                checks centroid shift < tol.

    Init = deterministic hash-cell means (centroid_table — a k-means
    half-step from a hashed partition). Returns (assignments(vec_id,
    cluster, dist2), centroids, inertia). Deterministic: hash init,
    argmin ties broken by cluster index.
    """
    cents_df = centroid_table(embeddings, n_cells=k, seed=seed,
                              normalize=normalize)
    centroids = {
        r["cell"]: list(r["centroid"]) for r in cents_df.collect()
    }
    cents = [centroids.get(i) for i in range(k)]
    # hash cells can be empty for tiny inputs; re-seat on any present one
    filler = next((c for c in cents if c is not None), None)
    if filler is None:
        raise ValueError("kmeans requires a non-empty embeddings input")
    cents = [c if c is not None else filler for c in cents]

    x_expr = (
        unit_vector("embedding") if normalize
        else F.col("embedding").cast("array<double>")
    )
    e = embeddings.select("vec_id", x_expr.alias("x"))
    e = e.localCheckpoint()  # scanned every iteration

    def assign(cent_lists):
        return assign_nearest(e, cent_lists, "x").select(
            "vec_id", "x", "cluster", "dist2"
        )

    dim = len(cents[0])
    assigned = None
    for _ in range(max_iter):
        assigned = assign(cents)
        new_rows = (
            assigned.groupBy("cluster")
            .agg(_mean_vec_agg(dim, "x").alias("centroid"))
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
    corpus = (
        assign_nearest(embeddings.select("vec_id", _unit()), cents, "unit")
        .withColumnRenamed("cluster", "cell")
        .drop("dist2")
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
    train_cap: int | None = None,
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

    train = embeddings
    if train_cap:
        # FAISS recipe: the coarse quantizer trains on a deterministic
        # hash-uniform sample — O(train_cap) per iteration instead of a
        # full corpus scan; the ASSIGNMENT below still covers every row.
        # GlobalLimit leaves ONE partition — re-spread it or every
        # k-means iteration runs single-core (measured 110 s of a 137 s
        # build at 50k rows)
        train = (
            embeddings.orderBy(F.xxhash64(F.lit(seed), "vec_id"))
            .limit(train_cap)
            .repartition(
                embeddings.sparkSession.sparkContext.defaultParallelism
            )
        )
    _assigned, cents, _inertia = kmeans(
        train, k=n_cells, max_iter=kmeans_iter, seed=seed
    )
    corpus = (
        assign_nearest(embeddings.select("vec_id", _unit()), cents, "unit")
        .withColumnRenamed("cluster", "cell")
        .drop("dist2")
    )
    # co-locate each cell before the partitioned write: without this,
    # every one of the T scan tasks opens a file in every cell dir
    # (T × n_cells small files); with it, one file per cell
    corpus.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(cents, f)
    return cents


def append_to_ivf_index(embeddings: DataFrame, path: str) -> None:
    """Incremental ingest into a persisted IVF index: assign the NEW
    vectors to the EXISTING centroids (read from the sidecar — the
    quantizer is immutable after build, the FAISS add() contract) and
    append them under their cell partitions. No shuffle beyond the
    co-locating repartition of the new shard; existing cells are never
    rewritten or re-read. Probes see old + new rows transparently
    (partition append is how a lakehouse ingests — the Iceberg
    equivalent is an append snapshot on the bucketed table).

    Periodic rebuild is still the curator's job: if the data
    distribution drifts far from the frozen centroids, recall decays —
    measure with `corpus_divergence` between the index's training
    corpus and the appended stream, and rebuild past a threshold."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        cents = json.load(f)
    new = (
        assign_nearest(embeddings.select("vec_id", _unit()), cents, "unit")
        .withColumnRenamed("cluster", "cell")
        .drop("dist2")
    )
    new.repartition(F.col("cell")).write.mode("append").partitionBy(
        "cell"
    ).parquet(path)


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


# ------------------------------------------------------ product quantization


def train_pq(
    embeddings: DataFrame,
    m: int = 8,
    nbits: int = 4,
    kmeans_iter: int = 4,
    seed: int = 5,
    sample_cap: int | None = 65536,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011, the
    IVF-PQ/FAISS compression scheme): the unit vector is split into `m`
    contiguous subspaces and each subspace gets its own 2^nbits-centroid
    codebook from the SAME Catalyst-native Lloyd's k-means the IVF path
    uses (normalize=False — the sub-slices of an already-unit vector must
    not be re-normalized). Returns codebooks[m][2^nbits][d/m].

    Why PQ at 100 TB: a 64-dim float32 corpus vector is 256 bytes; its
    m=8 × 4-bit code is FOUR bytes — the corpus index fits in ~1.6% of
    the raw footprint, so the scan side of ANN becomes bandwidth-trivial
    and the exact vectors are only fetched for the final re-rank
    (knn_pq(refine=...)). Training cost is m small k-means over a SAMPLE
    at scale; the codebooks (m · 2^nbits · d/m doubles) ride the plan as
    literals exactly like the IVF centroids.
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    k = 1 << nbits
    if sample_cap:
        # codebooks are trained on a deterministic hash-uniform sample —
        # training cost is O(sample_cap), independent of corpus size
        # (the FAISS recipe: quantizer training never scans the corpus;
        # TakeOrderedAndProject keeps only sample_cap rows per scan task)
        embeddings = (
            embeddings.orderBy(F.xxhash64(F.lit(seed), "vec_id"))
            .limit(sample_cap)
            .repartition(
                embeddings.sparkSession.sparkContext.defaultParallelism
            )
        )  # re-spread the single-partition GlobalLimit (see train_cap)

    # FUSED multi-subspace Lloyd's: all m subspace k-means advance in the
    # same jobs — (vec_id, j, sub) rows carry every subspace through ONE
    # (j, cluster, dim)-keyed map-side-combining shuffle per iteration and
    # ONE driver collect of m·k·(d/m) = k·d doubles, instead of m
    # sequential driver loops (the m-loop version measured ~6× slower at
    # sf0.01 purely on scheduler latency, and serializes what is
    # embarrassingly parallel at cluster scale).
    vec = (
        _unit()
        if normalize
        else F.col("embedding").cast("array<double>").alias("unit")
    )
    subs = embeddings.select("vec_id", vec).select(
        "vec_id",
        F.posexplode(
            F.array(
                *[F.slice("unit", j * sub_d + 1, sub_d) for j in range(m)]
            )
        ).alias("j", "sub"),
    )
    subs = subs.localCheckpoint()  # scanned every iteration

    def collect_books(grouped_rows, prev):
        got = {(r["j"], r["cluster"]): list(r["centroid"]) for r in grouped_rows}
        out = []
        for j in range(m):
            cs = [got.get((j, i)) for i in range(k)]
            filler = next((c for c in cs if c is not None), None)
            if filler is None and prev is not None:
                cs = prev[j]
            else:
                if filler is None:
                    raise ValueError("train_pq requires non-empty input")
                cs = [
                    c
                    if c is not None
                    else (prev[j][i] if prev is not None else filler)
                    for i, c in enumerate(cs)
                ]
            out.append(cs)
        return out

    init_rows = (
        subs.select(
            "j",
            F.pmod(
                F.xxhash64(F.lit(seed), "vec_id", "j"), F.lit(k)
            ).alias("cluster"),
            "sub",
        )
        .groupBy("j", "cluster")
        .agg(_mean_vec_agg(sub_d, "sub").alias("centroid"))
        .collect()
    )
    books = collect_books(init_rows, None)

    # the row's own subspace codebook is picked by indexing the broadcast
    # codebook tensor with the row's `j` — ONE parsed SQL expression over
    # a one-row broadcast column (the per-subspace when-chain of composed
    # nearest_centroid Columns cost seconds of driver wall per iteration
    # in py4j expression construction alone, and an expression-literal
    # tensor is re-evaluated per element inside HOF lambdas — see
    # _with_books)
    assign = F.expr(_pq_argmin_sql("sub", "_bk", "j", k))

    for _ in range(kmeans_iter):
        new_rows = (
            _with_books(subs, books)
            .select("j", assign.alias("cluster"), "sub")
            .groupBy("j", "cluster")
            .agg(_mean_vec_agg(sub_d, "sub").alias("centroid"))
            .collect()
        )
        new_books = collect_books(new_rows, books)
        shift = max(
            sum((a - b) ** 2 for a, b in zip(c0, c1)) ** 0.5
            for bj0, bj1 in zip(books, new_books)
            for c0, c1 in zip(bj0, bj1)
        )
        books = new_books
        if shift < 1e-5:
            break
    return books


def _with_const(df: DataFrame, name: str, value, sql_type: str) -> DataFrame:
    """Attach a constant tensor as a column via a ONE-ROW broadcast join.
    Constant tensors must ride as DATA, not as expression literals: a
    1024-leaf nested array() literal inside a higher-order-function
    lambda is NOT constant-folded and gets re-evaluated per element
    access — measured 37 s vs 2.3 s for the same 500-row PQ encode
    (16×). The broadcast row is deserialized once per task, exactly the
    shape a real cluster wants."""
    spark = df.sparkSession
    one = spark.createDataFrame([(value,)], f"{name}: {sql_type}")
    return df.crossJoin(F.broadcast(one))


def _with_books(df: DataFrame, codebooks) -> DataFrame:
    """The m × 2^nbits × d/m PQ codebook tensor as a `_bk` column."""
    return _with_const(
        df,
        "_bk",
        [[list(map(float, c)) for c in book] for book in codebooks],
        "array<array<array<double>>>",
    )


def _pq_lut_expr(m: int, sub_d: int, vec: str = "q_unit") -> Column:
    """Per-query ADC lookup table lut[m][k]: the dot product of each
    query sub-vector with every centroid of that subspace's codebook
    (read from the broadcast `_bk` column)."""
    return F.expr(
        f"transform(sequence(0, {m - 1}), jj -> "
        f"transform(_bk[jj], c -> "
        f"aggregate(zip_with(slice({vec}, jj * {sub_d} + 1, {sub_d}), c, "
        f"(a, b) -> a * b), 0D, (acc, v) -> acc + v)))"
    )


def _pq_argmin_sql(sub: str, books: str, j: str, k: int) -> str:
    """argmin_i ‖sub − books[j][i]‖² with index tie-break, as SQL text:
    same struct-ordered array_min metric as nearest_centroid, but the
    k-way unroll is a zip_with over the codebook column instead of k
    composed Column objects (the py4j-free formulation — building the
    composed version for m·k=128 centroids cost ~10 s of pure driver
    wall per query before any task ran)."""
    return (
        f"array_min(zip_with({books}[{j}], sequence(0, {k - 1}), "
        f"(c, i) -> struct("
        f"aggregate(zip_with({sub}, c, (a, b) -> (a - b) * (a - b)), "
        f"0D, (acc, v) -> acc + v) AS dist2, i AS cluster))).cluster"
    )


def _pq_code_expr(unit_col: str, codebooks) -> Column:
    """codes array<int>[m]: per subspace, argmin ‖sub − c‖² over that
    subspace's codebook read from the broadcast `_bk` column — encoding
    is a pure map built as a single SQL string."""
    m = len(codebooks)
    k = len(codebooks[0])
    sub_d = len(codebooks[0][0])
    argmin = _pq_argmin_sql(
        f"slice({unit_col}, jj * {sub_d} + 1, {sub_d})", "_bk", "jj", k
    )
    return F.expr(f"transform(sequence(0, {m - 1}), jj -> {argmin})")


def _pq_codes_np(codebooks):
    """numpy batch encoder (n, d) → (n, m) int32 codes: argmin ‖sub−c‖²
    per subspace, lowest-index tie-break — same metric as
    _pq_code_expr."""
    import numpy as np

    nb = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub_d)
    m, _k, sub_d = nb.shape

    def encode(X):
        n = X.shape[0]
        S = X.reshape(n, m, sub_d)
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            d2 = (
                (S[:, j, None, :] - nb[j][None, :, :]) ** 2
            ).sum(axis=-1)  # (n, k)
            codes[:, j] = d2.argmin(axis=1)
        return codes

    return encode


def _pq_codes_udf(codebooks, packed_nbits: int | None = None):
    """Vectorized (Arrow-batched) PQ encoder: same codes as
    _pq_code_expr (parity-pinned in test_corpus_ops). The interpreted
    HOF expression costs ~2 ms/vector — fine for oracles, unusable for
    a billion-vector corpus; this path is ~µs/vector.

    packed_nbits=nbits returns the m codes PACKED into one BIGINT
    (code_j in bits [j·nbits, (j+1)·nbits)) — 8 bytes per vector at
    m=8/nbits=4 instead of a 256-byte float vector; requires
    m·nbits ≤ 63."""
    import numpy as np

    encode = _pq_codes_np(codebooks)
    m = len(codebooks)

    if packed_nbits is None:

        @F.pandas_udf("array<int>")
        def enc(units: "pd.Series") -> "pd.Series":
            if not len(units):
                return pd.Series([], dtype=object)
            X = np.asarray(list(units), dtype=np.float64)
            return pd.Series(list(encode(X)))

        return enc

    if m * packed_nbits > 63:
        raise ValueError(f"m·nbits = {m * packed_nbits} > 63: cannot pack")
    shifts = packed_nbits * np.arange(m, dtype=np.int64)

    @F.pandas_udf("long")
    def enc_packed(units: "pd.Series") -> "pd.Series":
        if not len(units):
            return pd.Series([], dtype=np.int64)
        X = np.asarray(list(units), dtype=np.float64)
        codes = encode(X).astype(np.int64)
        return pd.Series((codes << shifts[None, :]).sum(axis=1))

    return enc_packed


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    impl: str = "arrow",
    normalize: bool = True,
) -> DataFrame:
    """(vec_id, codes array<int>[m]) — the compressed corpus index. Pure
    narrow map (no join, no shuffle); at scale this is written once,
    like build_ivf_index, and queries scan codes instead of vectors.

    impl="arrow" (default) encodes in a vectorized pandas UDF;
    impl="sql" is the pure-Catalyst twin (one SQL-string expression over
    the broadcast codebook column) — bit-identical codes, used as the
    engine-independent definition and by the parity test."""
    vec = (
        _unit()
        if normalize
        else F.col("embedding").cast("array<double>").alias("unit")
    )
    u = embeddings.select("vec_id", vec)
    if impl == "arrow":
        return u.select(
            "vec_id", _pq_codes_udf(codebooks)("unit").alias("codes")
        )
    return _with_books(u, codebooks).select(
        "vec_id", _pq_code_expr("unit", codebooks).alias("codes")
    )


# -------------------------------------------------------- Arrow ADC path


def _np_round6(s):
    """Spark-exact 6dp rounding in numpy. Spark's round(col, 6) on a
    double is BigDecimal.valueOf(x).setScale(6, HALF_UP) — HALF_UP over
    the SHORTEST decimal repr of x, which near a .000_000_5 boundary
    can differ from the vectorized floor(|x|·1e6 + 0.5) (e.g.
    x=1.0412225 stored as …2249…: shortest repr rounds up, the scaled
    product rounds down). So: vectorize the common case, then re-round
    the rare near-boundary values exactly via Python's repr (the same
    shortest-round-trip decimal as Java's Double.toString) + Decimal
    HALF_UP. (np.round alone is banker's — wrong convention.)

    Exactness caveat, documented rather than hidden: arrow and SQL
    still SUM in different orders (pairwise numpy vs sequential fold),
    so pre-rounding inputs can differ in the last bit; identical
    rounding makes a cross-impl 6dp mismatch possible only when two
    last-bit-different sums straddle a boundary (~1e-10 per score)."""
    import numpy as np

    s = np.asarray(s, dtype=np.float64)
    scaled = np.abs(s) * 1e6
    out = np.copysign(np.floor(scaled + 0.5), s) / 1e6
    frac = scaled - np.floor(scaled)
    near = np.abs(frac - 0.5) < 1e-6
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        flat_out = out.reshape(-1)
        flat_in = s.reshape(-1)
        q = Decimal("0.000001")
        for i in np.flatnonzero(near.reshape(-1)):
            flat_out[i] = float(
                Decimal(repr(float(flat_in[i]))).quantize(
                    q, rounding=ROUND_HALF_UP
                )
            )
    return out


def _collect_query_units(queries: DataFrame):
    """Bounded-row collect of the QUERY side — the contract's small
    broadcast side (knn_bruteforce broadcasts this same frame; a query
    batch that doesn't fit on the driver wouldn't fit in a broadcast
    either). Unit vectors are computed by the JVM `_unit` expression
    before collecting so both impls normalize with identical arithmetic.
    NULL-embedding queries are dropped (they contribute no candidates);
    the SQL twin instead carries them through as NULL scores that rank
    meaninglessly — for this one degenerate input the impls diverge,
    deliberately. Returns (ids list, units (Q, d) float64)."""
    import numpy as np

    rows = queries.select("query_id", _unit().alias("q_unit")).collect()
    rows = [r for r in rows if r.q_unit is not None]
    ids = [r.query_id for r in rows]
    units = (
        np.asarray([list(r.q_unit) for r in rows], dtype=np.float64)
        if rows
        else np.zeros((0, 0), dtype=np.float64)
    )
    return ids, units


def _pq_luts_np(q_units, codebooks):
    """luts[q][j][i] = <q_sub_j, codebook_j[i]> for every query at once —
    the numpy twin of _pq_lut_expr, built ONCE on the driver and shipped
    to workers inside the mapInArrow closure (Q · m · 2^nbits doubles —
    a few KB; rides task serialization like a broadcast)."""
    import numpy as np

    nb = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub_d)
    m, _k, sub_d = nb.shape
    subs = q_units.reshape(q_units.shape[0], m, sub_d)
    return np.einsum("qjd,jkd->qjk", subs, nb)


def _empty_ranked(spark, qid_field):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("query_id", qid_field.dataType),
            T.StructField("vec_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    return spark.createDataFrame([], schema)


def _adc_topk_arrow(
    codes_df: DataFrame,
    qids: list,
    luts,
    kk: int,
    qid_dtype,
    packed_nbits: int | None = None,
    cell_probe: dict | None = None,
) -> DataFrame:
    """Arrow-vectorized ADC with per-partition partial top-k: one
    mapInArrow over the code table gathers lut[q, j, codes[:, j]] for a
    whole batch with ONE take_along_axis per batch (µs/row instead of the
    interpreted HOF's ~ms/row), keeps a running per-query top-kk inside
    the partition, and emits only partitions × Q × kk candidate rows —
    the map-side-combine shape: at 1M corpus rows the global rank window
    sees ~2k rows per query instead of 1M (VERDICT r4 item #1).

    codes_df: (vec_id, codes array<int>) when packed_nbits is None, else
    (cell, vec_id, packed bigint) with codes unpacked by shift+mask in
    numpy. cell_probe maps cell -> (query-index array, qdotc array) for
    the IVF-PQ residual score  <q, c_cell> + Σ_j lut[j][code_j];  None
    scores every row against every query (flat PQ).

    Scores are 6dp-rounded IN the mapper (same HALF_UP convention as the
    JVM, _np_round6) so the partial selection and the final global window
    rank on identical values. Returns (query_id, vec_id, score)."""
    from pyspark.sql import types as T

    spark = codes_df.sparkSession
    nq = len(qids)
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_dtype),
            T.StructField("vec_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    if packed_nbits is None:
        src = codes_df.select(
            F.col("vec_id").cast("long").alias("vec_id"), "codes"
        )
    else:
        src = codes_df.select(
            F.col("cell").cast("int").alias("cell"),
            F.col("vec_id").cast("long").alias("vec_id"),
            "packed",
        )
    m = luts.shape[1]
    nbits = packed_nbits
    # the emitted arrays MUST carry the declared arrow types: pa.array
    # inference turns an IntegerType query_id (e.g. a lit() literal)
    # into int64 and the JVM's ArrowColumnVector accessor then crashes
    # on the int32 it was promised
    from pyspark.sql.pandas.types import to_arrow_type

    qid_arrow = to_arrow_type(qid_dtype)

    def mapper(batches):
        import numpy as np
        import pyarrow as pa

        best_s = [np.empty(0, dtype=np.float64) for _ in range(nq)]
        best_v = [np.empty(0, dtype=np.int64) for _ in range(nq)]

        def merge(qi, scores, vids):
            cs = np.concatenate([best_s[qi], scores])
            cv = np.concatenate([best_v[qi], vids])
            order = np.lexsort((cv, -cs))[:kk]
            best_s[qi], best_v[qi] = cs[order], cv[order]

        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if nbits is None:
                codes = (
                    batch.column("codes")
                    .flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    .reshape(n, m)
                )
            else:
                packed = batch.column("packed").to_numpy(
                    zero_copy_only=False
                )
                shifts = nbits * np.arange(m, dtype=np.int64)
                codes = (packed[:, None] >> shifts[None, :]) & (
                    (1 << nbits) - 1
                )
            if cell_probe is None:
                # (Q, m, n) gather, summed over subspaces -> (Q, n)
                s = _np_round6(
                    np.take_along_axis(
                        luts, codes.T[None, :, :], axis=2
                    ).sum(axis=1)
                )
                for qi in range(nq):
                    merge(qi, s[qi], vid)
            else:
                cells = batch.column("cell").to_numpy(
                    zero_copy_only=False
                )
                for c in np.unique(cells):
                    probe = cell_probe.get(int(c))
                    if probe is None:
                        continue
                    q_idx, qdotc = probe
                    sel = cells == c
                    sub_codes = codes[sel]
                    sub_vid = vid[sel]
                    s = _np_round6(
                        np.take_along_axis(
                            luts[q_idx],
                            sub_codes.T[None, :, :],
                            axis=2,
                        ).sum(axis=1)
                        + qdotc[:, None]
                    )
                    for row, qi in enumerate(q_idx):
                        merge(int(qi), s[row], sub_vid)

        out_ids, out_vids, out_s = [], [], []
        for qi in range(nq):
            out_ids.extend([qids[qi]] * len(best_v[qi]))
            out_vids.append(best_v[qi])
            out_s.append(best_s[qi])
        if out_ids:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, type=qid_arrow),
                    pa.array(
                        np.concatenate(out_vids), type=pa.int64()
                    ),
                    pa.array(
                        np.concatenate(out_s), type=pa.float64()
                    ),
                ],
                names=["query_id", "vec_id", "score"],
            )

    return src.mapInArrow(mapper, out_schema)


def _rank_topk(
    scored: DataFrame, k: int, score_col: str = "score"
) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", score_col, "rank")
    )


def _refine_exact(
    ranked: DataFrame,
    source: DataFrame,
    queries: DataFrame,
    k: int,
    refine: int,
) -> DataFrame:
    """Re-rank the top refine·k ADC candidates by exact cosine — point
    lookups of just those vec_ids against the full-vector table.

    The candidate list (Q · refine · k id pairs — bounded by the small
    query-batch contract) is BROADCAST and the corpus is the probe
    side: the full-vector table never shuffles and its unit vectors are
    only computed for the matched rows. The reversed shape (shuffling
    corpus (vec_id, unit) to meet the candidates) moved ~0.5 GB and
    cost 27 s of the 29 s refine wall at 1M×64 (measured r5)."""
    cand = ranked.where(F.col("rank") <= refine * k).select(
        "query_id", "vec_id"
    )
    q = queries.select("query_id", _unit().alias("q_unit"))
    exact = (
        source.select("vec_id", "embedding")
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(unit_vector("embedding"), F.col("q_unit")), 6
            ).alias("score"),
        )
    )
    return _rank_topk(exact, k)


def knn_pq(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    refine: int = 0,
    impl: str = "arrow",
) -> DataFrame:
    """ANN by asymmetric distance computation (ADC) over PQ codes:
    approx_cos(q, x) = Σ_j  <q_j , codebook_j[code_j(x)]>  — the dot
    product of the EXACT query sub-vector with the corpus sub-vector's
    centroid, which is why ADC beats symmetric code-code distance.

    plan: per query the m×2^nbits LUT of sub-dot-products is computed
    once as a native projection (codebook literals ride the plan); the
    broadcast-joined corpus side then scores each row with ONE
    zip_with(codes, lut) + sum — no vector arithmetic per corpus row at
    all, just m table lookups. Top-k via the shared rank window.

    refine > 0 re-ranks the top refine·k ADC candidates by exact cosine
    (joining only those rows back to their full vectors) — the standard
    PQ recall recovery; refine=0 returns pure-ADC ranks.
    Returns (query_id, vec_id, score, rank) where score is approx cos
    (refine=0) or exact cos (refine>0), rounded to 6dp.

    impl="arrow" (default) scores through _adc_topk_arrow — the batched
    numpy LUT gather with per-partition partial top-k (vec_id cast to
    long). impl="sql" is the pure-Catalyst twin: full Q×n scoring via
    one interpreted HOF per row, kept as the engine-independent
    definition and the parity oracle (same ranks, pinned in
    test_corpus_ops)."""
    m = len(codebooks)
    kk = refine * k if refine else k
    if impl == "arrow":
        qids, q_units = _collect_query_units(queries)
        if not qids:
            return _empty_ranked(
                embeddings.sparkSession, queries.schema["query_id"]
            )
        luts = _pq_luts_np(q_units, codebooks)
        corpus_codes = pq_encode(embeddings, codebooks)
        scored = _adc_topk_arrow(
            corpus_codes,
            qids,
            luts,
            kk,
            queries.schema["query_id"].dataType,
        )
    else:
        corpus_codes = pq_encode(embeddings, codebooks)
        q = queries.select("query_id", _unit().alias("q_unit"))
        sub_d = len(codebooks[0][0])
        q_lut = _with_books(q, codebooks).select(
            "query_id", "q_unit", _pq_lut_expr(m, sub_d).alias("lut")
        )
        adc = F.expr(
            "aggregate(zip_with(codes, lut, (c, l) -> l[c]), "
            "0D, (acc, v) -> acc + v)"
        )
        scored = corpus_codes.join(
            F.broadcast(q_lut.select("query_id", "lut"))
        ).select("query_id", "vec_id", F.round(adc, 6).alias("score"))
    ranked = _rank_topk(scored, kk)
    if not refine:
        return ranked.where(F.col("rank") <= k)
    return _refine_exact(ranked, embeddings, queries, k, refine)


# ------------------------------------------------------------------- IVF-PQ


def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    nbits: int = 4,
    seed: int = 5,
    kmeans_iter: int = 4,
    pq_iter: int = 4,
    sample_cap: int | None = 65536,
    train_cap: int | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Persist a FAISS-shaped IVF-PQ index: coarse k-means cells route
    each unit vector to its Voronoi region, the RESIDUAL x − c_cell is
    product-quantized (residual PQ is what makes IVF-PQ accurate: the
    quantizer only has to cover the within-cell spread, not the whole
    space), and the m codes are PACKED into one BIGINT per vector.

    On-disk layout: parquet (vec_id, packed) PARTITIONED BY cell, plus a
    JSON sidecar with centroids + codebooks. At m=8/nbits=4 a 64-dim
    float corpus row shrinks 256 B → 8 B of payload; a query batch reads
    only its probed cell partitions (dynamic partition pruning — same
    plan shape as knn_ivf_indexed) and scores each row with m table
    lookups, no vector arithmetic. Returns (centroids, codebooks)."""
    import json
    import os

    train = embeddings
    if train_cap:
        # same sampled coarse-quantizer training (and the same
        # single-partition GlobalLimit re-spread) as build_ivf_index
        train = (
            embeddings.orderBy(F.xxhash64(F.lit(seed), "vec_id"))
            .limit(train_cap)
            .repartition(
                embeddings.sparkSession.sparkContext.defaultParallelism
            )
        )
    _assigned, cents, _inertia = kmeans(
        train, k=n_cells, max_iter=kmeans_iter, seed=seed
    )
    resid = _ivfpq_residuals(embeddings, cents)
    books = train_pq(
        resid,
        m=m,
        nbits=nbits,
        kmeans_iter=pq_iter,
        seed=seed,
        sample_cap=sample_cap,
        normalize=False,
    )
    _ivfpq_write_cells(resid, books, nbits, path, mode="overwrite")
    with open(os.path.join(path, "_ivfpq.json"), "w") as f:
        json.dump({"cents": cents, "books": books, "nbits": nbits}, f)
    return cents, books


def _ivfpq_residuals(embeddings: DataFrame, cents) -> DataFrame:
    """(cell, vec_id, embedding=residual x − c_cell): the shared
    assign→residual stage of build AND append — one definition so the
    two paths can never encode differently against the same frozen
    coarse quantizer."""
    corpus = (
        assign_nearest(embeddings.select("vec_id", _unit()), cents, "unit")
        .withColumnRenamed("cluster", "cell")
        .drop("dist2")
    )
    return _with_const(
        corpus,
        "_ct",
        [list(map(float, c)) for c in cents],
        "array<array<double>>",
    ).select(
        "cell",
        "vec_id",
        F.expr("zip_with(unit, _ct[cell], (a, b) -> a - b)").alias(
            "embedding"
        ),
    )


def _ivfpq_write_cells(
    resid: DataFrame, books, nbits: int, path: str, mode: str
) -> None:
    """Shared encode→partitioned-write stage of build and append."""
    enc = _pq_codes_udf(books, packed_nbits=nbits)
    resid.select(
        "cell", "vec_id", enc(F.col("embedding")).alias("packed")
    ).repartition(F.col("cell")).write.mode(mode).partitionBy(
        "cell"
    ).parquet(path)


def append_to_ivfpq_index(embeddings: DataFrame, path: str) -> None:
    """Incremental ingest into a persisted IVF-PQ index — the
    append_to_ivf_index contract with the compression kept: BOTH
    quantizers are immutable after build (the FAISS add() rule), so new
    vectors are routed to their existing coarse cell, their residual
    x − c_cell is encoded against the existing codebooks (the Arrow
    batch encoder), and the packed BIGINT rows append under their cell
    partitions. No shuffle beyond the co-locating repartition of the
    new shard; existing cells are never rewritten or re-read, and
    queries see old + new rows transparently (ADC scores of appended
    rows are identical to build-time encoding of the same vectors —
    parity-pinned in test_corpus_ops).

    As with the uncompressed index, distribution drift degrades recall
    against frozen quantizers — measure with `corpus_divergence` and
    rebuild past a threshold."""
    import json
    import os

    with open(os.path.join(path, "_ivfpq.json")) as f:
        meta = json.load(f)
    _ivfpq_write_cells(
        _ivfpq_residuals(embeddings, meta["cents"]),
        meta["books"],
        meta["nbits"],
        path,
        mode="append",
    )


def knn_ivfpq_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    refine: int = 0,
    source: DataFrame | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """ANN over a persisted IVF-PQ index: probe the n_probe nearest
    cells per query, then score every row of those partitions by
    residual ADC —

        approx_cos(q, x) = <q, c_cell> + Σ_j lut[j][code_j(x)]

    where lut[j][i] = <q_j, book_j[i]> is the per-query table over the
    residual codebooks and code_j is unpacked from the BIGINT by
    shift+mask. The corpus side never touches a float vector; only
    probed partitions are read.

    impl="arrow" (default): cell ranking, qdotc, and the LUTs are
    computed driver-side in numpy from the sidecar centroids/codebooks
    plus the collected (bounded, broadcast-small) query batch; probed
    partitions are selected with a STATIC `cell IN (...)` partition
    filter, and scoring runs through _adc_topk_arrow (batched LUT
    gather, per-partition partial top-k). impl="sql" is the interpreted
    HOF twin — same probes, same scores (parity-pinned).

    refine > 0 re-ranks the top refine·k ADC candidates by exact cosine
    against `source` (the original embeddings table — point lookups of
    just those vec_ids; required when refine is set)."""
    import json
    import os

    with open(os.path.join(index_path, "_ivfpq.json")) as f:
        meta = json.load(f)
    cents, books, nbits = meta["cents"], meta["books"], meta["nbits"]
    m = len(books)
    sub_d = len(books[0][0])
    n_cells = len(cents)
    mask = (1 << nbits) - 1
    corpus = spark.read.parquet(index_path)
    if refine and source is None:
        raise ValueError("refine > 0 requires the source embeddings table")
    kk = refine * k if refine else k

    if impl == "arrow":
        import numpy as np

        qids, q_units = _collect_query_units(queries)
        if not qids:
            return _empty_ranked(spark, queries.schema["query_id"])
        C = np.asarray(cents, dtype=np.float64)  # (n_cells, d)
        d2 = ((q_units[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        qdotc = q_units @ C.T  # (Q, n_cells)
        cell_idx = np.arange(n_cells)
        cell_probe: dict[int, tuple] = {}
        for qi in range(len(qids)):
            # same (dist2, cell) tie-break as the SQL struct sort
            probed = np.lexsort((cell_idx, d2[qi]))[:n_probe]
            for c in probed:
                cell_probe.setdefault(int(c), ([], []))
                cell_probe[int(c)][0].append(qi)
                cell_probe[int(c)][1].append(qdotc[qi, c])
        cell_probe = {
            c: (np.asarray(qs, dtype=np.int64), np.asarray(ds))
            for c, (qs, ds) in cell_probe.items()
        }
        luts = _pq_luts_np(q_units, books)
        pruned = corpus.where(
            F.col("cell").isin(sorted(cell_probe.keys()))
        )
        scored = _adc_topk_arrow(
            pruned,
            qids,
            luts,
            kk,
            queries.schema["query_id"].dataType,
            packed_nbits=nbits,
            cell_probe=cell_probe,
        )
        ranked = _rank_topk(scored, kk)
        if not refine:
            return ranked.where(F.col("rank") <= k)
        return _refine_exact(ranked, source, queries, k, refine)

    q = queries.select("query_id", _unit().alias("q_unit"))
    q = _with_books(q, books)
    q = _with_const(
        q, "_ct", [list(map(float, c)) for c in cents], "array<array<double>>"
    )
    # rank cells by ‖q − c‖², keep n_probe, carry <q, c> for the ADC
    # score; one SQL expression over the broadcast centroid column
    probe = F.expr(
        f"slice(array_sort(zip_with(_ct, sequence(0, {n_cells - 1}), "
        f"(c, i) -> struct("
        f"aggregate(zip_with(q_unit, c, (a, b) -> (a - b) * (a - b)), "
        f"0D, (acc, v) -> acc + v) AS dist2, "
        f"i AS cell, "
        f"aggregate(zip_with(q_unit, c, (a, b) -> a * b), "
        f"0D, (acc, v) -> acc + v) AS qdotc))), 1, {n_probe})"
    )
    probes = q.select(
        "query_id",
        _pq_lut_expr(m, sub_d).alias("lut"),
        F.explode(probe).alias("p"),
    ).select(
        "query_id",
        "lut",
        F.col("p.cell").alias("cell"),
        F.col("p.qdotc").alias("qdotc"),
    )
    adc = F.expr(
        f"qdotc + aggregate(zip_with(lut, sequence(0, {m - 1}), "
        f"(l, j) -> l[cast(shiftright(packed, j * {nbits}) & {mask} "
        f"as int)]), 0D, (acc, v) -> acc + v)"
    )
    scored = corpus.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id", F.round(adc, 6).alias("score")
    )
    ranked = _rank_topk(scored, kk)
    if not refine:
        return ranked.where(F.col("rank") <= k)
    return _refine_exact(ranked, source, queries, k, refine)


def jl_signs(out_dim: int, in_dim: int, seed: int = 7) -> list[float]:
    """The deterministic ±1 Johnson-Lindenstrauss sign matrix, laid out
    row-major by output dimension (s[j*in_dim + i]): sign(j, i) = +1
    iff md5("{seed}|rp|{j}|{i}")[:8]/2^32 >= 0.5 — the repo's
    cross-engine uniform, so DuckDB regenerates the identical matrix
    inside the oracle SQL and python replays it in tests."""
    import hashlib

    out = []
    for j in range(out_dim):
        for i in range(in_dim):
            h = hashlib.md5(f"{seed}|rp|{j}|{i}".encode()).hexdigest()
            out.append(1.0 if int(h[:8], 16) / 2**32 >= 0.5 else -1.0)
    return out


def random_project(
    embeddings: DataFrame,
    out_dim: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection → (id, proj): each
    UNIT-normalized input vector multiplied by a deterministic ±1 sign
    matrix and scaled by 1/sqrt(out_dim) (Achlioptas 2001 — the
    database-friendly JL construction; sign matrices match dense
    Gaussian JL guarantees). The dimensionality-reduction front end
    for ANN at scale: a 1024-d corpus projected to 64-d cuts every
    downstream distance computation 16x while preserving pairwise
    inner products to within the JL epsilon.

    Scale shape: a PURE MAP — the sign matrix rides as a one-row
    broadcast column (never an expression literal, the pq_encode
    lesson), each output coordinate is one zip_with/aggregate fold
    over a contiguous slice, zero shuffles, zero driver data besides
    the out_dim x in_dim signs. The fold adds the same doubles in the
    same i-ascending order as DuckDB's list_sum replay, so projected
    values are bit-identical cross-engine (`embedding_near_dup` 'jl'
    leg) and exactly reproducible for shard regeneration.
    """
    import math

    if in_dim is None:
        row = embeddings.select(F.size(vec_col).alias("d")).first()
        if row is None:
            raise ValueError("cannot infer in_dim from an empty frame")
        in_dim = row["d"]
    signs = jl_signs(out_dim, in_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    base = embeddings.select(
        id_col, unit_vector(vec_col).alias("_unit")
    )
    with_s = _with_const(base, "_s", signs, "array<double>")
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                F.col("_unit"),
                F.slice(F.col("_s"), j * in_dim + 1, in_dim),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        * F.lit(scale),
    )
    return with_s.select(id_col, proj.alias("proj"))


# ----------------------------------------------------------------------- PCA


def pca_components(
    embeddings: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    center: bool = True,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Distributed PCA training → (components[out_dim][d], mean[d],
    explained_variance[out_dim]): one corpus pass computes per-partition
    covariance PARTIALS (n, Σx, XᵀX — each a d / d² payload, Arrow-
    vectorized numpy GEMM per batch), the driver combines them and
    eigendecomposes the d×d covariance (d is embedding width, so the
    driver work is microseconds). The data-dependent complement of
    random_project: PCA needs a training pass but packs variance into
    the fewest dimensions — the SemDeDup-style front end where JL's
    obliviousness wastes dimensions.

    Components carry a DETERMINISTIC sign convention (largest-|·|
    coordinate positive) so training is reproducible across partition
    orders up to eigenvalue ties; partials are exact sums, and
    numpy's eigh on the combined d×d matrix is partition-order
    independent because the partial SUM is combined in one driver
    reduction over sorted partition ids.
    """
    import numpy as np

    d_row = embeddings.select(F.size(vec_col).alias("d")).first()
    if d_row is None:
        raise ValueError("cannot train PCA on an empty frame")
    d = d_row["d"]
    if not 1 <= out_dim <= d:
        raise ValueError(f"out_dim must be in [1, {d}]")

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "xtx": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = (
        embeddings.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .mapInPandas(
            partials, "n long, s array<double>, xtx array<double>"
        )
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        xtx += np.asarray(r["xtx"]).reshape(d, d)
    mean = s / n if center else np.zeros(d)
    cov = xtx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:out_dim]
    comps = vecs[:, order].T
    # deterministic sign: the largest-|coordinate| entry is positive
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1
    return (
        [c.tolist() for c in comps],
        mean.tolist(),
        [float(vals[i]) for i in order],
    )


def pca_project(
    embeddings: DataFrame,
    components: list[list[float]],
    mean: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply trained PCA → (id, proj[out_dim]): a PURE MAP — the
    components (and mean) ride as one-row broadcast columns (the
    pq_encode lesson: never expression literals inside HOF lambdas),
    each output coordinate is one zip_with/aggregate fold over the
    centered vector. Zero shuffles; the corpus is never collected."""
    out_dim = len(components)
    d = len(components[0])
    mu = mean if mean is not None else [0.0] * d
    base = embeddings.select(
        id_col, F.col(vec_col).cast("array<double>").alias("_x")
    )
    base = _with_const(
        base, "_w", [list(map(float, c)) for c in components],
        "array<array<double>>",
    )
    base = _with_const(base, "_mu", [float(v) for v in mu], "array<double>")
    centered = F.zip_with(F.col("_x"), F.col("_mu"), lambda x, m: x - m)
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                centered, F.col("_w")[j], lambda x, w: x * w
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ),
    )
    return base.select(id_col, proj.alias("proj"))
