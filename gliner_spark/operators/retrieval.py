"""Ranked lexical retrieval over a document corpus: BM25 scoring of a
literal term query, fully native expressions.

Reference scope note: GLiNER itself has no retrieval operator — this is
one of the training-data-pipeline additions (corpus search / example
mining) layered on the same `documents` table as the dedup/quality ops.

Scale shape: the query is a LITERAL term list, so per-term tf is a
map-side `size(filter(tokens, = term))` expression on the token array —
no explode, no (doc, term) shuffle, and the scan pipeline stays in
whole-stage codegen. Corpus statistics (N, avgdl, per-term df) reduce to
ONE single-row global aggregate that joins back as a broadcast; the
final score is again a pure map expression, and the top-k is a
TakeOrderedAndProject (per-partition heap + driver merge of k rows — no
global sort shuffle). Every stage is linear in input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 (Robertson idf, `ln(1 + (N-df+.5)/(df+.5))`,
    so zero-df terms stay finite and contribute 0 via tf=0).

    Ordering is over the 6dp-ROUNDED score with an id tie-break, so the
    returned top-k is deterministic across engines even when two docs'
    raw doubles differ only in summation order.
    """
    if not query_terms:
        raise ValueError("bm25_rank needs at least one query term")
    toks = tokens(F.lower(F.col(text_col)))

    def _tf(word):
        # single-arg lambda on purpose: a two-arg lambda is the
        # (element, index) form to Spark's HOF builder
        return F.size(F.filter(toks, lambda t: t == F.lit(word)))

    per_doc = docs.select(
        id_col,
        F.size(toks).alias("dl"),
        *[
            _tf(w).cast("double").alias(f"tf_{i}")
            for i, w in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        term = idf * F.col(f"tf_{i}") * F.lit(k1 + 1.0) / (
            F.col(f"tf_{i}") + norm
        )
        score = term if score is None else score + term
    scored = per_doc.join(F.broadcast(stats)).select(
        id_col, F.round(score, 6).alias("score")
    )
    ranked = scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rk", F.row_number().over(w))


def _doc_postings(toks) -> "F.Column":
    """Per-doc (term, tf) array from a token-array column, LINEAR per
    row and fully map-side: sort the tokens, find run starts (positions
    whose token differs from its predecessor), then zip each run start
    with the next start to get the run length. No explode→groupBy — the
    per-occurrence shuffle that pattern costs is the whole corpus at
    index-build scale; here tf is finished before anything moves."""
    srt = F.array_sort(toks)
    n = F.size(srt)
    # sequence(1, n) auto-negates its step for n < 1 → guard (repo rule)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.lit(None).cast("array<int>")
    )
    starts = F.filter(
        idx,
        lambda i: (i == 1)
        | (F.element_at(srt, i) != F.element_at(srt, i - 1)),
    )
    nexts = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(n + 1),
    )
    # empty doc → idx NULL → result NULL; explode() skips NULL arrays,
    # so empty docs contribute no postings (but still count in n_docs)
    return F.zip_with(
        starts,
        nexts,
        lambda s, e: F.struct(
            F.element_at(srt, s).alias("term"),
            (e - s).cast("double").alias("tf"),
        ),
    )


def _postings_frame(
    docs: DataFrame, n_buckets: int, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, per_doc) for an index build/append: postings =
    (term, doc_id, tf, dl, bucket), per_doc = (doc_id, dl) for the
    sidecar stats aggregate. Shared by the batch build, the batch
    append, and the streaming per-micro-batch fold so all three write
    bit-identical layouts."""
    toks = tokens(F.lower(F.col(text_col)))
    per_doc = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        toks.alias("ts"),
        F.size(toks).alias("dl"),
    )
    postings = per_doc.select(
        "doc_id",
        F.col("dl").cast("double").alias("dl"),
        F.explode(_doc_postings(F.col("ts"))).alias("p"),
    ).select(
        F.col("p.term").alias("term"),
        "doc_id",
        F.col("p.tf").alias("tf"),
        "dl",
        F.pmod(F.xxhash64("p.term"), F.lit(n_buckets)).alias("bucket"),
    )
    return postings, per_doc


def build_bm25_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Persist an inverted index for BM25: postings (term, doc_id, tf,
    dl) written as parquet PARTITIONED BY a term-hash bucket, corpus
    stats (n_docs, total_dl) as a JSON sidecar. The retrieval twin of
    `build_ivf_index`: tokenization + tf are paid ONCE at build time,
    and a later query reads only the ≤len(terms) bucket directories its
    terms hash into (literal partition filter → directory pruning at
    the scan), never the corpus.

    Scale shape: per-doc tf is computed map-side by sort+run-length
    (`_doc_postings`) so the only shuffle is the repartition-by-bucket
    that co-locates each bucket before the partitioned write (one file
    per bucket instead of tasks × buckets small files). dl rides
    denormalized on every posting — BM25's length norm then needs no
    doc-table join at query time. df is NOT stored: it is exactly the
    posting count of a term, recomputed from the (tiny) slice the query
    reads, which keeps appends trivially correct."""
    import json
    import os

    postings, per_doc = _postings_frame(docs, n_buckets, text_col, id_col)
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).first()
    postings.repartition(F.col("bucket")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)
    meta = {
        "n_docs": int(agg["n_docs"]),
        "total_dl": int(agg["total_dl"] or 0),
        "n_buckets": int(n_buckets),
    }
    with open(os.path.join(path, "_bm25_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _committed_segment_ids(path: str) -> list[int]:
    """Batch ids with a committed segment marker on disk, ascending —
    including stale ones below the compaction watermark that are still
    awaiting GC (callers picking a FRESH id must clear those too)."""
    import glob as _glob
    import json as _json
    import os as _os

    out = []
    for mp in _glob.glob(_os.path.join(path, "_stream", "_meta_b*.json")):
        with open(mp) as f:
            out.append(int(_json.load(f)["batch_id"]))
    return sorted(out)


def _fold_segment(
    docs: DataFrame,
    path: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> bool:
    """Write `docs`' postings as the committed incremental segment
    `path/_stream/batch=<batch_id>/` — partitioned parquet first,
    marker LAST, so a crash at any point leaves only an invisible
    markerless directory. The shared core of the streaming fold
    (streaming/bm25.fold_index_batch) and the batch
    `append_to_bm25_index`. Returns True if folded; False if skipped —
    the id is already committed, sits at/below the latest compaction
    generation's max_batch watermark (a replay of a segment compaction
    already folded), or `docs` is empty."""
    import json
    import os

    gen, _ = _index_live_state(path)
    if (
        batch_id in _committed_segment_ids(path)
        or (gen is not None and batch_id <= int(gen["max_batch"]))
        or docs.isEmpty()
    ):
        return False
    with open(os.path.join(path, "_bm25_meta.json")) as f:
        n_buckets = int(json.load(f)["n_buckets"])
    postings, per_doc = _postings_frame(docs, n_buckets, text_col, id_col)
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).first()
    seg = os.path.join(path, "_stream", f"batch={batch_id}")
    postings.repartition(F.col("bucket")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(seg)
    marker = os.path.join(path, "_stream", f"_meta_b{batch_id}.json")
    with open(marker, "w") as f:
        json.dump(
            {
                "batch_id": int(batch_id),
                "n_docs": int(agg["n_docs"]),
                "total_dl": int(agg["total_dl"] or 0),
            },
            f,
        )
    return True


def _effective_stats(path: str) -> tuple[int, int, int, dict, list]:
    """(n_docs, total_dl, n_buckets, live gen meta or None, live
    segment metas) over base + committed incremental parts."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_bm25_meta.json")) as f:
        meta = _json.load(f)
    gen, segs = _index_live_state(path)
    n, t = int(meta["n_docs"]), int(meta["total_dl"])
    if gen is not None:
        n += int(gen["n_docs"])
        t += int(gen["total_dl"])
    for m in segs:
        n += int(m["n_docs"])
        t += int(m["total_dl"])
    return n, t, int(meta["n_buckets"]), gen, segs


def append_to_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally index new documents — crash-safe: the postings
    land as a committed segment (`_fold_segment`, marker-last, batch
    id = current watermark + 1), so a killed append leaves an invisible
    markerless directory instead of base rows whose sidecar counts
    never landed. The base partitions are never rewritten;
    `compact_bm25_index` later folds accumulated appends exactly like
    stream segments. Exact, not approximate — sidecars store total_dl
    (not avgdl) so the merged average is the true corpus average, and
    df is always recomputed from postings at query time so it can't go
    stale. Single writer at a time (an id race with a live stream or a
    concurrent append is the caller's lock to take). Returns the
    effective corpus stats over base + all committed parts, which equal
    a from-scratch build's sidecar on the same corpus (parity-pinned)."""
    gen, _ = _index_live_state(path)
    ids = _committed_segment_ids(path)
    floor = int(gen["max_batch"]) if gen is not None else -1
    next_id = max([floor] + ids) + 1
    _fold_segment(docs, path, next_id, text_col, id_col)
    n_docs, total_dl, n_buckets, _, _ = _effective_stats(path)
    return {
        "n_docs": n_docs,
        "total_dl": total_dl,
        "n_buckets": n_buckets,
    }


def _index_live_state(path: str) -> tuple[dict | None, list[dict]]:
    """Crash-safe view of a persisted BM25 index's incremental parts:
    (latest COMMITTED compaction generation's meta or None, committed
    streaming-segment metas not folded into it, batch-ascending).

    A part is committed iff its marker file exists (`_compacted/
    _meta_gG.json` / `_stream/_meta_bN.json`), and visibility hangs off
    ONE watermark: Structured Streaming batch ids are monotone, so a
    segment is live iff `batch_id > gen["max_batch"]`. Anything a
    crashed compaction cleanup left behind — an older generation, an
    already-folded segment whose directory still exists — is below the
    watermark and therefore never read and never counted, which is what
    makes `compact_bm25_index` safe to kill at any point."""
    import glob as _glob
    import json as _json
    import os as _os

    gens = []
    for mp in _glob.glob(_os.path.join(path, "_compacted", "_meta_g*.json")):
        with open(mp) as f:
            gens.append(_json.load(f))
    gen = max(gens, key=lambda m: int(m["gen"])) if gens else None
    floor = int(gen["max_batch"]) if gen else -1
    segs = []
    for mp in _glob.glob(_os.path.join(path, "_stream", "_meta_b*.json")):
        with open(mp) as f:
            m = _json.load(f)
        if int(m["batch_id"]) > floor:
            segs.append(m)
    return gen, sorted(segs, key=lambda m: int(m["batch_id"]))


def bm25_against_index(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-k BM25 over a `build_bm25_index` index. Reads ONLY the
    bucket partitions the query terms hash into (the bucket predicate
    is a literal IN list → PartitionFilters directory pruning; the term
    predicate pushes to parquet row groups inside them), computes df as
    the posting count per term from that slice, scores each posting
    map-side, and groupBy-sums the ≤len(terms) postings per doc.

    Same arithmetic, rounding (6dp) and (score desc, doc_id) tie-break
    as `bm25_rank`, so on matching docs the two rankings agree exactly
    (parity-pinned). Difference inherent to any inverted index: only
    docs containing ≥1 query term are candidates — bm25_rank ranks
    score-0 docs too when fewer than top_k docs match.

    If the index has COMMITTED incremental parts (streaming/bm25.py:
    `path/_stream/batch=N/` segments and at most one live
    `path/_compacted/gen=G/` compaction generation, each committed iff
    its marker file exists), they are unioned in with the same
    bucket/term pruning — the batch=/gen=/bucket= partition filters are
    all literal, so the scan still reads only the query's slice.
    Uncommitted (markerless) parts and parts subsumed by the live
    generation (`_index_live_state`) are invisible: both their rows and
    their sidecar counts are excluded, keeping a crashed half-written
    fold — or a compaction killed at ANY point — unreadable."""
    import os

    if not query_terms:
        raise ValueError("bm25_against_index needs at least one term")
    tot_docs, tot_dl, n_buckets, gen, segs = _effective_stats(path)
    stream_dir = os.path.join(path, "_stream")
    committed = [int(bm["batch_id"]) for bm in segs]
    n_docs = float(tot_docs)
    avgdl = tot_dl / tot_docs if tot_docs else 1.0
    # buckets for the literal IN filter: hash the terms with the SAME
    # engine function used at build time (one O(len(terms)) local job)
    bdf = spark.createDataFrame(
        [(t,) for t in query_terms], "term string"
    ).select(
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("bucket")
    )
    buckets = sorted({r["bucket"] for r in bdf.collect()})
    # explicit schema: skips footer-sampling inference AND keeps an
    # empty base (index built before any docs, stream-only ingest)
    # readable — an all-partition-pruned dir has no file to infer from
    cols = "term string, doc_id long, tf double, dl double"
    post = (
        spark.read.schema(f"{cols}, bucket bigint")
        .parquet(path)
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(query_terms))
    )
    if gen is not None:
        gp = (
            spark.read.schema(f"{cols}, bucket bigint")
            .parquet(
                os.path.join(path, "_compacted", f"gen={int(gen['gen'])}")
            )
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(query_terms))
        )
        post = post.unionByName(gp)
    if committed:
        sp = (
            spark.read.schema(f"{cols}, bucket bigint, batch bigint")
            .parquet(stream_dir)
            .where(F.col("batch").isin(committed))
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(query_terms))
            .drop("batch")
        )
        post = post.unionByName(sp)
    df_tbl = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = post.join(F.broadcast(df_tbl), "term")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
    ranked = per_doc.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return ranked.withColumn("rk", F.row_number().over(w))


def rrf_fuse(
    rankings: list[DataFrame],
    k0: float = 60.0,
    top_k: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Reciprocal-rank fusion of ≥1 ranked candidate lists →
    (doc_id, rrf, n_legs, rk ≤ top_k).

    score(d) = Σ over the legs that ranked d of 1/(k0 + rank_leg(d)) —
    the standard hybrid-retrieval combiner (Cormack, Clarke & Büttcher,
    SIGIR 2009; k0=60 is the paper's constant). Rank-based, so lexical
    (BM25) and dense (cosine) legs fuse without score calibration.

    Inputs are TOP-K CANDIDATE LISTS (each leg's own ranker already did
    the corpus-scale work and kept k rows), so the union/groupBy here
    moves O(Σ leg k) rows no matter the corpus size — the fusion itself
    is never the bottleneck. rrf is rounded to 6dp before ranking with a
    doc_id tie-break: the per-doc sum has at most len(rankings) terms,
    so the double is engine-order-independent after rounding and the
    fused top-k is deterministic (the repo-wide cross-engine rule).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    legs = [
        df.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(rank_col).cast("long").alias("_rk"),
        )
        for df in rankings
    ]
    u = legs[0]
    for df in legs[1:]:
        u = u.unionByName(df)
    fused = u.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("_rk"))), 6
        ).alias("rrf"),
        F.count(F.lit(1)).cast("long").alias("n_legs"),
    )
    ranked = fused.orderBy(
        F.col("rrf").desc(), F.col(id_col).asc()
    ).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return ranked.withColumn("rk", F.row_number().over(w))


def hybrid_rank(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    k_each: int = 20,
    top_k: int = 10,
    k0: float = 60.0,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """BM25 + dense-cosine hybrid search over an aligned corpus
    (documents and their embeddings share an id space) → the rrf_fuse
    output shape. Convenience composition: each leg is the existing
    corpus-scale ranker (bm25_rank's map-side tf, knn_bruteforce's
    broadcast-query scan), fusion touches only 2·k_each rows."""
    from .similarity import knn_bruteforce

    lexical = bm25_rank(docs, query_terms, top_k=k_each, id_col=id_col)
    q = docs.sparkSession.createDataFrame(
        [(0, [float(x) for x in query_vec])],
        "query_id long, embedding array<double>",
    )
    dense = knn_bruteforce(embeddings, q, k=k_each).select(
        F.col(vec_id_col).alias(id_col), "rank"
    )
    return rrf_fuse(
        [
            lexical.select(id_col, "rk"),
            dense.withColumnRenamed("rank", "rk"),
        ],
        k0=k0,
        top_k=top_k,
        id_col=id_col,
    )


def ranking_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Ranking evaluation → one row per query: (query_id, n_rel,
    n_hits_at_k, recall_at_k, mrr, ndcg_at_k) — the metrics half of
    the retrieval suite (bm25_rank / hybrid_rank / rrf_fuse produce
    the (query, doc, rank) shape this consumes; `qrels` is the
    binary-relevance gold set (query_id, doc_id)).

    All metrics are per-query aggregations over ≤k joined rows:
    recall@k = hits/|rel|, MRR = 1/first-hit-rank (0 when no hit),
    NDCG@k = Σ_hit 1/log2(rank+1) normalized by the ideal prefix
    Σ_{i≤min(|rel|,k)} 1/log2(i+1). One equi-join on (query, doc) +
    one hash agg on query + a broadcast-sized join back to per-query
    rel counts; macro-average by `.agg(F.avg(...))` downstream.
    Pytest- not oracle-gated: the log2 discount sums are float
    accumulations whose cross-engine summation order differs (the
    merge_evidence caveat); parity is pinned vs a Python restatement.
    """
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    ranked_k = ranked.select(
        q.alias("qid"), d.alias("did"), r.cast("long").alias("rk")
    ).where(F.col("rk") <= k)
    rel = qrels.select(
        F.col(query_col).alias("qid"), F.col(doc_col).alias("did")
    ).distinct()
    nrel = rel.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = ranked_k.join(rel, ["qid", "did"])
    per_q = hits.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_hits_at_k"),
        F.min("rk").alias("first_hit"),
        F.sum(1.0 / F.log2(F.col("rk") + 1.0)).alias("dcg"),
    )
    ideal = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return (
        nrel.join(per_q, "qid", "left")
        .select(
            F.col("qid").alias(query_col),
            "n_rel",
            F.coalesce("n_hits_at_k", F.lit(0)).alias("n_hits_at_k"),
            (
                F.coalesce("n_hits_at_k", F.lit(0))
                / F.col("n_rel").cast("double")
            ).alias("recall_at_k"),
            F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)).alias(
                "mrr"
            ),
            (F.coalesce("dcg", F.lit(0.0)) / ideal).alias("ndcg_at_k"),
        )
    )


def assemble_context(
    ranked: DataFrame,
    budget_tokens: int,
    query_col: str = "query_id",
    rank_col: str = "rk",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """RAG context assembly: walk each query's candidates in rank
    order and keep documents until the token budget fills → input
    columns + `cum_tokens` (the running total INCLUDING the row).

    Admission rule is the repo's budget rule (mixture_sample /
    stream_budget_admit): a doc is kept iff the total BEFORE it is
    under budget — the crossing doc ships, so the best-ranked chunk
    always makes it even when it alone exceeds the budget. One window
    cumsum per query (the partition is a candidate list, k-sized by
    construction — the ranker already did the corpus-scale work).

    The cumsum window tie-breaks equal ranks on `doc_id` when the
    input carries one (rank() rankers emit ties; a tie-order-dependent
    cumsum would make the admitted subset nondeterministic). Without a
    doc_id column, rank_col must be unique per query (row_number
    rankers — every entry-point caller here).
    """
    from pyspark.sql import Window as _W

    order = [F.col(rank_col).asc()]
    if "doc_id" in ranked.columns:
        order.append(F.col("doc_id").asc())
    w = (
        _W.partitionBy(query_col)
        .orderBy(*order)
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    out = ranked.withColumn("cum_tokens", cum)
    return out.where(
        F.col("cum_tokens") - F.col(tokens_col) < F.lit(int(budget_tokens))
    )
