"""Custom stateful streaming operator: per-conversation running entity
statistics via applyInPandasWithState.

The batch pipeline gets resume from the lineage table; a LIVE feed needs
true incremental state — this operator keeps, per conv_id, the running
mention count and the distinct-surface cardinality across micro-batches,
checkpointed by Structured Streaming (state survives query restarts; the
resume test drives two availableNow runs over a growing landing dir and
asserts accumulation).

State design for scale: the per-key state stores a COUNT and a bounded
surface-hash set (int64 xxhash-style hashes, capped at `max_tracked`),
not surface strings — a conversation with 10^8 turns keeps O(cap) state.
Beyond the cap the distinct count degrades to a lower bound, flagged by
`saturated` (production would switch to an HLL sketch; the plumbing —
grouped state, timeout config, update semantics — is identical).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_mentions", T.LongType(), False),
        T.StructField("surface_hashes", T.ArrayType(T.LongType()), False),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_mentions", T.LongType(), False),
        T.StructField("n_distinct_surfaces", T.LongType(), False),
        T.StructField("saturated", T.BooleanType(), False),
    ]
)

_MAX_TRACKED = 10_000


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_mentions, hashes = state.get
        seen = set(hashes)
    else:
        n_mentions, seen = 0, set()
    for pdf in pdfs:
        n_mentions += len(pdf)
        if len(seen) < _MAX_TRACKED:
            for t in pdf["text"]:
                seen.add(zlib.crc32(t.encode("utf-8")))
                if len(seen) >= _MAX_TRACKED:
                    break
    state.update((n_mentions, list(seen)))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_mentions": [n_mentions],
            "n_distinct_surfaces": [len(seen)],
            "saturated": [len(seen) >= _MAX_TRACKED],
        }
    )


def running_entity_stats(entities: DataFrame) -> DataFrame:
    """Streaming entities(conv_id, …, text) → per-conv running stats,
    one updated row per conv per micro-batch."""
    return (
        entities.select("conv_id", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------ token-budget admission

BUDGET_STATE_SCHEMA = T.StructType(
    [T.StructField("cum_tokens", T.LongType(), False)]
)

BUDGET_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("cum_tokens", T.LongType(), False),
    ]
)


def stream_budget_admit(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of `curation.mixture_sample`: admit documents into
    a per-domain token budget as they ARRIVE, with the running total as
    grouped state — the live-ingest side of Pile/Dolma domain mixing
    (cut the feed off the moment a domain's budget fills, instead of
    over-collecting and resampling in batch).

    Admission rule is the batch rule exactly: a doc is admitted iff the
    group's running total BEFORE it is under budget — the crossing doc
    ships, so a domain with any docs makes progress even when its budget
    is below its shortest doc. Within a micro-batch docs are walked in
    the same deterministic (md5-uniform, id) order as the batch op, so
    one availableNow batch reproduces `mixture_sample`'s survivor set
    bit-for-bit (parity-pinned in tests); across batches, arrival order
    decides — a stream cannot see future documents, which IS the
    semantic difference between the two, stated rather than hidden.

    State per group is ONE int64 (the admitted-token total): bounded by
    construction, no eviction needed. The admit mask inside a batch is a
    vectorized monotone-prefix cumsum, not a per-row loop.
    """
    budget_map = {str(k): int(v) for k, v in budgets.items()}
    dflt = int(default_budget)
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(float(1 << 32))
    from ..functions.text import token_count

    prepped = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(group_col).cast("string").alias("group"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        u.alias("_u"),
    )

    def admit(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        group = key[0]
        budget = budget_map.get(group, dflt)
        cum = state.get[0] if state.exists else 0
        # concat the group's chunks so the (u, id) walk covers the WHOLE
        # micro-batch (a per-chunk sort would order arbitrarily-split
        # chunks independently); the group holds (id, counts) metadata
        # only, never text — the bin_pack stance
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["_u", "doc_id"]).reset_index(drop=True)
        inc = pdf["n_tokens"].cumsum()
        # exclusive prefix + carried total < budget (monotone mask)
        mask = (inc - pdf["n_tokens"] + cum) < budget
        kept = pdf[mask]
        if len(kept):
            yield pd.DataFrame(
                {
                    "doc_id": kept["doc_id"],
                    "group": group,
                    "n_tokens": kept["n_tokens"],
                    "cum_tokens": inc[mask] + cum,
                }
            )
            cum = int((inc[mask] + cum).iloc[-1])
        state.update((cum,))

    return prepped.groupBy("group").applyInPandasWithState(
        admit,
        BUDGET_OUTPUT_SCHEMA,
        BUDGET_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.IntegerType(), False),
        T.StructField("t0", T.LongType(), False),
        T.StructField("tprev", T.LongType(), False),
    ]
)

_T_UNSET = -(2**63)


def stream_funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of `sessions.funnel`: per-key funnel progression
    maintained as grouped state while events ARRIVE — the live
    conversion tracker. State per key is THREE scalars (stage,
    first-match µs, last-match µs): bounded by construction, no
    timeout needed, and advancing is monotone so replaying a
    micro-batch after a crash is a value-level no-op (any advance the
    replay could make was already made from the same state).

    Within one micro-batch the greedy earliest-chain walk is the batch
    rule exactly, so ONE availableNow batch over a corpus reproduces
    `funnel`'s output bit-for-bit (parity-pinned). Across batches
    arrival order decides: a stage consumed in generation g cannot
    backtrack onto a later-arriving earlier timestamp — a stream
    cannot see the future; stated, same stance as stream_budget_admit.

    Emits a snapshot row whenever a key's state changes (and on first
    sight, so stage-0 keys with step-type events appear once).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    step_list = [str(s) for s in steps]
    # key keeps its NATIVE type (string conv ids included) — an ANSI
    # cast to long here would crash on the very keys the batch twin
    # accepts; the output schema is built from the input's key type
    key_type = events.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("key", key_type, True),
            T.StructField("stage", T.IntegerType(), False),
            T.StructField("ts_first_us", T.LongType(), True),
            T.StructField("ts_last_us", T.LongType(), True),
        ]
    )
    prep = events.where(
        F.col(type_col).isin(step_list) & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(type_col).cast("string").alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )

    def upd(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        existed = state.exists
        stage, t0, tprev = state.get if existed else (0, _T_UNSET, _T_UNSET)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        arrs = {
            s: np.sort(pdf.loc[pdf["t"] == s, "us"].to_numpy())
            for s in step_list
        }
        changed = False
        for si in range(stage, len(step_list)):
            a = arrs[step_list[si]]
            cand = a[a > tprev]
            if len(cand) == 0:
                break
            tprev = int(cand[0])
            stage += 1
            if t0 == _T_UNSET:
                t0 = tprev
            changed = True
        state.update((stage, t0, tprev))
        if changed or not existed:
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "stage": [stage],
                    "ts_first_us": [None if t0 == _T_UNSET else t0],
                    "ts_last_us": [
                        None if stage == 0 else tprev
                    ],
                }
            )

    return prep.groupBy("key").applyInPandasWithState(
        upd,
        out_schema,
        FUNNEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
