"""Stateful streaming candidate-pair generation (applyInPandasWithState).

The batch engine pairs records by self-joining the block table
(operators/pairs.py candidate_pairs). A stream cannot self-join its own
past without unbounded stream-stream join state it has no control
over, so the streaming analogue keeps explicit per-block-key state:
the record ids seen so far under each key. When a new record arrives
it emits (old, new) for every stored id, then joins the stored set —
each cross-batch pair is produced exactly once, in the micro-batch
where its LATER record arrives.

Hot keys get the same treatment cap_blocks gives them in batch
(operators/blocking.py): once a key's state reaches ``max_block_size``
ids it stops storing AND stops emitting — a celebrity key degenerates
into O(n²) pair volume otherwise, and at stream scale that state never
dies. This is the explicit state-size bound that makes the operator
100-TB-safe: state is O(keys × min(block, cap)), not O(records²).

No reference analogue (the reference is pure batch; SURVEY.md §2.13) —
this is the engine's own streaming surface, the custom-stateful-
operator slot (applyInPandasWithState) of the build brief.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

PAIR_SCHEMA = StructType(
    [
        StructField("block_key", StringType()),
        StructField("id1", StringType()),
        StructField("id2", StringType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("ids", ArrayType(StringType()))])


def _make_pair_fn(max_block_size: int):
    def emit_pairs(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (block_key,) = key
        (seen,) = state.get if state.exists else ([],)
        seen = list(seen)
        seen_set = set(seen)  # O(1) membership; `seen` keeps emit order
        capped = len(seen) >= max_block_size
        out_id1: list[str] = []
        out_id2: list[str] = []
        for pdf in pdfs:
            # deterministic within a micro-batch regardless of arrival
            # partitioning: process ids in sorted order
            for rid in sorted(pdf["record_id"].dropna().unique()):
                # capped first: a celebrity key in steady state skips
                # each further record in O(1), not O(cap) list scans
                if capped or rid in seen_set:
                    continue  # capped, or replayed record (idempotent)
                for old in seen:
                    a, b = (old, rid) if old < rid else (rid, old)
                    out_id1.append(a)
                    out_id2.append(b)
                seen.append(rid)
                seen_set.add(rid)
                if len(seen) >= max_block_size:
                    capped = True
        state.update((seen,))
        if out_id1:
            yield pd.DataFrame(
                {"block_key": block_key, "id1": out_id1, "id2": out_id2}
            )

    return emit_pairs


def streaming_candidate_pairs(
    blocks_stream: DataFrame, max_block_size: int = 2000
) -> DataFrame:
    """blocks_stream(record_id, block_key) -> (block_key, id1, id2)
    with id1 < id2, each pair emitted once per key family. Downstream
    dedups across key families exactly like batch (dropDuplicates on
    the canonical pair — a stateful streaming dedup Spark provides
    natively).

    State per key is the id list, capped at ``max_block_size`` — the
    streaming twin of cap_blocks' hot-key drop: a capped key emits
    nothing further (bounded state, bounded output)."""
    return blocks_stream.groupBy("block_key").applyInPandasWithState(
        _make_pair_fn(max_block_size),
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
