"""Streaming sequence packing — `applyInPandasWithState`.

The batch packer (operators/packing.py) assigns documents to fixed-capacity
context windows by a per-shard running token offset. Streaming ingest needs
the same assignment to be made AS DOCUMENTS ARRIVE — a training-data
pipeline that tokenizes a firehose can't re-sort the corpus first — so the
running offset becomes per-shard GroupState: one BIGINT per shard, carried
across micro-batches. Within a micro-batch documents are ordered by their
numeric id (deterministic); across batches the offset continues where the
previous batch stopped, so the assignment equals the batch packer's
whenever the replay delivers each shard's documents in id order (file
replay of id-ranged files and per-key-ordered Kafka both satisfy this —
the parity test drives maxFilesPerTrigger=1 over id-split files).

State is O(1) per shard (a single offset), so the state store stays trivial
at any corpus size; shards bound parallelism exactly like the batch op.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PACK_IN_SCHEMA = StructType([
    StructField("pack_shard", IntegerType()),
    StructField("doc_id", StringType()),
    StructField("oid", LongType()),       # numeric within-shard order id
    StructField("n_tok", LongType()),
])

PACK_STATE_SCHEMA = StructType([StructField("off", LongType())])

PACK_OUT_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("pack_shard", IntegerType()),
    StructField("pack_start", LongType()),
    StructField("pack_first", LongType()),
    StructField("pack_last", LongType()),
    StructField("pack_spans", IntegerType()),
    StructField("pack_head_fill", LongType()),
])


def _make_pack_fn(capacity: int):
    def _pack_state_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("oid", kind="mergesort")
        off = int(state.get[0]) if state.exists else 0
        n = batch["n_tok"].astype("int64")
        cum = off + n.cumsum()
        start = cum - n
        first = start // capacity
        last = (cum - 1) // capacity
        out = pd.DataFrame({
            "doc_id": batch["doc_id"],
            "pack_shard": key[0],
            "pack_start": start,
            "pack_first": first,
            "pack_last": last,
            "pack_spans": (last > first).astype("int32"),
            "pack_head_fill": pd.concat(
                [n, capacity * (first + 1) - start], axis=1).min(axis=1),
        })
        state.update((int(cum.iloc[-1]) if len(cum) else off,))
        yield out.astype({"pack_shard": "int32", "pack_start": "int64",
                          "pack_first": "int64", "pack_last": "int64",
                          "pack_spans": "int32", "pack_head_fill": "int64"})

    return _pack_state_fn


def pack_stream(tagged: DataFrame, capacity: int) -> DataFrame:
    """Streaming packing over a PACK_IN_SCHEMA stream: one output row per
    document with the same columns the batch `pack_sequences` emits."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    return (
        tagged.groupBy("pack_shard")
        .applyInPandasWithState(
            _make_pack_fn(capacity),
            outputStructType=PACK_OUT_SCHEMA,
            stateStructType=PACK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
