"""Streaming MinHash-LSH near-dup candidates — `applyInPandasWithState`.

Batch near-dup (`operators/dedup.minhash_candidate_pairs`) sees the whole
corpus at once; a streaming ingest pipeline needs candidates AS DOCUMENTS
ARRIVE (dedup a tokenized firehose against everything already admitted).
The LSH band bucket becomes the GroupState key: the state holds the doc
ids previously seen in that (band_idx, band_key) bucket, and every new
arrival emits one candidate pair per stored member — so after any prefix
of the stream, the emitted pair set equals the batch LSH candidate set
over the documents seen so far (pair orientation (earlier, later) matches
the batch (min, max) whenever replay is id-ordered; the parity test pins
set equality under {min, max} normalization). Candidates, not verdicts:
exact verification joins downstream, exactly like the batch contract.

State is bounded: `max_bucket` ids per bucket (default 256). A bucket past
the cap stops ACCUMULATING (first arrivals win — deterministic) but keeps
emitting pairs against its stored members; recall against a hyper-hot
bucket degrades exactly like batch LSH under a band-key hot spot, and a
production run shards such buckets or raises the cap. At 100 TB the state
store carries |buckets|·(≤cap) ids — the same order as the batch band
exchange, amortized across the stream's lifetime.
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

NEARDUP_IN_SCHEMA = StructType([
    StructField("band_idx", IntegerType()),
    StructField("band_key", LongType()),
    StructField("doc_id", StringType()),
    StructField("oid", LongType()),       # numeric arrival-order id
])

NEARDUP_STATE_SCHEMA = StructType([StructField("seen", StringType())])

NEARDUP_OUT_SCHEMA = StructType([
    StructField("id_a", StringType()),
    StructField("id_b", StringType()),
])


def _make_neardup_fn(max_bucket: int):
    def _neardup_state_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("oid", kind="mergesort")
        seen: list[str] = (
            state.get[0].split("\x1f") if state.exists and state.get[0] else []
        )
        pairs_a: list[str] = []
        pairs_b: list[str] = []
        for doc in batch["doc_id"]:
            for prev in seen:
                if prev != doc:
                    pairs_a.append(prev)
                    pairs_b.append(doc)
            if len(seen) < max_bucket:
                seen.append(doc)
        state.update(("\x1f".join(seen),))
        yield pd.DataFrame({"id_a": pairs_a, "id_b": pairs_b})

    return _neardup_state_fn


def neardup_stream(banded: DataFrame, max_bucket: int = 256) -> DataFrame:
    """Streaming LSH candidate pairs over a NEARDUP_IN_SCHEMA stream (one
    row per (band, doc) — produce it with `operators.dedup.lsh_band_rows`,
    which is pure column expressions). Emits (id_a, id_b) with
    id_a the earlier arrival; the same pair can surface from several bands
    (and, for re-keyed replays, several batches) — consumers de-duplicate,
    exactly as they do for the batch band join. Stored ids are serialized
    with a \\x1f separator — doc ids must not contain that byte."""
    if max_bucket <= 0:
        raise ValueError(f"max_bucket must be positive, got {max_bucket}")
    return (
        banded.groupBy("band_idx", "band_key")
        .applyInPandasWithState(
            _make_neardup_fn(max_bucket),
            outputStructType=NEARDUP_OUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
