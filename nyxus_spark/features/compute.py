"""Feature extraction as a narrow Spark transformation.

One input row = one entity-version whose `tokens` array is the nyxus "pixel
cloud" (/root/reference/src/nyx/roi_cache.h:48); features are per-row, so the
whole extraction is mapInPandas — zero shuffle, scales linearly with input
splits on a 1000-executor cluster. Inside each Arrow batch the kernels are
segment-vectorized numpy (see segmented.py), the engine's analog of nyxus's
reduce phase (src/nyx/reduce_trivial_rois.cpp) without the per-ROI thread pool:
Spark tasks are the parallelism, numpy the vector unit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

from nyxus_spark.features.registry import plan_sections, resolve_features
from nyxus_spark.settings import DEFAULT_SETTINGS, FeatureSettings


def extract_features(
    df: DataFrame,
    features: list[str] | None = None,
    settings: FeatureSettings = DEFAULT_SETTINGS,
    tokens_col: str = "tokens",
    keep_tokens: bool = True,
    annotations: list[str] | None = None,
) -> DataFrame:
    """Append one float64 column per requested feature.

    `features` accepts nyxus-style names and groups (*ALL_INTENSITY*, *ALL*…).
    Section gating mirrors the reference's `required()` checks — only kernels
    whose features are requested ever run (featureset pruning, SURVEY.md §2 F6).

    `annotations` names input columns to pass through as string columns
    `anno0..anno{k-1}` ahead of the feature columns — the reference's
    optional per-ROI annotation passthrough (src/nyx/output_2_csv.cpp:62-80
    emits `anno{i}` headers before the feature headers).
    """
    if annotations:
        from pyspark.sql import functions as F

        missing = [a for a in annotations if a not in df.columns]
        if missing:
            raise ValueError(f"annotation columns not in input: {missing}")
        clash = [f"anno{i}" for i in range(len(annotations))
                 if f"anno{i}" in df.columns]
        if clash:
            raise ValueError(f"annotation output names already present: {clash}")
        df = df.select(
            "*",
            *[F.col(a).cast("string").alias(f"anno{i}")
              for i, a in enumerate(annotations)],
        )
    names = resolve_features(features)
    section_list = plan_sections(names)

    in_fields = [f for f in df.schema.fields if keep_tokens or f.name != tokens_col]
    existing = {f.name for f in in_fields}
    feat_fields = [StructField(n, DoubleType()) for n in names if n not in existing]
    out_schema = StructType(in_fields + feat_fields)
    out_cols = [f.name for f in in_fields] + [f.name for f in feat_fields]
    wanted = [f.name for f in feat_fields]

    # capture plain values (picklable, no Spark objects) in the closure
    sec_fns = [(s.name, s.fn) for s in section_list]

    def gen(batches):
        # Arrow-native path: the tokens ListArray's values buffer + offsets
        # ARE the Segments layout — no pandas conversion, no per-row numpy
        # object allocation, one contiguous cast of the value buffer. On this
        # sandbox (first-touch page faults ~100× normal cost) the avoided
        # allocations are the dominant saving; on real hardware it removes
        # the Arrow→pandas→numpy round-trip per batch.
        import os
        import time

        import pyarrow as pa
        import pyarrow.compute as pc

        from nyxus_spark.features.segmented import Segments

        # Opt-in in-worker kernel timer (NYXUS_KERNEL_TIMING_DIR): measures the
        # compute span only — Segments construction → section kernels → output
        # RecordBatch assembly — EXCLUDING Arrow IPC transfer, shuffle, and
        # sink IO. Per-row kernel time at two parallelism levels isolates
        # "does the compute itself degrade with more workers" (cache/bus
        # contention) from host-side serialization outside the kernels; the
        # scaling-efficiency protocol in BENCH/BASELINE.md reads these files.
        # The NON-kernel worker span is split too (VERDICT r4 diagnostic):
        # `feed` = time blocked on the input iterator (JVM scan + Arrow IPC
        # in), `emit` = time between yielding a batch and being resumed
        # (Arrow IPC out + downstream serialization back-pressure) — so
        # wall ≈ feed + kernel + emit per worker, and a scaling pair can
        # attribute its end-to-end shortfall to a specific transport leg.
        timing_dir = os.environ.get("NYXUS_KERNEL_TIMING_DIR")
        k_sec = 0.0
        k_rows = 0
        feed_sec = 0.0
        emit_sec = 0.0
        it = iter(batches)
        try:
            while True:
                tf0 = time.perf_counter() if timing_dir else 0.0
                try:
                    rb = next(it)
                except StopIteration:
                    break
                t0 = time.perf_counter() if timing_dir else 0.0
                if timing_dir:
                    feed_sec += t0 - tf0
                tok_i = rb.schema.get_field_index(tokens_col)
                arr = rb.column(tok_i)
                lengths = (
                    pc.fill_null(pc.list_value_length(arr), 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                )
                flat = arr.flatten().to_numpy(zero_copy_only=False)
                seg = Segments.from_flat(flat, lengths)
                vals: dict = {}
                for _, fn in sec_fns:
                    vals.update(fn(seg, settings))
                cols, names = [], []
                for f in in_fields:
                    cols.append(rb.column(rb.schema.get_field_index(f.name)))
                    names.append(f.name)
                for n in wanted:
                    cols.append(pa.array(np.asarray(vals[n], dtype=np.float64),
                                         type=pa.float64()))
                    names.append(n)
                out = pa.RecordBatch.from_arrays(cols, names=names)
                if timing_dir:
                    k_sec += time.perf_counter() - t0
                    k_rows += rb.num_rows
                    ty0 = time.perf_counter()
                    yield out
                    emit_sec += time.perf_counter() - ty0
                else:
                    yield out
        finally:
            if timing_dir and k_rows:
                try:
                    with open(os.path.join(timing_dir, f"k_{os.getpid()}.jsonl"), "a") as fh:
                        fh.write(
                            '{"rows": %d, "sec": %.6f, "nsec": %d,'
                            ' "feed": %.6f, "emit": %.6f}\n'
                            % (k_rows, k_sec, len(sec_fns), feed_sec, emit_sec))
                except OSError:
                    pass  # timing is best-effort; never fail the task

    return df.mapInArrow(gen, out_schema)
