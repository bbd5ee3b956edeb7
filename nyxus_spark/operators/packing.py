"""Sequence packing: assign documents to fixed-capacity context windows.

The training-batch packing pass of an LLM data pipeline: token streams are
concatenated shard-locally in a deterministic order and sliced every
`capacity` tokens (the standard concat-then-chunk model — a document
starting at shard offset o lands in pack o // capacity and may span into
the following pack). All arithmetic is exact BIGINT on integer token
counts, so the assignment is engine-reproducible and SQL-replayable — the
same property the repo's deterministic sampling and chunking ops carry.

Scale shape: ONE hash exchange on the shard key, then a per-shard window
sort that runs whole-stage in the JVM. Shards come from the same
(id·MIX mod P31) mix as functions.text.deterministic_sample, so the
layout is re-derivable forever; size n_shards to the cluster (each
shard's window sorts independently, so 1000 executors want ≥ thousands of
shards at 100 TB — the per-shard state is just a running BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MIX = 2654435761
_P31 = 2147483647


def shard_expr(id_expr: Column, n_shards: int) -> Column:
    """Deterministic shard in [0, n_shards) from the (id·MIX mod P31) mix —
    shared by the batch packer and the streaming packer so both lay out the
    same shard streams."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return F.pmod(
        F.pmod((id_expr.cast("bigint") % _P31) * F.lit(_MIX % _P31), F.lit(_P31)),
        F.lit(n_shards),
    ).cast("int")


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_expr: Column,
    n_shards: int = 8,
    len_col: str = "n_tok",
) -> DataFrame:
    """Assign each row (a document with `len_col` tokens) to context-window
    packs of `capacity` tokens under shard-local concat-then-chunk.

    `id_expr` must be a deterministic integer column expression (it drives
    both the shard hash and the within-shard order, so ties are impossible
    when ids are unique). Adds:

    - pack_shard      hash shard in [0, n_shards)
    - pack_start      starting token offset within the shard's concat stream
    - pack_first      pack index of the document's first token
    - pack_last       pack index of its last token
    - pack_spans      1 when the document crosses a pack boundary
    - pack_head_fill  tokens the document contributes to its first pack

    Zero-length rows get pack_start at the running offset and
    pack_head_fill = 0; their pack_last is degenerate (start − 1 offset) —
    filter them out upstream when that matters.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    out = (df.withColumn("pack_shard", shard_expr(id_expr, n_shards))
           .withColumn("_pack_oid", id_expr.cast("bigint")))
    w = (
        Window.partitionBy("pack_shard")
        .orderBy("_pack_oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        out.withColumn("_pack_cum", F.sum(F.col(len_col).cast("bigint")).over(w))
        .withColumn("pack_start", F.col("_pack_cum") - F.col(len_col))
        # `div` is BIGINT integer division — offsets never round through a
        # double, so the math stays exact past 2^53 tokens per shard
        .withColumn("pack_first", F.expr(f"pack_start div {capacity}"))
        .withColumn("pack_last", F.expr(f"(_pack_cum - 1) div {capacity}"))
        .withColumn(
            "pack_head_fill",
            F.least(
                F.col(len_col).cast("bigint"),
                F.lit(capacity) * (F.col("pack_first") + 1) - F.col("pack_start"),
            ),
        )
        .withColumn("pack_spans", (F.col("pack_last") > F.col("pack_first")).cast("int"))
        .drop("_pack_cum", "_pack_oid")
    )
    return out


def pack_ffd(
    df: DataFrame,
    capacity: int,
    id_expr: Column,
    n_shards: int = 8,
    len_col: str = "n_tok",
) -> DataFrame:
    """First-Fit-DECREASING bin packing — the DOCUMENT-INTEGRITY packer
    (every document stays whole in exactly one context window; the
    concat-then-chunk packer above splits at boundaries instead — the two
    standard trainer layouts). Within each shard, documents in
    (len DESC, id ASC) order go into the FIRST bin with room, else a new
    bin opens; FFD's classic guarantee is ≤ 11/9·OPT + 6/9 bins. A document
    longer than `capacity` always opens its own (overfull) bin.

    The greedy is a sequential branching fold → ONE Catalyst aggregate()
    over the shard's sorted doc list (struct state {loads, assignments};
    per-element work O(bins), shard-local exactly like pack_sequences).
    The DuckDB oracle replays it with a RECURSIVE CTE, one document per
    recursion step (the LZ78 replay class) — fully value-gateable.

    Adds per row: ``ffd_bin`` (1-based bin within the shard), ``ffd_load``
    (that bin's FINAL token load), ``ffd_bins`` (the shard's bin count),
    plus ``pack_shard``. Zero-length docs fit bin 1 (or open it)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    out = (df.withColumn("pack_shard", shard_expr(id_expr, n_shards))
           .withColumn("_oid", id_expr.cast("bigint")))
    shards = out.groupBy("pack_shard").agg(
        F.sort_array(
            F.collect_list(F.struct(
                (-F.col(len_col).cast("bigint")).alias("nl"),
                F.col("_oid").alias("oid"),
            ))
        ).alias("_docs")
    )
    # first fitting bin (1-based) via an index-carrying filter — no
    # sequence() call, so the empty-loads case never hits the descending-
    # sequence trap; the fit/new-bin branches re-derive it (O(bins²) per
    # doc, bins are shard-local small)
    fit1 = (
        "element_at(filter(transform(acc.loads, (l, i) -> "
        f"named_struct('p', i, 'ok', l + (-e.nl) <= {{C}})), x -> x.ok), 1).p + 1"
    ).format(C=capacity)
    has_fit = (
        "size(filter(transform(acc.loads, (l, i) -> "
        f"named_struct('p', i, 'ok', l + (-e.nl) <= {{C}})), x -> x.ok)) > 0"
    ).format(C=capacity)
    fold = F.expr(
        "aggregate(_docs, "
        "named_struct('loads', cast(array() as array<bigint>), "
        "'asg', cast(array() as array<struct<oid: bigint, bin: int>>)), "
        "(acc, e) -> named_struct("
        f"'loads', CASE WHEN {has_fit} THEN transform(acc.loads, (l, i) -> "
        f"CASE WHEN i + 1 = {fit1} THEN l + (-e.nl) ELSE l END) "
        "ELSE concat(acc.loads, array(cast(-e.nl as bigint))) END, "
        "'asg', concat(acc.asg, array(named_struct('oid', e.oid, "
        f"'bin', CASE WHEN {has_fit} THEN cast({fit1} as int) "
        "ELSE cast(size(acc.loads) + 1 as int) END)))))"
    )
    packed = shards.select("pack_shard", fold.alias("_st")).select(
        "pack_shard",
        F.col("_st.loads").alias("_loads"),
        F.explode("_st.asg").alias("_a"),
    ).select(
        "pack_shard",
        F.col("_a.oid").alias("_oid"),
        F.col("_a.bin").cast("int").alias("ffd_bin"),
        F.expr("element_at(_loads, cast(_a.bin as int))").cast("long")
        .alias("ffd_load"),
        F.size("_loads").cast("long").alias("ffd_bins"),
    )
    return out.join(packed, ["pack_shard", "_oid"]).drop("_oid")


def lpt_assign(
    df: DataFrame,
    k: int,
    id_expr: Column,
    len_col: str = "n_tok",
    shard_col: str | None = None,
) -> DataFrame:
    """LONGEST-PROCESSING-TIME scheduling (Graham 1969): items in
    (weight DESC, id ASC) order each go to the LEAST-LOADED of `k` workers
    (ties → lowest worker) — the straggler-balancing assignment a task
    scheduler makes, with the classic makespan guarantee ≤ (4/3 − 1/(3k))·OPT.
    The reference's per-ROI work scheduler solves exactly this shape
    (balancing label batches across threads).

    Same machinery as `pack_ffd`: a Catalyst aggregate() fold over the
    sorted item list ({loads[k], assignments} struct state), replayed by
    the oracle one item per RECURSIVE-CTE step. Grouped by `shard_col` when
    given, else ONE global greedy (inherently sequential — at corpus scale
    schedule per shard, or pre-aggregate items into weight buckets first).

    Adds ``lpt_worker`` (1..k), ``lpt_load`` (that worker's final load),
    ``lpt_makespan`` (max worker load in the group)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    gcol = shard_col if shard_col is not None else "__lpt_g"
    out = df.withColumn("_oid", id_expr.cast("bigint"))
    if shard_col is None:
        out = out.withColumn(gcol, F.lit(0))
    groups = out.groupBy(gcol).agg(
        F.sort_array(
            F.collect_list(F.struct(
                (-F.col(len_col).cast("bigint")).alias("nl"),
                F.col("_oid").alias("oid"),
            ))
        ).alias("_docs")
    )
    # least-loaded worker (1-based, ties lowest): first index holding the min
    amin = (
        "element_at(filter(transform(acc.loads, (l, i) -> "
        "named_struct('p', i, 'ok', l = array_min(acc.loads))), "
        "x -> x.ok), 1).p + 1"
    )
    zeros = ", ".join(["cast(0 as bigint)"] * k)
    fold = F.expr(
        "aggregate(_docs, "
        f"named_struct('loads', array({zeros}), "
        "'asg', cast(array() as array<struct<oid: bigint, w: int>>)), "
        "(acc, e) -> named_struct("
        f"'loads', transform(acc.loads, (l, i) -> CASE WHEN i + 1 = {amin} "
        "THEN l + (-e.nl) ELSE l END), "
        "'asg', concat(acc.asg, array(named_struct('oid', e.oid, "
        f"'w', cast({amin} as int))))))"
    )
    packed = groups.select(F.col(gcol), fold.alias("_st")).select(
        F.col(gcol),
        F.col("_st.loads").alias("_loads"),
        F.explode("_st.asg").alias("_a"),
    ).select(
        F.col(gcol),
        F.col("_a.oid").alias("_oid"),
        F.col("_a.w").cast("int").alias("lpt_worker"),
        F.expr("element_at(_loads, cast(_a.w as int))").cast("long")
        .alias("lpt_load"),
        F.expr("array_max(_loads)").cast("long").alias("lpt_makespan"),
    )
    res = out.join(packed, [gcol, "_oid"]).drop("_oid")
    return res.drop("__lpt_g") if shard_col is None else res


def pack_segments(packed: DataFrame, capacity: int,
                  len_col: str = "n_tok") -> DataFrame:
    """Invert the doc→pack assignment of `pack_sequences` into per-(doc,
    pack) SEGMENT rows — the attention-boundary metadata a trainer actually
    consumes from a packed shard (segment ids for the block-diagonal
    attention mask, per-segment position-id reset offsets):

    - seg_pack  pack index this segment lives in (pack_first..pack_last)
    - seg_off   starting token offset WITHIN the pack (0..capacity-1)
    - seg_len   tokens this document contributes to this pack (≥ 1)
    - doc_off   offset of the segment's first token WITHIN the document
                (the position-id base when positions restart per document)
    - seg_idx   segment ordinal within the pack (0-based, by in-pack
                offset — unambiguous: offsets within a pack are distinct)

    All arithmetic is exact BIGINT off pack_start/len, so the layout is
    engine-reproducible and SQL-replayable like the packer itself.

    Scale shape: one narrow explode (a document spans at most
    n_tok/capacity + 1 packs, so output ≈ input + total_tokens/capacity
    rows) plus one window keyed (pack_shard, seg_pack) for seg_idx — the
    same hash-exchange family the packer already paid; no new wide
    dependency. Zero-length documents are skipped (they occupy no tokens
    in any pack)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    cap = F.lit(capacity).cast("bigint")
    segs = (
        packed.filter(F.col(len_col) > 0)
        .withColumn("seg_pack", F.expr("explode(sequence(pack_first, pack_last))"))
    )
    seg_lo = F.greatest(F.col("seg_pack") * cap, F.col("pack_start"))
    seg_hi = F.least((F.col("seg_pack") + 1) * cap,
                     F.col("pack_start") + F.col(len_col).cast("bigint"))
    segs = (
        segs.withColumn("seg_off", (seg_lo - F.col("seg_pack") * cap).cast("bigint"))
        .withColumn("seg_len", (seg_hi - seg_lo).cast("bigint"))
        .withColumn("doc_off", (seg_lo - F.col("pack_start")).cast("bigint"))
    )
    w = Window.partitionBy("pack_shard", "seg_pack").orderBy("seg_off")
    return segs.withColumn("seg_idx", (F.row_number().over(w) - 1).cast("bigint"))
