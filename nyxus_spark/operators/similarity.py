"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the baseline: a narrow dot-product expression and
  ORDER BY … LIMIT k, which Spark plans as TakeOrderedAndProject (per-partition
  top-k + driver merge: no full sort, no shuffle of the corpus);
* IVF-style probed search — the scale path: assign every vector to its nearest
  of C coarse centroids (broadcast), probe only the query's top-p centroid
  buckets. At 100 TB the bucket assignment is a write-time partition column
  (Iceberg bucket/identity partition → partition pruning at query time); here
  the pruning filter is applied explicitly.

All arithmetic is JVM-side (aggregate/zip_with) — no Python in the hot path.
Ordering is made deterministic by ranking on (round(cos, 4) DESC, id ASC) so
results are stable across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyxus_spark.compare import fround4


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(F.expr(
        f"aggregate({a}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))"
    ))


def cosine_col(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = (
        df.withColumn("__q", q)
        .select(F.col(id_col), fround4(cosine_col(vec_col, "__q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return out


def hamming_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hamming top-k over sign-random-projection bit signatures — the
    BIT-level ANN distance (the third classic alongside cosine and L2):
    each vector compresses to an `n_planes`-bit SRP signature
    (dedup.srp_signature, exact integer arithmetic), and candidates rank
    by popcount(sig XOR query_sig) — Charikar's SimHash distance, whose
    expectation is the angle. At scale this is the memory-minimal rerank
    stage-0: 16-64 bits per vector, distance = one XOR + popcount.

    The query signature is computed with the IDENTICAL integer arithmetic
    in plain Python (floor(x·1000+0.5) quantization, the same
    deterministic plane weights), so corpus and query sides agree exactly
    in any engine. Deterministic order: (hamming ASC, id ASC) — planned as
    TakeOrderedAndProject like the cosine baseline."""
    import math

    from nyxus_spark.operators.dedup import MIX, srp_signature

    q = [math.floor(float(x) * 1000.0 + 0.5) for x in query_vec]
    qsig = 0
    for p in range(n_planes):
        dot = sum(
            qi * (((d + 1) * MIX * (p + 13)) % 2001 - 1000)
            for d, qi in enumerate(q)
        )
        if dot > 0:
            qsig |= 1 << p
    return (
        df.select(F.col(id_col), srp_signature(vec_col, n_planes).alias("sig"))
        .select(
            id_col, "sig",
            F.expr(f"cast(bit_count(sig ^ {qsig}L) as bigint)").alias("hamming"),
        )
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (broadcast join +
    deterministic argmax: max cos, ties to lowest centroid id)."""
    joined = df.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col, cent_id, cosine_col(vec_col, cent_vec).alias("__c")
    )
    from pyspark.sql import Window

    # rank on the ROUNDED cosine (same discipline as topk_cosine): assignment
    # becomes reproducible across partitionings and engines
    w = Window.partitionBy(id_col).orderBy(fround4(F.col("__c")).desc(), F.col(cent_id).asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col(cent_id).alias("assigned_cent"))
    )


def _probe_cents(centroids: DataFrame, q: list[float], n_probe: int,
                 cent_id: str, cent_vec: str) -> list:
    qlit = F.array(*[F.lit(x) for x in q])
    return [
        r[0]
        for r in (
            centroids.withColumn("__q", qlit)
            .select(cent_id, fround4(cosine_col(cent_vec, "__q")).alias("c"))
            .orderBy(F.col("c").desc(), F.col(cent_id).asc())
            .limit(n_probe)
            .collect()
        )
    ]


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF probed search: score only vectors assigned to the query's top
    n_probe centroids.

    Pass `assigned` (a DataFrame carrying `assigned_cent`, e.g. the persisted
    index read back by `ivf_index_read`) to search WITHOUT re-assigning the
    corpus; computing assignments inline is the single-shot fallback. At scale
    the index lives as a table partitioned by `assigned_cent` (Iceberg
    bucket/identity partition), so the probe filter prunes partitions at the
    scan and only the probed buckets are ever read.
    """
    q = [float(x) for x in query_vec]
    top_cents = _probe_cents(centroids, q, n_probe, cent_id, cent_vec)
    if assigned is None:
        assigned = ivf_assign(df, centroids, id_col, vec_col, cent_id, cent_vec)
    pruned = assigned.filter(F.col("assigned_cent").isin(top_cents))
    return topk_cosine(pruned, q, k, id_col, vec_col)


def ivf_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> None:
    """Materialize the IVF index: assign every vector ONCE and write it
    partitioned by the bucket column. This is the write-time half of the
    scale path — searches then touch only the probed partitions (SURVEY.md
    §4 partition pruning; Iceberg: identity-partition on assigned_cent)."""
    assigned = ivf_assign(df, centroids, id_col, vec_col, cent_id, cent_vec)
    assigned.write.mode("overwrite").partitionBy("assigned_cent").parquet(path)


def ivf_index_read(spark, path: str) -> DataFrame:
    """Read the persisted IVF index (partition column restored)."""
    return spark.read.parquet(path)


def ivf_search(
    spark,
    index_path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Search against a persisted IVF index: the assigned_cent probe filter
    lands on the partition column, so the scan reads only the probed buckets
    (PartitionFilters in the physical plan — no full-corpus pass)."""
    q = [float(x) for x in query_vec]
    top_cents = _probe_cents(centroids, q, n_probe, cent_id, cent_vec)
    idx = ivf_index_read(spark, index_path).filter(
        F.col("assigned_cent").isin(top_cents)
    )
    return topk_cosine(idx, q, k, id_col, vec_col)


def topk_cosine_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    local_prefilter: bool = True,
) -> DataFrame:
    """Top-k cosine neighbors for EVERY query in a (small) query table.

    The query side broadcasts; scoring is a narrow ×|Q| expansion. Before
    the per-query rank, each input partition is reduced to its LOCAL top-k
    per query (streaming merge over Arrow batches, O(|Q|·k) state), so the
    query_id exchange carries only num_partitions·|Q|·k rows instead of
    |corpus|·|Q| — the same ~|partition|/k reduction TakeOrderedAndProject
    gives the single-query path. Correct because the rank order is total
    (rounded cos DESC, id ASC with unique ids): every global top-k row is by
    definition in its partition's local top-k under the same order. At full
    corpus scale, batch search still goes through the IVF index first (probe
    per query, score only the probed buckets); this rank then runs over the
    tiny candidate set. Deterministic like topk_cosine.
    """
    from pyspark.sql import Window

    scored = df.crossJoin(F.broadcast(queries)).select(
        query_id,
        F.col(id_col),
        fround4(cosine_col(vec_col, query_vec)).alias("cos"),
    )
    if local_prefilter:
        scored = _partition_topk(scored, k, query_id, id_col)
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id, id_col, "cos")
    )


def ivf_topk_batch(
    df: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Batch multi-query ANN through the IVF index — the full-corpus-scale
    batch plan the brute `topk_cosine_batch` docstring points to: each query
    ranks the (broadcast-tiny) centroid table and probes its top `n_probe`
    buckets; the corpus joins the probe table on its ONE `assigned_cent`
    bucket column, so each corpus row is scored only against the queries
    probing its bucket (a |probed fraction|·|Q| expansion instead of
    |corpus|·|Q|); the per-query rank then runs over the candidate set with
    the same local pre-top-k combine as the brute path. Pass `assigned`
    (e.g. `ivf_index_read`) to search the persisted partition-pruned index;
    otherwise assignments are computed inline."""
    from pyspark.sql import Window

    if assigned is None:
        assigned = ivf_assign(df, centroids, id_col, vec_col, cent_id, cent_vec)
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        query_id, query_vec, cent_id,
        fround4(cosine_col(query_vec, cent_vec)).alias("__c"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("__c").desc(), F.col(cent_id).asc()
    )
    probes = (
        qc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select(query_id, query_vec, F.col(cent_id).alias("__probe_cent"))
    )
    scored = (
        assigned.join(
            F.broadcast(probes),
            F.col("assigned_cent") == F.col("__probe_cent"),
        )
        .select(
            query_id,
            F.col(id_col),
            fround4(cosine_col(vec_col, query_vec)).alias("cos"),
        )
    )
    scored = _partition_topk(scored, k, query_id, id_col)
    wq = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= k)
        .select(query_id, id_col, "cos")
    )


def _partition_topk(scored: DataFrame, k: int, query_id: str, id_col: str,
                    score_col: str = "cos", ascending: bool = False) -> DataFrame:
    """Reduce each partition of (query_id, id, score) rows to its per-query
    top-k under (score DESC|ASC, id ASC) — a map-side combine for the rank
    that follows, carrying O(|Q|·k) state per partition."""

    def gen(batches):
        import pandas as pd
        import pyarrow as pa

        carry: pd.DataFrame | None = None
        schema = None
        for rb in batches:
            schema = rb.schema
            part = rb.to_pandas()
            if carry is not None:
                part = pd.concat([carry, part], ignore_index=True)
            part = part.sort_values(
                [query_id, score_col, id_col],
                ascending=[True, ascending, True],
                kind="mergesort",
            )
            carry = part.groupby(query_id, sort=False).head(k)
        if carry is not None and len(carry):
            yield pa.RecordBatch.from_pandas(
                carry.reset_index(drop=True), schema=schema, preserve_index=False
            )

    return scored.mapInArrow(gen, scored.schema)


def recall_at_k(
    ann: DataFrame,
    exact: DataFrame,
    query_id: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN quality evaluation — per-query recall against an exact
    (brute-force) ground truth: |ann ∩ exact| / |exact|, the standard
    index-quality monitor a production ANN deployment runs on a sampled
    query set ("measure, don't guess"). Exact integers + ONE final division.

    Both inputs are (query, id) result sets of ~k rows per query, so the
    intersection join is tiny regardless of corpus size — the expensive part
    is producing `exact`, which callers run on a SAMPLE of queries (e.g.
    `deterministic_sample` over the query log) while the ANN path serves
    everything. Queries the ANN missed entirely still emit a row (recall 0).
    """
    hits = (
        ann.select(query_id, id_col)
        .join(exact.select(query_id, id_col), [query_id, id_col], "left_semi")
        .groupBy(query_id)
        .agg(F.count("*").alias("n_hits"))
    )
    denom = exact.groupBy(query_id).agg(F.count("*").alias("n_exact"))
    zero = F.lit(0).cast("long")
    return denom.join(hits, query_id, "left").select(
        query_id,
        F.coalesce("n_hits", zero).cast("long").alias("n_hits"),
        F.col("n_exact").cast("long").alias("n_exact"),
        fround4(F.coalesce("n_hits", zero) / F.col("n_exact")).alias("recall"),
    )


def assign_nearest(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_qvec",
) -> DataFrame:
    """Exact nearest-centroid assignment over INTEGER-quantized vectors:
    broadcast the (small, by IVF construction) centroid table, per-row
    argmin of the exact int64 squared L2 distance (|q| ≤ 127 ⇒
    Σ(x−y)² ≤ dims·254², no rounding anywhere), ties to the lowest
    centroid id. Returns (id, vec, assigned_cent). The shared first step
    of Lloyd iteration (`kmeans_step`) and SemDeDup cluster blocking.

    Plan shape: the centroid table is folded into ONE array-of-structs row
    and broadcast, so the argmin is array_min(transform(...)) — a pure
    column expression whose struct ordering (d ASC, cid ASC) IS the
    tie-break. ZERO exchange and zero row expansion: the naive alternative
    (crossJoin ×C + a row_number window partitioned by the id) shuffles
    corpus·C rows through an id-hash exchange that this shape never pays.
    An EMPTY centroid table yields NULL assignments (not zero rows)."""
    cents1 = centroids.agg(
        F.collect_list(
            F.struct(F.col(cent_id).alias("cid"), F.col(cent_vec).alias("cv"))
        ).alias("__cents")
    )
    best = F.expr(
        f"array_min(transform(__cents, c -> struct("
        f"aggregate(zip_with({vec_col}, c.cv,"
        f" (x, y) -> cast(x - y as bigint) * (x - y)),"
        f" 0L, (a, v) -> a + v) as d,"
        f" c.cid as cid)))"
    )
    return df.crossJoin(F.broadcast(cents1)).select(
        id_col, vec_col, best.getField("cid").alias("assigned_cent")
    )


def kmeans_step(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_qvec",
) -> DataFrame:
    """One Lloyd iteration over INTEGER-quantized embeddings — the IVF
    coarse-quantizer training step, made engine-exact: assignment uses the
    exact int64 squared L2 distance (|q| ≤ 127, so Σ(x−y)² ≤ dims·254² —
    no rounding anywhere), ties to the lowest centroid id; the update
    returns per-(cluster, dim) exact BIGINT coordinate sums + counts, with
    the new coordinate as ONE final division. Iterating = re-seeding
    `centroids` from the returned sums.

    Plan shape: broadcast the (small) centroid table, per-row argmin via a
    window on the id (one exchange), then posexplode + partial/final hash
    agg — the shuffle after the explode carries only C·dims rows per map
    task, so the update scales like any Catalyst aggregation."""
    assigned = assign_nearest(df, centroids, id_col, vec_col, cent_id, cent_vec)
    ex = assigned.select("assigned_cent", F.posexplode(vec_col).alias("dim", "__v"))
    return (
        ex.groupBy("assigned_cent", "dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("__v").cast("bigint")).alias("coord_sum"),
        )
        .withColumn("new_coord", fround4(F.col("coord_sum") / F.col("n")))
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    sub_id: str = "sub_id",
    cent_id: str = "cent_id",
    cent_sub: str = "cent_sub",
) -> DataFrame:
    """Product-quantization encoding over integer-quantized embeddings — the
    memory-scale ANN path beyond IVF: each vector splits into `m` contiguous
    subvectors; each subvector is assigned its nearest codebook centroid by
    EXACT int64 squared L2 (ties → lowest centroid id), shrinking a
    D-dim vector to m small codes. `codebooks` has one row per
    (sub_id, cent_id, cent_sub: array<int>) — broadcast-tiny (m·k rows).

    Engine-exact by construction (integer arithmetic end-to-end), so the
    encoding is oracle-checkable. Plan shape: one posexplode into m subvector
    rows, broadcast-join the codebook on its ONE subspace key, per-(vector,
    subspace) argmin via min(struct(d2, cent_id)) — a hash aggregation, no
    window sort — then one groupBy(vector) to reassemble codes. Two narrow
    hash-agg exchanges total, both over m·|corpus| short rows; nothing
    quadratic, nothing driver-side.

    Returns (id_col, pq_codes: array<int> ordered by sub_id,
    pq_d2: BIGINT total quantization distortion). Requires m | D (each
    subspace gets D div m dims; a ragged tail would be silently dropped, so
    callers must pad or pick a divisor)."""
    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    subs = df.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m} - 1), j -> slice({vec_col},"
                f" j * (size({vec_col}) div {m}) + 1, size({vec_col}) div {m}))"
            )
        ).alias(sub_id, "__sub"),
    )
    d2 = F.expr(
        f"aggregate(zip_with(__sub, {cent_sub},"
        f" (x, y) -> cast(x - y as bigint) * (x - y)),"
        f" 0L, (a, v) -> a + v)"
    )
    best = (
        subs.join(F.broadcast(codebooks), sub_id)
        .select(id_col, sub_id, F.struct(d2.alias("d"), F.col(cent_id).alias("c")).alias("__dc"))
        .groupBy(id_col, sub_id)
        .agg(F.min("__dc").alias("__best"))
    )
    return (
        best.groupBy(id_col)
        .agg(
            F.expr(
                f"transform(array_sort(collect_list(struct({sub_id} as s,"
                f" __best.c as c))), x -> x.c)"
            ).alias("pq_codes"),
            F.sum("__best.d").alias("pq_d2"),
        )
    )


def pq_search_adc(
    codes: DataFrame,
    books: DataFrame,
    queries: DataFrame,
    m: int,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_qvec",
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    sub_id: str = "sub_id",
    cent_id: str = "cent_id",
    cent_sub: str = "cent_sub",
) -> DataFrame:
    """Asymmetric-distance PQ search (ADC) — the scan that makes PQ an ANN
    index: each query precomputes an m×C lookup table of exact int64
    subspace distances to every codebook centroid, then every corpus row is
    scored by m ARRAY LOOKUPS on its codes (no per-row vector arithmetic at
    all): d_ADC(q, x) = Σ_j ‖q_j − c[code_j]‖². With integer queries and
    codebooks the score is exact, so the whole search is oracle-checkable.

    Plan shape: the LUT build touches only queries × codebooks (|Q|·m·C
    rows, broadcast both ways); the corpus scan is ONE broadcast
    nested-loop over the code table with a JVM `aggregate` per (row, query),
    followed by the same per-partition pre-top-k combine the brute path
    uses — the rank exchange carries partitions·|Q|·k rows, never
    |corpus|·|Q|. Requires centroid ids dense 0..C−1 within each subspace
    (they index the LUT row).

    Returns (query_id, id_col, adc_d: BIGINT, rank)."""
    if m <= 0 or k <= 0:
        raise ValueError(f"need m > 0 and k > 0, got {m}, {k}")
    from pyspark.sql import Window

    qsubs = queries.select(
        query_id,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m} - 1), j -> slice({query_vec},"
                f" j * (size({query_vec}) div {m}) + 1, size({query_vec}) div {m}))"
            )
        ).alias(sub_id, "__qsub"),
    )
    d2 = F.expr(
        f"aggregate(zip_with(__qsub, {cent_sub},"
        f" (x, y) -> cast(x - y as bigint) * (x - y)),"
        f" 0L, (a, v) -> a + v)"
    )
    lut = (
        qsubs.join(F.broadcast(books), sub_id)
        .select(query_id, sub_id, F.col(cent_id).alias("__c"), d2.alias("__d"))
        .groupBy(query_id, sub_id)
        .agg(F.expr("transform(array_sort(collect_list(struct(__c as c,"
                    " __d as d))), x -> x.d)").alias("__ds"))
        .groupBy(query_id)
        .agg(F.expr(f"transform(array_sort(collect_list(struct({sub_id} as s,"
                    " __ds as ds))), x -> x.ds)").alias("__lut"))
    )
    scored = codes.crossJoin(F.broadcast(lut)).select(
        query_id,
        id_col,
        F.expr(
            f"aggregate(zip_with({codes_col}, __lut, (c, row) -> row[c]),"
            " 0L, (a, v) -> a + v)"
        ).alias("adc_d"),
    )
    pre = _partition_topk(scored, k, query_id, id_col,
                          score_col="adc_d", ascending=True)
    w = Window.partitionBy(query_id).orderBy(
        F.col("adc_d").asc(), F.col(id_col).asc()
    )
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "adc_d", F.col("rank").cast("long").alias("rank"))
    )


def quantize_embedding(vec_col: str = "embedding", levels: int = 127):
    """Column expr: symmetric int8-style quantization of a float vector —
    q_i = floor(levels·x_i/max|x| + 0.5) (round-half-up), the standard
    preprocessing that shrinks an embedding corpus ~4× before ANN indexing.
    Every op is an element-wise IEEE double op (no order-dependent
    reduction: the scale is max|x|, a comparison), so the quantized
    integers are bit-identical across engines. All-zero vectors quantize to
    all-zero."""
    mx = f"array_max(transform({vec_col}, y -> abs(cast(y as double))))"
    return F.expr(
        f"CASE WHEN {mx} = 0D THEN transform({vec_col}, x -> 0) "
        f"ELSE transform({vec_col}, x -> cast(floor({levels}D * cast(x as double)"
        f" / {mx} + 0.5D) as int)) END"
    )


def rerank_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Two-stage retrieval (the production cheap-filter + exact-rerank
    architecture): stage 1 scores int8-QUANTIZED vectors with an EXACT
    int64 dot product and keeps the top `m` candidates per query (rank on
    exact integers, ties to the lowest id — fully engine-reproducible);
    stage 2 re-joins only those m ids to the float corpus and re-ranks by
    the exact cosine (fround4) down to the final top `k`.

    Scale shape: stage 1 is the same broadcast-query × corpus expansion as
    `topk_cosine_batch`, shrunk below the rank exchange by the per-partition
    top-m combine — but each pair costs an int8 dot product instead of a
    float cosine, which is the whole point of quantized first-stage
    scoring. Stage 2 touches m·|Q| rows. At full corpus scale stage 1 runs
    over the IVF-probed buckets rather than the whole corpus.

    Emits (query_id, rr_rank 1..k, rr_vec_id, rr_int8_score, rr_cos4).
    """
    if not 1 <= k <= m:
        raise ValueError(f"need 1 <= k <= m, got k={k} m={m}")
    from pyspark.sql import Window

    q8 = df.select(id_col, quantize_embedding(vec_col).alias("__q8"))
    qq = queries.select(query_id, F.col(query_vec),
                        quantize_embedding(query_vec).alias("__qq8"))
    scored = q8.crossJoin(
        F.broadcast(qq.select(query_id, "__qq8"))
    ).select(
        query_id, id_col,
        F.expr(
            "aggregate(zip_with(__q8, __qq8, (a, b) -> cast(a as bigint) * b),"
            " 0L, (s, x) -> s + x)"
        ).alias("rr_int8_score"),
    )
    scored = _partition_topk(scored, m, query_id, id_col,
                             score_col="rr_int8_score")
    w1 = Window.partitionBy(query_id).orderBy(
        F.col("rr_int8_score").desc(), F.col(id_col).asc())
    cand = (scored.withColumn("__r1", F.row_number().over(w1))
                  .filter(F.col("__r1") <= m).drop("__r1"))
    # stage 2: re-join the m survivors to the float corpus (only candidate
    # ids carry vectors through this join) and rank by exact cosine
    re = (cand.join(df.select(id_col, vec_col), id_col)
              .join(F.broadcast(qq.select(query_id, query_vec)), query_id)
              .select(query_id, id_col, "rr_int8_score",
                      fround4(cosine_col(vec_col, query_vec)).alias("rr_cos4")))
    w2 = Window.partitionBy(query_id).orderBy(
        F.col("rr_cos4").desc(), F.col(id_col).asc())
    return (re.withColumn("rr_rank", F.row_number().over(w2).cast("long"))
              .filter(F.col("rr_rank") <= k)
              .select(query_id, "rr_rank",
                      F.col(id_col).cast("long").alias("rr_vec_id"),
                      "rr_int8_score", "rr_cos4"))


def mean_pool_docs(
    docs: DataFrame,
    token_emb: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    emb_id: str = "token",
    emb_col: str = "qvec",
) -> DataFrame:
    """Document embeddings by MEAN-POOLING token embeddings — the
    bag-of-embeddings doc representation (fastText/sentence-pooling
    style), made engine-exact over INTEGER-quantized vectors: per (doc,
    dim), the pooled coordinate numerator is an exact BIGINT sum of int8
    values (the mean is ONE division away), so the representation is
    bit-reproducible on any engine.

    `token_emb` is the |V|-row (token id → quantized vector) table.
    Tokens without an embedding row are skipped and do not count toward
    the pool (emit an UNK row in `token_emb` for the other behavior).

    Returns the LONG format (id, dim, pool_n, coord_sum): the grain every
    downstream consumer of exact sums wants (re-assembly to an array is
    one array_agg ORDER BY dim away; digests/norms are one re-agg).

    Plan shape (same family as `kmeans_step`'s update): one explode of
    the token stream, a broadcast equi-join against the |V|-row embedding
    dim, posexplode to (doc, dim) cells, and a partial/final hash agg —
    the shuffle after the explode carries docs·dims cells per map task,
    not token positions."""
    toks = docs.select(F.col(id_col), F.explode(tokens_col).alias("__t"))
    joined = toks.join(
        F.broadcast(token_emb.select(F.col(emb_id).alias("__t"), emb_col)),
        "__t",
    )
    ex = joined.select(F.col(id_col), F.posexplode(emb_col).alias("dim", "__v"))
    return ex.groupBy(id_col, "dim").agg(
        F.count("*").cast("long").alias("pool_n"),
        F.sum(F.col("__v").cast("bigint")).alias("coord_sum"),
    )


def ivf_index_stream(stream_df, centroids: DataFrame, path: str,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     cent_id: str = "cent_id", cent_vec: str = "cent_vec",
                     checkpoint: str | None = None):
    """STREAMING IVF index maintenance — the index-freshness half of the
    ANN story: every micro-batch of newly-embedded vectors is assigned to
    its nearest coarse centroid and APPENDED to the bucket-partitioned
    index, so searches see new vectors as soon as their batch commits.

    Assignment is deliberately STATELESS: the production IVF contract is
    a coarse quantizer trained offline and FROZEN (retraining centroids
    re-keys every posting list — that is a rebuild, not maintenance), so
    the stream needs only the broadcast centroid table, no GroupState.
    `ivf_search` over `path` prunes to probed buckets exactly as for the
    batch-built index — the scan sees one more file per bucket per batch
    (compact periodically, e.g. Iceberg rewrite_data_files, at scale).

    Returns the started StreamingQuery (caller awaits/stops)."""
    def _append(batch_df, batch_id: int) -> None:
        assigned = ivf_assign(batch_df, centroids, id_col, vec_col,
                              cent_id, cent_vec)
        assigned.write.mode("append").partitionBy("assigned_cent").parquet(path)

    w = stream_df.writeStream.foreachBatch(_append).outputMode("append")
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def ivf_index_compact(spark, path: str) -> None:
    """Compact the IVF index to ONE file per bucket — the maintenance pass
    a streamed index needs (`ivf_index_stream` appends one file per bucket
    per micro-batch; scan cost grows with file COUNT even when pruning is
    perfect). One hash repartition on the bucket column clusters every
    bucket into a single task (so partitionBy emits exactly one file per
    bucket), and DYNAMIC partition overwrite swaps only the buckets being
    rewritten — the partition layout searches prune on is untouched. The
    Iceberg analog is rewrite_data_files.

    Reads THEN overwrites the same path: the input is persisted and
    materialized first so the rewrite never races its own scan; the
    parquet committer stages output before the swap, so a crash
    mid-compact leaves the old files in place."""
    idx = spark.read.parquet(path)
    idx = idx.repartition("assigned_cent")
    idx.persist()
    try:
        idx.count()
        (idx.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("assigned_cent").parquet(path))
    finally:
        idx.unpersist()


def random_project(
    df: DataFrame,
    d_out: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "q",
    mix_i: int = 1103515245,
    mix_j: int = 506952114,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection with a DETERMINISTIC
    Achlioptas ±1 matrix (Achlioptas, JCSS 2003): output dim j of an
    integer-quantized vector q is

        rp_j = Σ_i s(i, j) · q_i,   s(i, j) = 1 − 2·((i+1)·MIX_I + (j+1)·MIX_J mod 2)

    — the dimensionality-reduction pass before sketching/bucketing when the
    embedding width itself is the cost (JL preserves pairwise distances to
    1±ε at d_out = O(log n / ε²)). The sign matrix is derived by hash, not
    sampled, so the projection is re-derivable forever on any engine, and
    every output is an EXACT BIGINT (integer sum — order-independent, no
    float fold to replay).

    Scale shape: a pure per-row map (zero shuffle); the sign matrix never
    materializes — each output dim is one Catalyst aggregate() over the
    vector. Exact while d_in · max|q_i| · 1 fits int64 (|q| ≤ 127 quantized
    → any realistic width).

    Returns (id_col, rp_0 .. rp_{d_out-1})."""
    if d_out < 1:
        raise ValueError(f"d_out must be >= 1, got {d_out}")
    cols = []
    for j in range(d_out):
        e = F.expr(
            f"aggregate(transform(sequence(0, size({vec_col}) - 1), i -> "
            f"(1 - 2 * pmod((cast(i as bigint) + 1) * {mix_i} + {(j + 1) * mix_j}, 2)) "
            f"* cast(element_at({vec_col}, cast(i + 1 as int)) as bigint)), "
            "0L, (a, v) -> a + v)"
        )
        cols.append(e.alias(f"rp_{j}"))
    return df.select(F.col(id_col), *cols)


def hard_negatives(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "q",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_qvec",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    vector, the highest-cosine neighbor that is NOT a near-duplicate
    (cosine < threshold, compared unrounded) among its k-means cell mates —
    the standard "mine hard negatives from the ANN cell" pass (same
    blocking contract as SemDeDup: candidates come from the assigned
    cluster, so the work is Σ|cluster|², bounded by choosing k with the
    corpus). A hard negative is exactly what the in-batch-negatives trick
    cannot guarantee: similar enough to be informative, dissimilar enough
    to be a true negative.

    Arithmetic is engine-exact over integer-quantized vectors: assignment
    is the exact int64 L2 argmin (`assign_nearest`), each candidate cosine
    the fixed IEEE chain dot/(sqrt(n2_a)·sqrt(n2_b)) on exact integers;
    ties break to the LOWEST candidate id via one max(struct) — no window
    sort. Zero vectors neither anchor nor candidate (n2 > 0 guard).

    Returns (id_col, hn_id, hn_cos4) — one row per vector that has at
    least one below-threshold cell mate."""
    from nyxus_spark.operators.similarity import assign_nearest

    n2 = F.expr(
        f"aggregate(transform({vec_col},"
        " x -> cast(x as bigint) * cast(x as bigint)),"
        " 0L, (a, v) -> a + v)"
    )
    m = assign_nearest(df, centroids, id_col, vec_col, cent_id, cent_vec).select(
        F.col(id_col), F.col(vec_col), F.col("assigned_cent"), n2.alias("__n2")
    )
    a, b = m.alias("a"), m.alias("b")
    dot = F.expr(
        f"aggregate(zip_with(a.{vec_col}, b.{vec_col},"
        " (x, y) -> cast(x as bigint) * cast(y as bigint)),"
        " 0L, (acc, v) -> acc + v)"
    )
    pairs = (
        a.join(
            b,
            (F.col("a.assigned_cent") == F.col("b.assigned_cent"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .filter((F.col("a.__n2") > 0) & (F.col("b.__n2") > 0))
        .select(
            F.col(f"a.{id_col}").alias("__vid"),
            F.col(f"b.{id_col}").alias("__cand"),
            (
                dot.cast("double")
                / (F.sqrt(F.col("a.__n2")) * F.sqrt(F.col("b.__n2")))
            ).alias("__cos"),
        )
        .filter(F.col("__cos") < F.lit(threshold))
    )
    return (
        pairs.groupBy("__vid")
        .agg(
            F.max(
                F.struct(
                    F.col("__cos").alias("c"),
                    (-F.col("__cand")).alias("nc"),
                    F.col("__cand").alias("cand"),
                )
            ).alias("__best")
        )
        .select(
            F.col("__vid").alias(id_col),
            F.col("__best.cand").cast("long").alias("hn_id"),
            fround4(F.col("__best.c")).alias("hn_cos4"),
        )
    )


def mmr_rerank(
    cands: DataFrame,
    k_select: int,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "cos",
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR
    1998) — the diversified-retrieval standard: greedily select k results
    where step i takes

        argmax  λ·rel(d) − µ·max_{s∈selected} sim(d, s)     (ties → low id)

    over the remaining candidates — relevance traded against redundancy,
    so near-duplicate hits cannot crowd the result list. λ and µ are two
    independent literals (NOT derived as 1−λ: float 1−0.7 is
    0.30000000000000004, not the 0.3 a SQL literal parses to — pass both).

    Arithmetic is engine-replayable: rel and the pairwise sims are
    4-decimal (fround4) cosines, each step's score the fixed IEEE chain
    λ·rel − µ·maxsim (maxsim = MAX over selected sims, 0.0 at step 1)
    rounded to 4 decimals BEFORE the argmax, so the selection order is
    bit-reproducible in any engine.

    `cands` is the bounded post-retrieval top-m (id, vector, rel) — MMR is
    a RERANK, never a corpus scan. The greedy argmax is one driver
    round-trip of ONE row per step (k bounded, same class as the LIMIT-1
    convergence probe in connected_components); everything else is
    DataFrame ops over the m-row table.

    Returns (ordinal, id_col, mmr_score4) with ordinal 1..k_select."""
    if k_select < 1:
        raise ValueError(f"k_select must be >= 1, got {k_select}")
    sims = (
        cands.alias("a")
        .join(cands.alias("b"), F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("ia"),
            F.col(f"b.{id_col}").alias("ib"),
            fround4(cosine_col(f"a.{vec_col}", f"b.{vec_col}")).alias("s"),
        )
        .localCheckpoint()  # m² rows, computed once, reused every step
    )
    base = cands.select(F.col(id_col), F.col(rel_col).alias("__rel"))
    picked: list[tuple[int, object, float]] = []
    for step in range(1, k_select + 1):
        sel_ids = [p[1] for p in picked]
        rem = base.filter(~F.col(id_col).isin(sel_ids)) if sel_ids else base
        if sel_ids:
            ms = (
                sims.filter(F.col("ib").isin(sel_ids))
                .groupBy("ia").agg(F.max("s").alias("__ms"))
            )
            j = rem.join(ms, rem[id_col] == ms["ia"], "left").withColumn(
                "__ms", F.coalesce("__ms", F.lit(0.0))
            )
        else:
            j = rem.withColumn("__ms", F.lit(0.0))
        score4 = fround4(
            F.lit(lam) * F.col("__rel") - F.lit(mu) * F.col("__ms")
        )
        best = (
            j.select(F.col(id_col), score4.alias("__sc"))
            .orderBy(F.col("__sc").desc(), F.col(id_col).asc())
            .first()
        )
        if best is None:
            break
        picked.append((step, best[id_col], float(best["__sc"])))
    spark = cands.sparkSession
    return spark.createDataFrame(
        picked, f"ordinal long, {id_col} long, mmr_score4 double"
    )


def maxsim_scores(
    docs: DataFrame,
    token_emb: DataFrame,
    query_terms: list[int],
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    tok_id: str = "tok",
    tok_vec: str = "embedding",
) -> DataFrame:
    """ColBERT-style MaxSim late interaction (Khattab & Zaharia, SIGIR
    2020): score(q, d) = Σ_{t ∈ q} max_{u ∈ d} cos(E[t], E[u]) — each query
    token finds its best-matching document token in embedding space, so a
    document scores high for SEMANTIC matches BM25's exact-term tf can
    never see (and the two gates cross-check each other on the same query).

    Engine-replayable shape: the (query-term × vocab) cosine LUT is
    computed ONCE (|q|·|V| rows, broadcast) with the same 4-decimal cosine
    chain as the dense gates; per (doc, term) the max over the doc's
    DISTINCT tokens is an order-independent MAX of identical doubles; the
    final score is a FIXED |q|-term addition chain in term order.
    Zero-norm token embeddings are excluded from both LUT sides (cos
    undefined); a doc whose tokens all lack usable embeddings carries
    sentinel −2.0 maxes and score 0 contributions.

    Scale shape: one broadcast LUT join + two hash aggs — the corpus is
    touched once, |q|·|V| never leaves the driver-broadcast size class.

    Returns (id_col, cb_<t> per term, colbert4)."""
    terms = sorted(set(int(x) for x in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    n2 = F.expr(
        f"aggregate({tok_vec}, 0D, (a, x) -> a + cast(x as double) * cast(x as double))"
    )
    toke = token_emb.select(F.col(tok_id).alias("__tok"),
                            F.col(tok_vec).alias("__tv")).filter(
        F.expr("aggregate(__tv, 0D, (a, x) -> a + cast(x as double) * cast(x as double))") > 0
    )
    qe = toke.filter(F.col("__tok").isin(terms)).select(
        F.col("__tok").alias("__qt"), F.col("__tv").alias("__qv"))
    lut = qe.crossJoin(toke).select(
        "__qt", "__tok", fround4(cosine_col("__qv", "__tv")).alias("__c4"))
    dt = docs.select(id_col, F.explode(tokens_col).alias("__tok")).distinct()
    pm = (
        dt.join(F.broadcast(lut), "__tok")
        .groupBy(id_col, "__qt")
        .agg(F.max("__c4").alias("__mx"))
        .groupBy(id_col)
        .pivot("__qt", terms)
        .agg(F.first("__mx"))
    )
    # keep docs whose tokens ALL lack usable embeddings (sentinel maxes)
    pm = docs.select(id_col).distinct().join(pm, id_col, "left")
    score = None
    for q in terms:
        c = F.coalesce(F.col(f"{q}"), F.lit(0.0))
        score = c if score is None else score + c
    return pm.select(
        id_col,
        *[F.coalesce(F.col(f"{q}"), F.lit(-2.0)).alias(f"cb_{q}") for q in terms],
        fround4(score).alias("colbert4"),
    )


def greedy_kcenter(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
) -> DataFrame:
    """Greedy k-center (farthest-point-first, Gonzalez 1985) coreset
    selection over int8-QUANTIZED embeddings — the deterministic
    diversity-sampling primitive ("pick k maximally spread exemplars, then
    assign everyone to the nearest") used for diverse-subset curation and
    as a 2-approximation of the optimal k-center clustering.

    All distances are EXACT int64 squared-L2 on the quantized vectors
    (integer sums are associative — order never matters), so center choice
    and assignment are bit-identical on every engine: seed = lowest id,
    each round adds the point with the LARGEST distance-to-nearest-center
    (ties to the lowest id).

    Scale shape: each of the k-1 expansion rounds is one full-scan
    aggregate against at most k broadcast-literal centers followed by a
    TakeOrderedAndProject of ONE row (the same driver-side probe pattern as
    `_probe_cents` — k rows total cross the driver, never the corpus). The
    final assignment is a single pass with k literal centers: no joins, no
    shuffles beyond the top-1 rank.

    Emits (id_col, kc_cent, kc_d): the nearest chosen center (ties to the
    lowest center id) and the exact squared distance to it.
    """
    if not 2 <= k <= 16:
        raise ValueError(f"k must be in [2, 16] (k-1 driver probe rounds), got {k}")

    def dist_to(lit_vec: str) -> str:
        return (
            f"aggregate(zip_with({qvec_col}, {lit_vec},"
            f" (a, b) -> cast(a - b as bigint) * (a - b)),"
            f" 0L, (s, x) -> s + x)"
        )

    def lit_arr(vals) -> str:
        return "array(" + ", ".join(str(int(v)) for v in vals) + ")"

    seed = df.orderBy(F.col(id_col).asc()).select(id_col, qvec_col).limit(1).collect()[0]
    centers = [(int(seed[id_col]), list(seed[qvec_col]))]
    cur = df.withColumn("__d", F.expr(dist_to(lit_arr(centers[0][1]))))
    for _ in range(k - 1):
        far = (
            cur.orderBy(F.col("__d").desc(), F.col(id_col).asc())
            .select(id_col, qvec_col)
            .limit(1)
            .collect()[0]
        )
        centers.append((int(far[id_col]), list(far[qvec_col])))
        cur = cur.withColumn(
            "__d", F.least(F.col("__d"), F.expr(dist_to(lit_arr(centers[-1][1]))))
        )
    # stage each per-center distance as a column (multiply-referenced
    # non-cheap exprs stay staged under CollapseProject — never inline a
    # fold into the min AND the argmin)
    by_id = sorted(centers)
    staged = df
    for cid, v in by_id:
        staged = staged.withColumn(f"__d_{cid}", F.expr(dist_to(lit_arr(v))))
    staged = staged.withColumn(
        "__bd", F.least(*[F.col(f"__d_{cid}") for cid, _ in by_id])
    )
    # nearest center id with ties to the LOWEST center id: scan centers in
    # ascending id order and keep the first whose distance equals the min
    cent = F.lit(None).cast("long")
    for cid, _ in reversed(by_id):
        cent = F.when(F.col(f"__d_{cid}") == F.col("__bd"), F.lit(cid)).otherwise(cent)
    return staged.select(
        id_col,
        cent.alias("kc_cent"),
        F.col("__bd").cast("long").alias("kc_d"),
    )
