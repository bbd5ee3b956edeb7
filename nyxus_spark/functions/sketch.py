"""Streaming sketches for corpus monitoring at 100 TB — exact-integer,
engine-replayable variants of the two classic at-scale estimators.

Count-Min Sketch (heavy-hitter frequency estimation) and HyperLogLog
(distinct-count estimation) are the standard answers when the exact
aggregation — a full vocabulary count, a COUNT(DISTINCT) — would be a
corpus-wide shuffle you cannot afford per monitoring tick. Both reduce to
fixed-size integer state with commutative merges, so Spark computes them
as ordinary two-phase aggregations: map-side partial combine caps the
shuffle at (depth x width) resp. m cells per partition regardless of input
size. Reference analog: nyxus streams per-ROI partial statistics and merges
them centrally (src/nyx/features/pixel_intensity.cpp online accumulators);
these sketches are the same partial-merge discipline applied to corpus-level
cardinality/frequency questions.

Determinism contract (the repo-wide gating discipline, CLAUDE.md):
every hash is pmod integer arithmetic below 2^62, register values are
integer maxima, and the single float step per estimator is one fixed
IEEE chain (constant * 2^Rmax / S with exact-integer operands), so the
DuckDB oracle replays each value bit-for-bit.

Why these parameters:
- CMS depth 4 x width 64: small enough that the sketch is broadcast-trivial
  and collisions actually occur at test scale (the overestimate property
  est >= true is exercised, not vacuous); the construction is
  width/depth-generic.
- HLL m = 64 registers (b = 6): hash is 31-bit (P31), so the remainder
  carries W = 25 usable bits; rho in [1, 26] and the scaled harmonic
  numerator S = sum 2^(Rmax - M_b) stays far below 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

P31 = 2147483647
# CMS row-hash family: h_j(t) = pmod(pmod(t, P31) * A_j + B_j, P31) % width.
# Distinct odd multipliers per row, derived from the repo's Knuth constant.
CMS_PARAMS = [(506952114, 11), (1013904228 + 1, 101), (1520856343, 211),
              (2027808457 + 2, 307)]
# HLL mixer — deliberately NOT the sampling mixer (506952114): sample_hash
# composes both on the same doc_id stream, and a shared multiplier would
# correlate the keep-filter with the register buckets.
HLL_MIX = 1103515245  # glibc LCG multiplier, < P31


def _pmod(x: Column, p: int = P31) -> Column:
    return F.pmod(x, F.lit(p))


def cms_bucket(token: Column, j: int, width: int = 64) -> Column:
    """Bucket of `token` in CMS hash row j — exact bigint arithmetic.

    token is reduced mod P31 first so token * A_j stays below 2^62 for any
    bigint token; pmod keeps negative tokens (the UNK = -1 convention) in
    range.
    """
    a, b = CMS_PARAMS[j]
    h = _pmod(_pmod(token.cast("bigint")) * F.lit(a) + F.lit(b))
    return _pmod(h, width).cast("int")


def cms_table(df: DataFrame, tokens_col: str = "tokens", depth: int = 4,
              width: int = 64) -> DataFrame:
    """Build the (j, bucket) -> count CMS table over a token-array corpus.

    One explode + ONE groupBy: each token emits its `depth` (row, bucket)
    pairs via posexplode, and the single hash-aggregation combines map-side,
    so the shuffle carries at most depth x width cells per input partition —
    sketch semantics with plain Catalyst partial/final aggregation, no
    custom state. Returns (j int, bucket int, c bigint).
    """
    if not 1 <= depth <= len(CMS_PARAMS):
        raise ValueError(f"depth must be in [1, {len(CMS_PARAMS)}], got {depth}")
    t = F.explode(tokens_col).alias("t")
    flat = df.select(t)
    buckets = F.array(*[cms_bucket(F.col("t"), j, width) for j in range(depth)])
    return (
        flat.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_estimate(rows: DataFrame, cms: DataFrame, token_col: str = "token",
                 depth: int = 4, width: int = 64) -> DataFrame:
    """Point-query the sketch: est(t) = min_j cms[j][h_j(t)].

    `rows` supplies the tokens to estimate (one output row per input row);
    the sketch side is depth x width rows — broadcast by construction, so
    the `depth` left joins are map-side. Buckets never touched by the
    corpus coalesce to 0 (the true CMS empty-cell value). Adds `cms_est`.
    """
    out = rows
    ests = []
    for j in range(depth):
        cj = cms.filter(F.col("j") == j).select(
            F.col("bucket").alias(f"__b{j}"), F.col("c").alias(f"__c{j}")
        )
        out = out.withColumn(f"__b{j}", cms_bucket(F.col(token_col), j, width))
        out = out.join(F.broadcast(cj), f"__b{j}", "left")
        ests.append(F.coalesce(F.col(f"__c{j}"), F.lit(0).cast("long")))
    est = F.least(*ests) if len(ests) > 1 else ests[0]
    drop = [c for j in range(depth) for c in (f"__b{j}", f"__c{j}")]
    return out.withColumn("cms_est", est.cast("long")).drop(*drop)


def cms_join_size(cms_a: DataFrame, cms_b: DataFrame, depth: int = 4) -> DataFrame:
    """JOIN-SIZE estimation from two Count-Min sketches (Cormode &
    Muthukrishnan 2005, the a₂ inner-product estimator): the equi-join
    cardinality |A ⋈ B| = Σ_t c_A(t)·c_B(t) is estimated WITHOUT touching
    either input as min_j Σ_bucket cmsA[j]·cmsB[j] — the estimator a query
    planner uses to size a shuffle before running it. Hash collisions only
    ADD mass, so the estimate is a guaranteed UPPER BOUND of the true join
    size (the one-sided-error law, pytest-pinned); all arithmetic is exact
    BIGINT products + sums, engine-reproducible.

    Inputs are (j, bucket, c) tables from `cms_table`; the work is one
    depth×width join + a depth-row min — metadata-sized regardless of
    corpus size. Returns one row: ``js_cms_est``."""
    a = cms_a.select("j", "bucket", F.col("c").alias("__ca"))
    b = cms_b.select("j", "bucket", F.col("c").alias("__cb"))
    per_j = (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).cast("long").alias("__dot"))
    )
    return per_j.agg(F.min("__dot").cast("long").alias("js_cms_est"))


def hll_rho(h: Column, m: int = 64) -> Column:
    """Register index + rank-of-first-one for a 31-bit nonnegative hash.

    bucket = h mod m; the remaining W = 25 bits (for m = 64) are the
    pattern: rho = W + 1 - bitlength(rem), with rem = 0 meaning all-zero
    pattern -> rho = W + 1. bitlength is length(bin(x)) — Spark and DuckDB
    both print bigints without leading zeros, so the value crosses engines
    exactly (bin(0) = '0' is why the zero case is explicit).
    Returns a struct (bucket int, rho int).
    """
    bits = {64: 6, 32: 5, 16: 4}[m]
    w = 31 - bits
    rem = F.shiftright(h, bits)
    rho = F.when(rem == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rem))
    )
    return F.struct(_pmod(h, m).cast("int").alias("bucket"),
                    rho.cast("int").alias("rho"))


def hll_summary(df: DataFrame, group_col: str = "source",
                id_col: str = "doc_id", m: int = 64) -> DataFrame:
    """Per-group HyperLogLog cardinality estimate, exact-integer end to end.

    Two Catalyst aggregations, both map-side combinable:
      1. (group, bucket) -> M_b = max(rho)   [<= m cells/group/partition]
      2. group -> (present, V, Rmax, S)      [<= m rows per group]
    The harmonic sum is kept exact by scaling with 2^Rmax:
      S = sum_present 2^(Rmax - M_b) + V * 2^Rmax   (bigint, < m * 2^26)
      raw estimate = alpha_m * m^2 * 2^Rmax / S     (one IEEE chain)
    Emits per group: hll_present, hll_v, hll_rmax, hll_snum (exact bigints
    — these gate the register state itself) and hll_est4 (fround4 of the
    raw estimate). Small-range linear counting is deliberately NOT applied:
    it needs ln(), which the repo's cross-engine discipline keeps out of
    gates (CLAUDE.md); the raw estimator is the gated artifact and the
    pytest suite covers its accuracy envelope.
    """
    if m not in (16, 32, 64):
        raise ValueError(f"m must be 16, 32 or 64, got {m}")
    h = _pmod(_pmod(F.col(id_col).cast("bigint")) * F.lit(HLL_MIX))
    br = hll_rho(h, m)
    regs = (
        df.select(F.col(group_col).alias("g"), br.alias("br"))
        .select("g", F.col("br.bucket").alias("bucket"), F.col("br.rho").alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("mreg"))
    )
    return _hll_regs_to_summary(regs, group_col, m)


def _hll_regs_to_summary(regs: DataFrame, group_col: str, m: int) -> DataFrame:
    """(g, bucket, mreg) register table -> the hll_summary output schema."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    from pyspark.sql import Window

    wg = Window.partitionBy("g")
    per = (
        regs.withColumn("rmax", F.max("mreg").over(wg))
        .groupBy("g", "rmax")
        .agg(
            F.count("*").cast("long").alias("hll_present"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), rmax - mreg)"))
            .cast("long").alias("__s_present"),
        )
        .withColumn("hll_v", (F.lit(m) - F.col("hll_present")).cast("long"))
        .withColumn(
            "hll_snum",
            (F.col("__s_present")
             + F.col("hll_v") * F.expr("shiftleft(CAST(1 AS BIGINT), rmax)"))
            .cast("long"),
        )
    )
    from nyxus_spark.compare import fround4

    est = (
        F.lit(alpha * (m * m))
        * F.expr("CAST(shiftleft(CAST(1 AS BIGINT), rmax) AS DOUBLE)")
        / F.col("hll_snum").cast("double")
    )
    return per.select(
        F.col("g").alias(group_col),
        "hll_present", "hll_v",
        F.col("rmax").cast("long").alias("hll_rmax"),
        "hll_snum",
        fround4(est).alias("hll_est4"),
    )


def hll_merged_summary(df: DataFrame, group_col: str = "source",
                       id_col: str = "doc_id", m: int = 64,
                       shards: int = 4) -> DataFrame:
    """hll_summary computed the way a 1000-executor cluster actually would:
    per-(group, SHARD) partial register tables first (shard = id mod
    `shards` — standing in for "one sketch per input split / per day of
    ingest"), then the shard partials MERGED by per-bucket MAX, then the
    same registers→estimate step. HLL's whole value at 100 TB is that this
    merge is lossless — max is associative/commutative, so sharded partials
    compose to exactly the from-scratch sketch. The gate makes that algebra
    a checked artifact: the oracle recomputes the summary FROM SCRATCH
    (no shards) and every register-state integer and the estimate must
    agree bit-for-bit. Same output schema as `hll_summary`.
    """
    if m not in (16, 32, 64):
        raise ValueError(f"m must be 16, 32 or 64, got {m}")
    if shards < 2:
        raise ValueError(f"shards must be >= 2, got {shards}")
    h = _pmod(_pmod(F.col(id_col).cast("bigint")) * F.lit(HLL_MIX))
    br = hll_rho(h, m)
    partials = (
        df.select(
            F.col(group_col).alias("g"),
            _pmod(F.col(id_col).cast("bigint"), shards).alias("shard"),
            br.alias("br"),
        )
        .select("g", "shard", F.col("br.bucket").alias("bucket"),
                F.col("br.rho").alias("rho"))
        .groupBy("g", "shard", "bucket")
        .agg(F.max("rho").alias("mreg"))
    )
    merged = partials.groupBy("g", "bucket").agg(F.max("mreg").alias("mreg"))
    return _hll_regs_to_summary(merged, group_col, m)


# --- SQL replay fragments (DuckDB) -----------------------------------------

def sql_cms_bucket(expr: str, j: int, width: int = 64) -> str:
    """DuckDB expression replaying cms_bucket bit-for-bit (pmod = (x%p+p)%p)."""
    a, b = CMS_PARAMS[j]
    h = (f"((((CAST({expr} AS BIGINT) % {P31}) * {a} + {b})"
         f" % {P31} + {P31}) % {P31})")
    return f"(({h} % {width} + {width}) % {width})"


def sql_hll_cte(group_col: str = "source", id_col: str = "doc_id",
                table: str = "documents", m: int = 64) -> str:
    """DuckDB CTE chain ending in `hll(g, hll_present, hll_v, hll_rmax,
    hll_snum, hll_est4)` — the op-for-op replay of hll_summary."""
    bits = {64: 6, 32: 5, 16: 4}[m]
    w = 31 - bits
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    h = (f"(((({id_col} % {P31}) + {P31}) % {P31} * {HLL_MIX}) % {P31})")
    return f"""
hll_h AS (
  SELECT {group_col} AS g, {h} AS h FROM {table}
),
hll_regs AS (
  SELECT g, h % {m} AS bucket,
         MAX(CASE WHEN h // {m} = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(h // {m})) END) AS mreg
  FROM hll_h GROUP BY 1, 2
),
hll_rm AS (SELECT g, MAX(mreg) AS rmax FROM hll_regs GROUP BY 1),
hll AS (
  SELECT r.g,
         CAST(COUNT(*) AS BIGINT) AS hll_present,
         CAST({m} - COUNT(*) AS BIGINT) AS hll_v,
         CAST(x.rmax AS BIGINT) AS hll_rmax,
         CAST(SUM(CAST(1 AS BIGINT) << (x.rmax - r.mreg))
              + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << x.rmax)
              AS BIGINT) AS hll_snum,
         FLOOR(CAST({alpha * m * m!r} AS DOUBLE)
               * CAST(CAST(1 AS BIGINT) << x.rmax AS DOUBLE)
               / CAST(SUM(CAST(1 AS BIGINT) << (x.rmax - r.mreg))
                      + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << x.rmax)
                      AS DOUBLE)
               * 10000.0 + 0.5) / 10000.0 AS hll_est4
  FROM hll_regs r JOIN hll_rm x USING (g)
  GROUP BY r.g, x.rmax
)"""
