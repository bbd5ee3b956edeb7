"""Gabor filter bank + radial distribution over token streams.

1-D recasts of the reference's remaining feature families:

* GABOR (src/nyx/features/gabor.cpp:18,43-122): nyxus convolves a bank of
  2-D Gabor filters at several frequencies and scores the energized-area ratio
  vs a baseline low-pass filter. 1-D contract: a K=9 complex Gabor kernel per
  frequency f (Gaussian envelope × cos/sin carrier) with taps QUANTIZED to
  integers at TAP_SCALE = 2^14 (14-bit fixed point), convolved along the
  sequence in exact int64 arithmetic; GABOR_E_{f} = Σ|response|² over valid
  positions divided by the baseline (f=0 Gaussian) energy — a ratio of two
  exact integers with ONE final division, so the driver's DuckDB oracle
  replays it bit-identically (the repo's integer-numerator standard trick;
  the shared quantized bank TAP_SCALE cancels any fixed-point bias concern
  because both engines convolve the same integer taps). Degenerate or
  too-short sequences (< K tokens, or all-zero tokens) emit softNAN.
  Exactness bound: per valid position |response|² = rc² + rs² ≤
  2·(K·TAP_SCALE·xmax)², so the per-row energy Σ|resp|² stays within int64
  only while n_valid·2·(K·TAP_SCALE·xmax)² < 2^63 — with xmax = 250 that is
  n_tok ≤ ~3300 (NOT ~6700: the complex magnitude doubles the single-carrier
  bound). Rows beyond the bound emit softNAN instead of silently wrapping
  (`exceeds_exact_bound` is the row predicate; the driver query filters the
  same expression so the DuckDB oracle, whose HUGEINT SUM never wraps, sees
  the identical domain). The energy accumulation splits each int64 term into
  hi/lo 26-bit halves so the float64 bincount partial sums stay exact for
  rows up to 2^27 tokens.

* RADIAL distribution (src/nyx/features/radial_distribution.cpp —
  FRAC_AT_D/MEAN_FRAC/RADIAL_CV): the pixel-to-centroid radius becomes the
  normalized positional distance |i − c| / max(c, n−1−c) from the weighted
  centroid; token mass is binned into 8 radial bands.

Segment-vectorized: convolution = K shift-masked multiply-adds on the flat
array (arena-backed); radial bands = one bincount.
"""

from __future__ import annotations

import numpy as np

from nyxus_spark.features._arena import buf
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

# 8 bank outputs mirroring the reference's f0_theta_pairs bank size
# (gabor.cpp:19-24 — 4 default pairs, README documents up to 8 values); in
# 1-D there is no θ, so the bank spans 8 carrier frequencies f/16 cycles per
# sample up to Nyquist (f=8)
GABOR_FREQS = (1, 2, 3, 4, 5, 6, 7, 8)
K = 9  # kernel taps
N_BANDS = 8

GABOR_FEATURES = [f"GABOR_E_{f}" for f in GABOR_FREQS]
RADIAL_FEATURES = [f"FRAC_AT_D_{k}" for k in range(N_BANDS)] + ["MEAN_FRAC", "RADIAL_CV"]


TAP_SCALE = 1 << 14  # 14-bit fixed-point taps → integer-exact convolution


def _kernels():
    """The quantized integer bank: round(float_tap · TAP_SCALE) per tap.
    Both the kernel and the SQL oracle consume THESE integers, so the
    float trig that produced them never crosses an engine boundary."""
    c = K // 2
    x = np.arange(K, dtype=np.float64) - c
    env = np.exp(-(x ** 2) / (2.0 * 3.0 ** 2))
    base = env / env.sum()
    ks = {}
    for f in GABOR_FREQS:
        phase = 2.0 * np.pi * f * x / 16.0
        kc = env * np.cos(phase)
        ksn = env * np.sin(phase)
        # zero-mean carriers: DC (the token-stream baseline) must not leak
        # into band-pass energies
        ks[f] = (
            np.rint((kc - kc.mean()) * TAP_SCALE).astype(np.int64),
            np.rint((ksn - ksn.mean()) * TAP_SCALE).astype(np.int64),
        )
    return np.rint(base * TAP_SCALE).astype(np.int64), ks


def quantized_taps() -> tuple[list[int], dict[int, tuple[list[int], list[int]]]]:
    """Integer taps for the SQL oracle (literal-embedded)."""
    base, ks = _kernels()
    return (
        [int(v) for v in base],
        {f: ([int(v) for v in kc], [int(v) for v in ksn]) for f, (kc, ksn) in ks.items()},
    )


_LO_BITS = 26
_LO_MASK = (1 << _LO_BITS) - 1

_INT64_LIMIT = float(1 << 63)


def exceeds_exact_bound(n_valid, xmax):
    """Row predicate: True where the int64 convolution could wrap.

    Per valid position |resp|² ≤ 2·(K·TAP_SCALE·xmax)², so the row energy is
    bounded by n_valid·2·(K·TAP_SCALE·xmax)²; the comparison is done in
    float64 with this exact op order — n_valid · (2·m·m) with
    m = double(K·TAP_SCALE·xmax) — so the driver query's SQL filter can
    replay it bit-identically (K·TAP_SCALE·xmax is int64-exact, products of
    doubles round identically on every IEEE engine)."""
    m = (np.int64(K * TAP_SCALE) * np.asarray(xmax, dtype=np.int64)).astype(np.float64)
    return np.asarray(n_valid, dtype=np.float64) * (2.0 * m * m) >= _INT64_LIMIT


def within_bound_sql(n_tok_expr: str, xmax_expr: str) -> str:
    """SQL twin of NOT exceeds_exact_bound — valid in both Spark SQL and
    DuckDB (CAST/ DOUBLE arithmetic, left-associative products, the 2^63
    literal rounds to exactly 2^63 in either parser). `xmax_expr` is the
    engine's array-max expression over the token list."""
    m = f"CAST({K * TAP_SCALE} * ({xmax_expr}) AS DOUBLE)"
    return (
        f"(CAST(({n_tok_expr}) - {K - 1} AS DOUBLE) * (2.0 * {m} * {m})"
        " < 9.223372036854775808e18)"
    )


def _seg_int_sum(vals: np.ndarray, rows: np.ndarray, n: int) -> np.ndarray:
    """Exact per-row sum of nonnegative int64 values via a hi/lo 26-bit
    split: each float64 bincount partial stays < 2^53, the recombined
    (hi << 26) + lo is the exact int64 total."""
    hi = np.bincount(rows, weights=(vals >> _LO_BITS).astype(np.float64), minlength=n)
    lo = np.bincount(rows, weights=(vals & _LO_MASK).astype(np.float64), minlength=n)
    return (hi.astype(np.int64) << _LO_BITS) + lo.astype(np.int64)


def gabor_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    n = seg.n_rows
    nan = settings.softnan
    total = seg.flat.size
    out = {name: np.full(n, nan) for name in GABOR_FEATURES}
    if total == 0:
        return out
    x = seg.flat.astype(np.int64)
    c = K // 2
    pos = np.arange(total, dtype=np.int64) - seg.starts[seg.row_idx]
    valid = (pos >= c) & (pos <= seg.lengths[seg.row_idx] - 1 - c)
    vrows = seg.row_idx[valid]
    nvalid = np.bincount(vrows, minlength=n)
    # overflow guard: rows whose worst-case energy could wrap int64 emit
    # softNAN (never a silently-wrapped value); the driver query filters the
    # identical predicate so the oracle sees the same domain
    xmax = seg.seg_max(np.abs(x).astype(np.float64), fill=0.0).astype(np.int64)
    overflow = exceeds_exact_bound(nvalid, xmax)
    base_k, banks = _kernels()

    # symmetric/antisymmetric tap decomposition: the quantized cos taps are
    # exactly symmetric (cos is even, rint preserves the mirror) and the sin
    # taps exactly antisymmetric (odd product, half-to-even rint is odd), so
    # acc[i] = Σ w_k·x[i+k−c] regroups into w_off·(x[i+off] ± x[i−off]) —
    # the paired sums S_off / differences D_off are computed ONCE per batch
    # and shared by the whole bank, cutting the array passes nearly in half.
    # Values are bit-identical to the plain tap loop (pure int64 regrouping;
    # cross-segment and flat-edge positions are garbage either way and
    # masked by `valid` — every valid position sits ≥ c from both borders).
    S = {}
    D = {}
    for off in range(1, c + 1):
        s_off = buf(f"gab_s{off}", total, np.int64)
        d_off = buf(f"gab_d{off}", total, np.int64)
        m = total - 2 * off
        if m > 0:
            np.add(x[2 * off:], x[:m], out=s_off[off:total - off])
            np.subtract(x[2 * off:], x[:m], out=d_off[off:total - off])
        s_off[:off] = 0
        s_off[total - off:] = 0
        d_off[:off] = 0
        d_off[total - off:] = 0
        S[off] = s_off
        D[off] = d_off

    def conv(weights):
        """acc[i] = Σ_k w_k · x[i+k−c], exact int64, via the S/D pairs when
        the taps are (anti)symmetric, else the plain shifted loop."""
        acc = buf("gab_acc", total, np.int64)
        acc.fill(0)
        t = buf("gab_t", total, np.int64)
        sym = all(weights[c + o] == weights[c - o] for o in range(1, c + 1))
        anti = (weights[c] == 0
                and all(weights[c + o] == -weights[c - o] for o in range(1, c + 1)))
        if sym or anti:
            paired = S if sym else D
            for off in range(1, c + 1):
                w = int(weights[c + off])
                if w == 0:
                    continue
                np.multiply(paired[off], w, out=t)
                np.add(acc, t, out=acc)
            w0 = int(weights[c])
            if w0 != 0:
                np.multiply(x, w0, out=t)
                np.add(acc, t, out=acc)
            return acc
        for k in range(K):
            off = k - c
            w = int(weights[k])
            m = total - abs(off)
            if m <= 0 or w == 0:
                continue
            if off == 0:
                np.multiply(x, w, out=t)
                np.add(acc, t, out=acc)
            elif off > 0:
                np.multiply(x[off:], w, out=t[:m])
                np.add(acc[:m], t[:m], out=acc[:m])
            else:
                np.multiply(x[:m], w, out=t[:m])
                np.add(acc[-off:], t[:m], out=acc[-off:])
        return acc

    base_resp = conv(base_k)
    sq = buf("gab_sq", total, np.int64)
    np.multiply(base_resp, base_resp, out=sq)
    base_energy = _seg_int_sum(sq[valid], vrows, n)
    ok = (nvalid > 0) & (base_energy > 0) & ~overflow
    safe_eb = np.where(base_energy > 0, base_energy, 1).astype(np.float64)
    for f in GABOR_FREQS:
        kc, ksn = banks[f]
        rc = conv(kc)
        mag = buf("gab_mag", total, np.int64)
        np.multiply(rc, rc, out=mag)
        rs = conv(ksn)  # reuses the conv buffer — rc is consumed above
        np.multiply(rs, rs, out=sq)
        np.add(mag, sq, out=mag)
        e = _seg_int_sum(mag[valid], vrows, n)
        # ONE final division of two exact integers — same two float64
        # conversions + divide the SQL oracle performs
        ratio = e.astype(np.float64) / safe_eb
        out[f"GABOR_E_{f}"] = np.where(ok, ratio, nan)
    return out


def radial_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    n = seg.n_rows
    nan = settings.softnan
    w = seg.flat.astype(np.float64)
    out = {name: np.full(n, nan) for name in RADIAL_FEATURES}
    if w.size == 0:
        return out
    pos = (np.arange(w.size, dtype=np.float64) - seg.starts[seg.row_idx])
    m0 = seg.seg_sum(w)
    m1 = seg.seg_sum(w * pos)
    ok = m0 > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        cen = m1 / np.where(ok, m0, 1.0)
        reach = np.maximum(cen, (seg.lengths - 1) - cen)
        reach = np.where(reach > 0, reach, 1.0)
        r = np.abs(pos - cen[seg.row_idx]) / reach[seg.row_idx]
        band = np.clip((r * N_BANDS).astype(np.int64), 0, N_BANDS - 1)
        # weighted per-band token mass
        key = seg.row_idx * N_BANDS + band
        wm = np.bincount(key, weights=w, minlength=n * N_BANDS).reshape(n, N_BANDS)
        frac = wm / np.where(ok, m0, 1.0)[:, None]
        mean_frac = frac.mean(axis=1)
        std_frac = frac.std(axis=1)
        cv = std_frac / np.where(mean_frac > 0, mean_frac, 1.0)
    for k in range(N_BANDS):
        out[f"FRAC_AT_D_{k}"] = np.where(ok, frac[:, k], nan)
    out["MEAN_FRAC"] = np.where(ok, mean_frac, nan)
    out["RADIAL_CV"] = np.where(ok, cv, nan)
    return out


def haar_cols(df, tokens_col: str = "tokens", n_tok_col: str = "n_tok",
              levels: int = 3):
    """Un-normalized Haar wavelet multi-resolution energies — the dyadic
    band decomposition beside the quantized Gabor bank above (the
    reference's frequency-band feature role, gabor.cpp, recast on the 1-D
    stream with an EXACT basis): at each level, adjacent pairs of the
    current approximation become pairwise SUMS (next approximation) and
    pairwise DIFFERENCES (detail); an odd tail element is dropped at that
    level (documented contract, replayed verbatim by the oracle).

    Deferring the 1/√2 normalization keeps every coefficient an exact
    integer (level-L values are 2^(L/2)-scaled), so the per-level detail
    energies haar_d1..haar_dL and the final approximation energy haar_aL
    are exact BIGINT sums — engine-bit-identical, order-free.

    Pure Catalyst exprs, zero Python, zero shuffle: each level is one
    staged array column (transform over a guarded sequence — Spark's
    sequence(a, b) DESCENDS when b < a, hence the size CASEs) plus one
    aggregate fold for its energy.
    """
    if not 1 <= levels <= 5:
        raise ValueError(f"levels must be in [1, 5], got {levels}")
    from pyspark.sql import functions as F

    def pair_arr(src: str, op: str) -> str:
        return (
            f"CASE WHEN size({src}) >= 2 THEN "
            f"transform(sequence(1, cast(size({src}) div 2 as int)),"
            f" i -> element_at({src}, 2 * i - 1) {op} element_at({src}, 2 * i))"
            f" ELSE array() END"
        )

    def energy(src: str) -> str:
        return (
            f"aggregate({src}, 0L,"
            f" (s, x) -> s + cast(x as bigint) * x)"
        )

    out = df
    cur = tokens_col
    for lv in range(1, levels + 1):
        out = out.withColumn(f"__haar_a{lv}", F.expr(pair_arr(cur, "+")))
        out = out.withColumn(
            f"haar_d{lv}", F.expr(energy(pair_arr(cur, "-"))).cast("long")
        )
        cur = f"__haar_a{lv}"
    out = out.withColumn(f"haar_a{levels}", F.expr(energy(cur)).cast("long"))
    return out.drop(*[f"__haar_a{lv}" for lv in range(1, levels + 1)])
