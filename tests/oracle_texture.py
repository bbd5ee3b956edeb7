"""Independent scalar reference for texture kernels — plain Python loops and
dicts, one sequence at a time; deliberately a different code path from
nyxus_spark.features.texture (which is segment-vectorized numpy).

Implements the engine's documented 1-D semantics (see texture.py docstring),
mirroring /root/reference/src/nyx/features/{glrlm,gldm,ngtdm,glcm}.cpp.
"""

from __future__ import annotations

import math

EPS = 2.2e-16


def bin_seq(values, grey_info):
    if not values:
        return []
    if grey_info == 0:
        return [int(v) for v in values]
    n = abs(grey_info)
    vmin, vmax = min(values), max(values)
    out = []
    if grey_info < 0:
        binw = (vmax - vmin) / n if vmax > vmin else 1.0
        for v in values:
            if v == 0:
                out.append(0)
            else:
                y = int((v - vmin) / binw) + 1
                out.append(min(y, n))
    else:
        slope = n / vmax if vmax > 0 else 0.0
        for v in values:
            if v == 0:
                out.append(1)
            else:
                y = int(math.floor(slope * v + 1.0))
                out.append(max(1, min(y, n)))
    return out


def _runs(b):
    runs = []
    i = 0
    while i < len(b):
        if b[i] == 0:
            i += 1
            continue
        j = i
        while j + 1 < len(b) and b[j + 1] == b[i]:
            j += 1
        runs.append((b[i], j - i + 1, i, j))
        i = j + 1
    return runs


def _family(cells, Np):
    """cells: list of (g, s) pairs. Returns dict of the 16 run-family stats."""
    Nr = len(cells)
    if Nr == 0:
        return {k: 0.0 for k in
                "SRE LRE GLN GLNN RLN RLNN RP GLV RV RE LGLRE HGLRE SRLGLE SRHGLE LRLGLE LRHGLE".split()}
    from collections import Counter

    byg = Counter(g for g, s in cells)
    bys = Counter(s for g, s in cells)
    bycell = Counter(cells)
    mu_g = sum(g for g, _ in cells) / Nr
    mu_s = sum(s for _, s in cells) / Nr
    return {
        "SRE": sum(1 / s ** 2 for _, s in cells) / Nr,
        "LRE": sum(s ** 2 for _, s in cells) / Nr,
        "GLN": sum(c * c for c in byg.values()) / Nr,
        "GLNN": sum(c * c for c in byg.values()) / Nr ** 2,
        "RLN": sum(c * c for c in bys.values()) / Nr,
        "RLNN": sum(c * c for c in bys.values()) / Nr ** 2,
        "RP": Nr / Np if Np else 0.0,
        "GLV": sum((g - mu_g) ** 2 for g, _ in cells) / Nr,
        "RV": sum((s - mu_s) ** 2 for _, s in cells) / Nr,
        "RE": -sum((c / Nr) * math.log2(c / Nr + EPS) for c in bycell.values()),
        "LGLRE": sum(1 / g ** 2 for g, _ in cells) / Nr,
        "HGLRE": sum(g ** 2 for g, _ in cells) / Nr,
        "SRLGLE": sum(1 / (g * g * s * s) for g, s in cells) / Nr,
        "SRHGLE": sum(g * g / (s * s) for g, s in cells) / Nr,
        "LRLGLE": sum(s * s / (g * g) for g, s in cells) / Nr,
        "LRHGLE": sum(g * g * s * s for g, s in cells) / Nr,
    }


def glrlm_ref(values, grey_info):
    vals = list(values)
    if not vals or min(vals) == max(vals):
        base = {f"GLRLM_{k}": 0.0 for k in _family([], 1)}
        base.update({f"GLDZM_{k}": 0.0 for k in
                     "SDE LDE LGLZE HGLZE GLNU ZDNU ZP ZDE SDLGLE LDHGLE".split()})
        return base
    b = bin_seq(vals, grey_info)
    runs = _runs(b)
    Np = sum(1 for x in b if x != 0)
    fam = _family([(g, l) for g, l, _, _ in runs], Np)
    out = {f"GLRLM_{k}": v for k, v in fam.items()}
    n = len(vals)
    dz = _family([(g, min(s, n - 1 - e) + 1) for g, l, s, e in runs], Np)
    m_dz = {"SDE": "SRE", "LDE": "LRE", "LGLZE": "LGLRE", "HGLZE": "HGLRE",
            "GLNU": "GLN", "ZDNU": "RLN", "ZP": "RP", "ZDE": "RE",
            "SDLGLE": "SRLGLE", "LDHGLE": "LRHGLE"}
    out.update({f"GLDZM_{k}": dz[v] for k, v in m_dz.items()})
    return out


def gldm_ref(values, grey_info, offset=1):
    vals = list(values)
    if not vals or min(vals) == max(vals):
        return None  # degenerate → NaN
    b = bin_seq(vals, grey_info)
    cells = []
    for i, g in enumerate(b):
        if g == 0:
            continue
        dep = 0
        for k in range(1, offset + 1):
            if i - k >= 0 and b[i - k] == g and b[i - k] != 0:
                dep += 1
            if i + k < len(b) and b[i + k] == g and b[i + k] != 0:
                dep += 1
        cells.append((g, dep + 1))
    if not cells:
        return None
    from collections import Counter

    Nz = len(cells)
    byg = Counter(g for g, _ in cells)
    byj = Counter(j for _, j in cells)
    byc = Counter(cells)
    mu_g = sum(g for g, _ in cells) / Nz
    mu_j = sum(j for _, j in cells) / Nz
    return {
        "GLDM_SDE": sum(1 / j ** 2 for _, j in cells) / Nz,
        "GLDM_LDE": sum(j ** 2 for _, j in cells) / Nz,
        "GLDM_GLN": sum(c * c for c in byg.values()) / Nz,
        "GLDM_DN": sum(c * c for c in byj.values()) / Nz,
        "GLDM_DNN": sum(c * c for c in byj.values()) / Nz ** 2,
        "GLDM_GLV": sum((g - mu_g) ** 2 for g, _ in cells) / Nz,
        "GLDM_DV": sum((j - mu_j) ** 2 for _, j in cells) / Nz,
        "GLDM_DE": -sum((c / Nz) * math.log2(c / Nz + EPS) for c in byc.values()),
        "GLDM_LGLE": sum(1 / g ** 2 for g, _ in cells) / Nz,
        "GLDM_HGLE": sum(g ** 2 for g, _ in cells) / Nz,
        "GLDM_SDLGLE": sum(1 / (g * g * j * j) for g, j in cells) / Nz,
        "GLDM_SDHGLE": sum(g * g / (j * j) for g, j in cells) / Nz,
        "GLDM_LDLGLE": sum(j * j / (g * g) for g, j in cells) / Nz,
        "GLDM_LDHGLE": sum(g * g * j * j for g, j in cells) / Nz,
    }


def ngtdm_ref(values, grey_info, offset=1):
    vals = list(values)
    if not vals or min(vals) == max(vals):
        return None
    b = bin_seq(vals, grey_info)
    N, S = {}, {}
    Nvc = 0
    for i, g in enumerate(b):
        if g == 0:
            continue
        neigh = [b[j] for j in range(max(0, i - offset), min(len(b), i + offset + 1))
                 if j != i and b[j] != 0]
        if not neigh:
            continue
        s = abs(g - sum(neigh) / len(neigh))
        N[g] = N.get(g, 0) + 1
        S[g] = S.get(g, 0.0) + s
        Nvc += 1
    levels = sorted(N)
    if len(levels) < 2:
        return None
    p = {g: N[g] / Nvc for g in levels}
    ps = sum(p[g] * S[g] for g in levels)
    Ngp = len(levels)
    contrast = (
        sum(p[i] * p[j] * (i - j) ** 2 for i in levels for j in levels)
        / (Ngp * (Ngp - 1))
    ) * (sum(S.values()) / Nvc)
    busy_den = sum(abs(i * p[i] - j * p[j]) for i in levels for j in levels)
    busyness = ps / busy_den if busy_den > 0 else 0.0
    complexity = sum(
        abs(i - j) * (p[i] * S[i] + p[j] * S[j]) / (p[i] + p[j])
        for i in levels for j in levels
    ) / Nvc
    s_tot = sum(S.values())
    strength = (
        sum((p[i] + p[j]) * (i - j) ** 2 for i in levels for j in levels) / s_tot
        if s_tot > 0 else 0.0
    )
    return {
        "NGTDM_COARSENESS": 1.0 / ps if ps else math.inf,
        "NGTDM_CONTRAST": contrast,
        "NGTDM_BUSYNESS": busyness,
        "NGTDM_COMPLEXITY": complexity,
        "NGTDM_STRENGTH": strength,
    }


def glcm_ref(values, grey_info, offset=1, symmetric=None):
    vals = list(values)
    if not vals or min(vals) == max(vals):
        return None
    b = bin_seq(vals, grey_info)
    if symmetric is None:
        symmetric = grey_info <= 0
    L = max(b) if grey_info == 0 else abs(grey_info)
    A = L + 1
    cnt = {}
    for i in range(len(b) - offset):
        if vals[i] == 0 or vals[i + offset] == 0:
            continue
        a, c = b[i], b[i + offset]
        if a == 0 or c == 0:
            continue
        cnt[(a, c)] = cnt.get((a, c), 0) + 1
        if symmetric:
            cnt[(c, a)] = cnt.get((c, a), 0) + 1
    sp = sum(cnt.values())
    if sp == 0:
        return None
    P = {(a, c): v / sp for (a, c), v in cnt.items()}

    def p(a, c):
        return P.get((a, c), 0.0)

    px = [sum(p(a, c) for c in range(A)) for a in range(A)]
    py = [sum(p(a, c) for a in range(A)) for c in range(A)]
    mux = sum(px[a] * a for a in range(A))
    muy = sum(py[c] * c for c in range(A))
    sigx = math.sqrt(sum(px[a] * (a - mux) ** 2 for a in range(A)))
    sigy = math.sqrt(sum(py[c] * (c - muy) ** 2 for c in range(A)))
    present = sorted({g for g in b if g != 0})
    Ng = len(present) if grey_info < 0 else L

    asm_ = sum(v * v for v in P.values())
    je = -sum(v * math.log2(v + EPS) for v in P.values())
    acor = sum(v * a * c for (a, c), v in P.items())
    jave = sum(v * a for (a, c), v in P.items())
    sumave = sum(v * (a + c) for (a, c), v in P.items())
    difave = sum(v * abs(a - c) for (a, c), v in P.items())
    hxy1 = -sum(p(a, c) * math.log2(px[a] * py[c] + EPS) for a in range(A) for c in range(A))
    hxy2 = -sum(px[a] * py[c] * math.log2(px[a] * py[c] + EPS) for a in range(A) for c in range(A))
    hx = -sum(px[a] * math.log2(px[a] + EPS) for a in range(A))
    hy = -sum(py[c] * math.log2(py[c] + EPS) for c in range(A))
    Ssum = {}
    Sdif = {}
    for (a, c), v in P.items():
        Ssum[a + c] = Ssum.get(a + c, 0.0) + v
        Sdif[abs(a - c)] = Sdif.get(abs(a - c), 0.0) + v
    return {
        "GLCM_ASM": asm_,
        "GLCM_ACOR": acor,
        "GLCM_CLUPROM": sum(v * (a + c - mux - muy) ** 4 for (a, c), v in P.items()),
        "GLCM_CLUSHADE": sum(v * (a + c - mux - muy) ** 3 for (a, c), v in P.items()),
        "GLCM_CLUTEND": sum(v * (a + c - mux - muy) ** 2 for (a, c), v in P.items()),
        "GLCM_CONTRAST": sum(v * (a - c) ** 2 for (a, c), v in P.items()),
        "GLCM_CORRELATION": (acor - mux * muy) / (sigx * sigy) if sigx * sigy else math.nan,
        "GLCM_DIFAVE": difave,
        "GLCM_DIFENTRO": -sum(v * math.log2(v + EPS) for v in Sdif.values()),
        "GLCM_DIFVAR": sum(v * (abs(a - c) - difave) ** 2 for (a, c), v in P.items()),
        "GLCM_DIS": difave,
        "GLCM_ENERGY": asm_,
        "GLCM_ENTROPY": je,
        "GLCM_HOM1": sum(v / (1 + abs(a - c)) for (a, c), v in P.items()),
        "GLCM_ID": sum(v / (1 + abs(a - c)) for (a, c), v in P.items()),
        "GLCM_IDN": sum(v / (1 + abs(a - c) / Ng) for (a, c), v in P.items()),
        "GLCM_IDM": sum(v / (1 + (a - c) ** 2) for (a, c), v in P.items()),
        "GLCM_IDMN": sum(v / (1 + (a - c) ** 2 / Ng ** 2) for (a, c), v in P.items()),
        "GLCM_INFOMEAS1": (je - hxy1) / max(hx, hy) if max(hx, hy) else math.nan,
        "GLCM_INFOMEAS2": math.sqrt(max(0.0, 1 - math.exp(-2 * (hxy2 - je)))),
        "GLCM_IV": sum(v / (a - c) ** 2 for (a, c), v in P.items() if a != c),
        "GLCM_JAVE": jave,
        "GLCM_JE": je,
        "GLCM_JMAX": max(P.values()),
        "GLCM_JVAR": sum(v * (a - jave) ** 2 for (a, c), v in P.items()),
        "GLCM_SUMAVERAGE": sumave,
        "GLCM_SUMENTROPY": -sum(v * math.log2(v + EPS) for v in Ssum.values()),
        "GLCM_SUMVARIANCE": sum(v * (a + c - sumave) ** 2 for (a, c), v in P.items()),
        "GLCM_VARIANCE": sum(v * (a - mux) ** 2 for (a, c), v in P.items()),
    }
