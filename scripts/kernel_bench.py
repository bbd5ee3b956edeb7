"""Per-section kernel cost benchmark + regression guard.

Times every registry kernel section on a fixed deterministic synthetic batch
(shaped like the bench corpus) and records the cost RELATIVE to an in-process
numpy calibration workload — this sandbox's wall-clock swings 2-3x with host
phase (CLAUDE.md), but the section/calibration ratio cancels the phase to
first order, so a >1.5x ratio regression is a real code regression, not
noise.

Usage:
  python scripts/kernel_bench.py                  # print per-section table
  python scripts/kernel_bench.py --write-baseline # record BENCH/kernel_baseline.json
  python scripts/kernel_bench.py --check          # exit 1 on >1.5x ratio regression
  python scripts/kernel_bench.py --sections ngtdm,gabor --passes 5

The pytest guard (tests/test_kernel_budget.py) runs --check, so a kernel
regression like round 3's q1 slowdown trips CI instead of shipping silently.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "kernel_baseline.json",
)
THRESHOLD = 1.5

N_ROWS = 2000
SEED = 20260817


def make_batch():
    """Deterministic synthetic batch shaped like the bench corpus: token
    values 0..250, row lengths 9..400 (gabor-valid), mixed short/long."""
    rng = np.random.RandomState(SEED)
    lengths = rng.randint(9, 400, size=N_ROWS)
    cells = [rng.randint(0, 251, size=k).astype(np.int32) for k in lengths]
    from nyxus_spark.features.segmented import Segments

    return Segments(cells)


def calibration() -> float:
    """Fixed numpy workload (bincount + multiply chains on batch-sized data)
    whose cost tracks the host's current memory/compute phase."""
    rng = np.random.RandomState(1)
    x = rng.randint(0, 251, size=400_000).astype(np.int64)
    idx = rng.randint(0, 2000, size=x.size)
    t0 = time.perf_counter()
    for _ in range(3):
        w = x.astype(np.float64)
        w2 = w * w
        np.bincount(idx, weights=w2 * w, minlength=2048)
        np.bincount(idx, weights=w2 * w2, minlength=2048)
    return time.perf_counter() - t0


def run(sections: list[str] | None, passes: int) -> dict[str, dict]:
    from nyxus_spark.features.registry import all_sections
    from nyxus_spark.settings import FeatureSettings

    seg = make_batch()
    settings = FeatureSettings()
    secs = all_sections()
    if sections:
        secs = {k: v for k, v in secs.items() if k in sections}
    out: dict[str, dict] = {}
    cal0 = calibration()
    for name, sec in secs.items():
        _reset_batch_cache(seg)
        sec.fn(seg, settings)  # warm (arena growth, first-touch pages)
        best = min(
            _timed(sec.fn, seg, settings) for _ in range(passes)
        )
        out[name] = {"ms": round(best * 1e3, 2)}
    cal1 = calibration()
    cal = min(cal0, cal1)
    for name, rec in out.items():
        rec["ratio"] = round(rec["ms"] / (cal * 1e3), 3)
    out["_calibration_ms"] = {"ms": round(cal * 1e3, 2)}
    return out


def _reset_batch_cache(seg) -> None:
    """Texture sections memoize shared work (binning ctx, run lists, per-offset
    GLCM stats) per batch; production gets one batch per Segments, so each
    timed pass must start from the fresh-batch state or it times a cache hit."""
    if hasattr(seg, "_tex_cache"):
        del seg._tex_cache


def _timed(fn, seg, settings) -> float:
    _reset_batch_cache(seg)
    t0 = time.perf_counter()
    fn(seg, settings)
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default=None,
                    help="comma-separated section names (default: all)")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--write-baseline", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help=f"fail if any section ratio regresses >{THRESHOLD}x "
                         "vs BENCH/kernel_baseline.json")
    args = ap.parse_args()
    if ((args.write_baseline or args.check)
            and not os.environ.get("MALLOC_MMAP_THRESHOLD_")):
        # the pytest guard runs --check with MALLOC_MMAP_THRESHOLD_ set (the
        # production-worker malloc config, session.py); a baseline recorded
        # under a DIFFERENT allocator config reads systematically off and
        # trips borderline sections on host-phase swings (round-5 incident:
        # histo/ih/ngtdm false regressions) — refuse the asymmetry
        print("set MALLOC_MMAP_THRESHOLD_=268435456 for --write-baseline/"
              "--check (the env tests/test_kernel_budget.py uses) so the "
              "baseline and the check share one allocator config",
              file=sys.stderr)
        return 2
    wanted = args.sections.split(",") if args.sections else None
    res = run(wanted, args.passes)
    for name, rec in sorted(res.items(), key=lambda kv: -kv[1]["ms"]):
        print(f"{name:16s} {rec['ms']:9.2f} ms   ratio {rec.get('ratio', '-')}")
    if args.write_baseline:
        os.makedirs(os.path.dirname(BASELINE_PATH), exist_ok=True)
        with open(BASELINE_PATH, "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)
        print(f"baseline written: {BASELINE_PATH}")
    if args.check:
        if not os.path.exists(BASELINE_PATH):
            print("no baseline recorded; run --write-baseline first", file=sys.stderr)
            return 1
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        bad = []
        for name, rec in res.items():
            if name.startswith("_") or name not in base:
                continue
            b = base[name].get("ratio")
            g = rec.get("ratio")
            if b and g and g > b * THRESHOLD:
                bad.append(f"{name}: ratio {g} > {THRESHOLD}x baseline {b}")
        if bad:
            print("KERNEL COST REGRESSION:\n  " + "\n  ".join(bad), file=sys.stderr)
            return 1
        print(f"kernel budget OK ({len([k for k in res if not k.startswith('_')])} "
              f"sections within {THRESHOLD}x of baseline ratios)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
