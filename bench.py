#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline pipeline (BASELINE.md protocol): read events parquet → derive
versioned token sequences + probes → sorted-merge as-of join → full feature
kernel catalog over matched sequences → write parquet. Throughput =
output (doc_id, ts) feature rows / wall-clock.

Usage:
  python bench.py                  # single run at $SPARK_GRAFT_CPUS (default 32)
  python bench.py --cores 8        # override parallelism
  python bench.py --dual           # N vs 4N scaling study (8 vs 32 cores),
                                   # each level in its own subprocess/JVM;
                                   # prints the 32-core JSON line + scaling
                                   # metrics, and refreshes BENCH/BASELINE.md
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _replicate(df, factor: int, key: str = "doc_id"):
    """Scale the input by `factor` with distinct entity ids — the sandbox
    stand-in for a larger table shard count (same per-row work, more rows)."""
    from pyspark.sql import functions as F

    if factor <= 1:
        return df
    reps = F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    return (
        df.withColumn("__r", reps)
        .withColumn(key, F.concat_ws("_", F.col(key), F.col("__r")))
        .drop("__r")
    )


def run_pipeline(cores: int, sf_dir: str, replicate: int = 8, warmup: bool = True) -> dict:
    from pyspark.sql import functions as F

    from nyxus_spark.features import extract_features
    from nyxus_spark.operators import asof_join, sessionize, with_lags, with_locf
    from nyxus_spark.session import get_spark
    from nyxus_spark.sources import probes, tokens_static, tokens_versions

    spark = get_spark("nyxus_spark_bench", cores=cores, shuffle_partitions=max(cores, 8))
    out_dir = tempfile.mkdtemp(prefix="nyxus_bench_")
    queries: dict[str, float] = {}

    if warmup:
        # steady-state measurement: prime Python workers (imports), codegen,
        # and the parquet committer on EVERY core before the clock starts
        w = tokens_versions(spark, sf_dir).limit(64 * cores).repartition(cores)
        extract_features(w, ["*ALL*"], keep_tokens=False).write.mode("overwrite").parquet(
            f"{out_dir}/warmup"
        )

    t_total0 = time.perf_counter()

    try:
        # q1: feature catalog over all versioned sequences. The sandbox input
        # is ONE parquet file → one split; repartition to use every core (at
        # 100 TB the source is thousands of splits and this is a no-op).
        t0 = time.perf_counter()
        v = _replicate(tokens_versions(spark, sf_dir), replicate).repartition(cores * 2)
        feats_v = extract_features(v.drop("event_id"), ["*ALL*"], keep_tokens=False)
        feats_v.write.mode("overwrite").parquet(f"{out_dir}/versions_feats")
        queries["q1_feature_catalog"] = time.perf_counter() - t0

        # q2: as-of join + first-order features on matched sequences
        t0 = time.perf_counter()
        p = _replicate(probes(spark, sf_dir), replicate)
        matched = asof_join(p, v.select("doc_id", "ts", "tokens", "n_tok", "source"))
        feats_m = extract_features(
            matched.filter(F.col("tokens").isNotNull()), ["*ALL_INTENSITY*"], keep_tokens=False
        )
        feats_m.write.mode("overwrite").parquet(f"{out_dir}/asof_feats")
        queries["q2_asof_features"] = time.perf_counter() - t0

        # q3: sessionize + lag/lead/LOCF over the raw event stream
        t0 = time.perf_counter()
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            F.col("user_id").cast("string").alias("doc_id"), "ts", "event_id", "value"
        )
        w = with_locf(with_lags(sessionize(ev, 3600.0), ["value"], [1]), ["value"])
        w.write.mode("overwrite").parquet(f"{out_dir}/windows")
        queries["q3_window_ops"] = time.perf_counter() - t0

        # q4: static corpus first-order + texture
        t0 = time.perf_counter()
        t = _replicate(tokens_static(spark, sf_dir), replicate).repartition(cores * 2)
        feats_s = extract_features(t, ["*ALL_INTENSITY*", "*ALL_GLCM*", "*ALL_GLRLM*"], keep_tokens=False)
        feats_s.write.mode("overwrite").parquet(f"{out_dir}/static_feats")
        queries["q4_static_texture"] = time.perf_counter() - t0

        total = time.perf_counter() - t_total0
        n_rows = (
            spark.read.parquet(f"{out_dir}/versions_feats").count()
            + spark.read.parquet(f"{out_dir}/asof_feats").count()
            + spark.read.parquet(f"{out_dir}/static_feats").count()
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()

    return {
        "metric": "end-to-end feature-vector pipeline wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(s, 3) for k, s in queries.items()},
        "sf": sf_dir,
        "cores": cores,
        "replicate": replicate,
        "feature_rows": int(n_rows),
        "rows_per_sec": round(n_rows / total, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=int(os.environ.get("SPARK_GRAFT_REPLICATE", "8")))
    ap.add_argument("--dual", action="store_true", help="N vs 4N scaling study")
    args = ap.parse_args()

    if not args.dual:
        print(json.dumps(run_pipeline(args.cores, args.sf_dir, args.replicate)))
        return

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores), "--sf-dir", args.sf_dir,
             "--replicate", str(args.replicate)],
            capture_output=True, text=True, check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    r8, r32 = results[8], results[32]
    eff = (r32["rows_per_sec"] / r8["rows_per_sec"]) / 4.0
    headline = dict(r32)
    headline["rows_per_sec_8"] = r8["rows_per_sec"]
    headline["rows_per_sec_32"] = r32["rows_per_sec"]
    headline["scaling_efficiency_n_to_4n"] = round(eff, 3)
    print(json.dumps(headline))
    _write_bench_md(r8, r32, eff, args.sf_dir)


def _write_bench_md(r8: dict, r32: dict, eff: float, sf_dir: str) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured scaling (N vs 4N parallelism)

Protocol per /root/repo/BASELINE.md: identical input ({sf_dir}), identical
physical plan, two parallelism levels as the sandbox proxy for cluster sizes
N and 4N (local[8] vs local[32], separate JVMs). Pipeline = read parquet →
derive versioned token table → as-of join → full feature-kernel catalog →
window ops → parquet sink.

| parallelism | wall-clock (s) | feature rows | rows/sec |
|---|---|---|---|
| local[8]  (N)  | {r8['value']} | {r8['feature_rows']} | {r8['rows_per_sec']} |
| local[32] (4N) | {r32['value']} | {r32['feature_rows']} | {r32['rows_per_sec']} |

**Scaling efficiency N→4N = (rows/sec@32 ÷ rows/sec@8) / 4 = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json north_rule)

Per-phase seconds at local[32]: {json.dumps(r32['queries'])}
Per-phase seconds at local[8]:  {json.dumps(r8['queries'])}

Caveat: at sf0.1 a large fraction of wall-clock is fixed overhead (JVM/session
startup excluded here, but stage scheduling, Python worker spin-up, and parquet
commit are not), which understates efficiency relative to a real 100 TB run
where compute dominates. Throughput numbers are the honest sandbox measurement.
"""
        )


if __name__ == "__main__":
    main()
