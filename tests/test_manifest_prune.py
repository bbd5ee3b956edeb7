"""prescan.manifest_prune: scan-planning soundness + python parity."""

import pytest

from nyxus_spark.operators.prescan import manifest_prune


@pytest.fixture(scope="module")
def planned(spark):
    # ids 0..199, value correlated with id (sorted-writer layout) + noise
    rows = [(i, (i * 3) % 7 + i // 2) for i in range(200)]
    df = spark.createDataFrame(rows, "rid long, v long")
    got = manifest_prune(df, "rid", "v", file_rows=16).toPandas()
    return rows, got.set_index("rid").sort_index()


def test_manifest_stats_match_python(planned):
    rows, got = planned
    files = {}
    for rid, v in rows:
        files.setdefault(rid // 16, []).append(v)
    for rid, v in rows:
        f = rid // 16
        r = got.loc[rid]
        assert r["mf_file"] == f
        assert r["mf_rows"] == len(files[f])
        assert r["mf_min"] == min(files[f])
        assert r["mf_max"] == max(files[f])


def test_bounds_are_lower_rank_percentiles(planned):
    rows, got = planned
    sv = sorted(v for _, v in rows)
    n = len(sv)
    assert (got["mf_lo"] == sv[max(1, (n * 25) // 100) - 1]).all()
    assert (got["mf_hi"] == sv[max(1, (n * 75) // 100) - 1]).all()


def test_pruning_is_sound_and_totals_consistent(planned):
    rows, got = planned
    # soundness: every row matching the predicate sits in a scanned file
    hits = got[got["mf_hit"] == 1]
    assert (hits["mf_scan"] == 1).all()
    # a skipped file contains no matching row at all
    skipped = got[got["mf_scan"] == 0]
    assert (skipped["mf_hit"] == 0).all()
    # totals: files = distinct files; skipped rows = rows in pruned files
    assert got["mf_files"].iloc[0] == got["mf_file"].nunique()
    assert got["mf_files_scanned"].iloc[0] == \
        got[got["mf_scan"] == 1]["mf_file"].nunique()
    assert got["mf_rows_skipped"].iloc[0] == len(skipped)


def test_validation(spark):
    df = spark.createDataFrame([(1, 1)], "rid long, v long")
    with pytest.raises(ValueError):
        manifest_prune(df, "rid", "v", file_rows=0)
    with pytest.raises(ValueError):
        manifest_prune(df, "rid", "v", lo_pct=80, hi_pct=20)
