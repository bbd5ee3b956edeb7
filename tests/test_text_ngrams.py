"""Repetition stats (duplicate n-grams) and benchmark decontamination.

These are the Gopher-style repetition quality rule and the test-set-overlap
scan every training corpus runs before training (the brief's text-analysis
family). Fixtures are hand-computed; a DuckDB replay of the list-valued gram
SQL (the oracle mechanism) must agree with the Spark string-key mechanism,
proving the two serializations count identically.
"""

import duckdb
import pytest

from nyxus_spark.functions import contamination, ngram_keys, repetition_stats


def test_ngram_validation():
    with pytest.raises(ValueError, match="n > 0"):
        ngram_keys(0)


def test_repetition_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 1,2,3 repeated: 6 trigrams, 3 distinct, each twice
            ("a", [1, 2, 3, 1, 2, 3, 1, 2], 8),
            # all-distinct trigrams
            ("b", [1, 2, 3, 4, 5], 5),
            # constant: 4 identical trigrams
            ("c", [9, 9, 9, 9, 9, 9], 6),
            # shorter than n: no row
            ("d", [1, 2], 2),
        ],
        "doc_id string, tokens array<int>, n_tok int",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, n=3).collect()}
    assert set(rows) == {"a", "b", "c"}
    a = rows["a"]
    assert (a["rep_total_ngrams"], a["rep_distinct_ngrams"],
            a["rep_dup_ngrams"], a["rep_top_ngram_count"]) == (6, 3, 3, 2)
    assert a["rep_dup_ratio"] == 0.5
    b = rows["b"]
    assert (b["rep_total_ngrams"], b["rep_distinct_ngrams"],
            b["rep_dup_ngrams"], b["rep_top_ngram_count"]) == (3, 3, 0, 1)
    assert b["rep_dup_ratio"] == 0.0
    c = rows["c"]
    assert (c["rep_total_ngrams"], c["rep_distinct_ngrams"],
            c["rep_dup_ngrams"], c["rep_top_ngram_count"]) == (4, 1, 3, 4)
    assert c["rep_dup_ratio"] == 0.75


def test_contamination_hand_computed(spark):
    corpus = spark.createDataFrame(
        [
            # shares the 2-gram (1,2) with the benchmark — twice
            ("a", [1, 2, 7, 1, 2], 5),
            # clean
            ("b", [8, 9, 10], 3),
            # too short for 2-grams — still emitted, zero-filled
            ("c", [4], 1),
        ],
        "doc_id string, tokens array<int>, n_tok int",
    )
    bench = spark.createDataFrame(
        [("bench", [0, 1, 2, 3], 4)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    rows = {r["doc_id"]: r for r in contamination(corpus, bench, n=2).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert (rows["a"]["contam_hits"], rows["a"]["contam_distinct"],
            rows["a"]["is_contaminated"]) == (2, 1, 1)
    assert (rows["b"]["contam_hits"], rows["b"]["contam_distinct"],
            rows["b"]["is_contaminated"]) == (0, 0, 0)
    assert (rows["c"]["contam_hits"], rows["c"]["contam_distinct"],
            rows["c"]["is_contaminated"]) == (0, 0, 0)


def test_repetition_matches_duckdb_list_mechanism(spark):
    """Spark counts ','-serialized gram keys; the oracle counts LIST values.
    The serialization is injective, so the per-doc stats must agree on any
    input — checked on a deterministic pseudo-random corpus."""
    import numpy as np

    rng = np.random.RandomState(7)
    data = []
    for i in range(40):
        k = int(rng.randint(1, 30))
        data.append((f"d{i}", [int(x) for x in rng.randint(0, 5, size=k)], k))
    df = spark.createDataFrame(data, "doc_id string, tokens array<int>, n_tok int")
    got = {
        r["doc_id"]: (r["rep_total_ngrams"], r["rep_distinct_ngrams"],
                      r["rep_dup_ngrams"], r["rep_top_ngram_count"])
        for r in repetition_stats(df, n=3).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{d}', {t}, {n})" for d, t, n in data)
        + ") AS v(doc_id, tokens, n_tok)"
    )
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute("""
WITH g3 AS (
  SELECT doc_id, tokens[i : i + 2] AS g
  FROM (SELECT doc_id, tokens, unnest(range(1, n_tok - 1)) AS i
        FROM t WHERE n_tok >= 3)
)
SELECT doc_id, CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(SUM(c) - COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT)
FROM (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g)
GROUP BY doc_id
""").fetchall()
    }
    assert got == exp
