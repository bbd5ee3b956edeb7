"""kmeans_step (exact Lloyd iteration on quantized vectors) and
epoch_shuffle_key (deterministic per-epoch training-order permutation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyxus_spark.functions import epoch_shuffle_key
from nyxus_spark.operators.similarity import kmeans_step

_P31 = 2147483647
_MIXR = 2654435761 % _P31


def test_kmeans_step_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randint(-127, 128, size=(60, 8))
    rows = [(i, [int(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, qvec array<int>")
    cents = spark.createDataFrame(rows[:4], "cent_id bigint, cent_qvec array<int>")
    got = kmeans_step(df, cents).toPandas()

    # numpy reference: exact integer distances, ties to lowest centroid id
    d = ((vecs[:, None, :].astype(np.int64) - vecs[None, :4, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)  # argmin takes the first (lowest id) on ties
    for (c, dim), g in got.set_index(["assigned_cent", "dim"]).iterrows():
        members = vecs[assign == c]
        assert g["n"] == len(members)
        assert g["coord_sum"] == members[:, dim].sum()
        exp = members[:, dim].sum() / len(members)
        assert abs(g["new_coord"] - exp) < 1e-3
    # every cluster-dim cell present
    assert len(got) == len(np.unique(assign)) * 8


def test_kmeans_step_empty_cluster_absent(spark):
    """A centroid that captures nothing simply has no output rows."""
    rows = [(0, [0, 0]), (1, [1, 1])]
    df = spark.createDataFrame(rows, "vec_id bigint, qvec array<int>")
    cents = spark.createDataFrame(
        [(0, [0, 0]), (1, [100, 100])], "cent_id bigint, cent_qvec array<int>")
    got = kmeans_step(df, cents).toPandas()
    assert set(got.assigned_cent) == {0}


def _key(i, epoch):
    off = (epoch * 2654435769) % _P31
    return (i + off) % _P31 * _MIXR % _P31


def test_epoch_shuffle_reproducible_and_decorrelated(spark):
    df = spark.range(500).select(F.col("id"))
    got = df.select(
        "id",
        epoch_shuffle_key(F.col("id"), 0).alias("k0"),
        epoch_shuffle_key(F.col("id"), 1).alias("k1"),
    ).toPandas().set_index("id").sort_index()
    for i in (0, 1, 17, 499):
        assert got.loc[i, "k0"] == _key(i, 0)
        assert got.loc[i, "k1"] == _key(i, 1)
    # keys are a permutation driver: no collisions on this range
    assert got.k0.nunique() == 500 and got.k1.nunique() == 500
    # epochs produce genuinely different orders
    o0 = got.sort_values("k0").index.to_numpy()
    o1 = got.sort_values("k1").index.to_numpy()
    assert (o0 != o1).mean() > 0.9


def test_epoch_shuffle_validation(spark):
    with pytest.raises(ValueError):
        epoch_shuffle_key(F.col("id"), -1)
