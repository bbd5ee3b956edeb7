"""connected_components: multi-hop label propagation + convergence."""

from pyspark.sql import functions as F

from nyxus_spark.operators.dedup import connected_components


def test_chain_and_islands(spark):
    # path a-b-c-d (diameter 3 → needs >1 propagation round), triangle
    # x-y-z, and an isolated pair p-q
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("x", "y"), ("y", "z"), ("x", "z"),
         ("p", "q")],
        "id_a string, id_b string",
    )
    got = {
        r["doc_id"]: r["rep"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
        "p": "p", "q": "p",
    }


def test_long_chain_converges(spark):
    # 12-node path: rep must reach the far end through iteration
    ids = [f"n{i:02d}" for i in range(12)]
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "id_a string, id_b string"
    )
    out = connected_components(pairs)
    reps = out.select(F.collect_set("rep").alias("s")).first()["s"]
    assert reps == ["n00"]
    assert out.count() == 12
