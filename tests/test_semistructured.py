"""Semi-structured JSON column parsing (functions/semistructured.py)."""

import pytest

from nyxus_spark.functions import parse_json_col


def test_parse_typed_fields(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 87, "name": "a", "score": 1.5}'),
            (2, '{"k": 0}'),               # absent fields -> nulls
            (3, 'not json at all'),        # malformed -> all nulls
            (4, None),                     # null input -> all nulls
            (5, '{"k": "12"}'),            # JSON string ≠ bigint: strict typing
        ],
        "id bigint, props string",
    )
    out = parse_json_col(
        df, "props", {"k": "bigint", "name": "string", "score": "double"}
    )
    rows = {r["id"]: r for r in out.collect()}
    assert (rows[1]["k"], rows[1]["name"], rows[1]["score"]) == (87, "a", 1.5)
    assert (rows[2]["k"], rows[2]["name"], rows[2]["score"]) == (0, None, None)
    assert (rows[3]["k"], rows[3]["name"], rows[3]["score"]) == (None, None, None)
    assert (rows[4]["k"], rows[4]["name"], rows[4]["score"]) == (None, None, None)
    assert rows[5]["k"] is None  # no string→int coercion (typed schema)
    assert "props" in out.columns  # kept by default


def test_prefix_and_drop(spark):
    df = spark.createDataFrame([(1, '{"k": 5}')], "id bigint, props string")
    out = parse_json_col(df, "props", {"k": "bigint"}, prefix="props_", drop=True)
    assert out.columns == ["id", "props_k"]
    assert out.collect()[0]["props_k"] == 5


def test_empty_fields_rejected(spark):
    df = spark.createDataFrame([(1, "{}")], "id bigint, props string")
    with pytest.raises(ValueError, match="fields"):
        parse_json_col(df, "props", {})
