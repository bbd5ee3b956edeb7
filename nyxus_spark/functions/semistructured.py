"""Semi-structured (JSON) column parsing.

The reference parses per-slide metadata sidecars into typed properties
before feature extraction (/root/reference/src/nyx/slideprops.h:6-76); the
table recast of that surface is a JSON string column (`events.props`)
parsed into typed columns. Spark-first mechanism: ONE `from_json` pass with
an explicit schema — a single JVM Jackson parse per row materializing every
requested field (Catalyst prunes the struct to the fields actually read),
instead of N `get_json_object` calls re-parsing the string N times.
Malformed documents yield nulls (PERMISSIVE), never a failed job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_col(
    df: DataFrame,
    col: str = "props",
    fields: dict[str, str] | None = None,
    prefix: str = "",
    drop: bool = False,
) -> DataFrame:
    """Parse the JSON string column `col` into typed top-level columns.

    ``fields`` maps field name -> Spark SQL type string (e.g.
    ``{"k": "bigint"}``). Absent fields, malformed JSON, and type-mismatched
    values (a JSON string where a bigint is declared — no implicit
    coercion) become nulls.
    ``prefix`` namespaces the new columns; ``drop`` removes the raw column.
    """
    if not fields:
        raise ValueError("fields must map at least one name -> type")
    schema = ", ".join(f"`{n}` {t}" for n, t in fields.items())
    parsed = F.from_json(F.col(col), schema).alias("__parsed")
    out = df.select(
        "*", *[parsed.getField(n).alias(f"{prefix}{n}") for n in fields]
    )
    return out.drop(col) if drop else out


def json_schema_audit(col: str = "props", expected: tuple = ("k",)):
    """Schema-DRIFT audit for a semi-structured JSON column — the
    ingest-monitoring pass that catches producers adding/dropping fields
    before a typed from_json pipeline silently nulls them out. Pure column
    expressions over json_object_keys:

      n_keys  — top-level key count,
      extra   — keys not in `expected` (new-field drift),
      missing — `expected` keys absent (dropped-field drift).

    Exact integers; malformed JSON yields NULL keys → all three NULL (the
    caller decides the quarantine policy)."""
    exp_arr = "array(" + ", ".join(f"'{e}'" for e in expected) + ")"
    keys = f"json_object_keys({col})"
    return {
        "n_keys": F.expr(f"cast(size({keys}) as bigint)"),
        "extra": F.expr(
            f"cast(size(array_except({keys}, {exp_arr})) as bigint)"
        ),
        "missing": F.expr(
            f"cast(size(array_except({exp_arr}, {keys})) as bigint)"
        ),
    }
