"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the baseline: a narrow dot-product expression and
  ORDER BY … LIMIT k, which Spark plans as TakeOrderedAndProject (per-partition
  top-k + driver merge: no full sort, no shuffle of the corpus);
* IVF-style probed search — the scale path: assign every vector to its nearest
  of C coarse centroids (broadcast), probe only the query's top-p centroid
  buckets. At 100 TB the bucket assignment is a write-time partition column
  (Iceberg bucket/identity partition → partition pruning at query time); here
  the pruning filter is applied explicitly.

All arithmetic is JVM-side (aggregate/zip_with) — no Python in the hot path.
Ordering is made deterministic by ranking on (round(cos, 4) DESC, id ASC) so
results are stable across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyxus_spark.compare import fround4


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(F.expr(
        f"aggregate({a}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))"
    ))


def cosine_col(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = (
        df.withColumn("__q", q)
        .select(F.col(id_col), fround4(cosine_col(vec_col, "__q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return out


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (broadcast join +
    deterministic argmax: max cos, ties to lowest centroid id)."""
    joined = df.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col, cent_id, cosine_col(vec_col, cent_vec).alias("__c")
    )
    from pyspark.sql import Window

    # rank on the ROUNDED cosine (same discipline as topk_cosine): assignment
    # becomes reproducible across partitionings and engines
    w = Window.partitionBy(id_col).orderBy(fround4(F.col("__c")).desc(), F.col(cent_id).asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col(cent_id).alias("assigned_cent"))
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """IVF probed search: score only vectors assigned to the query's top
    n_probe centroids (at scale: partition pruning on the bucket column)."""
    q = [float(x) for x in query_vec]
    qlit = F.array(*[F.lit(x) for x in q])
    top_cents = [
        r[0]
        for r in (
            centroids.withColumn("__q", qlit)
            .select(cent_id, fround4(cosine_col(cent_vec, "__q")).alias("c"))
            .orderBy(F.col("c").desc(), F.col(cent_id).asc())
            .limit(n_probe)
            .collect()
        )
    ]
    assigned = ivf_assign(df, centroids, id_col, vec_col, cent_id, cent_vec)
    pruned = assigned.filter(F.col("assigned_cent").isin(top_cents))
    return topk_cosine(pruned, q, k, id_col, vec_col)
