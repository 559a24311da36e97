"""Similarity search over embedding columns (engine extension;
BASELINE.json north-star). Generalizes the KNN core (operators/knn.py) from
time series to embedding vectors.

- ``ann_brute_topk``: exact cosine top-k — crossJoin + codegen'd fold +
  WindowGroupLimit top-k. The baseline and oracle target.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing (deterministic,
  hash-derived planes) -> candidate join -> exact rerank. The scale path:
  shuffles (bucket, id) pairs instead of the full cross product; recall<1
  by construction, measured against brute force in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.distance import cosine_distance, dot
from ..functions.text import HASH_P
from .topk import topk_per_key


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def ann_brute_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors. Output: (query_id, neighbor_id, rank,
    cos_dist rounded to 6dp)."""
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv"))
    pairs = q.crossJoin(F.broadcast(c))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.withColumn("_d", cosine_distance(F.col("_qv"), F.col("_cv")))
    top = topk_per_key(pairs, "query_id", [F.asc("_d"), F.asc("neighbor_id")], k)
    return top.select(
        "query_id", "neighbor_id", "rank", F.round("_d", 6).alias("cos_dist")
    )


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane coefficient in [-0.5, 0.5) derived
    from (plane, dim) — portable integer arithmetic, no RNG state."""
    v = (1103515245 * (plane * 1009 + dim) + 12345) % HASH_P
    return v / HASH_P - 0.5


def lsh_bucket(vec: Column, *, planes: int = 8, dim: int = 64, table: int = 0) -> Column:
    """Sign-bit bucket id of a vector under ``planes`` fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        coeffs = F.array(*[F.lit(_hyperplane(table * 131 + p, d)) for d in range(dim)])
        proj = dot(vec, coeffs)
        bucket = bucket + F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 8,
    dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-table hyperplane LSH.

    Candidates = pairs sharing a bucket in ANY of ``tables`` hash tables;
    exact cosine rerank on candidates. Same output schema as brute force.
    """
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv"))

    def buckets(df, vc, idc, out):
        entries = [
            F.struct(F.lit(t).alias("table"), lsh_bucket(F.col(vc), planes=planes, dim=dim, table=t).alias("bucket"))
            for t in range(tables)
        ]
        return df.select(idc, vc, F.explode(F.array(*entries)).alias("tb")).select(
            idc, vc, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
        )

    qb = buckets(q, "_qv", "query_id", "qb")
    cb = buckets(c, "_cv", "neighbor_id", "cb")
    cand = (
        qb.join(cb, ["table", "bucket"])
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    cand = cand.withColumn("_d", cosine_distance(F.col("_qv"), F.col("_cv")))
    top = topk_per_key(cand, "query_id", [F.asc("_d"), F.asc("neighbor_id")], k)
    return top.select(
        "query_id", "neighbor_id", "rank", F.round("_d", 6).alias("cos_dist")
    )
