"""Similarity search over an embedding column (array<float>).

Two paths:
  * `cosine_topk` — exact brute-force top-k for a (small) query set against
    the corpus: broadcast the queries, compute cosine with native
    higher-order functions (zip_with + aggregate — JVM-side, no UDF),
    rank with a per-query window. The correctness baseline.
  * `lsh_topk` — random-hyperplane LSH: bucket vectors by the sign pattern
    of R seeded hyperplane dot products, then search only within the
    query's bucket. The 100 TB path: the bucket join replaces the cross
    join; recall is tunable via R and multi-probe.

Cosines are computed in double and rounded (ROUND_DIGITS) so results are
bit-stable across engines (the DuckDB oracle reproduces them exactly).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_DIGITS = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a, b):
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), ROUND_DIGITS)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank) — exact top-k per query,
    self-matches excluded; ties broken by neighbor_id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 1234) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim)).round(6).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id from seeded hyperplanes — native SQL only
    (the plane constants are literal arrays in the plan)."""
    v = vec_col.cast("array<double>")
    bits = [
        F.when(_dot(v, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At scale the corpus side is pre-bucketed and written bucketed-by-bucket;
    the per-query work is then one partition-pruned scan + local top-k.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
