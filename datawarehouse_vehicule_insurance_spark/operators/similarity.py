"""Similarity search over embedding columns (``array<float>``).

Two tiers (SURVEY.md §7.2 step 6):

- :func:`cosine_topk` — brute-force exact top-k. The baseline; correct at
  any scale but O(Q×N). Queries broadcast; candidates stream — one pass
  over the embedding table, no shuffle of the big side.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: candidates are
  restricted to same-bucket rows (probing multiple hash tables for
  recall), so the join shuffles bucket-sized groups instead of the full
  cross product. The 100-TB path.

All vector math is native ``zip_with``/``aggregate``/``transform`` column
expressions computed in float64 — no Python UDF in the hot path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k. Queries are broadcast (the query
    set is small by construction); each candidate partition computes its
    similarities locally, then a per-query window picks top-k — with AQE
    the final rank shuffle carries only (query, cand, sim) triples."""
    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col(cand_id).asc()
    )
    return (
        F.broadcast(queries)
        .crossJoin(candidates)
        .withColumn("sim", cosine_sim(F.col(query_vec), F.col(cand_vec)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, F.round("sim", 6).alias("cosine_sim"),
                "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (sign of the dot
    product), packed into a long. Same-bucket vectors are cosine-close
    with probability 1 − θ/π per plane."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(vec, arr) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates pruned to rows sharing an LSH bucket
    with the query in ANY of ``n_tables`` hash tables (multi-table
    probing recovers recall lost to unlucky cuts). The candidate join is
    an equi-join on (table_id, bucket) — shuffle partitioned by bucket,
    which is what survives a 100× scale-up."""
    q_buckets = queries
    c_buckets = candidates
    q_parts = []
    c_parts = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * t)
        q_parts.append(
            q_buckets.select(
                query_id, query_vec,
                F.lit(t).alias("table_id"),
                lsh_bucket(F.col(query_vec), planes).alias("bucket"),
            )
        )
        c_parts.append(
            c_buckets.select(
                cand_id, cand_vec,
                F.lit(t).alias("table_id"),
                lsh_bucket(F.col(cand_vec), planes).alias("bucket"),
            )
        )
    qb = q_parts[0]
    for p in q_parts[1:]:
        qb = qb.unionByName(p)
    cb = c_parts[0]
    for p in c_parts[1:]:
        cb = cb.unionByName(p)

    pairs = (
        F.broadcast(qb)
        .join(cb, ["table_id", "bucket"])
        .select(query_id, query_vec, cand_id, cand_vec)
        .dropDuplicates([query_id, cand_id])
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col(cand_id).asc()
    )
    return (
        pairs.withColumn(
            "sim", cosine_sim(F.col(query_vec), F.col(cand_vec))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, F.round("sim", 6).alias("cosine_sim"),
                "rank")
    )
