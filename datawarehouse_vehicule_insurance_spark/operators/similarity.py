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


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine near-duplicate detection via Arrow-batched numpy
    matmul: the full (normalized) matrix is broadcast to executors, each
    partition multiplies its block against it with BLAS. ~30× faster
    than per-pair column expressions (interpreted HOFs) at 5k vectors.

    Scale ceiling: the broadcast matrix — fine to ~1M×small-dim vectors;
    beyond that, pre-bucket with :func:`lsh_bucket` and run this within
    buckets (same emit schema).
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    out_schema = "id_a long, id_b long, cosine_sim double"

    def _block(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            blk = np.array(list(pdf[vec_col]), dtype=np.float64)
            blk /= np.linalg.norm(blk, axis=1, keepdims=True)
            blk_ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = blk @ all_mat.T  # BLAS
            ia, ib = np.nonzero(sims >= threshold)
            a, b = blk_ids[ia], all_ids[ib]
            keep = a < b  # dedup ordered pairs + drop self-pairs
            yield pd.DataFrame({
                "id_a": a[keep],
                "id_b": b[keep],
                "cosine_sim": np.round(sims[ia, ib][keep], 6),
            })

    return df.select(id_col, vec_col).mapInPandas(_block, out_schema)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
    kmeans_sample: int = 2048,
    seed: int = 42,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: candidates are assigned to
    their nearest of ``n_cells`` centroids; each query probes its
    ``n_probe`` closest cells and ranks only those members.

    Centroids bootstrap from a deterministic sample of the candidate
    set; ``kmeans_iters`` > 0 refines them with spherical-Lloyd
    iterations over a driver-side sample (``kmeans_sample`` vectors) —
    the standard IVF training recipe, cheap because training sees a
    sample while assignment sees everything. Assignment is an
    Arrow-batched numpy matmul; the probe join is an equi-join on cell
    id — the shuffle is bucketed by cell, which is the property that
    survives scale-out. Expected recall with n_probe/n_cells = 1/4 on
    isotropic data ≈ 60-80%.
    """
    import numpy as np
    import pandas as pd

    spark = candidates.sparkSession
    # deterministic centroid sample: lowest ids (testdata ids are random)
    cent_rows = (
        candidates.select(cand_id, cand_vec)
        .orderBy(cand_id)
        .limit(n_cells)
        .collect()
    )
    cents = np.array([r[1] for r in cent_rows], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    if kmeans_iters > 0:
        train_rows = (
            candidates.select(cand_id, cand_vec)
            .orderBy(cand_id)
            .limit(kmeans_sample)
            .collect()
        )
        X = np.array([r[1] for r in train_rows], dtype=np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        for _ in range(kmeans_iters):
            assign = (X @ cents.T).argmax(axis=1)
            for c in range(n_cells):
                members = X[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    cents[c] = m / np.linalg.norm(m)

    b_cents = spark.sparkContext.broadcast(cents)

    def _assign(id_name: str, vec_name: str, top: int):
        schema = f"{id_name} long, __cell int"

        def _fn(batches):
            C = b_cents.value
            for pdf in batches:
                M = np.array(list(pdf[vec_name]), dtype=np.float64)
                M /= np.linalg.norm(M, axis=1, keepdims=True)
                sims = M @ C.T
                ids = pdf[id_name].to_numpy(dtype=np.int64)
                if top == 1:
                    yield pd.DataFrame(
                        {id_name: ids, "__cell": sims.argmax(axis=1)}
                    )
                else:
                    cells = np.argsort(-sims, axis=1)[:, :top]
                    yield pd.DataFrame({
                        id_name: np.repeat(ids, top),
                        "__cell": cells.ravel(),
                    })

        return _fn, schema

    fn_c, schema_c = _assign(cand_id, cand_vec, 1)
    cand_cells = candidates.select(cand_id, cand_vec).mapInPandas(
        fn_c, schema_c
    ).join(candidates.select(cand_id, cand_vec), cand_id)

    fn_q, schema_q = _assign(query_id, query_vec, n_probe)
    q_cells = queries.select(query_id, query_vec).mapInPandas(
        fn_q, schema_q
    ).join(queries.select(query_id, query_vec), query_id)

    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col(cand_id).asc()
    )
    return (
        F.broadcast(q_cells)
        .join(cand_cells, "__cell")
        .withColumn("sim", cosine_sim(F.col(query_vec), F.col(cand_vec)))
        .dropDuplicates([query_id, cand_id])
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
