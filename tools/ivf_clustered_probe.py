"""IVF clustered-storage probe (r13): measure what the cell-partitioned
clustered corpus buys an `ivf_topk` probe over the assignments-path at a
corpus-bound scale.

The assignments path bounds COMPARISONS (the probe join keeps only
probed-cell members) but still scans the full vector table to attach
embeddings; the clustered path stores vectors next to their cell id,
partitioned by cell, so the probed-cell filter becomes parquet
partition pruning on the VECTOR read itself. This probe builds a
content-perturbed replica of the sf0.1 embeddings table (copy-major
ids — see tools/ivfpq_read_probe.py for why), persists both storages,
and reports min-of-3 walls plus the independent rows-read fraction.

Usage:
    python tools/ivf_clustered_probe.py [base_sf_dir] [--copies 600]
        [--n-cells 64] [--n-probe 4] [--workdir /tmp/ivf_clustered]

Prints one JSON line. Pure probe: writes only under --workdir.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_vehicule_insurance_spark import get_spark  # noqa: E402
from datawarehouse_vehicule_insurance_spark.operators import (  # noqa: E402
    similarity as S,
)
from ivfpq_read_probe import build_replica  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=600)
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/ivf_clustered")
    args = ap.parse_args()

    spark = get_spark(
        app_name="ivf_clustered_probe", master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)

    corpus_path = f"{wd}/corpus"
    n = build_replica(spark, args.base, args.copies, corpus_path)
    cands = spark.read.parquet(corpus_path)
    idx_kw = dict(n_cells=args.n_cells, kmeans_iters=3)

    S.ivf_centroids_table(cands, **idx_kw).write.parquet(f"{wd}/cents")
    cents = spark.read.parquet(f"{wd}/cents")
    S.ivf_assign_table(cands, cents, **idx_kw).write.parquet(f"{wd}/asg")
    asg = spark.read.parquet(f"{wd}/asg")
    t0 = time.perf_counter()
    # repartition("cell") before partitionBy: without it every writer
    # task emits a file into every cell dir (tasks x cells tiny files,
    # whose footer/scheduling overhead can eat the pruning win — the
    # first run of this probe measured 0.78x BECAUSE of that); with it
    # each cell is a handful of well-sized files
    S.ivf_clustered_corpus_table(cands, cents, **idx_kw).repartition(
        "cell"
    ).write.partitionBy("cell").parquet(f"{wd}/clustered")
    cluster_build_sec = round(time.perf_counter() - t0, 2)
    clustered = spark.read.parquet(f"{wd}/clustered")

    qs = cands.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    kw = dict(k=50, n_cells=args.n_cells, n_probe=args.n_probe,
              kmeans_iters=3)

    def min3(make_df) -> float:
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            make_df().write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        return round(min(walls), 3)

    wall_asg = min3(lambda: S.ivf_topk(
        qs, cands, centroids=cents, assignments=asg, **kw))
    wall_clu = min3(lambda: S.ivf_topk(
        qs, cands, centroids=cents, clustered=clustered, **kw))

    # independent read fraction: probed-cell rows / total, from a cell
    # histogram + numpy re-derivation of the probe sets
    C = np.array(
        [r["centroid"] for r in sorted(
            cents.select("cell", "centroid").collect(), key=lambda r: r[0]
        )]
    )
    hist = {
        r["cell"]: r["n"]
        for r in clustered.groupBy("cell").agg(
            F.count("*").alias("n")
        ).collect()
    }
    union: set[int] = set()
    for r in qs.collect():
        v = np.array(r["qvec"], dtype=np.float64)
        v /= np.linalg.norm(v) or 1.0
        union |= set(np.argsort(-(C @ v))[:args.n_probe].tolist())
    in_union = sum(hist.get(c, 0) for c in union)
    total = sum(hist.values())

    print(json.dumps({
        "base": args.base, "n_vectors": n, "n_cells": args.n_cells,
        "n_probe": args.n_probe,
        "cluster_build_sec": cluster_build_sec,
        "wall_assignments_sec": wall_asg,
        "wall_clustered_sec": wall_clu,
        "speedup": round(wall_asg / wall_clu, 3),
        "cells_probed_union": len(union),
        "union_row_fraction": round(in_union / total, 4),
    }))


if __name__ == "__main__":
    main()
