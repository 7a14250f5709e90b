"""Embedding-ingest LOOP scale probe at the ANN-corpus-bound regime
(r13 verdict #4): the crawl/embedding loops had per-batch throughput
probes at sf0.1 and the 1.2M-vector measurement existed only for the
single `ivf_topk` operator — this composes them. Fixed-size mixture
batches stream through `run_incremental_embedding_ingest` (clustered
layout on by DEFAULT per r14, PQ tier on) while the corpus grows to
≥ 1.2M vectors, so batch cost vs corpus size is measured for the
WHOLE loop: IVF probe vs the stored corpus, survivor appends, PQ
encode, clustered cell-partitioned writes, checkpoint bookkeeping.

Per batch it reports wall seconds and the corpus size the batch was
deduped AGAINST; at the end it fits the log-log slope of batch wall
vs corpus-before (batches after the first two — batch 1 trains the
index, batch 2 still amortizes stream setup) and reports residual
checkpoint blocks (must be 0 — registry-scoped release, the same
invariant tools/loop_probe.py pins for the document loop).

Geometry: 64-center mixture at center scale 1 / sigma 1 (moderate
clusters — the regime ANN tiers are for), n_cells=256 so the
per-batch probe stays cell-bounded as the corpus grows (comparisons
per batch ≈ batch·n_probe/n_cells · corpus — LINEAR in corpus by
construction; the probe verifies the constant and the machinery
around it, not a miracle).

Usage:
    python tools/embedding_loop_scale_probe.py [--batches 12]
        [--batch-rows 100000] [--dim 32] [--n-cells 256]
        [--workdir /tmp/emb_loop_scale]

Prints one JSON line. Run alone — concurrent Spark sessions skew
timings 3-4x.
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_vehicule_insurance_spark import get_spark  # noqa: E402
from datawarehouse_vehicule_insurance_spark.streaming import (  # noqa: E402
    curation as SC,
)


def mixture_batch(spark, centers, start_id, n, dim, sigma, seed):
    """n mixture vectors with ids [start_id, start_id+n), built
    distributively: the center matrix broadcasts, noise is JVM randn
    (seeded per batch so batches differ), no driver-side matrix."""
    n_clusters = len(centers)
    cents_df = spark.createDataFrame(
        [(int(i), [float(x) for x in centers[i]])
         for i in range(n_clusters)],
        "__c bigint, __center array<double>",
    )
    noise = F.array(*[F.randn(seed * 10_000 + i) for i in range(dim)])
    return (
        spark.range(start_id, start_id + n)
        .repartition(32)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_clusters).alias("__c"),
            noise.alias("__n"),
        )
        .join(F.broadcast(cents_df), "__c")
        .select(
            "vec_id",
            F.zip_with(
                "__center", "__n", lambda c, x: c + F.lit(sigma) * x
            ).alias("embedding"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--n-cells", type=int, default=256)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/emb_loop_scale")
    args = ap.parse_args()

    spark = get_spark(
        app_name="embedding_loop_scale_probe", master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    p = {k: f"{wd}/{k}" for k in (
        "src", "corpus", "cents", "asg", "books", "codes", "ck",
    )}

    rng = np.random.default_rng(7)
    centers = rng.normal(scale=1.0, size=(64, args.dim))

    rows = []
    for b in range(args.batches):
        batch = mixture_batch(
            spark, centers, b * args.batch_rows, args.batch_rows,
            args.dim, sigma=1.0, seed=b + 1,
        )
        batch.coalesce(8).write.mode("append").parquet(p["src"])
        corpus_before = 0 if b == 0 else (
            spark.read.parquet(p["corpus"]).count()
        )
        t0 = time.time()
        q = SC.run_incremental_embedding_ingest(
            spark, p["src"], p["corpus"], p["cents"], p["asg"],
            p["ck"], neardup_threshold=0.95, n_probe=args.n_probe,
            n_cells=args.n_cells, kmeans_iters=0,
            codebooks_path=p["books"], codes_path=p["codes"],
            max_files_per_trigger=1024,
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 1)
        rows.append({"batch": b + 1, "corpus_before": corpus_before,
                     "wall_sec": wall})
        print(f"  batch {b + 1}: corpus_before={corpus_before} "
              f"wall={wall}s", file=sys.stderr)

    # log-log slope over the steady-state batches (3..n)
    steady = [r for r in rows[2:] if r["corpus_before"] > 0]
    xs = [math.log(r["corpus_before"]) for r in steady]
    ys = [math.log(r["wall_sec"]) for r in steady]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    slope = (
        sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        if denom else float("nan")
    )

    corpus_n = spark.read.parquet(p["corpus"]).count()
    clustered_n = spark.read.parquet(p["corpus"] + "_clustered").count()
    codes_n = spark.read.parquet(p["codes"]).count()
    resid = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    print(json.dumps({
        "batches": rows,
        "exponent_wall_vs_corpus": round(slope, 3),
        "corpus_rows": corpus_n,
        "clustered_rows": clustered_n,
        "codes_rows": codes_n,
        "clustered_matches_corpus": clustered_n == corpus_n,
        "codes_match_corpus": codes_n == corpus_n,
        "n_cells": args.n_cells, "n_probe": args.n_probe,
        "dim": args.dim, "batch_rows": args.batch_rows,
        "resid_blocks": resid,
    }))
    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
