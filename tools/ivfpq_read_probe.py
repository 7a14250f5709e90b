"""IVF-PQ read-bounding probe at corpus-bound scale (VERDICT r12 #5).

The r12 scaling audit measured ann_ivfpq_shortlist sub-noise at replica
scale (60k-180k vectors): wall time was all fixed cost, so the
"~n_probe/n_cells of the corpus is read" claim stayed a docstring. This
probe builds a corpus LARGE enough that the code scan dominates (default
~1.2M vectors: 600 content-perturbed copies of the sf0.1 embeddings
table), persists the IVF-PQ artifacts with the codes laid out
``partitionBy("cell")`` exactly as ivfpq_encode_table prescribes, and
then measures the claim two independent ways:

1. **n_probe sweep at fixed n_cells** — with the r13 probed-cell filter
   the scan's bytes grow with n_probe (wall ~ fixed + c*n_probe); the
   pre-r13 unpruned scan read 100% of the codes regardless of n_probe,
   so its sweep is FLAT. The sweep is therefore the pruned-vs-unpruned
   discriminator without patching the operator: report
   wall(n_probe=n_cells)/wall(n_probe=small) against the row fractions.
2. **exact read fractions** — rows in the union of probed cells /
   total rows (counted from the persisted codes table, independently of
   the operator), plus the number of parquet cell-partitions touched.

Also fits the corpus-size exponent at the smallest n_probe between a
K/4 replica and the full one (alpha ~ 1 = linear in corpus, the
corpus-bound signature; the r12 regime showed alpha ~ 0).

Usage:
    python tools/ivfpq_read_probe.py [base_sf_dir] [--copies 600]
        [--n-cells 64] [--probes 4,16,64] [--workdir /tmp/ivfpq_probe]

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


def build_replica(spark, base_dir: str, copies: int, out: str) -> int:
    """Content-perturbed replica of the embeddings table (the
    make_scaled_replica recipe, vectors only): copy c of vec_id v gets
    id v*copies+c and a deterministic ~1e-4 relative perturbation per
    component — enough to break exact ties so cells stay populated the
    way a real corpus's would, small enough to keep the geometry."""
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # id scheme: copy-major (id = copy*span + v), NOT vec-major — the
    # deterministic lowest-ids training sample must see DISTINCT base
    # vectors, not 2048 perturbed copies of base vector 0 (vec-major
    # ids made the coarse k-means degenerate and the cells imbalanced,
    # a probe artifact not an operator property)
    span = emb.agg(F.max("vec_id")).first()[0] + 1
    lit_copies = F.lit(int(copies))
    rep = (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(
                F.sequence(F.lit(0), lit_copies - F.lit(1))
            ).alias("copy"),
        )
        .select(
            (F.col("copy") * F.lit(int(span)) + F.col("vec_id")).alias(
                "vec_id"
            ),
            F.transform(
                "embedding",
                lambda x, i: x
                * (
                    F.lit(1.0)
                    + F.lit(1e-4)
                    * (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.col("copy"), i),
                            F.lit(997),
                        )
                        / F.lit(997.0)
                    )
                ),
            ).alias("embedding"),
        )
        .repartition(32)
    )
    rep.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def persist_index(spark, corpus_path: str, n_cells: int, workdir: str):
    cands = spark.read.parquet(corpus_path)
    kw = dict(n_cells=n_cells, m=8, ks=16, kmeans_iters=3)
    cents_tbl, books_tbl = S.ivfpq_centroids_table(cands, **kw)
    cents_tbl.write.mode("overwrite").parquet(f"{workdir}/cents")
    books_tbl.write.mode("overwrite").parquet(f"{workdir}/books")
    cents = spark.read.parquet(f"{workdir}/cents")
    books = spark.read.parquet(f"{workdir}/books")
    t0 = time.perf_counter()
    S.ivfpq_encode_table(cands, cents, books, **kw).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{workdir}/codes")
    encode_sec = round(time.perf_counter() - t0, 2)
    return cents, books, spark.read.parquet(f"{workdir}/codes"), encode_sec, kw


def probe_walls(spark, corpus_path, cents, books, codes, kw, n_probe, k=50):
    """min-of-3 wall of the persisted-artifact probe through the noop
    sink (bench.py convention), plus the independent read fraction."""
    cands = spark.read.parquet(corpus_path)
    qs = cands.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        S.ivfpq_topk(
            qs, cands, k=k, n_probe=n_probe, centroids=cents,
            codebooks=books, codes=codes, **kw,
        ).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    # read fractions, counted independently of the operator: re-derive
    # the probed cells from the persisted centroids and charge them
    # against a one-pass cell histogram. union fraction = what ONE
    # batched call over all queries reads; per-query fraction = the
    # docstring's ~n_probe/n_cells claim
    C = np.array(
        [r["centroid"] for r in sorted(
            cents.select("cell", "centroid").collect(), key=lambda r: r[0]
        )]
    )
    hist = {
        r["cell"]: r["n"]
        for r in codes.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    total = sum(hist.values())
    union: set[int] = set()
    per_q = []
    for r in qs.collect():
        v = np.array(r["qvec"], dtype=np.float64)
        v /= np.linalg.norm(v) or 1.0
        mine = set(np.argsort(-(C @ v))[:n_probe].tolist())
        union |= mine
        per_q.append(sum(hist.get(c, 0) for c in mine) / total)
    in_union = sum(hist.get(c, 0) for c in union)
    return {
        "n_probe": n_probe,
        "wall_sec": round(min(walls), 3),
        "cells_probed_union": len(union),
        "rows_in_probed_cells": in_union,
        "union_row_fraction": round(in_union / total, 4),
        "per_query_row_fraction": round(
            float(np.mean(per_q)), 4
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=600)
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--probes", default="4,16,64")
    ap.add_argument("--workdir", default="/tmp/ivfpq_probe")
    args = ap.parse_args()
    probes = [int(p) for p in args.probes.split(",")]

    # 16g heap like tools/scaling_audit.py: 32 concurrent vectorized
    # parquet readers over a 1.2M x 64-double corpus overflow the
    # default driver heap in local mode
    spark = get_spark(
        app_name="ivfpq_read_probe", master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)

    out = {"base": args.base, "n_cells": args.n_cells, "scales": []}
    # small scale first (copies/4), then full — exponent between them
    for label, copies in (("K/4", args.copies // 4), ("K", args.copies)):
        corpus = f"{wd}/corpus_{copies}"
        n = build_replica(spark, args.base, copies, corpus)
        cents, books, codes, encode_sec, kw = persist_index(
            spark, corpus, args.n_cells, f"{wd}/idx_{copies}"
        )
        sweep = [
            probe_walls(spark, corpus, cents, books, codes, kw, p)
            for p in (probes if label == "K" else probes[:1])
        ]
        out["scales"].append({
            "label": label, "n_vectors": n, "encode_sec": encode_sec,
            "sweep": sweep,
        })

    s_small, s_full = out["scales"]
    t_a, t_b = s_small["sweep"][0]["wall_sec"], s_full["sweep"][0]["wall_sec"]
    k_ratio = s_full["n_vectors"] / s_small["n_vectors"]
    out["corpus_alpha_at_min_probe"] = round(
        float(np.log(t_b / t_a) / np.log(k_ratio)), 3
    )
    full_sweep = s_full["sweep"]
    out["full_scan_over_min_probe_wall_ratio"] = round(
        full_sweep[-1]["wall_sec"] / full_sweep[0]["wall_sec"], 3
    )
    out["full_scan_over_min_probe_row_ratio"] = round(
        full_sweep[-1]["rows_in_probed_cells"]
        / max(1, full_sweep[0]["rows_in_probed_cells"]), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
