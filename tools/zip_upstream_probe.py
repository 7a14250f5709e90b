"""Two controlled experiments bounding the CAUSE of the Spark 4.1
reused-exchange zip defect (r8 verdict #4) — run beside
tools/zip_defect_probe.py (which reproduces it with the real engine
composition).

Experiment A (``stock``): an upstream-shaped STOCK-OPS mock of the
minimal firing composition — no engine code, only spark.read /
explode / posexplode / window / groupBy / join / self-join /
localCheckpoint(eager=False) — at the same 10x volume, 32 shuffle
partitions, AQE on, with the engine's reversed fused-count
materialization. Five shapes of increasing fidelity (count-joins;
+cuts; +banded self-join; +lead-chain-window grams and line
reassembly; all together).

Experiment B (``persist``): the REAL minimal firing composition
(line dedup + LM gate + Gopher over exact-dedup -> gates -> minhash),
but with ``DataFrame.localCheckpoint`` monkey-patched to
``persist(MEMORY_AND_DISK)`` (+count when eager) — Spark 4's concrete
class is ``pyspark.sql.classic.dataframe.DataFrame``; patching the
abstract base is a silent no-op — so every plan cut goes through the
cache manager instead of RDD materialization.

r9 results, pinned here so the conclusion is re-checkable:

- stock: ALL FIVE variants complete clean (3 runs each tried during
  development) — the defect needs the real operators' plan
  complexity (fused gate projections, a model table referenced 3x by
  the scorer, 16-band signature columns, ...), not just the
  cut-and-fan-out SHAPE.
- persist: FIRES 3/3 with the identical List(32, 64) mismatch at
  cuts=8 engaged — the defect is INDEPENDENT of
  localCheckpoint(eager=False): a pure SQL-plan + cache-manager
  execution hits it too. A persist()-based cut redesign would NOT
  dodge the defect, and costs ~5x more wall time before the firing
  point (eager per-cut materialization serializes the stages the
  fused reverse count runs as one job graph).

Together with r8 (per-cut retry refuted 3/3; cut claims are
UnknownPartitioning): the defect is an upstream AQE
stage-materialization race that the engine can only heal around
(session-wide exchange-reuse-off), not design around. Keep the heal;
retire it only when tools/zip_defect_probe.py exits 3 repeatedly.

Usage:
    python tools/zip_upstream_probe.py stock [variant 1-5] [sf_dir]
    python tools/zip_upstream_probe.py persist [sf_dir]

Exit 0 = defect fired, 3 = completed clean, 1 = other failure.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

ZIP_RE = re.compile(
    r"(?is)zip\s+rdds?.{0,120}?(unequal|different).{0,60}?partitions"
)
TOK = r"\s+"


def _session(driver_mem: str):
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def _classify(exc: BaseException, t0: float, label: str) -> int:
    if ZIP_RE.search(str(exc)):
        print(f"FIRED {label} after {time.time()-t0:.1f}s: "
              + str(exc).splitlines()[0][:200])
        return 0
    raise exc


# --------------------------------------------------------------- stock

def _grams(df, n):
    toks = df.select("doc_id", F.split(F.lower("text"), TOK).alias("t"))
    if n == 1:
        return toks.select("doc_id", F.explode("t").alias("g"))
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("t") - n + 1, F.lit(0))
                ),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i, n))),
            )
        ).alias("g"),
    )


def _stage_count_join(df, n, col):
    g = _grams(df, n)
    counts = g.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    feat = (
        g.join(counts, "g")
        .groupBy("doc_id")
        .agg(F.max("c").alias(col), F.count(F.lit(1)).alias(col + "_n"))
    )
    return df.join(feat, "doc_id", "left")


def _stage_dedup(df):
    h = df.select("doc_id", F.xxhash64(F.col("text")).alias("h"))
    keep = h.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    return df.join(keep.select("doc_id"), "doc_id", "left_semi")


def _stage_selfjoin(df):
    b = df.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.xxhash64(F.substring(F.lower("text"), 1, 40), F.lit(i))
                for i in range(4)
            ])
        ).alias("band"),
    )
    pairs = (
        b.alias("a")
        .join(b.alias("b"), "band")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    return df.join(pairs, "doc_id", "left_anti")


def _stage_window_grams(df, col):
    toks = df.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), TOK)).alias("pos", "w"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    g = toks.select(
        "doc_id",
        F.xxhash64(
            F.concat_ws(" ", "w", F.lead("w", 1).over(wdoc),
                        F.lead("w", 2).over(wdoc))
        ).alias("g"),
    ).where(F.col("g").isNotNull())
    wg = Window.partitionBy("doc_id", "g")
    flagged = g.select(
        "doc_id", (F.count(F.lit(1)).over(wg) > 1).alias("dup")
    )
    feat = flagged.groupBy("doc_id").agg(
        F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias(col)
    )
    return df.join(feat, "doc_id", "left")


def _stage_line_reassembly(df):
    lines = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "ln")
    )
    freq = lines.groupBy("ln").agg(F.countDistinct("doc_id").alias("nd"))
    kept = lines.join(freq, "ln").where(F.col("nd") < 10000)
    re_asm = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ln"))),
                lambda s: s["ln"],
            ),
        ).alias("text2")
    )
    return (
        df.join(re_asm, "doc_id", "left")
        .withColumn("text", F.coalesce("text2", "text"))
        .drop("text2")
    )


def run_stock(variant: int, sf_dir: str) -> int:
    spark = _session("16g")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    cuts: list = []

    def cut(df):
        c = df.localCheckpoint(eager=False)
        cuts.append(c)
        return c

    t0 = time.time()
    try:
        cur = _stage_dedup(docs)
        cur = cut(cur)
        if variant >= 4:
            cur = _stage_line_reassembly(cur)
        else:
            cur = _stage_count_join(cur, 1, "line_f")
        cur = cut(cur)
        cur = _stage_count_join(cur, 2, "lm_f")
        if variant >= 2:
            cur = cut(cur)
        if variant >= 4:
            cur = _stage_window_grams(cur, "gopher_f")
        else:
            cur = _stage_count_join(cur, 3, "gopher_f")
        cur = cut(cur)
        if variant in (3, 5):
            cur = _stage_selfjoin(cur)
            cur = cut(cur)
        for c in reversed(cuts):  # the engine's fused materialization
            c.count()
        n = cur.count()
        print(f"CLEAN stock variant={variant} rows={n} "
              f"{time.time()-t0:.1f}s")
        return 3
    except Exception as e:  # noqa: BLE001
        return _classify(e, t0, f"stock variant={variant}")


# ------------------------------------------------------------- persist

def run_persist(sf_dir: str) -> int:
    from pyspark import StorageLevel
    from pyspark.sql.classic.dataframe import (
        DataFrame as ClassicDataFrame,
    )

    calls = {"n": 0}

    def _persist_cut(self, eager=True, storageLevel=None):
        calls["n"] += 1
        df = self.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            df.count()
        return df

    ClassicDataFrame.localCheckpoint = _persist_cut

    spark = _session("24g")
    spark.sparkContext.setLogLevel("ERROR")

    from datawarehouse_vehicule_insurance_spark.operators.curate import (
        curate_corpus,
    )
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        bigram_lm_tables,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    lm = bigram_lm_tables(docs.filter(F.col("doc_id") % 7 == 0))
    lm = tuple(t.coalesce(1).localCheckpoint(eager=True) for t in lm)

    t0 = time.time()
    try:
        out = curate_corpus(
            docs,
            min_tokens=5,
            line_dedup_min_freq=100,
            lm_model=lm,
            max_perplexity=1e6,
            gopher_rules=dict(
                min_words=5, min_mean_word_len=1.0,
                max_mean_word_len=50.0, min_alpha_word_ratio=0.0,
                min_stopword_hits=0, max_dup_line_ratio=1.0,
                max_dup_line_char_ratio=1.0,
            ),
        )
        n = out.count()
        print(f"CLEAN persist-cuts rows={n} cuts={calls['n']} "
              f"{time.time()-t0:.1f}s")
        return 3
    except Exception as e:  # noqa: BLE001
        code = _classify(e, t0, f"persist-cuts (cuts={calls['n']})")
        return code


def main() -> int:
    args = sys.argv[1:]
    mode = args[0] if args else "stock"
    if mode == "persist":
        sf = args[1] if len(args) > 1 else "/tmp/sfx10"
        return run_persist(sf)
    variant = int(args[1]) if len(args) > 1 else 5
    sf = args[2] if len(args) > 2 else "/tmp/sfx10"
    return run_stock(variant, sf)


if __name__ == "__main__":
    sys.exit(main())
