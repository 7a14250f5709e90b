"""Degenerate-document robustness sweep (r8).

Spark 4 runs with ANSI mode ON, where an unguarded division by zero is
a hard runtime error, not a NULL — and one degenerate document
(empty/whitespace/NULL text) crashing a 100-TB curation job is exactly
the failure mode the review pass caught in quality_features. This
suite feeds a corpus spiked with every degenerate text shape through
each doc-facing operator and asserts the batch COMPLETES, the real
documents come through with the expected values, and the degenerate
ones are dropped or passed per each operator's documented semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

REAL_1 = (
    "The quick brown fox jumps over the lazy dog and then runs far "
    "away to the green hills with a friendly otter beside it."
)
REAL_2 = (
    "Seven curious travelers wander past old villages and tall trees, "
    "sharing long stories that keep everyone smiling on the journey."
)

# every degenerate shape we have seen (or can construct) in crawl data
DEGENERATE = {
    10: "",                       # empty string (0 chars)
    11: "   \t  \n  ",            # whitespace only
    12: None,                     # NULL text
    13: "x",                      # single char
    14: "??? !!! ... ###",        # symbols only, no alpha
    15: "\n\n\n\n",               # newlines only
    16: "wordwordword" * 400,     # one giant unbroken token (4800 chars)
}


def _corpus(spark):
    rows = [(1, REAL_1), (2, REAL_2)] + list(DEGENERATE.items())
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_features_degenerate(spark):
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        quality_features,
    )

    got = {r["doc_id"]: r for r in quality_features(_corpus(spark)).collect()}
    assert len(got) == 9                       # nothing crashed, no drops
    assert got[1]["alpha_ratio"] > 0.5
    assert got[10]["alpha_ratio"] is None      # 0/0 -> NULL, not a crash
    assert got[12]["n_tokens"] is None or got[12]["n_tokens"] < 0 or \
        got[12]["n_tokens"] == 0               # NULL text: no token stats


def test_gopher_filter_degenerate(spark):
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        gopher_filter,
    )

    kept = sorted(
        r["doc_id"]
        for r in gopher_filter(
            _corpus(spark), min_words=5, min_stopword_hits=1,
            min_mean_word_len=1.0, max_mean_word_len=50.0,
        ).collect()
    )
    assert kept == [1, 2]                      # every degenerate shape dropped


def test_lang_and_fingerprint_degenerate(spark):
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        fingerprint,
        lang_id,
        token_count,
    )

    rows = _corpus(spark).select(
        "doc_id",
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
        token_count(F.col("text")).alias("n"),
    ).collect()
    assert len(rows) == 9
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["lang"] == "en" and by_id[1]["n"] > 10


def test_dedup_family_degenerate(spark):
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        exact_dedup_by_content,
        minhash_dedup,
        simhash,
    )

    docs = _corpus(spark)
    exact = exact_dedup_by_content(docs)
    assert exact.count() == 9                  # all distinct, none crash
    mh = sorted(r["doc_id"] for r in minhash_dedup(docs).collect())
    assert 1 in mh and 2 in mh                 # real docs survive near-dup
    sh = docs.select("doc_id", simhash(F.col("text")).alias("sig"))
    assert sh.count() == 9                     # signatures computable


def test_line_and_span_ops_degenerate(spark):
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        duplicate_span_trim,
        line_dedup_incremental,
        span_overlap_dedup,
        winnow_table,
    )

    docs = _corpus(spark)
    ld = line_dedup_incremental(docs, None, min_doc_freq=2)
    assert ld.count() <= 9 and ld.count() >= 2
    st = duplicate_span_trim(docs, min_span=10)
    got = {r["doc_id"]: r["text"] for r in st.collect()}
    assert 1 in got and 2 in got
    so = span_overlap_dedup(docs, min_shared=2)
    assert {1, 2} <= {r["doc_id"] for r in so.collect()}
    wt = winnow_table(docs)
    assert wt.count() >= 0                     # executes


def test_contamination_and_perplexity_degenerate(spark):
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        bigram_lm_tables,
        contamination_overlap,
        perplexity_filter,
    )

    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(900, "totally unrelated benchmark sentence with rare words")],
        "doc_id long, text string",
    )
    hits = contamination_overlap(docs, bench, n=8)
    assert hits.count() == 0                   # executes, no false hits
    lm = tuple(
        t.localCheckpoint()
        for t in bigram_lm_tables(docs.filter("doc_id <= 2"))
    )
    pf = perplexity_filter(docs, *lm, 1e9)
    assert {1, 2} <= {r["doc_id"] for r in pf.collect()}


def test_mlprep_degenerate(spark):
    from datawarehouse_vehicule_insurance_spark.operators.mlprep import (
        cap_per_key,
        pack_sequences,
        packing_stats,
    )
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        token_count,
    )

    docs = _corpus(spark).withColumn("source", F.lit("s"))
    capped = cap_per_key(docs, "source", 5)
    assert capped.count() == 5
    with_counts = docs.filter("text is not null").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(with_counts, max_len=64)
    assert packed.count() >= 1
    stats = packing_stats(packed, max_len=64).collect()[0]
    assert stats["n_seqs"] >= 1

    # packing_stats over an EMPTY packed frame must not divide by the
    # zero sequence count (the fill_rate denominator)
    empty = packed.filter("1 = 0")
    row = packing_stats(empty, max_len=64).collect()[0]
    assert row["n_seqs"] == 0


def test_curate_corpus_full_composition_degenerate(spark):
    """The composed pipeline — every optional batch stage on — over the
    spiked corpus: completes, keeps exactly the real documents, and the
    rejection audit attributes every degenerate doc."""
    from datawarehouse_vehicule_insurance_spark.operators.curate import (
        curate_corpus,
        rejection_log,
    )
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        bigram_lm_tables,
    )

    docs = _corpus(spark).withColumn("source", F.lit("s"))
    lm = tuple(
        t.localCheckpoint()
        for t in bigram_lm_tables(docs.filter("doc_id <= 2"))
    )
    frames, reasons = {}, {}
    out = curate_corpus(
        docs,
        stage_frames=frames, reason_frames=reasons,
        min_tokens=5, min_alpha_ratio=0.3, max_dup_2gram_ratio=0.95,
        line_dedup_min_freq=3,
        span_trim_min_span=12,
        gopher_rules={"min_words": 5, "min_stopword_hits": 1,
                      "min_mean_word_len": 1.0,
                      "max_mean_word_len": 50.0},
        lm_model=lm, max_perplexity=1e9,
        span_dedup_min_shared=2,
        source_cap=10, source_col="source",
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2]
    rej = {
        r["doc_id"]: (r["stage"], r["reason"])
        for r in rejection_log(frames, reason_frames=reasons).collect()
    }
    assert set(rej) == set(DEGENERATE)         # every degenerate attributed
    # composite-gate drops carry a concrete reason, never a silent NULL
    for doc_id, (stage, reason) in rej.items():
        if stage in ("quality_gates", "gopher"):
            assert reason is not None, (doc_id, stage)


def test_embedding_ops_zero_vector(spark):
    """A single all-zero embedding must not crash cosine-based queries
    (under ANSI an unguarded 0/0 norm product is a hard
    DIVIDE_BY_ZERO — found live in cosine_sim by this sweep): the
    native top-k ranks it last / never matches (NULL sim), and the
    numpy block path yields no pair for it (NaN fails the
    threshold)."""
    from datawarehouse_vehicule_insurance_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_sim,
        cosine_topk,
    )

    cands = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0]),
         (3, [0.9, 0.1, 0.0]), (4, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    # direct column form: zero-norm -> NULL, real vectors exact
    sims = {
        r["vec_id"]: r["c"]
        for r in cands.select(
            "vec_id",
            cosine_sim(
                F.col("embedding"),
                F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)),
            ).alias("c"),
        ).collect()
    }
    assert sims[1] == pytest.approx(1.0)
    assert sims[2] is None
    assert sims[4] == pytest.approx(0.0)

    # brute-force top-k: completes; the zero vector never outranks a
    # real candidate
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "query_id long, qvec array<float>"
    )
    top = cosine_topk(queries, cands, k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 3]

    # numpy block near-dup: completes; no pair involves the zero vector
    pairs = cosine_neardup_pairs(cands, threshold=0.5).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 2 not in ids


def test_topk_excludes_nan_similarities(spark):
    """Spark's descending sort treats NaN as larger than any double, so
    without the rank-window guard ONE corrupt (NaN/Inf-component)
    embedding would outrank every real candidate for every query. The
    top-k surfaces exclude non-rankable sims; clean candidates fill
    the ranks."""
    from datawarehouse_vehicule_insurance_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_topk,
    )

    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [float("nan"), 1.0]),
         (3, [float("inf"), 1.0]), (4, [0.6, 0.8]),
         (5, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0])], "query_id long, qvec array<float>"
    )
    top = cosine_topk(queries, cands, k=3).collect()
    assert [r["vec_id"] for r in top] == [1, 4]   # only rankable cands
    assert all(r["cosine_sim"] == r["cosine_sim"] for r in top)  # no NaN

    ivf = ivf_topk(queries, cands, k=3, n_cells=2, n_probe=2).collect()
    assert set(r["vec_id"] for r in ivf) <= {1, 4}

    lsh = lsh_topk(queries, cands, dim=2, k=3, n_planes=4).collect()
    assert set(r["vec_id"] for r in lsh) <= {1, 4}


def test_ivf_neardup_ignores_nan_embeddings(spark):
    """Threshold filters need their own NaN guard (r9 ADVICE): Spark SQL
    defines NaN as LARGER than any double, so an unguarded
    ``cosine_sim >= threshold`` is TRUE for a NaN sim — one corrupt
    (NaN/Inf-component) embedding on either side of
    ivf_neardup_candidates used to match everything in its probed
    cells, and the embedding ingest loop turns those matches into
    drop_ids, spuriously and permanently dropping real batch
    documents. Corrupt vectors must match NOTHING; real near-dups must
    still be found."""
    from datawarehouse_vehicule_insurance_spark.operators import (
        similarity as S,
    )

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [float("nan"), 1.0]),
         (12, [0.0, 1.0]), (13, [float("inf"), 0.0])],
        "vec_id long, embedding array<float>",
    )
    batch = spark.createDataFrame(
        [(1, [1.0, 0.05]),            # near-dup of corpus 10
         (2, [-0.7, 0.7]),            # far from everything
         (3, [float("nan"), 0.0])],   # corrupt batch vector
        "vec_id long, embedding array<float>",
    )
    cents = S.ivf_centroids_table(
        spark.createDataFrame(
            [(10, [1.0, 0.0]), (12, [0.0, 1.0])],
            "vec_id long, embedding array<float>",
        ),
        n_cells=2,
    )
    asg = S.ivf_assign_table(corpus, cents, n_cells=2)

    # n_probe = n_cells: exhaustive, so nothing is hidden by cell choice
    pairs = S.ivf_neardup_candidates(
        batch, corpus, cents, asg, threshold=0.9, n_probe=2, n_cells=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 10)}
    assert all(r["cosine_sim"] == r["cosine_sim"] for r in pairs)  # no NaN


def test_semantic_dedup_ignores_nan_embeddings(spark):
    """semantic_dedup's greedy pass needs the same non-finite guard
    (r9 ADVICE medium): unguarded, a corrupt vector's all-NaN
    normalized row makes `NaN < threshold` False for every later scan,
    so if the corrupt vector is kept first (min id in its cell) every
    other vector in the cell is silently dropped. Corrupt vectors must
    match nothing (kept verbatim, never a comparison target) and real
    dups must still collapse."""
    from datawarehouse_vehicule_insurance_spark.operators import (
        similarity as S,
    )

    df = spark.createDataFrame(
        [(1, [float("nan"), 1.0]),    # corrupt, min id — scanned first
         (2, [1.0, 0.0]),
         (3, [1.0, 0.001]),           # near-dup of 2 — must be dropped
         (4, [0.0, 1.0]),             # distinct — must survive
         (5, [float("inf"), 0.0])],   # corrupt via Inf
        "vec_id long, embedding array<float>",
    )
    kept = sorted(
        r["vec_id"]
        for r in S.semantic_dedup(
            df, threshold=0.95, n_cells=1, seed=7
        ).collect()
    )
    # pre-fix this came back [1] — the NaN row ate the whole cell
    assert kept == [1, 2, 4, 5]

    dec = {
        r["vec_id"]: r["kept"]
        for r in S.semantic_dedup(
            df, threshold=0.95, n_cells=1, seed=7, return_decisions=True
        ).collect()
    }
    assert dec == {1: True, 2: True, 3: False, 4: True, 5: True}


def test_ann_index_builds_are_nan_safe(spark):
    """Index-BUILD NaN safety (r9 verdict #8): the r9 fixes guarded
    query/candidate time; a corrupt embedding must also never bake NaN
    into persisted IVF centroids or PQ codebooks (min-id corrupt rows
    would bootstrap straight into the geometry), never receive a fake
    finite PQ code, and never surface from an LSH bucket."""
    import math

    from datawarehouse_vehicule_insurance_spark.operators import (
        similarity as S,
    )

    nan, inf = float("nan"), float("inf")
    corpus = spark.createDataFrame(
        [(1, [nan, 0.0, 0.0, 0.0]),      # corrupt, min id
         (2, [inf, 0.0, 0.0, 0.0]),      # corrupt via Inf
         (3, [1.0, 0.0, 0.0, 0.0]),
         (4, [0.0, 1.0, 0.0, 0.0]),
         (5, [0.0, 0.0, 1.0, 0.0]),
         (6, [0.0, 0.0, 0.0, 1.0]),
         (7, [0.9, 0.1, 0.0, 0.0]),
         (8, [0.1, 0.9, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )

    cents = S.ivf_centroids_table(corpus, n_cells=2, kmeans_iters=2)
    for r in cents.collect():
        assert all(math.isfinite(x) for x in r["centroid"]), r

    books = S.pq_codebooks_table(
        corpus, m=2, ks=2, train_sample=8, kmeans_iters=2
    )
    for r in books.collect():
        assert all(math.isfinite(x) for x in r["centroid"]), r

    codes = S.pq_encode_table(
        corpus, books, m=2, ks=2, train_sample=8, kmeans_iters=2
    )
    encoded_ids = {r["vec_id"] for r in codes.select("vec_id").collect()}
    assert encoded_ids == {3, 4, 5, 6, 7, 8}  # corrupt rows not indexed

    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "query_id long, qvec array<float>"
    )
    top = S.pq_topk(
        queries, corpus, k=3, m=2, ks=2, train_sample=8, kmeans_iters=2,
        codebooks=books, codes=codes,
    ).collect()
    assert top and all(r["vec_id"] not in (1, 2) for r in top)

    lsh = S.lsh_topk(queries, corpus, dim=4, k=8, n_planes=4,
                     n_tables=2).collect()
    assert lsh and all(r["vec_id"] not in (1, 2) for r in lsh)


# ---------------------------------------------------------------------------
# streaming loops (r9: the r8 sweep covered the batch surfaces; these
# drive the same degenerate shapes through the INGEST loops, where a
# crash would kill a long-running crawl, not just one job)
# ---------------------------------------------------------------------------

REAL_3 = (
    "Bright lanterns float over the quiet harbor while three fishers "
    "trade easy jokes about the morning tide and the stubborn wind."
)
REAL_4 = (
    "Every autumn the small library hosts a week of readings where "
    "neighbors bring warm bread and argue gently about old poems."
)


@pytest.mark.slow
def test_streaming_loop_degenerate_batch_with_gates(spark, tmp_path):
    """A crawl batch spiked with every degenerate shape arrives mid-
    stream with the CLI's quality-gate transform on: the loop must
    complete all three availableNow runs under ANSI (the r8 bug class:
    one empty document used to DIVIDE_BY_ZERO inside
    quality_features), keep exactly the real documents, and list every
    degenerate doc in the per-batch rejection audit."""
    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        quality_features,
    )
    from datawarehouse_vehicule_insurance_spark.streaming import (
        curation as SC,
    )

    src = str(tmp_path / "src")
    rej = str(tmp_path / "rej")
    paths = [str(tmp_path / p) for p in ("corpus", "bands", "hashes", "ck")]

    def transform(df):
        cols = df.columns
        return (
            quality_features(df, text_col="text")
            .filter(F.col("n_tokens") >= 5)
            .select(*cols)
        )

    def run():
        q = SC.run_incremental_curation(
            spark, src, *paths, transform=transform,
            rejections_path=rej,
        )
        q.awaitTermination()

    def ids():
        df = SC.read_corpus(spark, paths[0])
        return sorted(r["doc_id"] for r in df.collect())

    b1 = spark.createDataFrame(
        [(1, REAL_1), (2, REAL_2)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(4, REAL_3)] + list(DEGENERATE.items()),
        "doc_id long, text string",
    )
    b3 = spark.createDataFrame([(5, REAL_4)], "doc_id long, text string")

    b1.coalesce(1).write.mode("append").parquet(src)
    run()
    assert ids() == [1, 2]
    b2.coalesce(1).write.mode("append").parquet(src)
    run()
    assert ids() == [1, 2, 4]
    b3.coalesce(1).write.mode("append").parquet(src)
    run()
    assert ids() == [1, 2, 4, 5]

    audit = spark.read.parquet(rej)
    rejected = {r["doc_id"] for r in audit.select("doc_id").collect()}
    assert set(DEGENERATE) <= rejected
    assert rejected.isdisjoint({1, 2, 4, 5})


def test_streaming_loop_degenerate_reaches_index_stages(spark, tmp_path):
    """Without a gate transform, degenerate documents flow INTO the
    dedup/index machinery itself (empty shingle sets, zero-gram span
    tables, sub-min_chars lines): every optional stage + all persisted
    text artifacts stay on, the loop must complete, keep the real
    docs, store the degenerates per the documented semantics (nothing
    legitimately dedups them — empty shingle sets produce no bands, so
    they can never be near-dup candidates), and a restart with no new
    files is a no-op."""
    from datawarehouse_vehicule_insurance_spark.streaming import (
        curation as SC,
    )

    src = str(tmp_path / "src")
    paths = [str(tmp_path / p) for p in ("corpus", "bands", "hashes", "ck")]
    extra = dict(
        shingles_path=str(tmp_path / "shingles"),
        line_counts_path=str(tmp_path / "lines"),
        line_dedup_min_freq=3,
        winnow_path=str(tmp_path / "winnow"),
        span_min_shared=8,
        span_grams_path=str(tmp_path / "span_grams"),
        trim_min_span=50,
    )

    def run():
        q = SC.run_incremental_curation(spark, src, *paths, **extra)
        q.awaitTermination()

    def ids():
        df = SC.read_corpus(spark, paths[0])
        return sorted(r["doc_id"] for r in df.collect())

    b1 = spark.createDataFrame(
        [(1, REAL_1), (2, REAL_2)], "doc_id long, text string"
    )
    # NULL text is excluded here: storing a NULL-text doc in a TEXT
    # corpus is a caller error the gate transform exists to stop —
    # this test is about the index stages, which only ever see
    # non-NULL text in the gated production shape
    spiked = [(k, v) for k, v in DEGENERATE.items() if v is not None]
    b2 = spark.createDataFrame(
        [(4, REAL_3)] + spiked, "doc_id long, text string"
    )

    b1.coalesce(1).write.mode("append").parquet(src)
    run()
    assert ids() == [1, 2]
    b2.coalesce(1).write.mode("append").parquet(src)
    run()
    after_b2 = ids()
    assert {1, 2, 4} <= set(after_b2)          # real docs all kept
    assert set(after_b2) <= {1, 2, 4} | set(DEGENERATE)
    # restart with nothing new: a no-op, indexes unchanged
    run()
    assert ids() == after_b2


def test_embedding_loop_degenerate_vectors(spark, tmp_path):
    """Zero-norm and NaN/Inf-component vectors arrive mid-ingest: the
    loop must complete (r8: an unguarded zero-norm crashed cosine under
    ANSI), corrupt vectors must match NOTHING — the r9 ADVICE bug made
    one NaN vector match everything in its probed cells, and the loop
    turned those matches into drop_ids that silently discarded real
    batch documents — and near-dup detection must keep working for
    later batches with the corrupt vectors already in the corpus."""
    from datawarehouse_vehicule_insurance_spark.streaming import (
        curation as SC,
    )

    src = str(tmp_path / "vsrc")
    args = [str(tmp_path / p) for p in ("vcorpus", "cents", "asg", "vck")]

    def run():
        q = SC.run_incremental_embedding_ingest(
            spark, src, *args, n_cells=2, n_probe=2,
            neardup_threshold=0.95,
        )
        q.awaitTermination()

    def ids():
        df = spark.read.parquet(args[0])
        return sorted(r["vec_id"] for r in df.collect())

    b1 = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [0.0, 0.0, 1.0, 0.0]), (4, [0.0, 0.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    b2 = spark.createDataFrame(
        [(10, [1.0, 0.02, 0.0, 0.0]),          # near-dup of 1 -> drop
         (11, [float("nan"), 1.0, 0.0, 0.0]),  # corrupt -> matches nothing
         (12, [0.0, 0.0, 0.0, 0.0]),           # zero-norm -> matches nothing
         (13, [0.7, 0.0, 0.0, -0.7])],         # fresh real -> KEEP
        "vec_id long, embedding array<float>",
    )
    b3 = spark.createDataFrame(
        [(21, [0.71, 0.01, 0.0, -0.7]),        # near-dup of 13 -> drop
         (22, [-1.0, 0.0, 0.0, 0.0])],         # fresh (cos=-1 vs 1) -> KEEP
        "vec_id long, embedding array<float>",
    )

    b1.coalesce(1).write.mode("append").parquet(src)
    run()
    assert ids() == [1, 2, 3, 4]
    b2.coalesce(1).write.mode("append").parquet(src)
    run()
    # the real fresh doc 13 survives (the ADVICE failure mode dropped
    # it); corrupt vectors match nothing so they are stored
    assert ids() == [1, 2, 3, 4, 11, 12, 13]
    b3.coalesce(1).write.mode("append").parquet(src)
    run()
    assert ids() == [1, 2, 3, 4, 11, 12, 13, 22]


def test_lang_scores_regex_equals_hof(spark):
    """lang_scores' regexp_count form counts EXACTLY like the previous
    interpreted-HOF form (size(filter(tokens, in markers))) on the real
    corpus plus adversarial rows: NULL, empty, whitespace-only, and
    adjacent markers ("of of the the") where a consuming-separator
    regex would undercount."""
    from pyspark.sql import functions as F

    from datawarehouse_vehicule_insurance_spark.operators.text_analysis import (
        LANG_MARKERS,
        lang_scores,
        tokens,
    )

    def hof_scores(text):
        toks = tokens(text)

        def _hits(markers):
            arr = F.array(*[F.lit(m) for m in markers])
            return F.size(
                F.filter(toks, lambda x: F.array_contains(arr, x))
            )

        return {lang: _hits(m) for lang, m in LANG_MARKERS.items()}

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("text")
    extra = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("of of the the of",),
         ("la la la de el",), ("the… and\tof\nder und",)],
        "text string",
    )
    df = docs.unionByName(extra)
    new = lang_scores(F.col("text"))
    old = hof_scores(F.col("text"))
    checks = df.select(*[
        (new[lang].eqNullSafe(old[lang])).alias(lang)
        for lang in LANG_MARKERS
    ])
    agg = checks.agg(*[
        F.sum(F.when(F.col(lang), 0).otherwise(1)).alias(lang)
        for lang in LANG_MARKERS
    ]).first()
    assert all(agg[lang] == 0 for lang in LANG_MARKERS), agg.asDict()
