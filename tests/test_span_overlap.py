"""Verbatim span-overlap dedup — partial-containment detection that
set-based Jaccard misses: a long quote inside an otherwise-different
document. Built on the winnowing sketch; its shared-run guarantee
(runs ≥ window + w_select − 1 tokens always share a fingerprint) makes
the planted cases deterministic."""

from __future__ import annotations

from datawarehouse_vehicule_insurance_spark.operators.dedup import (
    span_overlap_dedup,
    verbatim_overlap_pairs,
)

W, WS = 8, 4  # guarantee threshold: runs >= 11 tokens


def _tokens(tag, n):
    return [f"{tag}{i}" for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df, **kw):
    return {
        (r["id_a"], r["id_b"]): r["n_shared_fingerprints"]
        for r in verbatim_overlap_pairs(
            df, window=W, w_select=WS, **kw
        ).collect()
    }


def test_quote_containment_detected(spark):
    a_toks = _tokens("a", 40)
    quote = a_toks[10:25]  # 15-token verbatim run, above the guarantee
    b_toks = _tokens("b", 15) + quote + _tokens("c", 15)
    docs = _df(spark, [
        (1, " ".join(a_toks)),
        (2, " ".join(b_toks)),
        (3, " ".join(_tokens("z", 40))),  # unrelated
    ])
    got = _pairs(docs)
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 1

    kept = sorted(
        r["doc_id"]
        for r in span_overlap_dedup(docs, window=W, w_select=WS).collect()
    )
    assert kept == [1, 3]  # keep-first: the quoting doc dropped


def test_short_shared_run_not_flagged(spark):
    """A shared run shorter than the fingerprint window cannot produce
    a shared 8-token window when its surroundings differ — no pair."""
    a_toks = _tokens("a", 40)
    short = a_toks[10:15]  # 5 tokens < window
    b_toks = _tokens("b", 15) + short + _tokens("c", 15)
    docs = _df(spark, [
        (1, " ".join(a_toks)), (2, " ".join(b_toks)),
    ])
    assert _pairs(docs) == {}


def test_min_shared_orders_by_overlap_length(spark):
    """Longer verbatim overlaps share more fingerprints, so min_shared
    separates heavy mirrors from short quotes."""
    a_toks = _tokens("a", 60)
    short_quoter = _tokens("s", 12) + a_toks[5:17] + _tokens("t", 12)
    long_quoter = _tokens("u", 12) + a_toks[10:50] + _tokens("v", 12)
    docs = _df(spark, [
        (1, " ".join(a_toks)),
        (2, " ".join(short_quoter)),
        (3, " ".join(long_quoter)),
    ])
    got = _pairs(docs)
    assert (1, 2) in got and (1, 3) in got
    assert got[(1, 3)] > got[(1, 2)]
    heavy_only = _pairs(docs, min_shared=got[(1, 2)] + 1)
    assert (1, 2) not in heavy_only and (1, 3) in heavy_only


def test_transitive_chain_collapses(spark):
    a_toks = _tokens("a", 40)
    b_toks = _tokens("b", 14) + a_toks[10:25] + _tokens("bb", 14)
    # C shares a run with B's private tokens only — chained, not direct
    c_toks = _tokens("cc", 14) + b_toks[0:14] + _tokens("cd", 14)
    docs = _df(spark, [
        (1, " ".join(a_toks)),
        (2, " ".join(b_toks)),
        (3, " ".join(c_toks)),
    ])
    got = _pairs(docs)
    assert (1, 2) in got and (2, 3) in got and (1, 3) not in got
    kept = sorted(
        r["doc_id"]
        for r in span_overlap_dedup(
            docs, window=W, w_select=WS, transitive=True
        ).collect()
    )
    assert kept == [1]


def test_winnow_table_and_cross_corpus(spark):
    """The persisted winnow index: probing it matches the on-the-fly
    corpus sketch; parameter mismatch raises; exactly-one-of-corpus/fps
    enforced."""
    import pytest

    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        WINNOW_PARAMS_COL,
        cross_corpus_verbatim_pairs,
        winnow_table,
    )

    a_toks = _tokens("a", 40)
    corpus = _df(spark, [
        (1000, " ".join(a_toks)),
        (1001, " ".join(_tokens("z", 40))),
    ])
    batch = _df(spark, [
        (1, " ".join(_tokens("b", 14) + a_toks[10:25] + _tokens("c", 14))),
        (2, " ".join(_tokens("q", 40))),
    ])
    direct = {
        (r["id_a"], r["id_b"])
        for r in cross_corpus_verbatim_pairs(
            batch, corpus, window=W, w_select=WS
        ).collect()
    }
    assert direct == {(1, 1000)}

    idx = winnow_table(corpus, window=W, w_select=WS)
    assert WINNOW_PARAMS_COL in idx.columns
    indexed = {
        (r["id_a"], r["id_b"])
        for r in cross_corpus_verbatim_pairs(
            batch, corpus_fps=idx, window=W, w_select=WS
        ).collect()
    }
    assert indexed == direct

    with pytest.raises(ValueError, match="parameter mismatch"):
        cross_corpus_verbatim_pairs(
            batch, corpus_fps=idx, window=W, w_select=WS + 1
        )
    with pytest.raises(ValueError, match="exactly one"):
        cross_corpus_verbatim_pairs(batch, corpus, corpus_fps=idx)


def test_curate_corpus_span_stage(spark):
    """curate_corpus(span_dedup_min_shared=...) drops the quoting doc
    within-batch; incremental mode also drops batch docs sharing runs
    with the corpus via the persisted winnow index; half-configured
    index raises."""
    import pytest

    from datawarehouse_vehicule_insurance_spark.operators.curate import (
        curate_corpus,
    )
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        band_table,
        content_hash_table,
        shingle_table,
        winnow_table,
    )

    a_toks = _tokens("alpha", 40)
    docs = _df(spark, [
        (1, " ".join(a_toks)),
        (2, " ".join(_tokens("beta", 14) + a_toks[10:25]
                     + _tokens("gamma", 14))),
        (3, " ".join(_tokens("delta", 40))),
    ])
    kept = sorted(
        r["doc_id"]
        for r in curate_corpus(
            docs, min_tokens=5, transitive=False, span_dedup_min_shared=1
        ).collect()
    )
    assert kept == [1, 3]

    corpus = _df(spark, [(1000, " ".join(_tokens("omega", 40)))])
    o_toks = _tokens("omega", 40)
    batch = _df(spark, [
        (1, " ".join(_tokens("eta", 14) + o_toks[5:20]
                     + _tokens("theta", 14))),
        (2, " ".join(_tokens("iota", 40))),
    ])
    kept = sorted(
        r["doc_id"]
        for r in curate_corpus(
            batch, min_tokens=5, transitive=False,
            span_dedup_min_shared=1,
            existing_corpus=corpus,
            existing_bands=band_table(corpus),
            existing_hashes=content_hash_table(corpus),
            existing_shingles=shingle_table(corpus),
            existing_winnow=winnow_table(corpus),
        ).collect()
    )
    assert kept == [2]

    with pytest.raises(ValueError, match="span_dedup_min_shared"):
        curate_corpus(batch, existing_winnow=winnow_table(corpus))


def test_winnow_rows_match_window_form(spark):
    """Hash-compat pin for the per-row winnow sketch builder: (id, fp)
    rows equal the superseded posexplode + lead-chain + frame-min
    window form (reconstructed inline) on the real corpus plus
    degenerate docs — short docs (truncated gram), sketches shorter
    than w_select (overall min), NULL/empty/whitespace text."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        _winnow_fingerprint_rows,
    )

    def window_form(docs, window, w_select):
        toks = F.split(
            F.regexp_replace(
                F.lower(F.trim(F.col("text"))), r"\s+", " "
            ), " ",
        )
        tok = docs.select(
            F.col("doc_id"), F.posexplode(toks).alias("__pos", "__tok")
        ).withColumn("__th", F.xxhash64("__tok"))
        w = Window.partitionBy("doc_id").orderBy("__pos")
        lead_hashes = [F.col("__th")] + [
            F.lead("__th", j).over(w) for j in range(1, window)
        ]
        fp_rows = (
            tok.withColumn("__fp0", F.xxhash64(*lead_hashes))
            .withColumn("__full", lead_hashes[-1].isNotNull())
            .filter(F.col("__full") | (F.col("__pos") == 0))
        )
        sel = (
            fp_rows.withColumn(
                "__fp",
                F.min("__fp0").over(w.rowsBetween(0, w_select - 1)),
            )
            .withColumn(
                "__fullw",
                F.lead("__fp0", w_select - 1).over(w).isNotNull(),
            )
            .filter(F.col("__fullw") | (F.col("__pos") == 0))
        )
        return sel.select("doc_id", "__fp").distinct()

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(70001, None), (70002, ""), (70003, "   "),
         (70004, "one two three"),                      # < window
         (70005, "one two three four five six seven eight nine"),
         (70006, "a b " * 30)],
        "doc_id long, text string",
    )
    both = docs.unionByName(extra)
    old = window_form(both, window=8, w_select=4)
    new = _winnow_fingerprint_rows(both, "text", "doc_id", 8, 4)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0
    assert new.filter(F.col("doc_id") == 70001).count() == 0
