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
