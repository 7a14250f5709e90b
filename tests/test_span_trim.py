"""duplicate_span_trim (ExactSubstr-style passage removal): python
reference parity, keep modes, corpus mode, and edge semantics."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark.operators.dedup import (
    duplicate_span_trim,
)


def _norm_toks(t):
    if t is None:
        return None
    s = re.sub(r"\s+", " ", t.strip().lower())
    return s.split(" ")


def _ref_trim(rows, L, corpus=None, min_occ=2, keep="first"):
    """Token-tuple reference of the operator's stated rule."""
    sides = []
    for side, rs in ((0, corpus or []), (1, rows)):
        for i, t in rs:
            toks = _norm_toks(t)
            if toks is not None:
                sides.append((side, i, toks))
    occ = []
    for side, i, toks in sides:
        for p in range(len(toks) - L + 1):
            occ.append((tuple(toks[p:p + L]), side, i, p))
    from collections import Counter, defaultdict
    cnt = Counter(g for g, *_ in occ)
    # rank occurrences per gram in (side, id, pos) order
    per_gram = defaultdict(list)
    for g, side, i, p in occ:
        per_gram[g].append((side, i, p))
    flagged = defaultdict(set)
    for g, occs in per_gram.items():
        if cnt[g] < min_occ:
            continue
        occs.sort()
        spare = 1 if keep == "first" else 0
        for side, i, p in occs[spare:]:
            if side == 1:
                flagged[i].add(p)
    out = {}
    for side, i, toks in sides:
        if side != 1:
            continue
        kept = [
            tok for p, tok in enumerate(toks)
            if not any(s in flagged[i] for s in range(p - L + 1, p + 1))
        ]
        out[i] = " ".join(kept)
    for i, t in rows:
        if _norm_toks(t) is None:
            out[i] = None
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


PASSAGE = " ".join(f"quote{i}" for i in range(12))


def test_trim_matches_python_reference(spark):
    rows = [
        (1, "intro one " + PASSAGE + " outro one two three"),
        (2, "different start here " + PASSAGE + " and a different end"),
        (3, " ".join(f"fresh{i}" for i in range(20))),
        (4, "short shared run " + " ".join(PASSAGE.split()[:6])),  # < L
        (5, None),
        (6, ""),
    ]
    for keep in ("first", "none"):
        got = {
            r["doc_id"]: r["text"]
            for r in duplicate_span_trim(
                _df(spark, rows), min_span=12, keep=keep
            ).collect()
        }
        ref = _ref_trim(rows, 12, keep=keep)
        assert got == ref, keep
    # keep='first': doc 1 (lower id) retains the passage, doc 2 loses it
    first = _ref_trim(rows, 12, keep="first")
    assert PASSAGE in first[1] and PASSAGE not in first[2]
    assert "different start here" in first[2]
    none = _ref_trim(rows, 12, keep="none")
    assert PASSAGE not in none[1] and PASSAGE not in none[2]
    # the sub-threshold shared run survives everywhere
    assert "short shared run" in first[4]
    assert first[5] is None and first[6] == ""


def test_trim_against_corpus(spark):
    """Corpus occurrences outrank the batch: a batch doc repeating a
    corpus passage is trimmed even under keep='first', and the corpus
    frame itself is never rewritten."""
    corpus_rows = [(100, "stored page with " + PASSAGE + " inside")]
    rows = [
        (1, "new page quoting " + PASSAGE + " verbatim"),
        (2, "unrelated fresh content " + " ".join(
            f"x{i}" for i in range(15))),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in duplicate_span_trim(
            _df(spark, rows), min_span=12,
            corpus=_df(spark, corpus_rows),
        ).collect()
    }
    ref = _ref_trim(rows, 12, corpus=corpus_rows)
    assert got == ref
    assert PASSAGE not in got[1] and "new page quoting" in got[1]
    assert "unrelated fresh content" in got[2]


def test_trim_within_doc_repeat_and_validation(spark):
    """A passage repeated INSIDE one document is trimmed down to its
    first occurrence; parameter validation raises."""
    body = PASSAGE + " middle words here " + PASSAGE
    got = duplicate_span_trim(
        _df(spark, [(1, body)]), min_span=12
    ).first()["text"]
    ref = _ref_trim([(1, body)], 12)
    assert got == ref[1]
    assert got.count("quote0") == 1
    assert "middle words here" in got

    with pytest.raises(ValueError, match="keep"):
        duplicate_span_trim(_df(spark, [(1, "x")]), keep="bogus")
    with pytest.raises(ValueError, match="min_span"):
        duplicate_span_trim(_df(spark, [(1, "x")]), min_span=1)


def test_trim_real_documents_matches_reference(spark):
    """Real documents (which contain planted duplicate docs by
    construction): the full output equals the python reference, the
    planted cross-doc passage is removed, and rows are preserved."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(20)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    rows += [(9001, "aa " + PASSAGE + " bb"), (9002, "cc " + PASSAGE + " dd")]
    frame = _df(spark, rows)
    for keep in ("first", "none"):
        got = {
            r["doc_id"]: r["text"]
            for r in duplicate_span_trim(
                frame, min_span=12, keep=keep
            ).collect()
        }
        assert got == _ref_trim(rows, 12, keep=keep), keep
        assert len(got) == 22
    assert _ref_trim(rows, 12, keep="none")[9001] == "aa bb"


def test_trim_property_random_small_vocab(spark):
    """Property: output equals the reference on random corpora drawn
    from a 4-word vocabulary (span repeats and self-overlaps are
    likely), both keep modes, with and without a corpus side."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(word, min_size=0, max_size=14).map(" ".join)

    @given(
        st.lists(doc, min_size=1, max_size=5),
        st.lists(doc, min_size=0, max_size=2),
        st.sampled_from(["first", "none"]),
    )
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(texts, corpus_texts, keep):
        rows = [(i, t) for i, t in enumerate(texts)]
        corpus_rows = [(100 + i, t) for i, t in enumerate(corpus_texts)]
        got = {
            r["doc_id"]: r["text"]
            for r in duplicate_span_trim(
                _df(spark, rows), min_span=3,
                corpus=_df(spark, corpus_rows) if corpus_rows else None,
                keep=keep,
            ).collect()
        }
        ref = _ref_trim(rows, 3, corpus=corpus_rows or None, keep=keep)
        assert got == ref

    run()


def test_curate_corpus_span_trim_stage(spark):
    """curate_corpus(span_trim_min_span=) trims duplicated passages
    (vs batch and vs existing corpus) before the gates run."""
    from datawarehouse_vehicule_insurance_spark.operators.curate import (
        curate_corpus,
    )

    filler1 = " ".join(f"alpha{i}" for i in range(30))
    filler2 = " ".join(f"beta{i}" for i in range(30))
    stored = "stored page " + PASSAGE + " end of stored"
    rows = [
        (1, filler1 + " " + PASSAGE),    # passage spared (first in batch)
        (2, filler2 + " " + PASSAGE),    # passage trimmed
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in curate_corpus(
            _df(spark, rows),
            min_tokens=5,
            min_alpha_ratio=0.0,
            max_dup_2gram_ratio=1.0,
            span_trim_min_span=12,
        ).collect()
    }
    assert sorted(out) == [1, 2]
    assert PASSAGE in out[1] and PASSAGE not in out[2]

    # with an existing corpus holding the passage, BOTH batch docs lose
    # it (corpus occurrence is the spared one)
    inc = {
        r["doc_id"]: r["text"]
        for r in curate_corpus(
            _df(spark, rows),
            min_tokens=5,
            min_alpha_ratio=0.0,
            max_dup_2gram_ratio=1.0,
            span_trim_min_span=12,
            existing_corpus=_df(spark, [(100, stored)]),
        ).collect()
    }
    assert PASSAGE not in inc[1] and PASSAGE not in inc[2]
    assert inc[1].startswith("alpha0") and inc[2].startswith("beta0")


@pytest.mark.slow
def test_streaming_loop_trim_min_span(spark, tmp_path):
    """The crawl loop with trim_min_span: a batch doc quoting a stored
    corpus passage arrives with the quote cut out (not rejected), and
    the persisted indexes describe the TRIMMED text."""
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        validate_band_params,
    )
    from datawarehouse_vehicule_insurance_spark.streaming import (
        curation as SC,
    )

    src = str(tmp_path / "src")
    corpus_path = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    hashes = str(tmp_path / "hashes")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = SC.run_incremental_curation(
            spark, src, corpus_path, bands, hashes, ckpt,
            jaccard_threshold=0.8, trim_min_span=12,
        )
        q.awaitTermination()

    filler1 = " ".join(f"alpha{i}" for i in range(40))
    filler2 = " ".join(f"beta{i}" for i in range(40))
    _df(spark, [(1, filler1 + " " + PASSAGE)]).coalesce(1) \
        .write.mode("append").parquet(src)
    run()
    got1 = {r["doc_id"]: r["text"]
            for r in SC.read_corpus(spark, corpus_path).collect()}
    assert PASSAGE in got1[1]  # first occurrence, nothing to trim vs

    _df(spark, [(11, filler2 + " " + PASSAGE)]).coalesce(1) \
        .write.mode("append").parquet(src)
    run()
    got2 = {r["doc_id"]: r["text"]
            for r in SC.read_corpus(spark, corpus_path).collect()}
    assert sorted(got2) == [1, 11]
    assert PASSAGE in got2[1]           # corpus copy untouched
    assert PASSAGE not in got2[11]      # quote cut, doc kept
    assert got2[11].startswith("beta0")

    # the stored hash index matches the TRIMMED text, so re-submitting
    # the trimmed form is recognized as an exact corpus match
    import pyspark.sql.functions as F
    hashed = spark.read.parquet(hashes).drop(SC.BATCH_COL)
    stored = {r["doc_id"]: r["content_hash"] for r in hashed.collect()}
    expect_11 = spark.createDataFrame(
        [(0, got2[11])], "i long, text string"
    ).select(F.md5("text")).first()[0]
    assert stored[11] == expect_11


def test_span_gram_index_path_equivalence(spark):
    """The persisted span_gram_table path: trimming a batch against the
    index ≡ trimming against corpus text ≡ the python reference — the
    index changes the plan, never the result — including the
    corpus-outranks-batch keep='first' rule and batch-internal repeats
    the index knows nothing about."""
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        span_gram_table,
    )

    corpus_rows = [
        (100, "stored page with " + PASSAGE + " inside"),
        (101, "another stored page " + " ".join(
            f"c{i}" for i in range(20))),
    ]
    batch2 = " ".join(f"y{i}" for i in range(14))
    rows = [
        (1, "new page quoting " + PASSAGE + " verbatim"),
        # batch-internal repeat (no corpus involvement)
        (2, batch2 + " sep " + batch2),
        (3, "unrelated fresh content " + " ".join(
            f"x{i}" for i in range(15))),
        (4, None),
        (5, ""),
    ]
    corpus = _df(spark, corpus_rows)
    grams = span_gram_table(corpus, min_span=12)
    ref = _ref_trim(rows, 12, corpus=corpus_rows)
    via_text = {
        r["doc_id"]: r["text"]
        for r in duplicate_span_trim(
            _df(spark, rows), min_span=12, corpus=corpus
        ).collect()
    }
    via_index = {
        r["doc_id"]: r["text"]
        for r in duplicate_span_trim(
            _df(spark, rows), min_span=12, corpus_grams=grams
        ).collect()
    }
    assert via_text == ref
    assert via_index == ref
    assert PASSAGE not in via_index[1]  # corpus copy outranks the batch
    assert via_index[2].count("y0") == 1  # within-batch repeat collapsed

    # keep='none' composes with the index too
    none_index = {
        r["doc_id"]: r["text"]
        for r in duplicate_span_trim(
            _df(spark, rows), min_span=12, corpus_grams=grams,
            keep="none",
        ).collect()
    }
    assert none_index == _ref_trim(rows, 12, corpus=corpus_rows,
                                   keep="none")


def test_span_gram_table_merge_and_round_trip(spark, tmp_path):
    """Per-batch span_gram_table partials merge (counts sum, first
    occurrences min) to exactly the whole-corpus table, surviving a
    parquet round trip — the loop's append-only maintenance contract."""
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        SPAN_PARAMS_COL,
        merge_span_gram_tables,
        span_gram_table,
    )

    b1 = [(1, "lead in " + PASSAGE + " tail"),
          (2, " ".join(f"a{i}" for i in range(18)))]
    b2 = [(11, "other intro " + PASSAGE + " other outro"),
          (12, " ".join(f"b{i}" for i in range(18)))]
    full = span_gram_table(_df(spark, b1 + b2), min_span=12)
    p1 = str(tmp_path / "g1")
    p2 = str(tmp_path / "g2")
    span_gram_table(_df(spark, b1), min_span=12).write.parquet(p1)
    span_gram_table(_df(spark, b2), min_span=12).write.parquet(p2)
    merged = merge_span_gram_tables(
        spark.read.parquet(p1), spark.read.parquet(p2)
    )
    cols = ["gram_hash", "n_occ", "first_id", "first_pos"]
    assert sorted(map(tuple, merged.select(*cols).collect())) == \
        sorted(map(tuple, full.select(*cols).collect()))
    # the stamp survives the merge
    assert merged.select(SPAN_PARAMS_COL).first()[0] == \
        full.select(SPAN_PARAMS_COL).first()[0]
    # the shared passage's first occurrence is batch-1's doc 1
    shared = merged.filter(F.col("n_occ") >= 2).collect()
    assert shared and all(r["first_id"] == 1 for r in shared)


def test_span_gram_validation(spark):
    """Parameter-stamp mismatches and conflicting corpus inputs raise;
    mixed-stamp merges raise."""
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        merge_span_gram_tables,
        span_gram_table,
    )

    corpus = _df(spark, [(100, PASSAGE + " stored here")])
    g12 = span_gram_table(corpus, min_span=12)
    g10 = span_gram_table(corpus, min_span=10)
    batch = _df(spark, [(1, PASSAGE + " quoted again")])
    with pytest.raises(ValueError, match="parameter mismatch"):
        duplicate_span_trim(batch, min_span=10, corpus_grams=g12)
    with pytest.raises(ValueError, match="at most one"):
        duplicate_span_trim(
            batch, min_span=12, corpus=corpus, corpus_grams=g12
        )
    with pytest.raises(ValueError, match="mixed parameters"):
        merge_span_gram_tables(g12, g10)
    with pytest.raises(ValueError, match="at least one"):
        merge_span_gram_tables()
    with pytest.raises(ValueError, match="min_span"):
        span_gram_table(corpus, min_span=1)


def test_decontamination_by_trimming(spark):
    """Passing the benchmark as the trim corpus CUTS benchmark quotes
    out of candidate documents instead of dropping them — the
    complement of curate's drop-the-document contamination stage
    (benchmark occurrences outrank candidates, so candidates never
    'claim' a benchmark passage)."""
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        duplicate_span_trim,
    )

    bench_span = " ".join(f"bench{i}" for i in range(12))
    lead = "original reporting with its own words here"
    tail = "and a closing thought of its own too"
    docs = spark.createDataFrame(
        [(1, f"{lead} {bench_span} {tail}"),
         (2, "a clean document sharing nothing with the benchmark")],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(900, f"setup text {bench_span} more benchmark prose")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in duplicate_span_trim(
        docs, min_span=10, corpus=benchmark
    ).collect()}
    assert sorted(got) == [1, 2]           # no document dropped
    assert bench_span not in got[1]        # the quote is gone
    assert lead in got[1] and tail in got[1]
    assert got[2] == ("a clean document sharing nothing with the "
                      "benchmark")


def test_span_gram_builders_identical(spark):
    """Hash-compat pin: the per-row gram builder
    (_span_grams_per_row — xxhash64 over a token-hash array slice)
    emits EXACTLY the rows of the superseded lead-chain window builder
    (_span_grams_from_tok — variadic xxhash64 over 50 lead columns).
    This is the guarantee that lets a span_gram_table persisted under
    the old builder keep working unchanged (same fingerprint, same
    values). Real corpus + degenerate rows, two span lengths."""
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        _span_grams_from_tok,
        _span_grams_per_row,
        _span_tok_rows,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(90001, None), (90002, ""), (90003, "   "),
         (90004, "one two three four five six seven"),
         (90005, "a b " * 40)],
        "doc_id long, text string",
    )
    both = docs.unionByName(extra)
    for L in (3, 50):
        old = _span_grams_from_tok(
            _span_tok_rows(both, 1, "text", "doc_id"), L
        )
        new = _span_grams_per_row(both, 1, "text", "doc_id", L)
        # same columns and types (nullability differs: the per-row
        # builder's when()-guard marks __gh nullable; values never are)
        assert [(f.name, f.dataType) for f in old.schema.fields] \
            == [(f.name, f.dataType) for f in new.schema.fields]
        assert old.exceptAll(new).count() == 0, L
        assert new.exceptAll(old).count() == 0, L
