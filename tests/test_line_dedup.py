"""Line-level (boilerplate) dedup — the C4/RefinedWeb repeated-line
rule: a line appearing in ≥ min_doc_freq distinct documents is removed
from EVERY document. Verified against a pure-Python reference
implementation plus planted edge cases (order preservation, short-line
exemption, per-scope counting, empty/NULL handling, mergeable partial
counts, parameter-stamp validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark.operators.dedup import (
    line_count_table,
    line_dedup,
    line_fingerprint,
    merge_line_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _py_line_dedup(rows, min_doc_freq=2, min_chars=1, scope=None,
                   drop_empty=True):
    """Pure-Python reference: count distinct docs per trimmed line
    (within scope), remove lines over the threshold from every doc."""
    from collections import defaultdict

    freq = defaultdict(set)
    for doc_id, text, source in rows:
        if text is None:
            continue
        key_scope = source if scope else None
        for line in text.split("\n"):
            if len(line.strip()) >= min_chars:
                freq[(key_scope, line.strip())].add(doc_id)
    repeated = {k for k, docs in freq.items() if len(docs) >= min_doc_freq}
    out = []
    for doc_id, text, source in rows:
        if text is None:
            out.append((doc_id, None, source))
            continue
        key_scope = source if scope else None
        kept = [
            line
            for line in text.split("\n")
            if (key_scope, line.strip()) not in repeated
            or len(line.strip()) < min_chars
        ]
        if drop_empty and not kept:
            continue
        out.append((doc_id, "\n".join(kept), source))
    return sorted(out)


ROWS = [
    (1, "unique opening\nSubscribe to our newsletter\nreal content one", "a"),
    (2, "real content two\nSubscribe to our newsletter\nmore words", "a"),
    (3, "Subscribe to our newsletter\nthird doc body", "b"),
    (4, "totally original document", "b"),
    (5, "-\nshort sep doc\n-", "b"),
    (6, "-\nanother short sep doc\n-", "a"),
    (7, None, "a"),
    (8, "", "b"),
    (9, "Subscribe to our newsletter", "a"),  # becomes empty -> dropped
]


def _collect(df):
    return sorted(
        tuple(r) for r in df.select("doc_id", "text", "source").collect()
    )


def test_matches_python_reference(spark):
    got = _collect(line_dedup(_docs(spark, ROWS)))
    assert got == _py_line_dedup(ROWS)


def test_boilerplate_removed_everywhere_order_kept(spark):
    out = dict(
        (r["doc_id"], r["text"])
        for r in line_dedup(_docs(spark, ROWS)).collect()
    )
    # the repeated line is gone from ALL docs, including the first
    assert out[1] == "unique opening\nreal content one"
    assert out[2] == "real content two\nmore words"
    assert out[3] == "third doc body"
    # untouched doc intact
    assert out[4] == "totally original document"
    # default min_chars=1 exempts only blank lines: the 1-char "-"
    # separator repeats across docs 5 and 6 and is removed
    assert out[5] == "short sep doc"
    # NULL text passes through; originally-empty doc survives
    assert out[7] is None
    assert out[8] == ""
    # doc 9 became empty -> dropped
    assert 9 not in out


def test_drop_empty_false_keeps_hollow_doc(spark):
    out = dict(
        (r["doc_id"], r["text"])
        for r in line_dedup(_docs(spark, ROWS), drop_empty=False).collect()
    )
    assert out[9] == ""


def test_min_chars_exempts_short_separators(spark):
    out = dict(
        (r["doc_id"], r["text"])
        for r in line_dedup(_docs(spark, ROWS), min_chars=2).collect()
    )
    # with the exemption raised to 2 chars the "-" separators survive
    assert out[5] == "-\nshort sep doc\n-"
    assert out[6] == "-\nanother short sep doc\n-"
    got = _collect(line_dedup(_docs(spark, ROWS), min_chars=2))
    assert got == _py_line_dedup(ROWS, min_chars=2)


def test_scope_col_counts_per_source(spark):
    rows = [
        (1, "shared across sources\nbody one", "a"),
        (2, "shared across sources\nbody two", "b"),
        (3, "site template line\nbody three", "a"),
        (4, "site template line\nbody four", "a"),
    ]
    out = dict(
        (r["doc_id"], r["text"])
        for r in line_dedup(_docs(spark, rows), scope_col="source").collect()
    )
    # repeated only across DIFFERENT sources -> kept
    assert out[1] == "shared across sources\nbody one"
    assert out[2] == "shared across sources\nbody two"
    # repeated within one source -> removed there
    assert out[3] == "body three"
    assert out[4] == "body four"
    assert _collect(line_dedup(_docs(spark, rows), scope_col="source")) == \
        _py_line_dedup(rows, scope=True)


def test_trimmed_matching_preserves_original_bytes(spark):
    rows = [
        (1, "  Subscribe now  \nkeep me", "a"),
        (2, "Subscribe now\nother body", "a"),
        (3, "   indented survivor\nSubscribe now", "a"),
    ]
    out = dict(
        (r["doc_id"], r["text"])
        for r in line_dedup(_docs(spark, rows)).collect()
    )
    # indentation variants of the boilerplate line all match (trimmed
    # hash), while surviving lines keep their original bytes
    assert out[1] == "keep me"
    assert out[2] == "other body"
    assert out[3] == "   indented survivor"


def test_threshold_three(spark):
    got = _collect(line_dedup(_docs(spark, ROWS), min_doc_freq=3))
    assert got == _py_line_dedup(ROWS, min_doc_freq=3)


def test_merged_partial_counts_match_global(spark):
    batch1 = _docs(spark, ROWS[:4])
    batch2 = _docs(spark, ROWS[4:])
    merged = merge_line_counts(
        line_count_table(batch1), line_count_table(batch2)
    )
    got = _collect(
        line_dedup(_docs(spark, ROWS), line_counts=merged)
    )
    assert got == _py_line_dedup(ROWS)


def test_count_table_counts_distinct_docs(spark):
    rows = [
        (1, "dup line\ndup line\nbody", "a"),  # twice in ONE doc
        (2, "unrelated", "a"),
    ]
    counts = {
        r["n_docs"]
        for r in line_count_table(_docs(spark, rows)).collect()
    }
    # within-doc repetition counts once -> no line reaches 2
    assert counts == {1}
    out = _collect(line_dedup(_docs(spark, rows)))
    assert out == _py_line_dedup(rows)


def test_param_stamp_mismatch_raises(spark):
    counts = line_count_table(_docs(spark, ROWS), min_chars=5)
    with pytest.raises(ValueError, match="parameter mismatch"):
        line_dedup(_docs(spark, ROWS), min_chars=1, line_counts=counts)


def test_merge_mixed_stamps_raises(spark):
    a = line_count_table(_docs(spark, ROWS), min_chars=1)
    b = line_count_table(_docs(spark, ROWS), min_chars=5)
    with pytest.raises(ValueError, match="mixed parameters"):
        merge_line_counts(a, b)


def test_fingerprint_distinguishes_scope(spark):
    assert line_fingerprint("\n", 1, None) != line_fingerprint("\n", 1, "source")


def test_plan_has_no_text_in_count_shuffle(spark):
    """The count table's exchange carries (hash, id) — the projection
    before the distinct must not include the line text."""
    plan = line_count_table(_docs(spark, ROWS))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    # text flows only into the narrow explode; the aggregate keys are
    # the hash (+id); __line must not survive into the distinct
    agg_sections = [s for s in plan.split("Exchange") if "HashAggregate" in s]
    assert agg_sections, plan
    assert "__line_hash" in plan


def test_line_count_table_remove_is_exact_subtraction(spark):
    """The algebraic delete (table-format DELETE building block):
    removing a doc's own partial from the full counts equals counting
    the remaining docs directly — shared lines decrement, lines unique
    to the removed doc vanish at zero."""
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        line_count_table_remove,
    )

    full = line_count_table(_docs(spark, ROWS))
    removed = _docs(spark, [r for r in ROWS if r[0] in (1, 9)])
    remaining = _docs(spark, [r for r in ROWS if r[0] not in (1, 9)])
    got = {
        (r["line_hash"], r["n_docs"])
        for r in line_count_table_remove(full, removed).collect()
    }
    want = {
        (r["line_hash"], r["n_docs"])
        for r in line_count_table(remaining).collect()
    }
    assert got == want
