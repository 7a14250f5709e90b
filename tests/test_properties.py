"""Property-based tests: the cleaning rules must agree with a plain-
Python reference implementation of the reference's lambdas
(reference: load_silver.py:63-143) on arbitrary input, not just the
fixture corpus. Each Hypothesis example is a BATCH of strings evaluated
in one Spark job to keep runtime sane."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark.functions import text as TX

TEXTISH = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Z"), max_codepoint=0x2FF
    ),
    max_size=40,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_title_norm(x: str | None) -> str | None:
    """reference: load_silver.py:69-71 — strip, title, ''→None."""
    if x is None:
        return None
    s = x.strip()
    return s.title() if s else None


def _py_phone(x: str | None) -> str | None:
    """reference: load_silver.py:99-107."""
    if x is None:
        return None
    s = re.sub(r"[^\d+\-]", "", x)
    return s if s else None


def _py_plate(x: str | None) -> str | None:
    """reference: load_silver.py:137-143 (ASCII [A-Z0-9] keep-class)."""
    if x is None:
        return None
    return re.sub(r"[^A-Z0-9]", "", x.upper())


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_exact_title_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    df2 = df.select(TX.normalize_text(F.col("t"), "exact").alias("out"))
    got = [r["out"] for r in df2.collect()]
    want = [_py_title_norm(v) for v in vals]
    assert got == want, (got, want)


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_phone_strip_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [
        r["out"] for r in df.select(TX.clean_phone(F.col("t")).alias("out")).collect()
    ]
    want = [_py_phone(v) for v in vals]
    assert got == want


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_plate_canon_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [
        r["out"] for r in df.select(TX.clean_plate(F.col("t")).alias("out")).collect()
    ]
    want = [_py_plate(v) for v in vals]
    assert got == want


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_empty_to_null_idempotent(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    once = df.select(TX.empty_to_null(F.col("t")).alias("out"))
    twice = once.select(TX.empty_to_null(F.col("out")).alias("out"))
    assert [r["out"] for r in once.collect()] == [
        r["out"] for r in twice.collect()
    ]


@given(
    st.lists(
        st.floats(min_value=1e-3, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=30,
    )
)
@SETTINGS
def test_round2_exact_matches_cpython(spark, vals):
    """validate.round2_exact == CPython round(x, 2) on arbitrary
    positive doubles (correctly-rounded half-even on the binary value)."""
    from datawarehouse_vehicule_insurance_spark.functions.validate import (
        positive_round2,
    )

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["r"] for r in
        df.select(positive_round2(F.col("x"), banker=True).alias("r"))
        .collect()
    ]
    want = [round(v, 2) for v in vals]
    assert got == want, (got, want)


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
@SETTINGS
def test_ngrams_and_dup_ratio_match_python(spark, texts, n):
    """text_analysis.ngrams / dup_ngram_ratio == the straightforward
    Python reference over arbitrary token streams (incl. empty and
    sub-n-gram docs)."""
    from datawarehouse_vehicule_insurance_spark.operators import (
        text_analysis as TA,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["r"]
        for r in df.select(
            "i", TA.dup_ngram_ratio(F.col("t"), n).alias("r")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.strip().lower().split()
        grams = [
            " ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)
        ]
        if not grams:
            want = 0.0
        else:
            want = round(1.0 - len(set(grams)) / len(grams), 6)
        assert abs(got[i] - want) < 1e-9, (t, got[i], want)


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)),
        min_size=2, max_size=40,
    )
)
@SETTINGS
def test_zorder_value_matches_python_interleave(spark, pts):
    """scale.zorder_value == a Python Morton-interleave reference over
    the same linear quantization."""
    from datawarehouse_vehicule_insurance_spark.operators.scale import (
        zorder_value,
    )

    bits = 8
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    mins = [float(min(xs)), float(min(ys))]
    maxs = [float(max(xs)), float(max(ys))]
    df = spark.createDataFrame(pts, "x int, y int")
    got = [
        r["z"] for r in df.select(
            zorder_value([F.col("x"), F.col("y")], mins, maxs, bits)
            .alias("z")
        ).collect()
    ]

    def quant(v, lo, hi):
        span = (hi - lo) or 1.0
        import math
        return min(max(math.floor((v - lo) / span * (2 ** bits)), 0),
                   2 ** bits - 1)

    def interleave(a, b):
        z = 0
        for bit in range(bits):
            z |= ((a >> bit) & 1) << (2 * bit)
            z |= ((b >> bit) & 1) << (2 * bit + 1)
        return z

    want = [
        interleave(quant(x, mins[0], maxs[0]), quant(y, mins[1], maxs[1]))
        for x, y in pts
    ]
    assert got == want


def _py_ffd(tokens: list[tuple[int, int]], max_len: int):
    """Local reference of pack_sequences' per-shard FFD: input (id, tok),
    sort by (tok desc, id), first-fit; oversized → singleton."""
    order = sorted(tokens, key=lambda t: (-t[1], t[0]))
    room, assign = [], {}
    for i, tok in order:
        if tok > max_len:
            room.append(0)
            assign[i] = (len(room) - 1, True)
            continue
        for b, cap in enumerate(room):
            if cap >= tok:
                room[b] = cap - tok
                assign[i] = (b, False)
                break
        else:
            room.append(max_len - tok)
            assign[i] = (len(room) - 1, False)
    return assign


@given(
    st.lists(
        st.integers(min_value=0, max_value=40),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=30),
)
@SETTINGS
def test_pack_sequences_matches_python_ffd(spark, toks, max_len):
    from datawarehouse_vehicule_insurance_spark.operators import mlprep as MP

    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # one shard: the distributed result IS the reference FFD
    got = {
        r["doc_id"]: (r["seq_id"], r["overflow"])
        for r in MP.pack_sequences(
            df, token_col="n_tokens", max_len=max_len, num_shards=1
        ).collect()
    }
    want = _py_ffd(rows, max_len)
    assert set(got) == set(want)
    for i, (bin_idx, ovf) in want.items():
        assert got[i] == (bin_idx, ovf), (i, got[i], want[i])


# ---------------------------------------------------------------------------
# line-level dedup vs python reference (arbitrary corpora)
# ---------------------------------------------------------------------------

# a small pool of reusable lines forces cross-document repeats; free
# text keeps the unique tail arbitrary. NOTE: matching trims with
# Spark's F.trim semantics (0x20 only), so the reference strips ' '
# only — Python str.strip() would also eat NBSP-class whitespace.
LINE_POOL = ["shared one", "shared two", "  shared three ", "", "-", "x"]
FREE_LINE = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Z"), max_codepoint=0x2FF
    ),
    max_size=20,
).map(lambda s: s.replace("\n", " "))
DOC = st.one_of(
    st.none(),
    st.lists(
        st.one_of(st.sampled_from(LINE_POOL), FREE_LINE),
        min_size=0, max_size=6,
    ).map("\n".join),
)


def _py_line_dedup_ref(rows, min_doc_freq, min_chars):
    from collections import defaultdict

    freq = defaultdict(set)
    for i, t in rows:
        if t is None:
            continue
        for line in t.split("\n"):
            if len(line.strip(" ")) >= min_chars:
                freq[line.strip(" ")].add(i)
    repeated = {
        k for k, d in freq.items() if len(d) >= min_doc_freq
    }
    out = []
    for i, t in rows:
        if t is None:
            out.append((i, None))
            continue
        kept = [
            line for line in t.split("\n")
            if line.strip(" ") not in repeated
            or len(line.strip(" ")) < min_chars
        ]
        if kept:
            out.append((i, "\n".join(kept)))
    return sorted(out)


@given(
    st.lists(DOC, min_size=1, max_size=12),
    st.integers(min_value=2, max_value=3),
    st.integers(min_value=0, max_value=2),
)
@SETTINGS
def test_line_dedup_matches_python(spark, docs, min_freq, min_chars):
    from datawarehouse_vehicule_insurance_spark.operators.dedup import (
        line_dedup,
    )

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["text"])
        for r in line_dedup(
            df, min_doc_freq=min_freq, min_chars=min_chars
        ).collect()
    )
    assert got == _py_line_dedup_ref(rows, min_freq, min_chars)
