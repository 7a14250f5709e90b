"""K× FK-consistent replica of a testdata scale factor, for scale audits.

    python tools/make_scaled_replica.py [SRC] [DST] [K]
    # defaults: /root/testdata/sf0.1  /tmp/sfx10  10

Each copy ``i`` offsets every key family by ``i * (max_key + 1)`` so all
FK joins stay consistent across copies. Content is perturbed per copy so
near-duplicate WORK and OUTPUT scale linearly instead of exploding on
clones:

- documents: a bijective character rotation per copy (vowels rotated by
  ``i % 5``, the consonant set 'rstln' by ``(i // 5) % 5``, the second
  consonant set 'dcmhg' by ``i // 25`` → K ≤ 125 distinct bijections;
  K ≤ 25 replicas are byte-identical to what this tool produced before
  the third set existed, since its rotation is 0 there) — token
  structure and lengths preserved, cross-copy shingle Jaccard ≈ 0.
  CAVEAT (r9 advice) for K > 25: the third set's consonants are
  low-frequency, so copy pairs with i ≡ j (mod 25) — i.e. sharing the
  vowel and 'rstln' rotations — leave every token containing none of
  d/c/m/h/g unchanged, and verbatim 10-token runs CAN recur across
  such copies. The "cross-copy Jaccard ≈ 0" premise is therefore
  weaker at 30×/50×: scaling-audit readers should attribute small
  super-linear deltas in span-trim/near-dup work at K > 25 to this
  residual overlap before suspecting the operators;
- embeddings: a per-copy sign mask flipping ~half the dimensions
  (flip where popcount((dim-1) & i) is odd; DuckDB list_transform's
  index lambda arg is 1-based, so dim-1 is the 0-based dimension) —
  copy 0 is the identity (original vectors preserved), copies i and j
  differ by the XOR mask i^j so cross-copy cosine ≈ 0;
- events.ts is written as TIMESTAMP_NS to preserve the NANOS-adaptive
  reader path the real testdata exercises.

Used for the round-2 3× audit (suite 1.61×) and the round-4 10× audit
(suite 2.83×, no super-linear query) — see NOTES.md "Scale audit".
"""

import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
if K > 125:
    # checked up front: tr() is only reached at the documents table,
    # by which point six tables would already be written — aborting
    # there would leave a half-built replica on disk
    raise SystemExit("K > 125 needs a fourth disjoint character set")

con = duckdb.connect()


def mx(table, col):
    return con.sql(
        f"SELECT max({col})+1 FROM '{SRC}/{table}.parquet'"
    ).fetchone()[0]


OFF_C = mx("customer", "c_custkey")
OFF_O = mx("orders", "o_orderkey")
OFF_P = mx("part", "p_partkey")
OFF_S = mx("supplier", "s_suppkey")
OFF_E = mx("events", "event_id")
OFF_U = mx("events", "user_id")
OFF_D = mx("documents", "doc_id")
OFF_V = mx("embeddings", "vec_id")

V = "aeiou"
C5 = "rstln"
C5B = "dcmhg"  # third disjoint set: lifts the bijection count to 125


def rot(s, k):
    return s[k:] + s[:k]


def tr(i):
    src = V + V.upper() + C5 + C5.upper() + C5B + C5B.upper()
    dst = (rot(V, i % 5) + rot(V.upper(), i % 5)
           + rot(C5, (i // 5) % 5) + rot(C5.upper(), (i // 5) % 5)
           + rot(C5B, i // 25) + rot(C5B.upper(), i // 25))
    return src, dst


def gen(table, sql_fn):
    parts = " UNION ALL ".join(sql_fn(i) for i in range(K))
    con.sql(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM '{DST}/{table}.parquet'"
    ).fetchone()[0]
    print(table, n)


gen("customer", lambda i:
    f"SELECT c_custkey + {i*OFF_C} AS c_custkey, c_name, c_nationkey, "
    f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'")
gen("orders", lambda i:
    f"SELECT o_orderkey + {i*OFF_O} AS o_orderkey, "
    f"o_custkey + {i*OFF_C} AS o_custkey, o_orderstatus, o_totalprice, "
    f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'")
gen("lineitem", lambda i:
    f"SELECT l_orderkey + {i*OFF_O} AS l_orderkey, "
    f"l_partkey + {i*OFF_P} AS l_partkey, "
    f"l_suppkey + {i*OFF_S} AS l_suppkey, l_linenumber, l_quantity, "
    f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    f"l_shipdate FROM '{SRC}/lineitem.parquet'")
gen("supplier", lambda i:
    f"SELECT s_suppkey + {i*OFF_S} AS s_suppkey, s_name, s_nationkey, "
    f"s_acctbal FROM '{SRC}/supplier.parquet'")
gen("part", lambda i:
    f"SELECT p_partkey + {i*OFF_P} AS p_partkey, p_name, p_brand, p_type, "
    f"p_size, p_retailprice FROM '{SRC}/part.parquet'")
gen("events", lambda i:
    f"SELECT event_id + {i*OFF_E} AS event_id, ts::TIMESTAMP_NS AS ts, "
    f"user_id + {i*OFF_U} AS user_id, event_type, value, props "
    f"FROM '{SRC}/events.parquet'")


def doc_sql(i):
    s, d = tr(i)
    return (f"SELECT doc_id + {i*OFF_D} AS doc_id, "
            f"translate(text, '{s}', '{d}') AS text, lang, source, n_chars "
            f"FROM '{SRC}/documents.parquet'")


gen("documents", doc_sql)
gen("embeddings", lambda i:
    f"SELECT vec_id + {i*OFF_V} AS vec_id, "
    f"list_transform(embedding, (x, d) -> CASE WHEN "
    f"bit_count(((d - 1) & {i})::BIGINT) % 2 = 1 THEN -x ELSE x END)"
    f"::FLOAT[] AS embedding, label FROM '{SRC}/embeddings.parquet'")
for t in ("nation", "region"):
    con.sql(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
    )
    print(t, "copied")
