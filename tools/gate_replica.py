"""Local replica of the driver's DuckDB-oracle correctness gate, with an
aggregate-checksum fallback for outputs too large to value-compare.

Runs every `queries()` entry on Spark and the matching `oracle_sql()` on
DuckDB over the same parquet dir, then compares row count, schema
(column names), and values (columns sorted by name, rows sorted, floats
rounded) — approximating the driver's value-hash.

Outputs larger than ``--max-rows`` (default 2M — the round-4 10× audit
showed driver-style collect comparison dying around 6M wide rows while
the queries themselves were fine) are instead verified by per-column
aggregate checksums computed by BOTH engines from one shared SQL string:
row count, SUM/MIN/MAX for integers, SUM(CAST(ROUND(x*10000) AS BIGINT))
for doubles (explicit round before cast — Spark CAST truncates where
DuckDB rounds, NOTES.md), SUM(LENGTH)+COUNT(DISTINCT) for strings,
COUNT(DISTINCT)+MIN/MAX for dates/timestamps. The same fallback engages
if the full value compare itself raises (driver-side memory). This makes
scale-audit oracle runs (tools/make_scaled_replica.py outputs) fully
automatic: every query reports ok / ok-checksum / FAIL with no manual
verification step.

Usage: python tools/gate_replica.py [sf_dir] [--max-rows N] [query ...]
"""

import math
import sys

import duckdb
import pandas as pd

args = [a for a in sys.argv[1:]]
max_rows = 2_000_000
if "--max-rows" in args:
    i = args.index("--max-rows")
    max_rows = int(args[i + 1])
    del args[i:i + 2]
sf_dir = args[0] if args else "/root/testdata/sf0.01"
only = set(args[1:])

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _connect():
    c = duckdb.connect()
    # in-memory DuckDB disables spilling unless a temp_directory is
    # set — without one, the 10x-replica gopher/span-trim oracles
    # (hundreds of millions of gram groups) OOM-kill the process
    # instead of spilling
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    c.execute("SET memory_limit='48GB'")
    # row order is irrelevant here (compares sort, checksums
    # aggregate) and preserving it forces full materialization of
    # large intermediates
    c.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


# one FRESH connection per query (r9 scale-audit lesson): a long-lived
# connection accumulates buffer-pool state across the big checksum
# oracles — at the 30x replica, query #31 died with an
# OutOfMemoryException that the very same SQL cannot reproduce on a
# fresh connection (12s, well under the limit). Views are cheap to
# re-register; cumulative state is not worth carrying. The loop (and
# the full-compare fallback) assign this before every use.
con = None


def _reconnect():
    global con
    if con is not None:
        try:
            con.close()
        except Exception:  # noqa: BLE001 — a died connection stays died
            pass
    con = _connect()
    return con


def _record_fail(fails, name, e):
    msg = f"{type(e).__name__}: {str(e)[:200]}"
    fails.append((name, [msg]))
    print(f"{name:32s} FAIL: {msg}")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime64", "dbdate")) or (
            df[c].dtype == object
            and len(df)
            and df[c].map(lambda v: v is None or hasattr(v, "isoformat")).all()
        ):
            df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else round(v, 6)
            )
    return df.sort_values(list(df.columns), ignore_index=True)


MOD = 1_000_000_007


def _mod(expr: str) -> str:
    """Non-negative modular residue — `%` keeps the dividend's sign in
    both engines, so normalize with the add-then-mod idiom."""
    return f"((({expr}) % {MOD}) + {MOD}) % {MOD}"


def checksum_exprs(cols: list[tuple[str, str]]) -> list[str]:
    """Per-column aggregate checksum expressions valid in BOTH Spark SQL
    and DuckDB (bare snake_case identifiers, shared function subset)."""
    exprs = ["COUNT(*) AS __n"]
    for name, typ in cols:
        t = typ.upper()
        if "[" in t or "STRUCT" in t or "MAP" in t or "LIST" in t:
            exprs.append(f"COUNT({name}) AS n_{name}")
        elif t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
            # round BEFORE cast: Spark CAST(double AS BIGINT) truncates,
            # DuckDB rounds (NOTES.md checksum gotcha); then the modular
            # sum below so hash-magnitude values can't overflow ANSI SUM
            exprs.append(
                f"SUM({_mod(f'CAST(ROUND({name} * 10000) AS BIGINT)')}) "
                f"AS s_{name}"
            )
            exprs.append(f"COUNT({name}) AS n_{name}")
        elif t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
                   "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
            # modular sum: order-independent, exact, and safe for
            # hash-valued columns (plain SUM overflows Spark ANSI mode)
            exprs.append(f"SUM({_mod(name)}) AS s_{name}")
            exprs.append(f"MIN({name}) AS mn_{name}")
            exprs.append(f"MAX({name}) AS mx_{name}")
        elif t == "BOOLEAN":
            exprs.append(
                f"SUM(CASE WHEN {name} THEN 1 ELSE 0 END) AS s_{name}"
            )
            exprs.append(f"COUNT({name}) AS n_{name}")
        elif t == "DATE" or t.startswith("TIMESTAMP"):
            exprs.append(f"COUNT(DISTINCT {name}) AS d_{name}")
            exprs.append(f"MIN({name}) AS mn_{name}")
            exprs.append(f"MAX({name}) AS mx_{name}")
        else:  # VARCHAR and friends
            exprs.append(f"SUM(LENGTH({name})) AS s_{name}")
            exprs.append(f"COUNT(DISTINCT {name}) AS d_{name}")
    return exprs


def normv(v):
    """Engine-neutral scalar: int-like → int, float → rounded, temporal
    → isoformat string."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return str(pd.Timestamp(v).isoformat())
    return str(v)


def checksum_compare(name: str, sdf, oracle_sql: str):
    """Compare per-column aggregate checksums computed by both engines
    from one shared SQL string. Returns a list of mismatch messages."""
    schema = con.execute(
        f"DESCRIBE SELECT * FROM ({oracle_sql}) t"
    ).fetchall()
    cols = [(r[0], r[1]) for r in schema]
    sel = ", ".join(checksum_exprs(cols))
    duck = con.execute(f"SELECT {sel} FROM ({oracle_sql}) t").fetchone()
    view = f"__gate_{name}"
    sdf.createOrReplaceTempView(view)
    got = spark.sql(f"SELECT {sel} FROM {view}").collect()[0]
    labels = [e.split(" AS ")[-1] for e in checksum_exprs(cols)]
    bad = []
    for lbl, dv, sv in zip(labels, duck, got):
        if normv(dv) != normv(sv):
            bad.append(f"checksum {lbl}: spark {normv(sv)} vs {normv(dv)}")
    return bad


qs = E.queries()
oracles = E.oracle_sql()
fails, rows_only, checksummed = [], [], []
for name, fn in qs.items():
    if only and name not in only:
        continue
    # fresh DuckDB connection per query — see _connect()
    con = _reconnect()
    try:
        sdf = fn(spark, sf_dir)
        if name not in oracles:
            n = sdf.count()
            rows_only.append((name, n))
            print(f"{name:32s} ROWS-ONLY ({n} rows)")
            continue
        osql = oracles[name]
        n_oracle = con.execute(
            f"SELECT COUNT(*) FROM ({osql}) t"
        ).fetchone()[0]
    except Exception as e:  # noqa: BLE001 — record, keep auditing
        _record_fail(fails, name, e)
        continue

    def checksum_verify():
        """rows + schema + per-column checksums — the degraded-mode
        verification shared by the >max_rows branch and the fallback
        when the full collect/compare itself dies."""
        status = []
        n_spark = sdf.count()
        if n_spark != n_oracle:
            status.append(f"rows {n_spark} vs {n_oracle}")
        if sorted(sdf.columns) != sorted(
            r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM ({osql}) t"
            ).fetchall()
        ):
            status.append("schema mismatch")
        if not status:
            status = checksum_compare(name, sdf, osql)
        return status

    status = []
    try:
        if n_oracle > max_rows:
            status = checksum_verify()
            if status:
                fails.append((name, status))
                print(f"{name:32s} FAIL: {'; '.join(status)}")
            else:
                checksummed.append(name)
                print(f"{name:32s} ok-checksum ({n_oracle} rows)")
            continue
    except Exception as e:  # noqa: BLE001 — even the degraded path can
        # die (the r9 30x run lost 19 queries to one such death);
        # record and keep auditing on a fresh connection next query
        _record_fail(fails, name, e)
        continue
    try:
        # any driver-side failure of the full collect/compare (Python
        # MemoryError, Py4J/Arrow OOM, JVM OutOfMemoryError surfacing
        # as Py4JError) degrades to the checksum verification; a VALUE
        # mismatch (AssertionError from assert_frame_equal) stays a
        # hard FAIL — the fallback covers capacity, not wrong answers
        pdf = sdf.toPandas()
        odf = con.execute(osql).fetchdf()
        if len(pdf) != len(odf):
            status.append(f"rows {len(pdf)} vs {len(odf)}")
        if sorted(pdf.columns) != sorted(odf.columns):
            status.append(
                f"schema {sorted(pdf.columns)} vs {sorted(odf.columns)}"
            )
        if not status:
            try:
                a, b = norm(pdf.copy()), norm(odf.copy())
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False,
                    rtol=1e-6, atol=1e-9,
                )
            except AssertionError as e:
                status.append("hash: " + str(e).split("\n")[0])
    except Exception as e:
        print(f"{name:32s} full compare died ({type(e).__name__}); "
              f"falling back to checksums")
        # the death may have poisoned (or been caused by) the DuckDB
        # connection itself — give the degraded path a fresh one, or
        # it inherits the very failure it exists to absorb
        con = _reconnect()
        try:
            status = checksum_verify()
        except Exception as e2:  # noqa: BLE001 — second-level death:
            # record it instead of killing the remaining queries
            status = [f"{type(e2).__name__}: {str(e2)[:200]}"]
        if not status:
            checksummed.append(name)
            print(f"{name:32s} ok-checksum ({n_oracle} rows)")
            continue
    if status:
        fails.append((name, status))
        print(f"{name:32s} FAIL: {'; '.join(status)}")
    else:
        print(f"{name:32s} ok ({len(pdf)} rows)")

print(
    f"\n=== {len(fails)} failed, {len(rows_only)} rows-only, "
    f"{len(checksummed)} checksum-verified ==="
)
for n, s in fails:
    print(" ", n, s)
sys.exit(1 if fails else 0)
