"""Replica of the driver's CORRECTNESS hash protocol, run locally at any SF.

The per-round driver runs each __spark_entry__.queries() entry AND its
oracle_sql() side-by-side, sorts columns by name, and hashes the values.
The q56/q60 round-4 episode proved that *value equality after rounding*
is not enough: DuckDB widening sum(BIGINT) -> HUGEINT (int128) serializes
differently from Spark's bigint and hash-reds value-identical results.

This script therefore compares at the strictest layer we can reach
locally:

  1. row counts and sorted column names,
  2. the *pandas dtype* each side produces (Spark toPandas vs DuckDB
     fetchdf) -- a HUGEINT/DECIMAL column surfaces here as object/float
     vs Spark's int64 and is flagged even when values compare equal,
  3. exact value equality for non-float columns (no rounding), and
     6-decimal-rounded equality for float columns.

Usage:
    python scripts/driver_protocol_check.py [SF_DIR] [query ...]
Defaults to /root/testdata/sf0.01 and all queries that have an oracle.
Prints one line per query and a JSON summary; exit code 1 on any flag.
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from dedupe_spark.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# pandas dtype equivalence classes: Spark toPandas vs duckdb fetchdf use
# different nullable conventions (e.g. int64 vs Int64) that the driver's
# hasher treats as equal; int128/object/float-for-int do NOT fall in the
# same class and are exactly the artifact we're hunting.
_DTYPE_CLASS = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "Int8": "int", "Int16": "int", "Int32": "int", "Int64": "int",
    "uint8": "int", "uint16": "int", "uint32": "int", "uint64": "int",
    "float32": "float", "float64": "float", "Float64": "float",
    "bool": "bool", "boolean": "bool",
    "object": "object", "string": "object",
    "datetime64[ns]": "ts", "datetime64[us]": "ts",
}


def _dtype_class(dt) -> str:
    s = str(dt)
    if s in _DTYPE_CLASS:
        return _DTYPE_CLASS[s]
    # prefix fallbacks so variants outside the table still land in a
    # known class (tz-aware datetime64[ns, UTC], decimal128(…), etc.);
    # an unknown class falls through as its literal string, which the
    # comparison below always flags against a known class
    if s.startswith("datetime64"):
        return "ts"
    if s.startswith(("decimal", "Decimal")):
        return "decimal"
    return s


def _norm_cell(v, is_float: bool):
    if v is None:
        return None
    if is_float:
        f = float(v)
        if math.isnan(f):
            return "nan"
        return round(f, 6)
    if isinstance(v, float):
        # int column materialized as float (e.g. pandas NaN-able int):
        # compare the integral value but the dtype check will flag it.
        return int(v) if v == int(v) else v
    return v


def check_query(spark, duck, name: str) -> dict:
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    spdf = q(spark, SF_DIR).toPandas()
    dpdf = duck.execute(sql).fetchdf()

    out = {"rows": [len(spdf), len(dpdf)], "flags": []}
    if sorted(spdf.columns) != sorted(dpdf.columns):
        out["flags"].append(
            f"columns: spark={sorted(spdf.columns)} oracle={sorted(dpdf.columns)}")
        return out
    if len(spdf) != len(dpdf):
        out["flags"].append("row count mismatch")
        return out

    cols = sorted(spdf.columns)
    # dtype-class comparison (the HUGEINT detector)
    for c in cols:
        sc, dc = _dtype_class(spdf[c].dtype), _dtype_class(dpdf[c].dtype)
        # all-NULL columns degrade to object on either side; values decide
        if sc != dc and not (spdf[c].isna().all() and dpdf[c].isna().all()):
            # duckdb returns object for HUGEINT and str columns alike;
            # only flag when the *other* side is non-object (a genuine
            # width/kind difference the driver hasher would see).
            if "object" not in (sc, dc) or {sc, dc} & {"int", "float", "bool", "ts"}:
                out["flags"].append(f"dtype[{c}]: spark={spdf[c].dtype} oracle={dpdf[c].dtype}")

    # exact value comparison, order-insensitive
    is_float = {c: _dtype_class(spdf[c].dtype) == "float" or _dtype_class(dpdf[c].dtype) == "float"
                for c in cols}

    def rows_of(df):
        recs = []
        for t in df[cols].itertuples(index=False, name=None):
            recs.append(tuple(_norm_cell(v if not (isinstance(v, float) and math.isnan(v)) else None,
                                         is_float[c])
                              for v, c in zip(t, cols)))
        return sorted(recs, key=lambda r: tuple((v is None, str(v)) for v in r))

    a, b = rows_of(spdf), rows_of(dpdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        out["flags"].append(f"values: first diffs {diffs}")
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    SF_DIR = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        args = args[1:]

    names = args or sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))

    spark = build_session(app_name="driver_protocol_check", master="local[8]",
                          shuffle_partitions=16)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    n_flagged = 0
    results = {}
    for name in names:
        try:
            r = check_query(spark, duck, name)
        except Exception as e:  # noqa: BLE001
            r = {"rows": None, "flags": [f"error: {type(e).__name__}: {e}"]}
        results[name] = r
        status = "OK" if not r["flags"] else "FLAG"
        if r["flags"]:
            n_flagged += 1
        print(f"{status:4s} {name} rows={r['rows']} {'; '.join(r['flags'])}", flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "checked": len(names), "flagged": n_flagged}))
    sys.exit(1 if n_flagged else 0)
