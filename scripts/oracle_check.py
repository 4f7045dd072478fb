"""Local replica of the driver's correctness gate: every registry query vs
its DuckDB oracle — row count, schema (column names), and BIT-EXACT sorted
value equality (the driver hashes raw values, so exact equality is the real
gate; a float-tolerant pass is reported separately as diagnostics only).

    PYTHONPATH=. python scripts/oracle_check.py [sf_dir] [--only a,b,c] [--strict]

``--only`` runs a comma-separated subset of registry queries.
``--strict`` additionally fails when any query lacks a DuckDB oracle
(oracle-coverage regression guard); NO_ORACLE count is always reported.
"""
import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as e  # noqa: E402
from nifi_nlp_processor_spark.session import build_session  # noqa: E402

args = [a for a in sys.argv[1:]]
STRICT = "--strict" in args
args = [a for a in args if a != "--strict"]
ONLY = None
if "--only" in args:
    i = args.index("--only")
    ONLY = set(args[i + 1].split(","))
    del args[i:i + 2]
SF = args[0] if args else "/root/testdata/sf0.01"

spark = build_session("xcheck_all", cores=16, shuffle_partitions=16)
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

queries = e.queries()
oracles = e.oracle_sql()


def key(v, digits):
    """Sort/compare key: floats rounded to ``digits`` (None = raw). NULLs
    sort first via an (is_present, value) pair — outer-join results carry
    None, which plain tuple comparison cannot order against values."""
    if v is None:
        return (0, 0)
    if isinstance(v, float):
        return (1, round(v, digits) if digits is not None else v)
    if isinstance(v, (list, tuple)):
        return (1, tuple(key(x, digits) for x in v))
    return (1, v)


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-5, abs_tol=1e-8)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(close(x, y) for x, y in zip(a, b))
    return a == b


results = {}
no_oracle = []
for name, fn in queries.items():
    if ONLY is not None and name not in ONLY:
        continue
    t0 = time.time()
    try:
        df = fn(spark, SF)
        cols = sorted(df.columns)
        sraw = [tuple(r[c] for c in cols) for r in df.collect()]
        if name not in oracles:
            no_oracle.append(name)
            results[name] = {"spark_rows": len(sraw), "oracle": "none"}
            print(f"{name}: rows={len(sraw)} NO_ORACLE", flush=True)
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in sorted(ocols)]
        oraw = [tuple(r[i] for i in idx) for r in cur.fetchall()]
        ok_rows = len(sraw) == len(oraw)
        ok_schema = cols == sorted(ocols)
        # the driver's gate: sort raw rows, hash — i.e. bit-exact equality
        s_exact = sorted(sraw, key=lambda r: key(r, None))
        o_exact = sorted(oraw, key=lambda r: key(r, None))
        ok_exact = s_exact == o_exact
        ok_tol = ok_exact
        if not ok_exact and ok_rows and ok_schema:
            # diagnostic tolerant pass: sort BOTH sides on coarsely-rounded
            # keys (4 digits, consistent with the 1e-5 tolerance) so rows
            # that differ only in float jitter still align positionally.
            s_tol = sorted(sraw, key=lambda r: key(r, 4))
            o_tol = sorted(oraw, key=lambda r: key(r, 4))
            ok_tol = all(close(s, o) for s, o in zip(s_tol, o_tol))
        results[name] = {
            "rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": ok_exact, "vals_close": ok_tol,
            "spark_rows": len(sraw), "oracle_rows": len(oraw),
        }
        flag = "OK" if (ok_rows and ok_schema and ok_exact) else (
            "CLOSE" if (ok_rows and ok_schema and ok_tol) else "FAIL")
        results[name]["sec"] = round(time.time() - t0, 2)
        print(f"{name}: {flag} rows={len(sraw)}/{len(oraw)} "
              f"{results[name]['sec']}s", flush=True)
    except Exception as ex:  # noqa: BLE001
        results[name] = {"err": str(ex)[:300]}
        print(f"{name}: ERR {str(ex)[:200]}", flush=True)

bad = {k: v for k, v in results.items()
       if v.get("err") or not (v.get("hash_match", True) and v.get("rows_match", True)
                               and v.get("schema_match", True))}
summary = {"total": len(results), "no_oracle": len(no_oracle),
           "no_oracle_names": no_oracle, "bad": bad}
print(json.dumps(summary))
sys.exit(1 if (bad or (STRICT and no_oracle)) else 0)
