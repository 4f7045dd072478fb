"""Local replica of the driver's correctness gate: every registry query vs
its DuckDB oracle — row count, schema (column names), and sorted value
equality (float-tolerant). Exits non-zero with a JSON summary of any
mismatching query.

    PYTHONPATH=. python scripts/oracle_check.py [sf_dir]   # default sf0.01
"""
import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as e  # noqa: E402
from nifi_nlp_processor_spark.session import build_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = build_session("xcheck_all", cores=16, shuffle_partitions=16)
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

queries = e.queries()
oracles = e.oracle_sql()


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


results = {}
for name, fn in queries.items():
    try:
        df = fn(spark, SF)
        cols = sorted(df.columns)
        srows = sorted(tuple(norm(r[c]) for c in cols) for r in df.collect())
        if name not in oracles:
            results[name] = {"spark_rows": len(srows), "oracle": "none"}
            print(f"{name}: rows={len(srows)} NO_ORACLE", flush=True)
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in sorted(ocols)]
        orows = sorted(tuple(norm(r[i]) for i in idx) for r in cur.fetchall())
        ok_rows = len(srows) == len(orows)
        ok_schema = cols == sorted(ocols)
        ok_vals = srows == orows
        if not ok_vals and ok_rows and ok_schema:
            # float-tolerant second pass
            def close(a, b):
                if isinstance(a, float) and isinstance(b, float):
                    return math.isclose(a, b, rel_tol=1e-5, abs_tol=1e-8)
                if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
                    return all(close(x, y) for x, y in zip(a, b))
                return a == b
            ok_vals = all(close(s, o) for s, o in zip(srows, orows))
        results[name] = {
            "rows_match": ok_rows, "schema_match": ok_schema, "vals_match": ok_vals,
            "spark_rows": len(srows), "oracle_rows": len(orows),
        }
        flag = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(f"{name}: {flag} rows={len(srows)}/{len(orows)}", flush=True)
    except Exception as ex:  # noqa: BLE001
        results[name] = {"err": str(ex)[:300]}
        print(f"{name}: ERR {str(ex)[:200]}", flush=True)

bad = {k: v for k, v in results.items()
       if v.get("err") or not (v.get("vals_match", True) and v.get("rows_match", True)
                               and v.get("schema_match", True))}
print(json.dumps({"total": len(results), "bad": bad}))
sys.exit(1 if bad else 0)
