"""Local replica of the driver's correctness gate.

Runs every __ray_entry__ query at an sf dir (default sf0.01) and
compares rows/schema/values against its oracle_sql() in DuckDB —
the same checks the driver records in CORRECTNESS_r{N}.json.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [query ...]
"""
import sys
import time

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)
sys.path.insert(0, "/root/repo")
import __ray_entry__ as m  # noqa: E402

SF = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        return res.to_pandas()
    return res


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows)


con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = m.queries()
oracles = m.oracle_sql()
only = sys.argv[1:]
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = to_df(fn(SF))
    except Exception as e:
        print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
        fails.append(name)
        continue
    sql = oracles.get(name)
    if sql is None:
        print(f"{name}: no_oracle rows={len(res)} ({time.time()-t0:.1f}s)")
        continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
        fails.append(name)
        continue
    rows_ok = len(res) == len(want)
    schema_ok = sorted(res.columns) == sorted(want.columns)
    vals_ok = schema_ok and canon(res) == canon(want)
    status = "OK" if (rows_ok and schema_ok and vals_ok) else "FAIL"
    print(f"{name}: {status} rows={len(res)}/{len(want)} "
          f"schema={schema_ok} vals={vals_ok} ({time.time()-t0:.1f}s)")
    if status == "FAIL":
        fails.append(name)
        if schema_ok:
            a, b = canon(res), canon(want)
            onlya = [r for r in a if r not in set(b)][:3]
            onlyb = [r for r in b if r not in set(a)][:3]
            print("   spark-only:", onlya)
            print("   oracle-only:", onlyb)
        else:
            print("   spark cols:", sorted(res.columns))
            print("   oracle cols:", sorted(want.columns))

print("\nFAILURES:", fails if fails else "none")
ray.shutdown()
