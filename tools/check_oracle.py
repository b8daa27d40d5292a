"""Driver-style comparator: run queries() vs oracle_sql() via DuckDB."""
import sys, json, hashlib, time
import numpy as np, pandas as pd, duckdb
import ray
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = sys.argv[2:] if len(sys.argv) > 2 else None
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def to_pandas(res):
    import pyarrow as pa, ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

def vhash(df):
    return hashlib.sha256(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()[:16]

qs = E.queries(); oss = E.oracle_sql()
names = only or list(qs)
for name in names:
    t0 = time.time()
    try:
        mine = canon(to_pandas(qs[name](sf_dir)))
        dt = time.time() - t0
        if name in oss:
            oracle = canon(con.sql(oss[name]).df())
            rows_ok = len(mine) == len(oracle)
            cols_ok = list(mine.columns) == list(oracle.columns)
            # compare with numeric tolerance via rounding float cols the same way both sides
            if rows_ok and cols_ok:
                eq = True
                for c in mine.columns:
                    a, b = mine[c].values, oracle[c].values
                    if np.issubdtype(mine[c].dtype, np.floating):
                        af, bf = a.astype(float), b.astype(float)
                        # bit-exact: the driver hashes values, 1 ulp flips it
                        same = (af == bf) | (np.isnan(af) & np.isnan(bf))
                        if not same.all(): eq = False; break
                    else:
                        if not (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all(): eq = False; break
                status = "MATCH" if eq else "VALUE-MISMATCH"
            else:
                status = f"SHAPE-MISMATCH rows {len(mine)}vs{len(oracle)} cols {list(mine.columns)}vs{list(oracle.columns)}"
            print(f"{name:24s} {status:16s} rows={len(mine)} {dt:.1f}s")
        else:
            print(f"{name:24s} ROWS-ONLY        rows={len(mine)} {dt:.1f}s")
    except Exception as e:
        print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:200]}")
ray.shutdown()

# Usage: python tools/check_oracle.py [sf_dir] [query ...]
# Side-by-side driver-style comparison of queries() vs oracle_sql().
