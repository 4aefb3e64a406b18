#!/usr/bin/env python3
"""Local dev-loop correctness check mimicking the driver's DuckDB oracle
compare: for each result parquet dumped by graft.Verify, run the matching
oracle SQL in DuckDB over the fixture tables and diff values.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, os, sys, math
import duckdb
import numpy as np
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    # Bug-compatible with the driver harness: sort columns by name, then
    # pandas sort_values over ALL columns with NO normalization of list/array
    # cells — an ArrayType output column raises `unhashable type:
    # numpy.ndarray` exactly as CORRECTNESS_r01.json recorded, so local green
    # predicts driver green (VERDICT r1 item 3).
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def _is_int(x) -> bool:
    return isinstance(x, (int, np.integer)) and not isinstance(x, (bool, np.bool_))

def _is_float(x) -> bool:
    return isinstance(x, (float, np.floating))

def values_equal(a, b) -> bool:
    # The driver's value hash is TYPE-sensitive: DuckDB HUGEINT surfacing as
    # float64 0.0 vs Spark long 0 fails it, but numpy's `0 == 0.0` is true —
    # that masking shipped q69 red in round 6 (VERDICT r6 item 2). Reject
    # int-vs-float cross-type equality outright.
    if (_is_int(a) and _is_float(b)) or (_is_float(a) and _is_int(b)):
        return False
    if _is_float(a) and _is_float(b):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # DuckDB's default thread count on this box degrades to ~1-core
    # progress on the largest sf10 aggregates (q172's 120M-pair group-by
    # ran 5x faster pinned at 16 threads); opt-in knob, default untouched
    # so the driver-mimicking behavior is unchanged.
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads TO {int(thr)}")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # GenScale fixtures are Spark-written DIRECTORIES of part files;
            # the driver's testdata are single files — support both
            pat = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        spark_df = pq.read_table(str(res_dir)).to_pandas()
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        try:
            s, d = norm_df(spark_df), norm_df(duck_df)
        except Exception as e:
            print(f"FAIL {name}: harness err (driver would also err): {e}")
            failures += 1
            continue
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns differ spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        # Dtype-kind diff: catches numeric-type drift (e.g. DuckDB HUGEINT →
        # float64 vs Spark int64) even where every value happens to compare
        # equal numerically. Kind-level ('i' vs 'f'), not width-level, so
        # int32-vs-int64 doesn't false-alarm.
        kind_bad = [(c, s[c].dtype, d[c].dtype) for c in s.columns
                    if s[c].dtype.kind != d[c].dtype.kind
                    and not (s[c].dtype.kind in "iuf" and d[c].dtype.kind == "O" and d[c].isna().any())
                    and not (d[c].dtype.kind in "iuf" and s[c].dtype.kind == "O" and s[c].isna().any())]
        if kind_bad:
            c, sk, dk = kind_bad[0]
            print(f"FAIL {name}: dtype drift col {c}: spark={sk} duck={dk}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: row counts differ spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        bad = None
        for i in range(len(s)):
            for c in s.columns:
                if not values_equal(s.iloc[i][c], d.iloc[i][c]):
                    bad = (i, c, s.iloc[i][c], d.iloc[i][c])
                    break
            if bad:
                break
        if bad:
            i, c, sv, dv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={sv!r} duck={dv!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s)} rows, {len(s.columns)} cols")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
