#!/usr/bin/env python3
"""Aggregate-digest oracle compare for results too large for check.py's
row-by-row Python loop (VERDICT r13 item 4: q31 at sf10 = 100M rows).

Both digests are computed INSIDE DuckDB — `count(*)` plus the
order-independent `sum(hash(col1, col2, …))` over the name-sorted column
list — once over the Verify parquet dump, once over the oracle SQL, so no
result row ever crosses the Python boundary. The hash sum is exact
(UBIGINT hashes summed into HUGEINT), which makes this a STRICTER compare
than check.py for float columns: it has no 1e-9 tolerance, so use it only
for outputs whose values are bit-determined (carried-through column
values, integer arithmetic, or values rounded identically on both sides).

Usage: digest_check.py <sfDir> <verifyOutDir> <query...>
"""
import json, sys
from pathlib import Path
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            pat = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in queries:
        sql = oracle.get(name)
        res = Path(out_dir) / name
        if sql is None or not res.exists():
            print(f"FAIL {name}: missing oracle sql or spark result dir")
            failures += 1
            continue
        pat = f"{res}/*.parquet"
        try:
            cols = sorted(r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{pat}')").fetchall())
            collist = ", ".join(f'"{c}"' for c in cols)
            sd = con.execute(
                f"SELECT count(*), sum(hash({collist})) FROM read_parquet('{pat}')").fetchone()
            od = con.execute(
                f"SELECT count(*), sum(hash({collist})) FROM ({sql})").fetchone()
        except Exception as e:
            print(f"FAIL {name}: digest error: {e}")
            failures += 1
            continue
        if sd == od:
            print(f"OK   {name}: digest match, {sd[0]} rows")
        else:
            print(f"FAIL {name}: spark (n={sd[0]}, h={sd[1]}) vs oracle (n={od[0]}, h={od[1]})")
            failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
