#!/usr/bin/env python3
"""Pin STAGED == PLAIN for the q172 oracle at a given sf (VERDICT r15
item 6): the sf10 certification rests on the staged decomposition
(q172_sf10_staged.py), whose equality to the monolithic oracle SQL was
previously pinned only at sf0.01. This script runs BOTH forms in DuckDB
on the same fixtures and compares them row-for-row, so the staged sf10
gate rests on a two-decade equivalence once run at sf1.

Usage: q172_staged_vs_plain.py <sfDir> <oracle_sql.json>
(the json is Verify's dump; the plain SQL is read from it VERBATIM so
this pin can never drift from the declared oracle text).
"""
import json, sys, time
from pathlib import Path

import duckdb

MIN_PAIR_COUNT = 2
TOP_PAIRS = 50


def view(con, sf_dir, name):
    p = Path(sf_dir) / f"{name}.parquet"
    pat = f"{p}/*.parquet" if p.is_dir() else str(p)
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")


def staged(con):
    con.execute("DROP TABLE IF EXISTS items"); con.execute("DROP TABLE IF EXISTS nb")
    con.execute("DROP TABLE IF EXISTS ic"); con.execute("DROP TABLE IF EXISTS pairs")
    con.execute(
        "CREATE TEMP TABLE items AS "
        "SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem")
    con.execute("CREATE TEMP TABLE nb AS SELECT COUNT(DISTINCT basket) AS n FROM items")
    con.execute("CREATE TEMP TABLE ic AS SELECT item, COUNT(*) AS cnt FROM items GROUP BY item")
    con.execute(
        "CREATE TEMP TABLE pairs AS "
        "SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_count "
        "FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item "
        "GROUP BY a.item, b.item "
        f"HAVING COUNT(*) >= {MIN_PAIR_COUNT}")
    return con.execute(
        "SELECT p.item_a, p.item_b, p.pair_count, "
        "       ca.cnt AS cnt_a, cb.cnt AS cnt_b, "
        "       round(p.pair_count / CAST(nb.n AS DOUBLE), 6) AS support, "
        "       round(p.pair_count / CAST(ca.cnt AS DOUBLE), 6) AS confidence, "
        "       round(p.pair_count * CAST(nb.n AS DOUBLE) / (ca.cnt * cb.cnt), 6) AS lift "
        "FROM pairs p "
        "JOIN ic ca ON ca.item = p.item_a "
        "JOIN ic cb ON cb.item = p.item_b "
        "CROSS JOIN nb "
        "ORDER BY p.pair_count DESC, lift DESC, p.item_a, p.item_b "
        f"LIMIT {TOP_PAIRS}").fetchdf()


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    plain_sql = json.load(open(oracle_json))["q172_market_basket"]
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    view(con, sf_dir, "lineitem")

    t0 = time.time()
    plain = con.execute(plain_sql).fetchdf()
    t_plain = time.time() - t0
    t0 = time.time()
    st = staged(con)
    t_staged = time.time() - t0

    cols = sorted(plain.columns)
    if sorted(st.columns) != cols:
        print(f"FAIL q172 staged-vs-plain: columns differ {sorted(st.columns)} vs {cols}")
        sys.exit(1)
    a = plain.reindex(cols, axis=1).sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    b = st.reindex(cols, axis=1).sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    if len(a) != len(b):
        print(f"FAIL q172 staged-vs-plain: rows {len(a)} vs {len(b)}")
        sys.exit(1)
    for c in cols:
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if (ak == "f") != (bk == "f"):
            print(f"FAIL q172 staged-vs-plain: dtype kind mismatch in {c} ({a[c].dtype} vs {b[c].dtype})")
            sys.exit(1)
        same = (abs(a[c].values.astype(float) - b[c].values.astype(float)) < 1e-12).all() \
            if ak == "f" else bool((a[c].values == b[c].values).all())
        if not same:
            print(f"FAIL q172 staged-vs-plain: values differ in {c}")
            sys.exit(1)
    print(f"OK   q172 staged == plain: {len(a)} rows, {len(cols)} cols "
          f"(plain {t_plain:.1f}s, staged {t_staged:.1f}s)")


if __name__ == "__main__":
    main()
