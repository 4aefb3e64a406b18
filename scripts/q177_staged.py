#!/usr/bin/env python3
"""q177 large-sf certification via BLOCKED-STAGE decomposition.

The declared q177 oracle is the naive dominance NOT EXISTS — O(n²) by
construction (deliberately independent of the engine's decomposition),
fine at the sf0.01 driver gate (2k parts) but ~4·10^10 predicate
evaluations at sf1. This script restates the SAME computation with an
x-bucket pre-filter (the q172 staged precedent: same answer, explicit
materialization/blocking boundaries, sanity-pinned staged == plain at a
small sf via --pin-plain):

  * per x-bucket (y,z) fronts bound the cross-bucket dominator set — any
    earlier-bucket dominator is itself (y,z)-dominated by a front member
    of its bucket, which then also dominates the probe row (its x is
    strictly smaller by bucket disjointness);
  * the same-bucket test stays the exact pair predicate, bucket²-bounded.

The ORACLE-side bucket width is independent of the engine's (any width
partitions the same answer); 1.0 keeps sf10's same-bucket blocks small.

Usage: q177_staged.py <sfDir> <verifyOutDir> [--pin-plain]
Prints the check.py OK/FAIL line shape.
"""
import sys, time
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

WIDTH = 1.0


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    pin_plain = "--pin-plain" in sys.argv[3:]
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    p = Path(sf_dir) / "part.parquet"
    pat = f"{p}/*.parquet" if p.is_dir() else str(p)
    con.execute(f"CREATE VIEW part AS SELECT * FROM read_parquet('{pat}')")

    t0 = time.time()
    con.execute(
        "CREATE TEMP TABLE pts AS "
        "SELECT p_partkey AS id, p_retailprice AS x, CAST(p_size AS BIGINT) AS y, "
        f"       CAST(length(p_name) AS BIGINT) AS z, CAST(floor(p_retailprice / {WIDTH}) AS BIGINT) AS bk "
        "FROM part")
    con.execute(
        "CREATE TEMP TABLE front AS "
        "SELECT bk AS f_bk, y AS f_y, ymax AS f_z FROM ("
        "  SELECT bk, y, ymax, MAX(ymax) OVER (PARTITION BY bk ORDER BY y DESC "
        "         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS zpref"
        "  FROM (SELECT bk, y, MAX(z) AS ymax FROM pts GROUP BY bk, y)"
        ") WHERE zpref IS NULL OR ymax > zpref")
    con.execute(
        "CREATE TEMP TABLE cross_safe AS "
        "SELECT p.* FROM pts p WHERE NOT EXISTS ("
        "  SELECT 1 FROM front f WHERE f.f_bk < p.bk AND f.f_y >= p.y AND f.f_z >= p.z)")
    duck = con.execute(
        "SELECT id, x, y, z FROM cross_safe p WHERE NOT EXISTS ("
        "  SELECT 1 FROM pts q WHERE q.bk = p.bk AND q.x <= p.x AND q.y >= p.y AND q.z >= p.z"
        "    AND (q.x < p.x OR q.y > p.y OR q.z > p.z)) "
        "ORDER BY x, id").fetchdf()
    t_staged = time.time() - t0

    if pin_plain:
        t0 = time.time()
        plain = con.execute(
            "WITH r AS (SELECT p_partkey AS id, p_retailprice AS x, CAST(p_size AS BIGINT) AS y, "
            "           CAST(length(p_name) AS BIGINT) AS z FROM part) "
            "SELECT id, x, y, z FROM r p WHERE NOT EXISTS ("
            "  SELECT 1 FROM r q WHERE q.x <= p.x AND q.y >= p.y AND q.z >= p.z"
            "    AND (q.x < p.x OR q.y > p.y OR q.z > p.z)) "
            "ORDER BY x, id").fetchdf()
        t_plain = time.time() - t0
        if not plain.equals(duck):
            print("FAIL q177 staged-vs-plain: result sets differ")
            sys.exit(1)
        print(f"OK   q177 staged == plain: {len(duck)} rows "
              f"(staged {t_staged:.1f}s, plain {t_plain:.1f}s)")

    spark = pq.read_table(str(Path(out_dir) / "q177_skyline_3d")).to_pandas()
    cols = sorted(spark.columns)
    s = spark.reindex(cols, axis=1).sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    d = duck.reindex(cols, axis=1).sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    if list(s.columns) != list(d.columns) or len(s) != len(d):
        print(f"FAIL q177_skyline_3d: shape spark={s.shape} duck={d.shape}")
        sys.exit(1)
    for c in cols:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        if (sk == "f") != (dk == "f"):
            print(f"FAIL q177_skyline_3d: dtype kind mismatch in {c} "
                  f"(spark={s[c].dtype}, duck={d[c].dtype})")
            sys.exit(1)
        same = (abs(s[c].values.astype(float) - d[c].values.astype(float)) < 1e-12).all() \
            if sk == "f" else bool((s[c].values == d[c].values).all())
        if not same:
            print(f"FAIL q177_skyline_3d: values differ in col {c}")
            sys.exit(1)
    print(f"OK   q177_skyline_3d: {len(s)} rows, {len(cols)} cols "
          f"(staged oracle, {t_staged:.1f}s)")


if __name__ == "__main__":
    main()
