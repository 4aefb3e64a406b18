#!/usr/bin/env python3
"""Bucketed aggregate-digest oracle compare, for oracles whose one-shot
DuckDB evaluation exhausts memory at sf10 (q86: the BPE merge-chain over
500k documents OOMs a 125 GB box — BASELINE round-14 tranche 4).

Requirement: the query must be PER-DOCUMENT INDEPENDENT — its result over
a doc_id-filtered `documents` view must equal the corresponding filter of
its full result. Then, because digest_check.py's `sum(hash(cols))` is
ADDITIVE over disjoint row sets, running the UNMODIFIED oracle SQL over
`documents WHERE doc_id % N = k` for every k and summing (count, hashsum)
equals the digest of the full oracle — each bucket holding only 1/N of
the working set. The Spark side is digested once over the full Verify
dump, exactly as digest_check.py does.

NOT valid for queries with cross-document state (vocab builds, corpus
aggregates, windows over doc order): a bucket-filtered run changes their
semantics, not just their memory. q86 qualifies: its merge table is a
pinned constant and every output row derives from one document.

Usage: digest_bucketed.py <sfDir> <verifyOutDir> <query> [nBuckets=16]
"""
import json, sys
from pathlib import Path
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    con = duckdb.connect()
    paths = {}
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            paths[t] = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{paths[t]}')")
    sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())[name]
    res = Path(out_dir) / name
    pat = f"{res}/*.parquet"
    cols = sorted(r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{pat}')").fetchall())
    collist = ", ".join(f'"{c}"' for c in cols)
    sd = con.execute(
        f"SELECT count(*), sum(hash({collist})) FROM read_parquet('{pat}')").fetchone()
    total_n, total_h = 0, 0
    for k in range(n_buckets):
        con.execute(
            f"CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM read_parquet('{paths['documents']}') WHERE doc_id % {n_buckets} = {k}")
        n, h = con.execute(f"SELECT count(*), sum(hash({collist})) FROM ({sql})").fetchone()
        total_n += n or 0
        total_h += h or 0
        print(f"  bucket {k}/{n_buckets}: n={n}", flush=True)
    od = (total_n, total_h)
    if sd == od:
        print(f"OK   {name}: bucketed digest match, {sd[0]} rows over {n_buckets} buckets")
        sys.exit(0)
    print(f"FAIL {name}: spark (n={sd[0]}, h={sd[1]}) vs bucketed oracle (n={od[0]}, h={od[1]})")
    sys.exit(1)


if __name__ == "__main__":
    main()
