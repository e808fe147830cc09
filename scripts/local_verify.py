#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
(done by caller via sbt), then compare each query's parquet output
against its DuckDB oracle on the same sf dir.

Usage: python3 scripts/local_verify.py <sfDir> <outDir> [query ...]
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        # mirror a tolerant-ish driver: repr of float; exactness still
        # required because we don't know the driver's tolerance
        return repr(v)
    return repr(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.md5(repr(data).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{pq}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        if sorted(got_cols) != sorted(want_cols):
            results[name] = f"SCHEMA: spark={sorted(got_cols)} oracle={sorted(want_cols)}"
        elif len(got) != len(want):
            results[name] = f"ROWS: spark={len(got)} oracle={len(want)}"
        elif table_hash(got, got_cols) != table_hash(want, want_cols):
            results[name] = "HASH_MISMATCH"
        else:
            results[name] = f"OK ({len(got)} rows)"
    bad = 0
    for k, v in sorted(results.items()):
        flag = " " if v.startswith("OK") else "X"
        if flag == "X":
            bad += 1
        print(f"[{flag}] {k}: {v}")
    print(f"\n{len(results) - bad}/{len(results)} oracle-checked queries match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
