#!/usr/bin/env python3
"""Validator for tools/gx_replays.py: at a small SF (where the registered
CTE oracle still runs) every replay must produce EXACTLY the registered
SQL's result — same columns, same rows. Run before trusting a sweep that
substitutes the replays at 10x scale.

Usage: python3 tools/test_gx_replays.py <sf_dir> <oracle_sql.json> [q ...]
"""
import sys, os, json, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gx_replays
import selfcheck


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in selfcheck.TABLES:
        p = f"{sf_dir}/{t}.parquet"
        pat = p + "/*.parquet" if os.path.isdir(p) else p
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(oracle_path))
    n_ok = n_bad = 0
    for name in sorted(gx_replays.ALTERNATES):
        if only and name not in only:
            continue
        sql = oracle[name]
        ref = con.sql(sql)
        rcols = [d[0] for d in ref.description]
        rrows = ref.fetchall()
        t0 = time.time()
        try:
            cols, rows = gx_replays.ALTERNATES[name](con, sql)
        except Exception as e:
            print(f"ERR   {name}: {str(e).splitlines()[0][:140]}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if cols != rcols:
            print(f"COLS  {name}: replay={cols} sql={rcols}")
            n_bad += 1
            continue
        if sorted(map(tuple, rows)) != sorted(map(tuple, rrows)):
            sr, rr = sorted(map(tuple, rows)), sorted(map(tuple, rrows))
            diff = next(((a, b) for a, b in zip(sr, rr) if a != b),
                        (("len", len(sr)), ("len", len(rr))))
            print(f"VALS  {name}: replay={diff[0]} sql={diff[1]}")
            n_bad += 1
            continue
        print(f"OK    {name} ({len(rows)} rows, {dt:.2f}s)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
