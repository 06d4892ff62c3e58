#!/usr/bin/env python3
"""Dev-only scale-sweep artifact writer: the selfcheck.py compare loop with
JSON output (the SELFCHECK_sf01.json / SELFCHECK_sf1.json artifact format).

Usage: python3 tools/sweepjson.py <sf_dir> <verify_out_dir> <out_json> \
           [--purpose TEXT] [--rows-only q1,q2] [--only q3,q4,...]

--only (comma-separated, if given) limits the sweep. --rows-only names queries
checked for row count > 0 only (oracles that cannot run at this scale);
everything else runs the full DuckDB compare, with selfcheck.py's gx_cc
union-find alternate applied above sf0.01.
"""
import sys, os, json, glob, argparse
import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir"); ap.add_argument("out_dir"); ap.add_argument("out_json")
    ap.add_argument("--purpose", default="scale-robustness oracle sweep")
    ap.add_argument("--rows-only", default="")
    ap.add_argument("--only", default="")
    a = ap.parse_args()
    rows_only = set(x for x in a.rows_only.split(",") if x)
    only = set(x for x in a.only.split(",") if x)
    con = duckdb.connect()
    for t in selfcheck.TABLES:
        p = f"{a.sf_dir}/{t}.parquet"
        # driver fixtures are single files; ScaleUp output is a Spark dir
        pat = p + "/*.parquet" if os.path.isdir(p) else p
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{a.out_dir}/oracle_sql.json"))
    res, n_ok, n_bad = {}, 0, 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = f"{a.out_dir}/{name}"
        if not glob.glob(os.path.join(spark_path, "*.parquet")):
            res[name] = {"status": "MISS", "ok": False}; n_bad += 1; continue
        st = pq.read_table(spark_path)
        if name in rows_only:
            ok = st.num_rows > 0
            res[name] = {"status": "ROWS_ONLY", "ok": ok, "rows": st.num_rows}
            n_ok += ok; n_bad += not ok
            print(("OK    " if ok else "EMPTY ") + f"{name} (rows-only, {st.num_rows} rows)")
            continue
        try:
            if name == "gx_cc" and os.path.basename(
                    os.path.normpath(a.sf_dir)) not in ("sf0.001", "sf0.01"):
                dcols, drows = selfcheck.gx_cc_unionfind(con, sql)
            else:
                r = con.sql(sql)
                dcols = [d[0] for d in r.description]
                drows = r.fetchall()
        except Exception as e:
            res[name] = {"status": "OERR", "ok": False,
                         "err": str(e).splitlines()[0][:160]}
            n_bad += 1; print(f"OERR  {name}"); continue
        scols = st.schema.names
        srows = [tuple(r[c] for c in scols) for r in st.to_pylist()]
        sc, sr = selfcheck.norm_rows(scols, srows)
        dc, dr = selfcheck.norm_rows(dcols, drows)
        if sc != dc:
            res[name] = {"status": "COLS", "ok": False}; n_bad += 1
            print(f"COLS  {name}: spark={sc} duck={dc}"); continue
        if len(sr) != len(dr):
            res[name] = {"status": "NROW", "ok": False,
                         "spark": len(sr), "duck": len(dr)}
            n_bad += 1; print(f"NROW  {name}: spark={len(sr)} duck={len(dr)}"); continue
        bad = [(x, y) for x, y in zip(sr, dr) if x != y]
        if bad:
            res[name] = {"status": "VALS", "ok": False, "n_bad": len(bad)}
            n_bad += 1
            print(f"VALS  {name}: {len(bad)}/{len(sr)}; first spark={bad[0][0]} duck={bad[0][1]}")
            continue
        res[name] = {"status": "OK", "ok": True, "rows": len(sr)}
        n_ok += 1; print(f"OK    {name} ({len(sr)} rows)")
    out = {"purpose": a.purpose, "sf_dir": a.sf_dir, "n_ok": n_ok,
           "n_bad": n_bad, "queries": res}
    json.dump(out, open(a.out_json, "w"), indent=1, sort_keys=True)
    print(f"\n{n_ok} ok, {n_bad} bad -> {a.out_json}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
