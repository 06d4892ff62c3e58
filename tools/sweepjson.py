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
import sys, os, json, glob, argparse, threading
import duckdb
import pyarrow.parquet as pq


class _Budget:
    """Per-query DuckDB budget that keeps firing. A one-shot timer is not
    enough for the multi-statement replay alternates: if the deadline
    lands between two DuckDB calls (e.g. while numpy-converting the first
    fetch), the stale interrupt gets drained and the replay's NEXT
    construction-prefix query runs unbounded (gx_labelprop at sf10 ran
    55+ min past a 600s budget, r17). Re-fires every 30s after the
    deadline until cancelled; cancel() before any drain query."""

    def __init__(self, sec, con, flag):
        self.con, self.flag = con, flag
        self.done = threading.Event()
        self.lock = threading.Lock()
        self.t = threading.Timer(sec, self._fire)
        self.t.daemon = True
        self.t.start()

    def _fire(self):
        # The lock + done-check close the cancel/fire race: without them a
        # _fire already past cancel()'s done.set() could interrupt the
        # connection AFTER the query finished, aborting the NEXT query
        # with timed_out=False (graded OERR spuriously). cancel() blocks
        # on the lock until an in-flight _fire completes, so it always
        # cancels the newest timer.
        with self.lock:
            if self.done.is_set():
                return
            self.flag[0] = True
            try:
                self.con.interrupt()
            except Exception:
                pass
            self.t = threading.Timer(30, self._fire)
            self.t.daemon = True
            self.t.start()

    def cancel(self):
        self.done.set()
        with self.lock:
            self.t.cancel()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir"); ap.add_argument("out_dir"); ap.add_argument("out_json")
    ap.add_argument("--purpose", default="scale-robustness oracle sweep")
    ap.add_argument("--rows-only", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout-sec", type=float, default=0,
                    help="per-query DuckDB budget; on expiry the query is "
                         "interrupted and graded rows-only instead")
    ap.add_argument("--mem-limit", default="",
                    help="DuckDB memory_limit (e.g. 64GB) — prevents the "
                         "OOM killer taking the whole sweep down")
    ap.add_argument("--resume", action="store_true",
                    help="skip queries already recorded in out_json (the "
                         "sweep dumps incrementally, so an OOM-killed run "
                         "resumes where it died)")
    a = ap.parse_args()
    rows_only = set(x for x in a.rows_only.split(",") if x)
    only = set(x for x in a.only.split(",") if x)
    def fresh_con():
        c = duckdb.connect()
        if a.mem_limit:
            c.sql(f"SET memory_limit='{a.mem_limit}'")
            c.sql("SET temp_directory='/tmp/duckdb_sweep_tmp'")
        for t in selfcheck.TABLES:
            p = f"{a.sf_dir}/{t}.parquet"
            # driver fixtures are single files; ScaleUp output is a Spark dir
            pat = p + "/*.parquet" if os.path.isdir(p) else p
            if os.path.exists(p):
                c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
        return c

    con = fresh_con()
    oracle = json.load(open(f"{a.out_dir}/oracle_sql.json"))
    res, n_ok, n_bad = {}, 0, 0
    if a.resume and os.path.exists(a.out_json):
        res = json.load(open(a.out_json)).get("queries", {})
        n_ok = sum(1 for v in res.values() if v.get("ok"))
        n_bad = len(res) - n_ok
        print(f"RESUME {len(res)} prior results ({n_ok} ok)")

    def dump():
        json.dump({"purpose": a.purpose, "sf_dir": a.sf_dir, "n_ok": n_ok,
                   "n_bad": n_bad, "queries": res},
                  open(a.out_json, "w"), indent=1, sort_keys=True)

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if a.resume and name in res:
            continue
        spark_path = f"{a.out_dir}/{name}"
        if not glob.glob(os.path.join(spark_path, "*.parquet")):
            res[name] = {"status": "MISS", "ok": False}; n_bad += 1; dump(); continue
        st = pq.read_table(spark_path)
        if name in rows_only:
            ok = st.num_rows > 0
            res[name] = {"status": "ROWS_ONLY", "ok": ok, "rows": st.num_rows}
            n_ok += ok; n_bad += not ok; dump()
            print(("OK    " if ok else "EMPTY ") + f"{name} (rows-only, {st.num_rows} rows)")
            continue
        def run_oracle(c):
            alt = selfcheck.ALTERNATES.get(name)
            if alt is not None and os.path.basename(
                    os.path.normpath(a.sf_dir)) not in ("sf0.001", "sf0.01"):
                return alt(c, sql)
            r = c.sql(sql)
            return [d[0] for d in r.description], r.fetchall()

        timer, timed_out = None, [False]
        if a.timeout_sec > 0:
            timer = _Budget(a.timeout_sec, con, timed_out)
        try:
            dcols, drows = run_oracle(con)
        except Exception as e:
            if timer is not None:
                timer.cancel()
            is_oom = isinstance(e, duckdb.OutOfMemoryException) or \
                "Out of Memory Error" in str(e)
            if is_oom and not timed_out[0]:
                # an OOM can be prior-query allocator pollution rather than
                # this query's real footprint — retry once on a fresh
                # connection before conceding the rows-only fallback
                # (r16: q1_agg "OOM'd" at a trivial 6M-row aggregation)
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_con()
                timer2 = None
                if a.timeout_sec > 0:
                    timer2 = _Budget(a.timeout_sec, con, timed_out)
                try:
                    dcols, drows = run_oracle(con)
                    e = None
                except Exception as e2:
                    e = e2
                finally:
                    if timer2 is not None:
                        timer2.cancel()
            # budget expiry or engine OOM: the ORACLE can't run at this
            # scale — grade the Spark result rows-only, honestly labeled
            if e is not None:
                is_oom = isinstance(e, duckdb.OutOfMemoryException) or \
                    "Out of Memory Error" in str(e)
                if timed_out[0] or is_oom:
                    why = "TIMEOUT" if timed_out[0] else "ORACLE_OOM"
                    ok = st.num_rows > 0
                    res[name] = {"status": f"{why}_ROWS_ONLY", "ok": ok,
                                 "rows": st.num_rows}
                    n_ok += ok; n_bad += not ok; dump()
                    print(("OK    " if ok else "EMPTY ") +
                          f"{name} ({why.lower()} rows-only, {st.num_rows} rows)")
                else:
                    res[name] = {"status": "OERR", "ok": False,
                                 "err": str(e).splitlines()[0][:160]}
                    n_bad += 1; dump(); print(f"OERR  {name}: {str(e).splitlines()[0][:120]}")
                if timer is not None:
                    # an interrupt may have landed after the query finished
                    # (or on the fresh connection) even when timed_out was
                    # never observed — drain unconditionally so a stale
                    # interrupt can't abort the NEXT query
                    try:
                        con.sql("SELECT 1").fetchall()
                    except Exception:
                        con = fresh_con()
                continue
        finally:
            if timer is not None:
                timer.cancel()
        if timer is not None:
            # drain unconditionally after every budgeted query: the timer
            # may have fired just as the query completed (flag set or not) —
            # a stale interrupt must not reach the next loop iteration
            try:
                con.sql("SELECT 1").fetchall()
            except Exception:
                con = fresh_con()
        scols = st.schema.names
        srows = [tuple(r[c] for c in scols) for r in st.to_pylist()]
        sc, sr = selfcheck.norm_rows(scols, srows)
        dc, dr = selfcheck.norm_rows(dcols, drows)
        if sc != dc:
            res[name] = {"status": "COLS", "ok": False}; n_bad += 1; dump()
            print(f"COLS  {name}: spark={sc} duck={dc}"); continue
        if len(sr) != len(dr):
            res[name] = {"status": "NROW", "ok": False,
                         "spark": len(sr), "duck": len(dr)}
            n_bad += 1; dump(); print(f"NROW  {name}: spark={len(sr)} duck={len(dr)}"); continue
        bad = [(x, y) for x, y in zip(sr, dr) if x != y]
        if bad:
            res[name] = {"status": "VALS", "ok": False, "n_bad": len(bad)}
            n_bad += 1; dump()
            print(f"VALS  {name}: {len(bad)}/{len(sr)}; first spark={bad[0][0]} duck={bad[0][1]}")
            continue
        res[name] = {"status": "OK", "ok": True, "rows": len(sr)}
        n_ok += 1; dump(); print(f"OK    {name} ({len(sr)} rows)")
    dump()
    print(f"\n{n_ok} ok, {n_bad} bad -> {a.out_json}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
