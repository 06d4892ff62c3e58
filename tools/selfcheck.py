#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sf_dir> <verify_out_dir> [query ...]

Runs each oracle_sql.json entry in DuckDB against the sf_dir parquet tables,
loads the corresponding Spark result parquet, and compares schema + values
(columns sorted by name, rows sorted, floats compared exactly after the
queries' own rounding). Not part of the library.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    t = pq.read_table(path)
    return t

def gx_cc_unionfind(con, sql):
    """Exact alternate oracle for gx_cc above the driver's sf0.01 gate.

    The recursive min-label CTE is DuckDB-pathological at sf0.1+ (killed
    after ~5 CPU-hours in round 15), so at larger scales we replay the SAME
    union edge list (the non-recursive `ue` CTE prefix of the registered
    oracle SQL, still executed by DuckDB) through a Python union-find.
    Component label = lexicographic min key, identical to the CTE's
    min(label) over VARCHAR and to GraphXBridge.connectedComponents'
    reduceByKey min (all keys are ASCII).
    """
    cut = sql.find(", ud AS (")
    if cut < 0:
        raise RuntimeError("gx_cc oracle SQL shape changed; expected ', ud AS ('")
    edges = con.sql(sql[:cut] + " SELECT src, dst FROM ue").fetchall()
    # seed from the full node set (the CTE seeds `SELECT key, key FROM un`),
    # not just edge endpoints — an isolated node in the union graph would
    # otherwise show on the Spark side only and fail NROW spuriously
    nodes = [r[0] for r in con.sql(sql[:cut] + " SELECT key FROM un").fetchall()]
    parent = {k: k for k in nodes}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for s, d in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rd] = rs
    comp_min = {}
    for k in parent:
        r = find(k)
        if r not in comp_min or k < comp_min[r]:
            comp_min[r] = k
    rows = [(k, comp_min[find(k)]) for k in parent]
    return ["key", "component"], rows

# Alternate oracles applied ABOVE the driver's sf0.01 gate (sf dir basename
# not sf0.001/sf0.01): name -> fn(con, registered_sql) -> (cols, rows).
# Each replays the SAME algorithm the unrolled-CTE oracle encodes, over the
# same DuckDB-extracted inputs, when the CTE itself is DuckDB-pathological
# at 10x scale (recursive min-label CC, the louvain/greedy families).
# Populated further by gx_replays.py (imported at the bottom of this file).
ALTERNATES = {"gx_cc": gx_cc_unionfind}

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

# scale-replay oracles for the gx iterative/greedy families (round-17);
# kept in their own module so this file stays the compare loop
try:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gx_replays
    ALTERNATES.update(gx_replays.ALTERNATES)
except ImportError:
    pass

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; ScaleUp output is a Spark dir
        pat = p + "/*.parquet" if os.path.isdir(p) else p
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        st = load_spark(spark_path)
        if st is None:
            print(f"MISS  {name}: no spark result")
            n_bad += 1
            continue
        try:
            alt = ALTERNATES.get(name)
            if alt is not None and os.path.basename(
                    os.path.normpath(sf_dir)) not in ("sf0.001", "sf0.01"):
                print(f"NOTE  {name}: Python-replay alternate oracle (the "
                      "registered CTE is DuckDB-pathological above sf0.01)")
                dcols, drows = alt(con, sql)
            else:
                res = con.sql(sql)
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
        except Exception as e:
            print(f"OERR  {name}: {str(e).splitlines()[0][:160]}")
            n_bad += 1
            continue
        scols = st.schema.names
        srows = [tuple(r[c] for c in scols) for r in st.to_pylist()]
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"COLS  {name}: spark={sc} duck={dc}")
            n_bad += 1
            continue
        if len(sr) != len(dr):
            print(f"NROW  {name}: spark={len(sr)} duck={len(dr)}")
            n_bad += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"VALS  {name}: {len(bad)}/{len(sr)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_bad += 1
            continue
        print(f"OK    {name} ({len(sr)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
