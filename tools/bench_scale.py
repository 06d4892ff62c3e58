#!/usr/bin/env python3
"""Build the BENCH_sf{N}.json scale artifact: per-entry wall-clock at the
blown-up scale vs the committed sf0.1 plan cost, with the 10x ratio that
grades near-linearity.

Usage: python3 tools/bench_scale.py <scale_detail.json> <sf01_detail.json> \
           <out.json> [--factor 10] [--purpose TEXT] [--note TEXT]

Both inputs are Bench detail files (SPARK_GRAFT_BENCH_OUT). Ratio semantics:
ratio = t_scale / t_sf01 on the same entry; near-linear scaling at factor F
reads ratio <= ~F (log-round iterative ops carry an extra log factor, fixed
driver/scheduling floors read ratio << 1 on sub-second entries). Entries
present only on one side are listed, not silently dropped.
"""
import sys, json, argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scale_detail")
    ap.add_argument("sf01_detail")
    ap.add_argument("out_json")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--purpose", default="sf1 (10x) wall-clock scale bench")
    ap.add_argument("--note", default="")
    a = ap.parse_args()
    big = json.load(open(a.scale_detail))
    ref = json.load(open(a.sf01_detail))
    bq = {k: v for k, v in big["queries"].items() if v is not None}
    rq = {k: v for k, v in ref["queries"].items() if v is not None}
    entries = {}
    for k in sorted(bq):
        e = {"t_scale": round(bq[k], 3)}
        if k in rq and rq[k] > 0:
            e["t_sf01"] = round(rq[k], 3)
            e["ratio"] = round(bq[k] / rq[k], 2)
        entries[k] = e
    ratios = [(e["ratio"], k) for k, e in entries.items() if "ratio" in e]
    # superlinear flags: only meaningful above the scheduling floor — a
    # 0.2s -> 3s swing is driver noise, not a plan property
    flagged = sorted([(r, k) for r, k in ratios
                      if r > 1.5 * a.factor and entries[k]["t_scale"] > 5.0],
                     reverse=True)
    med = sorted(r for r, _ in ratios)[len(ratios) // 2] if ratios else None
    out = {
        "purpose": a.purpose,
        "factor": a.factor,
        "note": a.note,
        "n_entries": len(entries),
        "total_scale_sec": round(sum(bq.values()), 1),
        "total_sf01_sec": round(sum(rq[k] for k in bq if k in rq), 1),
        "median_ratio": med,
        "max_ratio": max(ratios)[0] if ratios else None,
        "superlinear": [{"name": k, "ratio": r,
                         "t_scale": entries[k]["t_scale"]}
                        for r, k in flagged],
        "only_in_scale_run": sorted(k for k in bq if k not in rq),
        "failed_at_scale": sorted(k for k, v in big["queries"].items()
                                  if v is None),
        "entries": entries,
    }
    json.dump(out, open(a.out_json, "w"), indent=1, sort_keys=False)
    print(f"{len(entries)} entries, median ratio {med}, "
          f"{len(flagged)} superlinear -> {a.out_json}")


if __name__ == "__main__":
    main()
