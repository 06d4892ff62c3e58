#!/usr/bin/env python3
"""Scale-replay alternate oracles for the gx iterative/greedy families.

Registered into selfcheck.ALTERNATES (applied only ABOVE the driver's
sf0.01 gate). Each replay executes the registered oracle SQL's own
construction prefix in DuckDB (so the replayed algorithm runs over exactly
the inputs the oracle declares), then runs the iterative algebra in
numpy/Python where the unrolled-CTE form is DuckDB-pathological at 10x
scale. All arithmetic is the oracles' integer fixed-point algebra:
  - integer SUMS stay far below 2^53, so float64 bincount accumulation is
    EXACT and results cast back to int64; gain/stat PRODUCTS can exceed
    2^53 and are always computed in int64 (max ~1e17 < 2^63);
  - node ids are assigned in lexicographically sorted key order, so the
    oracles' VARCHAR min / tie-break laws become integer comparisons;
  - the md5-derived hash60 family replays exactly via hashlib.
Every replay raises on an unrecognized SQL shape (fail-closed: the sweep
grades OERR, never a silent pass). Each function is validated against the
registered SQL itself at sf0.001 and sf0.01 by tools/test_gx_replays.py.
"""
import hashlib
import math
import re
import numpy as np


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _prefix(sql, marker):
    cut = sql.find(marker)
    if cut < 0:
        raise RuntimeError(f"oracle SQL shape changed; expected '{marker}'")
    return sql[:cut]


def _ids(keys):
    """Sorted-key id assignment: integer order == lexicographic order."""
    ks = sorted(keys)
    return ks, {k: i for i, k in enumerate(ks)}


# per-process memo: the louvain/LPA family shares one construction prefix,
# so a full sweep re-fetches and re-derives the same base repeatedly —
# keyed by the prefix TEXT, so any SQL change is a cache miss by definition
_MEMO = {}


def _union_edges(con, sql, marker):
    """Execute the oracle's own prefix for the directed edge list `ue`
    and the node set `un`. Memoized per prefix text."""
    pre = _prefix(sql, marker)
    hit = _MEMO.get(("ue", pre))
    if hit is not None:
        return hit
    edges = con.sql(pre + " SELECT src, dst FROM ue").fetchall()
    nodes = [r[0] for r in con.sql(pre + " SELECT key FROM un").fetchall()]
    ks, idx = _ids(nodes)
    src = np.fromiter((idx[s] for s, _ in edges), dtype=np.int64,
                      count=len(edges))
    dst = np.fromiter((idx[d] for _, d in edges), dtype=np.int64,
                      count=len(edges))
    _MEMO[("ue", pre)] = (ks, src, dst)
    return ks, src, dst


def _exact_sum(to, weights, minlength):
    """Exact integer segmented sum (values < 2^53) via float64 bincount."""
    return np.bincount(to, weights=weights.astype(np.float64),
                       minlength=minlength).astype(np.int64)


# ------------------------------------------------------------------ HITS
def gx_hits(con, sql):
    """3 unrolled HITS rounds: raw sums along ue, per-round max-rescale to
    ~1e6 via BIGINT floor division (missing keys read 0)."""
    ks, src, dst = _union_edges(con, sql, ", h0 AS ")
    n = len(ks)

    def push(v, frm, to):
        raw = _exact_sum(to, v[frm], n)
        mx = raw.max() if n else 0
        return raw // max(mx // 1000000, 1)

    h = np.full(n, 1000000, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(3):
        a = push(h, src, dst)
        h = push(a, dst, src)
    return ["key", "hub", "auth"], [(ks[i], int(h[i]), int(a[i]))
                                    for i in range(n)]


# ------------------------------------------------------------- PAGERANK-FP
def gx_pagerank_fp(con, sql):
    """5 unrolled integer fixed-point pagerank rounds over the directed
    union graph: r0 = 1e9; r_{t+1}(d) = 150000000 + (85 * inc) // 100 with
    inc(d) = SUM over in-edges of r_t(s) // od(s), missing inc reads 0.
    All-int64 algebra; total rank mass stays ~n*1e9 << 2^53, so the
    float64 bincount segmented sum is exact."""
    if "CAST(150000000 + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT)" \
            not in sql or \
            "SELECT key, r AS rank_fp FROM r5 ORDER BY key" not in sql:
        raise RuntimeError("pagerank_fp oracle shape changed")
    ks, src, dst = _union_edges(con, sql, ", od AS ")
    n = len(ks)
    od = np.bincount(src, minlength=n).astype(np.int64)
    ods = od[src]  # per-edge out-degree of the source (>= 1 by construction)
    r = np.full(n, 1000000000, dtype=np.int64)
    for _ in range(5):
        inc = _exact_sum(dst, r[src] // ods, n)
        r = 150000000 + (85 * inc) // 100
    return ["key", "rank_fp"], [(ks[i], int(r[i])) for i in range(n)]


# ------------------------------------------------------------------- LPA
def _sym_edges(src, dst):
    """The ud CTE: DISTINCT symmetrized directed pairs, self-loops out."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    keep = s != d
    s, d = s[keep], d[keep]
    pair = np.unique(np.stack([s, d], axis=1), axis=0)
    return pair[:, 0], pair[:, 1]


def _lpa_round(n, s, d, lab):
    """One synchronous LPA round: per dst the incoming label maximizing
    (cnt, -label) i.e. min(struct(-cnt, label)); no in-edges -> own key."""
    el = lab[s]
    pairs = np.stack([d, el], axis=1)
    uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
    ud, ul = uniq[:, 0], uniq[:, 1]
    order = np.lexsort((ul, -cnt, ud))
    ud_o, ul_o = ud[order], ul[order]
    first = np.ones(len(ud_o), dtype=bool)
    first[1:] = ud_o[1:] != ud_o[:-1]
    out = np.arange(n, dtype=np.int64)
    out[ud_o[first]] = ul_o[first]
    return out


def _lpa5(n, src, dst):
    s, d = _sym_edges(src, dst)
    lab = np.arange(n, dtype=np.int64)
    for _ in range(5):
        lab = _lpa_round(n, s, d, lab)
    return lab


def gx_labelprop(con, sql):
    """5 unrolled synchronous LPA rounds over the symmetrized union graph,
    most-frequent incoming label, ties to the lexicographic min."""
    ks, src, dst = _union_edges(con, sql, ", ud AS ")
    lab = _lpa5(len(ks), src, dst)
    return ["key", "label"], [(ks[i], ks[lab[i]]) for i in range(len(ks))]


# ------------------------------------------------------- louvain algebra
def _und_pairs(src, dst):
    """lvund: DISTINCT (least, greatest) pairs, self-loops out."""
    u = np.minimum(src, dst)
    v = np.maximum(src, dst)
    keep = u != v
    pair = np.unique(np.stack([u[keep], v[keep]], axis=1), axis=0)
    return pair[:, 0], pair[:, 1]


def _wsum_pairs(key_a, key_b, w, n_hint=None):
    """Group (a, b) pairs, summing w exactly. Returns (a, b, w) arrays."""
    pairs = np.stack([key_a, key_b], axis=1)
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    ws = _exact_sum(inv, w, len(uniq))
    return uniq[:, 0], uniq[:, 1], ws


class _Louvain:
    """One synchronous louvain move pass over weighted undirected edges
    (u, v, w; u == v self-loops allowed), labels `lab` defined on the id
    universe [0, nn). Mirrors GraphOps.weightedLouvainSql exactly.
    Exposes the intermediate stats the stat-audit oracles read."""

    def __init__(self, nn, u, v, w, lab):
        self.nn, self.u, self.v, self.w, self.lab = nn, u, v, w, lab
        self.m = int(w.sum())
        self.ki = (_exact_sum(u, w, nn) + _exact_sum(v, w, nn))
        # deg rows exist only for edge endpoints
        self.present = np.zeros(nn, dtype=bool)
        self.present[u] = True
        self.present[v] = True
        self.dsum = _exact_sum(lab[self.present.nonzero()[0]],
                               self.ki[self.present], nn)
        # adj excludes self-loops
        nl = u != v
        ak = np.concatenate([u[nl], v[nl]])
        ab = np.concatenate([v[nl], u[nl]])
        aw = np.concatenate([w[nl], w[nl]])
        lk, ll, lw = _wsum_pairs(ak, lab[ab], aw)
        self.lic_k, self.lic_l, self.lic_w = lk, ll, lw

    def move(self):
        """Returns (keys, label0, label1, gain_num) over the base rows
        (labels ∩ deg), keys ascending."""
        nodes = self.present.nonzero()[0]
        l0 = self.lab[nodes]
        ki = self.ki[nodes]
        da = self.dsum[l0]
        # lown per node: lic at own label
        lown = np.zeros(self.nn, dtype=np.int64)
        own = self.lic_l == self.lab[self.lic_k]
        lown[self.lic_k[own]] = self.lic_w[own]
        # candidates: lic rows with nbl != own label
        cmask = ~own
        ck, cl, cw = (self.lic_k[cmask], self.lic_l[cmask],
                      self.lic_w[cmask])
        gain = (4 * self.m * (cw - lown[ck])
                - 2 * self.ki[ck] * (self.dsum[cl] - self.dsum[self.lab[ck]]
                                     + self.ki[ck]))
        order = np.lexsort((cl, -gain, ck))
        ck_o, cl_o, g_o = ck[order], cl[order], gain[order]
        first = np.ones(len(ck_o), dtype=bool)
        first[1:] = ck_o[1:] != ck_o[:-1]
        best_l = np.full(self.nn, -1, dtype=np.int64)
        best_g = np.zeros(self.nn, dtype=np.int64)
        best_l[ck_o[first]] = cl_o[first]
        best_g[ck_o[first]] = g_o[first]
        mv = best_g[nodes] > 0
        label1 = np.where(mv, best_l[nodes], l0)
        gain_num = np.where(mv, best_g[nodes], 0)
        return nodes, l0, label1, gain_num


def _louvain_base(con, sql):
    """Shared prefix of the louvain-family oracles: union edges, LPA-5
    labels, the unweighted lvund pass state. Memoized per prefix text —
    eight oracles ride the identical base at sweep time."""
    pre = _prefix(sql, ", ud AS ")
    hit = _MEMO.get(("lvbase", pre))
    if hit is not None:
        return hit
    ks, src, dst = _union_edges(con, sql, ", ud AS ")
    n = len(ks)
    l5 = _lpa5(n, src, dst)
    u, v = _und_pairs(src, dst)
    lv = _Louvain(n, u, v, np.ones(len(u), dtype=np.int64), l5)
    out = (ks, n, l5, u, v, lv)
    _MEMO[("lvbase", pre)] = out
    return out


def gx_louvain1(con, sql):
    ks, n, l5, u, v, lv = _louvain_base(con, sql)
    nodes, l0, l1, g = lv.move()
    return (["key", "label0", "label1", "gain_num"],
            [(ks[k], ks[a], ks[b], int(gn))
             for k, a, b, gn in zip(nodes, l0, l1, g)])


def gx_conductance(con, sql):
    ks, n, l5, u, v, lv = _louvain_base(con, sql)
    nodes, l0, l1, g = lv.move()
    lbl = np.full(n, -1, dtype=np.int64)
    lbl[nodes] = l1
    n_nodes = np.bincount(l1, minlength=n)
    vol = _exact_sum(l1, lv.ki[nodes], n)
    e_in = _exact_sum(lbl[u][lbl[u] == lbl[v]],
                      np.ones(int((lbl[u] == lbl[v]).sum()), dtype=np.int64),
                      n)
    rows = []
    for c in sorted(set(l1.tolist())):
        cut = int(vol[c]) - 2 * int(e_in[c])
        denom = min(int(vol[c]), 2 * lv.m - int(vol[c]))
        cond = (1000 * cut) // denom if denom > 0 else 0
        rows.append((ks[c], int(n_nodes[c]), int(vol[c]), cut, int(cond)))
    return ["label", "n_nodes", "vol", "cut", "cond_milli"], rows


def gx_modularity(con, sql):
    """LPA-5 labels over ALL un nodes (isolated singletons included),
    per-community e_in / deg_sum / q_num and the one-float-step total."""
    ks, src, dst = _union_edges(con, sql, ", ud AS ")
    n = len(ks)
    l5 = _lpa5(n, src, dst)
    u, v = _und_pairs(src, dst)
    m = len(u)
    deg = (np.bincount(u, minlength=n)
           + np.bincount(v, minlength=n)).astype(np.int64)
    n_nodes = np.bincount(l5, minlength=n)
    same = l5[u] == l5[v]
    e_in = np.bincount(l5[u][same], minlength=n).astype(np.int64)
    deg_sum = _exact_sum(l5, deg, n)
    labels = sorted(set(l5.tolist()))
    q_num = {c: 4 * m * int(e_in[c]) - int(deg_sum[c]) * int(deg_sum[c])
             for c in labels}
    q_tot = sum(q_num.values())
    q_micro = int(math.floor(1000000.0 * float(q_tot)
                             / ((4.0 * float(m)) * float(m))))
    return (["label", "n_nodes", "e_in", "deg_sum", "m_edges", "q_num",
             "q_total_micro"],
            [(ks[c], int(n_nodes[c]), int(e_in[c]), int(deg_sum[c]), m,
              q_num[c], q_micro) for c in labels])


def gx_coarsen(con, sql):
    ks, src, dst = _union_edges(con, sql, ", ud AS ")
    n = len(ks)
    l5 = _lpa5(n, src, dst)
    u, v = _und_pairs(src, dst)
    ca = np.minimum(l5[u], l5[v])
    cb = np.maximum(l5[u], l5[v])
    a, b, w = _wsum_pairs(ca, cb, np.ones(len(ca), dtype=np.int64))
    return (["ca", "cb", "n_edges"],
            [(ks[x], ks[y], int(c)) for x, y, c in zip(a, b, w)])


def gx_louvain_q(con, sql):
    ks, n, l5, u, v, lv = _louvain_base(con, sql)
    nodes, l0, l1, g = lv.move()
    m = lv.m
    dsq_b = int(sum(int(d) * int(d) for d in lv.dsum[lv.dsum != 0]))
    same_b = l5[u] == l5[v]
    intra_b = int(same_b.sum())
    lbl = np.full(n, -1, dtype=np.int64)
    lbl[nodes] = l1
    ds_a = _exact_sum(l1, lv.ki[nodes], n)
    dsq_a = int(sum(int(d) * int(d) for d in ds_a[ds_a != 0]))
    intra_a = int((lbl[u] == lbl[v]).sum())
    moved = int((l0 != l1).sum())
    s_b = 4 * m * intra_b - dsq_b
    s_a = 4 * m * intra_a - dsq_a
    return (["m_edges", "intra_before", "dsq_before", "s_before",
             "intra_after", "dsq_after", "s_after", "s_delta", "n_moved"],
            [(m, intra_b, dsq_b, s_b, intra_a, dsq_a, s_a, s_a - s_b,
              moved)])


def gx_louvain_w(con, sql):
    """Weighted chain: w = hash60(u || '|' || v) % 100 + 1 on the
    canonical pair (the md5 family replays exactly in hashlib)."""
    ks, src, dst = _union_edges(con, sql, ", ud AS ")
    n = len(ks)
    l5 = _lpa5(n, src, dst)
    u, v = _und_pairs(src, dst)
    w = np.fromiter((_h60(ks[a] + "|" + ks[b]) % 100 + 1
                     for a, b in zip(u, v)), dtype=np.int64, count=len(u))
    lv = _Louvain(n, u, v, w, l5)
    nodes, l0, l1, g = lv.move()
    return (["key", "label0", "label1", "gain_num"],
            [(ks[k], ks[a], ks[b], int(gn))
             for k, a, b, gn in zip(nodes, l0, l1, g)])


def _contract(u, v, w, lab_u, lab_v):
    """Weighted contraction: group by (least, greatest) of endpoint
    labels, summing w — self-loop supernode edges kept."""
    ca = np.minimum(lab_u, lab_v)
    cb = np.maximum(lab_u, lab_v)
    return _wsum_pairs(ca, cb, w)


def _level2(ks, n, u, v, lv):
    """lvout -> l2e contraction -> weighted move on supernodes. Returns
    (lbl1 over universe, level-2 Louvain object, its move outputs)."""
    nodes, l0, l1, g = lv.move()
    lbl1 = np.full(n, -1, dtype=np.int64)
    lbl1[nodes] = l1
    a2, b2, w2 = _contract(u, v, np.ones(len(u), dtype=np.int64),
                           lbl1[u], lbl1[v])
    ident = np.arange(n, dtype=np.int64)
    lv2 = _Louvain(n, a2, b2, w2, ident)
    return (nodes, l0, l1, g, lbl1, a2, b2, w2, lv2) + lv2.move()


def gx_louvain2(con, sql):
    ks, n, l5, u, v, lv = _louvain_base(con, sql)
    (nodes, l0, l1, g, lbl1, a2, b2, w2, lv2,
     n2, l20, l21, g2) = _level2(ks, n, u, v, lv)
    lab2 = np.full(n, -1, dtype=np.int64)
    lab2[n2] = l21
    return (["key", "label1", "label2"],
            [(ks[k], ks[b], ks[lab2[b]]) for k, b in zip(nodes, l1)])


def gx_louvain_cc(con, sql):
    """Leiden repair: union-find over the intra-community edge subset,
    label_cc = min key of the component; per label distinct part count."""
    ks, n, l5, u, v, lv = _louvain_base(con, sql)
    nodes, l0, l1, g = lv.move()
    lbl = np.full(n, -1, dtype=np.int64)
    lbl[nodes] = l1
    same = lbl[u] == lbl[v]
    parent = list(range(n))

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in zip(u[same].tolist(), v[same].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min = {}
    for k in nodes.tolist():
        r = find(k)
        if r not in comp_min or k < comp_min[r]:
            comp_min[r] = k
    label_cc = {k: comp_min[find(k)] for k in nodes.tolist()}
    parts = {}
    for k in nodes.tolist():
        parts.setdefault(int(lbl[k]), set()).add(label_cc[k])
    return (["key", "label", "label_cc", "n_parts"],
            [(ks[k], ks[int(lbl[k])], ks[label_cc[k]],
              len(parts[int(lbl[k])])) for k in nodes.tolist()])


def _level3(ks, n, u, v, lv):
    """The three-level chain shared by gx_louvain_n and gx_louvain_nq."""
    (nodes, l0, l1, g, lbl1, a2, b2, w2, lv2,
     n2, l20, l21, g2) = _level2(ks, n, u, v, lv)
    lab2 = np.full(n, -1, dtype=np.int64)
    lab2[n2] = l21
    a3, b3, w3 = _contract(a2, b2, w2, lab2[a2], lab2[b2])
    lv3 = _Louvain(n, a3, b3, w3, np.arange(n, dtype=np.int64))
    n3, l30, l31, g3 = lv3.move()
    lab3 = np.full(n, -1, dtype=np.int64)
    lab3[n3] = l31
    return nodes, l0, l1, lbl1, l20, l21, lab2, l30, l31, lab3


def gx_louvain_n(con, sql):
    ks, n, l5, u, v, lv = _louvain_base(con, sql)
    (nodes, l0, l1, lbl1, l20, l21, lab2,
     l30, l31, lab3) = _level3(ks, n, u, v, lv)
    m1 = int((l0 != l1).sum())
    m2 = int((l20 != l21).sum())
    m3 = int((l30 != l31).sum())
    return (["key", "label1", "label2", "label3",
             "moved1", "moved2", "moved3"],
            [(ks[k], ks[b], ks[lab2[b]], ks[lab3[lab2[b]]], m1, m2, m3)
             for k, b in zip(nodes, l1)])


def gx_louvain_nq(con, sql):
    ks, n, l5, u, v, lv = _louvain_base(con, sql)
    (nodes, l0, l1, lbl1, l20, l21, lab2,
     l30, l31, lab3) = _level3(ks, n, u, v, lv)
    m = lv.m

    def stats(lab_per_node):
        ds = _exact_sum(lab_per_node, lv.ki[nodes], n)
        dsq = int(sum(int(d) * int(d) for d in ds[ds != 0]))
        full = np.full(n, -1, dtype=np.int64)
        full[nodes] = lab_per_node
        intra = int((full[u] == full[v]).sum())
        return 4 * m * intra - dsq

    s_l0 = stats(l5[nodes])
    s_l1 = stats(l1)
    nql3 = lab3[lab2[l1]]
    s_l3 = stats(nql3)
    return (["m_edges", "s_l0", "s_l1", "s_l3"], [(m, s_l0, s_l1, s_l3)])


# ------------------------------------------------------------------- WL
def _wl_labels(n, u, v, rounds):
    """WL refinement over the undirected pair graph: per round
    l' = hash60(str(l) + '|' + ','.join(neighbor ls sorted numerically)).
    Only edge-endpoint nodes participate. Returns list of per-round label
    dicts (id -> int label)."""
    adj = {}
    for a, b in zip(u.tolist(), v.tolist()):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {k: 0 for k in adj}
    out = []
    for _ in range(rounds):
        nxt = {}
        for k, nbs in adj.items():
            sig = (str(lab[k]) + "|"
                   + ",".join(str(x) for x in sorted(lab[b] for b in nbs)))
            nxt[k] = _h60(sig)
        lab = nxt
        out.append(lab)
    return out


def gx_wl(con, sql):
    ks, src, dst = _union_edges(con, sql, ", wlu AS ")
    u, v = _und_pairs(src, dst)
    l1, l2, l3 = _wl_labels(len(ks), u, v, 3)
    keys = sorted(l1)
    return (["key", "l1", "l2", "l3"],
            [(ks[k], l1[k], l2[k], l3[k]) for k in keys])


def _round_half_up(x):
    return int(math.floor(x * 1000000.0 + 0.5))


def _partition_pair(con, sql, marker):
    """The shared gx_ari / gx_nmi prefix: LPA-5 labels (la) vs WL-1
    labels (lb) on edge-endpoint nodes."""
    ks, src, dst = _union_edges(con, sql, ", ud AS ")
    n = len(ks)
    l5 = _lpa5(n, src, dst)
    u, v = _und_pairs(src, dst)
    (wl1,) = _wl_labels(n, u, v, 1)
    rows = [(l5[k], wl1[k]) for k in sorted(wl1)]
    return rows


def gx_ari(con, sql):
    rows = _partition_pair(con, sql, ", arpa AS ")
    nn = len(rows)
    ct = {}
    for la, lb in rows:
        ct[(la, lb)] = ct.get((la, lb), 0) + 1
    ai, bj = {}, {}
    for (la, lb), c in ct.items():
        ai[la] = ai.get(la, 0) + c
        bj[lb] = bj.get(lb, 0) + c
    sij = sum(c * (c - 1) // 2 for c in ct.values())
    sa = sum(a * (a - 1) // 2 for a in ai.values())
    sb = sum(b * (b - 1) // 2 for b in bj.values())
    nc2 = nn * (nn - 1) // 2
    exp = float(sa) * float(sb) / float(nc2)
    denom = float(sa + sb) / 2.0 - exp
    ari = 0 if denom == 0 else int(
        math.floor(1000000 * (float(sij) - exp) / denom))
    return (["n", "sij", "sa", "sb", "nc2", "ari_micro"],
            [(nn, sij, sa, sb, nc2, ari)])


def gx_nmi(con, sql):
    rows = _partition_pair(con, sql, ", arpa AS ")
    nn = len(rows)
    ct = {}
    for la, lb in rows:
        ct[(la, lb)] = ct.get((la, lb), 0) + 1
    ai, bj = {}, {}
    for (la, lb), c in ct.items():
        ai[la] = ai.get(la, 0) + c
        bj[lb] = bj.get(lb, 0) + c
    ln_n = _round_half_up(math.log(nn))
    lnr = lambda x: _round_half_up(math.log(x))
    i_num = sum(c * (lnr(c) + ln_n - lnr(ai[la]) - lnr(bj[lb]))
                for (la, lb), c in ct.items())
    h_a = sum(a * (ln_n - lnr(a)) for a in ai.values())
    h_b = sum(b * (ln_n - lnr(b)) for b in bj.values())
    nmi = 0 if h_a + h_b == 0 else int(
        math.floor(1000000.0 * (2.0 * float(i_num)) / float(h_a + h_b)))
    return (["n", "i_num", "h_a", "h_b", "nmi_micro"],
            [(nn, i_num, h_a, h_b, nmi)])


# ------------------------------------------------- landmark BFS families
def _landmarks(ks, salt, k):
    """ORDER BY hash60(key || salt), key LIMIT k — md5 replay."""
    return [key for _, key in
            sorted(((_h60(key + salt), key) for key in ks))[:k]]


def _bfs_sigma(n, s, d, start, depth):
    """BFS with shortest-path counts from `start`, frontier-based,
    `depth` rounds (the unrolled bwf chain). Returns (dist, sigma) with
    dist = -1 for unreached."""
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.int64)
    dist[start] = 0
    sigma[start] = 1
    frontier = np.array([start], dtype=np.int64)
    for r in range(1, depth + 1):
        on = np.isin(s, frontier)
        if not on.any():
            break
        raw = _exact_sum(d[on], sigma[s[on]], n)
        new = (raw > 0) & (dist < 0)
        if not new.any():
            break
        dist[new] = r
        sigma[new] = raw[new]
        frontier = new.nonzero()[0]
    return dist, sigma


def gx_betweenness(con, sql):
    """3 md5-ordered landmarks, depth-3 BFS with path counts; per node the
    Σ sf·sb over landmark pairs where it sits on a shortest i→j path."""
    ks, src, dst = _union_edges(con, sql, ", uebw AS ")
    n = len(ks)
    s, d = _sym_edges(src, dst)
    lms = _landmarks(ks, "lm", 3)
    idx = {k: i for i, k in enumerate(ks)}
    runs = [_bfs_sigma(n, s, d, idx[lm], 3) for lm in lms]
    paths = np.zeros(n, dtype=np.int64)
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            di, si = runs[i]
            dj, sj = runs[j]
            both = (di >= 0) & (dj >= 0)
            if not both.any():
                continue
            tot = di[both] + dj[both]
            dij = tot.min()
            onpath = both.copy()
            onpath[both] = (tot == dij)
            onpath &= (di > 0) & (dj > 0)
            paths[onpath] += si[onpath] * sj[onpath]
    return (["key", "n_paths_through"],
            [(ks[i], int(paths[i])) for i in range(n) if paths[i] > 0])


def gx_bipartite(con, sql):
    """4 md5-ordered landmarks, radius-4 BFS distances; per landmark the
    count of within-radius edges whose endpoint distances have equal
    parity (odd-cycle witnesses)."""
    ks, src, dst = _union_edges(con, sql, ", udc AS ")
    n = len(ks)
    s, d = _sym_edges(src, dst)
    u, v = _und_pairs(src, dst)
    lms = _landmarks(ks, "lm", 4)
    idx = {k: i for i, k in enumerate(ks)}
    rows = []
    for lm in lms:
        dist = np.full(n, -1, dtype=np.int64)
        dist[idx[lm]] = 0
        frontier = np.array([idx[lm]], dtype=np.int64)
        for r in range(1, 5):
            on = np.isin(s, frontier)
            nxt = np.unique(d[on])
            nxt = nxt[dist[nxt] < 0]
            if len(nxt) == 0:
                break
            dist[nxt] = r
            frontier = nxt
        reached = int((dist >= 0).sum())
        both = (dist[u] >= 0) & (dist[v] >= 0)
        conf = int(((dist[u[both]] + dist[v[both]]) % 2 == 0).sum())
        rows.append((lm, reached, conf, conf == 0))
    rows.sort(key=lambda r: r[0])
    return (["landmark", "n_reached", "n_conflicts",
             "bipartite_in_radius"], rows)


# ------------------------------------------------------------ HyperANF
def gx_anf_growth(con, sql):
    """HyperANF growth curve: 16 md5-derived registers per endpoint node
    (j = h%16, r = trailing-zeros(h//16)+1 capped at 40), three cumulative
    neighborhood max-merge rounds, per-round corpus aggregates. A register
    (key, j) exists only where some node in the ball hashes to j — absent
    registers carry the 2^40 completion term."""
    ks, src, dst = _union_edges(con, sql, ", agu AS ")
    n = len(ks)
    u, v = _und_pairs(src, dst)
    ak = np.concatenate([u, v])
    ab = np.concatenate([v, u])
    members = np.zeros(n, dtype=bool)
    members[u] = True
    members[v] = True
    reg = np.zeros((n, 16), dtype=np.int64)  # 0 = absent
    for i in members.nonzero()[0].tolist():
        h = _h60(ks[i])
        x = h // 16
        r = 40 if x == 0 else min((x & -x).bit_length(), 40)
        reg[i, h % 16] = r
    rows = []
    for rnd in (1, 2, 3):
        acc = reg.copy()
        np.maximum.at(acc, ak, reg[ab])
        reg = acc
        mem = members.nonzero()[0]
        rr = reg[mem]
        nnz = (rr > 0).sum(axis=1).astype(np.int64)
        reg_sum = rr.sum(axis=1)
        est = (np.where(rr > 0, np.int64(1) << (40 - rr), 0).sum(axis=1)
               + (16 - nnz) * (np.int64(1) << 40))
        rows.append((rnd, int(len(mem)), int(reg_sum.sum()),
                     int(est.sum())))
    return ["round", "n_nodes", "tot_reg", "tot_est_num"], rows


# ---------------------------------------------------------- Adamic-Adar
def gx_adamic(con, sql):
    """Hub-capped Adamic–Adar top-100: per common neighbor w with
    2 <= deg(w) <= p90 cap, aa(w) = round(1e6 / ln(deg)); per (a < b)
    pair the Σ aa and common count over shared capped neighbors. Wedges
    enumerate vectorized per offset within sorted neighbor groups; pair
    aggregation is one np.unique over a*n+b keys."""
    ks, src, dst = _union_edges(con, sql, ", aud AS ")
    n = len(ks)
    s, d = _sym_edges(src, dst)
    deg = np.bincount(s, minlength=n).astype(np.int64)
    # DuckDB quantile_cont over the deg rows (nodes appearing in aud)
    degs = np.sort(deg[deg > 0]).astype(np.float64)
    q = 0.9 * (len(degs) - 1)
    lo = int(math.floor(q))
    cap = degs[lo] + (q - lo) * (degs[min(lo + 1, len(degs) - 1)] - degs[lo])
    keep = (deg >= 2) & (deg <= cap)
    aa = np.zeros(n, dtype=np.int64)
    kn = keep.nonzero()[0]
    aa[kn] = [int(math.floor(1000000.0 / math.log(x) + 0.5))
              for x in deg[kn]]
    # wedge hubs: sorted adjacency of capped nodes, neighbors ascending
    on = keep[s]
    ws, wd = s[on], d[on]
    order = np.lexsort((wd, ws))
    ws, wd = ws[order], wd[order]
    sizes = np.bincount(ws, minlength=n)[ws]  # group size per row
    pos = np.arange(len(ws)) - np.concatenate(
        ([0], np.cumsum(np.bincount(ws, minlength=n))))[ws]
    total_pairs = int((deg[kn] * (deg[kn] - 1) // 2).sum())
    if total_pairs > 500_000_000:
        raise RuntimeError(f"gx_adamic replay: {total_pairs} wedges "
                           "exceed the in-memory budget")
    key_parts, w_parts = [], []
    max_d = int(deg[kn].max()) if len(kn) else 0
    for k in range(1, max_d):
        m = pos + k < sizes
        if not m.any():
            break
        i = m.nonzero()[0]
        a = wd[i]
        b = wd[i + k]  # same group (pos+k < size), b > a by sort order
        key_parts.append(a * n + b)
        w_parts.append(aa[ws[i]])
    if key_parts:
        keys = np.concatenate(key_parts)
        wts = np.concatenate(w_parts)
        uk, inv = np.unique(keys, return_inverse=True)
        score = _exact_sum(inv, wts, len(uk))
        common = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        a, b = uk // n, uk % n
        top = sorted(zip((-score).tolist(), a.tolist(), b.tolist(),
                         score.tolist(), common.tolist()))[:100]
        rows = [(ks[x[1]], ks[x[2]], x[3], x[4]) for x in top]
    else:
        rows = []
    return ["a", "b", "score_micro", "common"], rows


# ---------------------------------------------------------------- MSF
def gx_msf(con, sql):
    """4 unrolled Boruvka rounds: per component the min cross edge by
    struct(w, u, v, cu, cv); pointer-double the successor graph with a
    running lexical min (16 steps); component label = min of the jump
    target. Weights from the oracle's own bwe prefix."""
    pre = _prefix(sql, "bl0 AS MATERIALIZED")
    pre = pre.rstrip().rstrip(",")
    rows = con.sql(pre + " SELECT u, v, w FROM bwe").fetchall()
    nodes = [r[0] for r in con.sql(pre + " SELECT key FROM un").fetchall()]
    ks, idx = _ids(nodes)
    n = len(ks)
    eu = np.fromiter((idx[a] for a, _, _ in rows), dtype=np.int64,
                     count=len(rows))
    ev = np.fromiter((idx[b] for _, b, _ in rows), dtype=np.int64,
                     count=len(rows))
    ew = np.fromiter((w for _, _, w in rows), dtype=np.int64,
                     count=len(rows))
    comp = np.arange(n, dtype=np.int64)
    forest = []
    for rnd in range(1, 5):
        cu, cv = comp[eu], comp[ev]
        cross = cu != cv
        if not cross.any():
            break
        xu, xv, xw = eu[cross], ev[cross], ew[cross]
        xcu, xcv = cu[cross], cv[cross]
        # per component c (as cu or cv) the min struct(w,u,v,cu,cv)
        cc = np.concatenate([xcu, xcv])
        mw = np.concatenate([xw, xw])
        mu = np.concatenate([xu, xu])
        mv = np.concatenate([xv, xv])
        mcu = np.concatenate([xcu, xcu])
        mcv = np.concatenate([xcv, xcv])
        order = np.lexsort((mcv, mcu, mv, mu, mw, cc))
        first = np.ones(len(cc), dtype=bool)
        cc_o = cc[order]
        first[1:] = cc_o[1:] != cc_o[:-1]
        sel = order[first]
        q_c, q_u, q_v = cc_o[first], mu[sel], mv[sel]
        q_w, q_cu, q_cv = mw[sel], mcu[sel], mcv[sel]
        # forest edges this round: DISTINCT (u, v, w) of the chosen
        fuvw = sorted(set((int(a), int(b), int(w))
                          for a, b, w in zip(q_u, q_v, q_w)))
        forest.extend((ks[a], ks[b], w, rnd) for a, b, w in fuvw)
        # successor graph on CURRENT components; pointer-double with min
        succ = {}
        for c, ecu, ecv in zip(q_c.tolist(), q_cu.tolist(), q_cv.tolist()):
            succ[c] = ecv if c == ecu else ecu
        comps = np.unique(comp)
        jump = {c: succ.get(c, c) for c in comps.tolist()}
        mn = dict(jump)
        for _ in range(16):
            jump2 = {c: jump[jump[c]] for c in jump}
            mn = {c: min(mn[c], mn[jump[c]]) for c in jump}
            jump = jump2
        rep = {c: mn[jump[c]] for c in jump}
        comp = np.fromiter((rep[c] for c in comp.tolist()), dtype=np.int64,
                           count=n)
    forest.sort(key=lambda r: (r[0], r[1]))
    return ["u", "v", "w", "round"], forest


# ================================================================ dedup/ANN
# Replays for the minhash-LSH and cosine families, whose registered SQL is
# DuckDB-pathological at 10x scale for a DIFFERENT reason than the gx CTEs:
# the `sh` shingle CTE re-evaluates regexp_split_to_array(trim(text)) per
# lambda element (O(words^2) string work per document), and e_near_dup's
# all-pairs list_cosine_similarity join is O(n^2 * dims) in the row engine.
# The replays keep every DuckDB-semantics-bearing step IN DuckDB (trim +
# regexp_split per document — one split each, not words^2) and run the
# hash/linear algebra in hashlib/numpy:
#   - md5 replays exactly (hashlib), so shingle hashes, band values and the
#     hash60 family are bit-identical;
#   - minhash lane mins are int64 affine-mod arithmetic (a*h+b < 2^52);
#   - est_sim = matches/32 is an exact 5-decimal binary fraction, so the
#     SQL's round(.,6) is the identity on it;
#   - list_cosine_similarity is a SEQUENTIAL per-dim fold with denominator
#     sqrt(nx)*sqrt(ny) (probed vs DuckDB: 300/300 bit-exact) — replayed by
#     vectorizing ACROSS pairs and looping over dims, which preserves each
#     pair's accumulation order exactly;
#   - DuckDB round(x, p) on DOUBLE is std::round(x*10^p)/10^p with
#     half-away-from-zero ties — the multiply's own IEEE rounding can land
#     exactly on .5 halves (probed: 0/400k mismatches, incl. the 2.675->2.68
#     family that shortest-repr decimal models get wrong).


def _round_half_away(x, p):
    """DuckDB round(DOUBLE, p): std::round(x * 10^p) / 10^p."""
    pw = float(10 ** p)
    v = x * pw
    a = abs(v)
    f = math.floor(a)
    r = f + (a - f >= 0.5)
    return (r if v >= 0 else -r) / pw


def _round4_np(v):
    """Vectorized _round_half_away(., 4) over a float64 array."""
    w = v * 10000.0
    a = np.abs(w)
    f = np.floor(a)
    r = f + (a - f >= 0.5)
    return np.copysign(r, w) / 10000.0


def _uf_min_label(edges, keys):
    """The oracles' recursive min-label reach CC: component min over the
    symmetric edge set. Returns {key: min_label_of_component} for keys
    that appear in `keys` (ints compare like the SQL's BIGINT min)."""
    parent = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for k in keys:
        parent.setdefault(k, k)
    for s, t in edges:
        parent.setdefault(s, s)
        parent.setdefault(t, t)
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    return {k: find(k) for k in parent}


_SH_MARKERS = (
    "unnest((CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) < 3 "
    "THEN [trim(text)]",
    "CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT)",
    "FROM documents",
)


def _minhash_sigs(con, sql):
    """Replay the sh -> hs -> sig -> bands chain of the minhash oracles:
    per-document 3-shingles (DuckDB's own trim + regexp_split, ONE split per
    document), md5-derived 32-bit shingle hashes, 32 affine-mod minhash
    lanes (constants parsed from the SQL), and the 8 band md5 values.
    Returns (doc_ids sorted, sig int64 [n,32], bands {(band, val): [ids]}).
    Memoized per parsed-constant set."""
    for m in _SH_MARKERS:
        if m not in sql:
            raise RuntimeError(f"minhash oracle shape changed; expected {m!r}")
    lanes = re.findall(
        r"min\(\((\d+) \* h \+ (\d+)\) % (\d+)\) AS mh_(\d+)", sql)
    if len(lanes) != 32 or [int(l[3]) for l in lanes] != list(range(32)):
        raise RuntimeError("minhash oracle shape changed: expected mh_0..31")
    mods = {int(l[2]) for l in lanes}
    if len(mods) != 1:
        raise RuntimeError("minhash oracle shape changed: mixed moduli")
    mod = mods.pop()
    band_defs = re.findall(r"(\d+) AS band, md5\((.*?)\) AS band_val", sql)
    bands_lanes = [(int(b), [int(x) for x in re.findall(r"mh_(\d+)", expr)])
                   for b, expr in band_defs]
    if sorted(b for b, _ in bands_lanes) != list(range(8)) or \
            any(len(ls) != 4 for _, ls in bands_lanes):
        raise RuntimeError("minhash oracle shape changed: expected 8x4 bands")
    key = ("mhsig", tuple(tuple(int(x) for x in l) for l in lanes),
           tuple((b, tuple(ls)) for b, ls in bands_lanes))
    hit = _MEMO.get(key)
    if hit is not None:
        return hit
    rows = con.sql(
        "SELECT doc_id, trim(text), "
        r"regexp_split_to_array(trim(text), '\s+') "
        "FROM documents ORDER BY doc_id").fetchall()
    doc_ids = [r[0] for r in rows]
    starts, all_h = [], []
    pos = 0
    for _, t, w in rows:
        if len(w) < 3:
            sh = {t}
        else:
            sh = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        starts.append(pos)
        pos += len(sh)
        for s in sh:
            all_h.append(
                int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big"))
    h = np.array(all_h, dtype=np.int64)
    starts = np.array(starts, dtype=np.int64)
    sig = np.empty((len(doc_ids), 32), dtype=np.int64)
    for a, b, _, i in ((int(x[0]), int(x[1]), x[2], int(x[3]))
                       for x in lanes):
        sig[:, i] = np.minimum.reduceat((a * h + b) % mod, starts)
    buckets = {}
    for b, ls in bands_lanes:
        for d in range(len(doc_ids)):
            val = hashlib.md5(
                ",".join(str(sig[d, l]) for l in ls).encode()).hexdigest()
            buckets.setdefault((b, val), []).append(doc_ids[d])
    out = (doc_ids, sig, buckets)
    _MEMO[key] = out
    return out


def _minhash_pairs(con, sql):
    """Distinct banded candidate pairs (a < b) with match counts (0..32)."""
    doc_ids, sig, buckets = _minhash_sigs(con, sql)
    idx = {d: i for i, d in enumerate(doc_ids)}
    pairs = set()
    for ids in buckets.values():
        if len(ids) > 1:
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((ids[i], ids[j]))
    pairs = sorted(pairs)
    if not pairs:
        return [], np.zeros(0, dtype=np.int64)
    ai = np.fromiter((idx[a] for a, _ in pairs), dtype=np.int64,
                     count=len(pairs))
    bi = np.fromiter((idx[b] for _, b in pairs), dtype=np.int64,
                     count=len(pairs))
    matches = (sig[ai] == sig[bi]).sum(axis=1).astype(np.int64)
    return pairs, matches


def d_minhash_lsh(con, sql):
    """Banded candidate pairs with est_sim = matches/32 (exact 5-decimal
    binary fraction; the SQL's round(.,6) is the identity on it)."""
    pairs, matches = _minhash_pairs(con, sql)
    return ["a", "b", "est_sim"], [
        (a, b, m / 32.0) for (a, b), m in zip(pairs, matches.tolist())]


def d_dedup_pipeline(con, sql):
    """Candidates -> est_sim >= 0.5 edges (== matches >= 16, exact integer
    compare) -> min-label CC -> survivors (drop non-min members)."""
    if "WHERE est_sim >= 0.5" not in sql:
        raise RuntimeError("dedup-pipeline oracle shape changed")
    pairs, matches = _minhash_pairs(con, sql)
    edges = [p for p, m in zip(pairs, matches.tolist()) if m >= 16]
    label = _uf_min_label(edges, [])
    drop = {k for k, v in label.items() if v != k}
    docs = [r[0] for r in
            con.sql("SELECT doc_id FROM documents ORDER BY doc_id")
            .fetchall()]
    return ["doc_id"], [(d,) for d in docs if d not in drop]


def d_dedup_incr(con, sql):
    """Incremental dedup: cut = (4*max(doc_id))//5; new docs (>= cut) that
    band-match an old near-dup (est >= 0.5, a < cut <= b) drop outright;
    the rest dedup among themselves (min-label CC over internal edges)."""
    if "WITH cut AS (SELECT (4 * max(doc_id)) // 5 AS c FROM documents)" \
            not in sql or "WHERE a < c AND b >= c AND est_sim >= 0.5" \
            not in sql:
        raise RuntimeError("dedup-incr oracle shape changed")
    cut = con.sql(
        "SELECT (4 * max(doc_id)) // 5 FROM documents").fetchone()[0]
    pairs, matches = _minhash_pairs(con, sql)
    dup = [p for p, m in zip(pairs, matches.tolist()) if m >= 16]
    xhit = {b for a, b in dup if a < cut <= b}
    docs = [r[0] for r in
            con.sql("SELECT doc_id FROM documents ORDER BY doc_id")
            .fetchall()]
    rem = [d for d in docs if d >= cut and d not in xhit]
    rset = set(rem)
    internal = [(a, b) for a, b in dup
                if a >= cut and a in rset and b in rset]
    label = _uf_min_label(internal, [])
    drop = {k for k, v in label.items() if v != k}
    return ["doc_id"], [(d,) for d in rem if d not in drop]


def _embeddings(con):
    """vec_id-sorted ids + float64 matrix (float32 -> float64 is exact) +
    per-vector squared norms accumulated in DIM ORDER (the sequential fold
    list_cosine_similarity uses)."""
    hit = _MEMO.get("embmat")
    if hit is not None:
        return hit
    rows = con.sql(
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        "FROM embeddings ORDER BY vec_id").fetchall()
    ids = [r[0] for r in rows]
    V = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.zeros(len(ids), dtype=np.float64)
    for k in range(V.shape[1]):
        nrm += V[:, k] * V[:, k]
    out = (ids, V, np.sqrt(nrm))
    _MEMO["embmat"] = out
    return out


def _seq_cosine(V, sn, ai, bi):
    """Exact list_cosine_similarity for index-pair arrays: the dot
    accumulates in dim order per pair (vectorized across pairs), and the
    denominator is sqrt(nx)*sqrt(ny) — both probed bit-exact vs DuckDB."""
    acc = np.zeros(len(ai), dtype=np.float64)
    A, B = V[ai], V[bi]
    for k in range(V.shape[1]):
        acc += A[:, k] * B[:, k]
    return acc / (sn[ai] * sn[bi])


def e_near_dup(con, sql):
    """All-pairs cosine near-dup: round(cos, 4) >= 0.45. A blocked matmul
    pre-filters with a 1e-9 margin (matmul vs sequential fold differ by
    ~1e-15 relative); survivors are recomputed with the exact sequential
    fold and the exact DuckDB rounding."""
    if "round(list_cosine_similarity(a.vec, b.vec), 4) >= 0.45" not in sql \
            or "ON a.id < b.id" not in sql:
        raise RuntimeError("near-dup oracle shape changed")
    ids, V, sn = _embeddings(con)
    n = len(ids)
    rows = []
    step = 2048
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        approx = (V[lo:hi] @ V.T) / np.outer(sn[lo:hi], sn)
        bi, bj = np.nonzero(approx >= 0.44995 - 1e-9)
        keep = lo + bi < bj  # a.id < b.id on sorted ids
        ai, bj = (lo + bi[keep]), bj[keep]
        if not len(ai):
            continue
        cos = _seq_cosine(V, sn, ai, bj)
        r = _round4_np(cos)
        ok = r >= 0.45
        rows.extend(zip((ids[i] for i in ai[ok].tolist()),
                        (ids[j] for j in bj[ok].tolist()),
                        r[ok].tolist()))
    rows.sort()
    return ["a", "b", "cos"], rows


def e_semdedup(con, sql):
    """SemDeDup: 16 hash60-selected centroids, nearest-cell assignment by
    (round(cos,4) DESC, cell ASC), per-cell pairs with round(cos,4) >= 0.45,
    min-label CC, drop non-min members."""
    if "|| 'ivfc'), 1, 15) AS BIGINT) AS hc" not in sql or \
            "ORDER BY hc, id LIMIT 16" not in sql or \
            "round(list_cosine_similarity(a.vec, b.vec), 4) >= 0.45" \
            not in sql:
        raise RuntimeError("semdedup oracle shape changed")
    ids, V, sn = _embeddings(con)
    n = len(ids)
    order = sorted(range(n), key=lambda i: (_h60(str(ids[i]) + "ivfc"),
                                            ids[i]))[:16]
    # Nearest-cell cosines through the module's canonical exact fold
    # (_seq_cosine, one centroid column at a time) — not a broadcast
    # matmul — so the (round4 DESC, cell ASC) argmax can never ride a
    # matmul-vs-fold ulp onto a round4 boundary or an inter-cell tie.
    oarr = np.array(order, dtype=np.int64)
    rows_idx = np.arange(n, dtype=np.int64)
    cell_cos = np.empty((n, 16), dtype=np.float64)
    for c in range(16):
        cell_cos[:, c] = _seq_cosine(
            V, sn, rows_idx, np.full(n, oarr[c], dtype=np.int64))
    cell_cos = _round4_np(cell_cos)
    # rank by (cos DESC, cell ASC): argmax of (cos, -cell) lexicographic
    best = np.zeros(n, dtype=np.int64)
    bval = cell_cos[:, 0].copy()
    for c in range(1, 16):
        better = cell_cos[:, c] > bval
        bval = np.where(better, cell_cos[:, c], bval)
        best = np.where(better, c, best)
    edges = []
    for c in range(16):
        mem = np.nonzero(best == c)[0]
        if len(mem) < 2:
            continue
        ii, jj = np.triu_indices(len(mem), k=1)
        for lo in range(0, len(ii), 2_000_000):
            a = mem[ii[lo:lo + 2_000_000]]
            b = mem[jj[lo:lo + 2_000_000]]
            cos = _seq_cosine(V, sn, a, b)
            cand = cos >= 0.44995 - 1e-9
            a, b = a[cand], b[cand]
            if not len(a):
                continue
            r = _round4_np(_seq_cosine(V, sn, a, b))
            ok = r >= 0.45
            edges.extend(zip((ids[i] for i in a[ok].tolist()),
                             (ids[j] for j in b[ok].tolist())))
    label = _uf_min_label(edges, [])
    drop = {k for k, v in label.items() if v != k}
    return ["id"], [(i,) for i in ids if i not in drop]


ALTERNATES = {
    "d_minhash_lsh": d_minhash_lsh,
    "d_dedup_pipeline": d_dedup_pipeline,
    "d_dedup_incr": d_dedup_incr,
    "e_near_dup": e_near_dup,
    "e_semdedup": e_semdedup,
    "gx_adamic": gx_adamic,
    "gx_anf_growth": gx_anf_growth,
    "gx_hits": gx_hits,
    "gx_labelprop": gx_labelprop,
    "gx_louvain1": gx_louvain1,
    "gx_conductance": gx_conductance,
    "gx_modularity": gx_modularity,
    "gx_coarsen": gx_coarsen,
    "gx_louvain_q": gx_louvain_q,
    "gx_louvain_w": gx_louvain_w,
    "gx_louvain2": gx_louvain2,
    "gx_louvain_cc": gx_louvain_cc,
    "gx_louvain_n": gx_louvain_n,
    "gx_louvain_nq": gx_louvain_nq,
    "gx_wl": gx_wl,
    "gx_ari": gx_ari,
    "gx_nmi": gx_nmi,
    "gx_betweenness": gx_betweenness,
    "gx_bipartite": gx_bipartite,
    "gx_msf": gx_msf,
    "gx_pagerank_fp": gx_pagerank_fp,
}
