"""Generator fidelity check (VERDICT r3 missing #1, offline variant).

The sandbox has no network egress, so the REAL ogbn-arxiv / Reddit
graphs named by BASELINE.json cannot be constructed here. This script
documents exactly how close the synthetic stand-ins are on the
statistics that drive plan selection (AUTO gates, hybrid tiering,
bucketed-ELL pad ratios):

1. For the published datasets, the count-level invariants that ARE
   known offline (node count, edge count, average degree — OGB site /
   GraphSAGE paper) are compared against the generators' realized
   values.
2. The degree-TAIL shape (p50/p90/p99/max, empty-row fraction, top-1%
   degree mass) cannot be checked against the real data offline; it IS
   checked against the two bundled REAL SNAP graphs
   (p2p-Gnutella31, ca-CondMat — reference example/data/), which carry
   real power-law structure end-to-end through the same stats.

Run: python benchmark/fidelity_check.py
Writes benchmark/results_fidelity.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/example/data"

# Published count-level stats (offline-known): (nodes, edges, avg_deg).
# ogbn-arxiv: OGB node-property datasets table (directed citation graph).
# Reddit: GraphSAGE paper / DGL RedditDataset docstring.
PUBLISHED = {
    "ogbn-arxiv": (169_343, 1_166_243, 6.9),
    "reddit": (232_965, 114_615_892, 492.0),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def degree_stats(rowptr):
    deg = np.diff(rowptr).astype(np.int64)
    nz = deg[deg > 0]
    order = np.sort(deg)[::-1]
    top1 = order[: max(len(deg) // 100, 1)].sum() / max(deg.sum(), 1)
    return {
        "nodes": int(len(deg)),
        "nnz": int(deg.sum()),
        "avg_deg": round(float(deg.mean()), 2),
        "avg_deg_nonempty": round(float(nz.mean()) if len(nz) else 0, 2),
        "empty_frac": round(float((deg == 0).mean()), 4),
        "p50": int(np.percentile(deg, 50)),
        "p90": int(np.percentile(deg, 90)),
        "p99": int(np.percentile(deg, 99)),
        "max": int(deg.max()),
        "top1pct_mass": round(float(top1), 3),
    }


def main():
    from bench_scale import clustered_graph

    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    out = {"generators": {}, "real": {}, "published": {}}

    # --- real bundled graphs (ground truth for the stats machinery)
    for name in ("p2p-Gnutella31", "ca-CondMat"):
        path = os.path.join(DATA, f"{name}.mtx")
        if not os.path.exists(path):
            continue
        rowptr, col, vals, (m, n) = load_mtx(path)
        s = degree_stats(rowptr)
        out["real"][name] = s
        log(f"[real      ] {name:16s} {s}")

    # --- synthetic stand-ins vs published counts
    gens = {
        "arxiv-scale": lambda: random_csr(169_343, 169_343,
                                          avg_degree=4.2, seed=0,
                                          skew=1.0,
                                          with_empty_rows=False)[0],
        "reddit-clustered": lambda: clustered_graph(
            232_965, 232_965, 492, seed=4)[0],
    }
    pub_of = {"arxiv-scale": "ogbn-arxiv", "reddit-clustered": "reddit"}
    for name, fn in gens.items():
        rowptr = fn()
        s = degree_stats(rowptr)
        pub = PUBLISHED[pub_of[name]]
        s["vs_published"] = {
            "nodes": f"{s['nodes']}/{pub[0]}",
            "nnz_ratio": round(s["nnz"] / pub[1], 3),
            "avg_deg_ratio": round(s["avg_deg"] / pub[2], 3),
        }
        out["generators"][name] = s
        out["published"][pub_of[name]] = {
            "nodes": pub[0], "edges": pub[1], "avg_deg": pub[2]}
        log(f"[generator ] {name:16s} {s}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_fidelity.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
