"""Projected multi-chip scaling table (VERDICT r3 #8).

Single-chip hardware cannot MEASURE multi-chip scaling, but the
communication volume of every sharded op is a static property of the
jaxpr — `utils.testing.collective_volumes` counts the per-device elements
each collective moves. This script traces the sharded GCN and GAT
training steps (dist/gcn.py, dist/gat.py) at arxiv- and reddit-scale for
D in {2, 4, 8} shards on a virtual CPU mesh and emits, per config:

- ICI bytes per device per step (all_gather + psum/psum_scatter + ...)
- local HBM traffic estimate per device per step (the dominant gather +
  stream bytes of the per-shard SpMMs, from the shard plan shapes)
- the comm/compute byte ratio and the projected step-time lower bounds
  at v5e link rates.

Projection model (stated assumptions, not measurements): per-chip HBM
819 GB/s (v5e); ICI all-gather rides a 1-D ring — per-chip one-way ICI
bandwidth ~45 GB/s x 2 directions = 90 GB/s effective for bidirectional
ring collectives (scaling-book v5e numbers). A config is ICI-bound when
ici_bytes/90GBps > hbm_bytes/819GBps, i.e. when the byte RATIO exceeds
~0.11. The moment real multi-chip hardware exists, bench_dist.py's
--measure flag times the same jitted steps for real.

Run: python benchmark/bench_dist.py [--quick]
Writes benchmark/results_dist_projection.json and prints the table.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# virtual multi-chip mesh BEFORE jax import
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

HBM_GBPS = 819.0     # v5e HBM bandwidth
ICI_GBPS = 90.0      # per-chip bidirectional ring-collective rate (assumed)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_graph(name, quick=False):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import clustered_graph, power_law_graph

    if name == "arxiv-scale":
        m = n = 169_343
        rowptr, col = power_law_graph(m, n, 1_166_243, seed=3)
    elif name == "reddit-scale":
        if quick:
            # shape-faithful 1/8 sample: same avg degree, 1/8 the nodes
            m = n = 29_120
            rowptr, col = clustered_graph(m, n, 492, seed=5)
        else:
            m = n = 232_965
            rowptr, col = clustered_graph(m, n, 492, seed=5)
    else:
        raise ValueError(name)
    return rowptr, col, m, n


def shard_local_bytes(adj, f: int) -> int:
    """Dominant per-device HBM traffic of one sharded SpMM forward:
    the per-edge row gather ([padded_edges/D, F] reads) + contribution
    stream + output rows. A lower-bound byte model, matching the
    roofline accounting of BENCHMARKS.md §2."""
    per_dev_edges = int(adj.p_cols.shape[1])
    rows = int(adj.rows_per_shard)
    return 4 * (per_dev_edges * f          # gathered B rows
                + per_dev_edges * f        # contribution stream
                + rows * f)                # output block


def trace_volumes(name, fn, *args) -> dict:
    from dgsparse_tpu.utils.testing import collective_volumes

    v = collective_volumes(fn, *args)
    log(f"  {name}: {v}")
    return v


def gcn_row(graph, rowptr, col, m, n, f_in, f_hid, f_out, d, results):
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.dist import gcn as dgcn
    from dgsparse_tpu.dist.shard import shard_csr

    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(m, n), build_plans=False)
    adj = shard_csr(sp, d, balance="edges")
    mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, f_in)).astype(np.float32)
    y = rng.integers(0, f_out, m).astype(np.int32)
    m_pad = adj.num_shards * adj.rows_per_shard
    xp = np.zeros((m_pad, f_in), np.float32)
    xp[:m] = x
    yp = np.full((m_pad,), -1, np.int32)
    yp[:m] = y
    row_sh = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(xp), row_sh)
    yd = jax.device_put(jnp.asarray(yp), row_sh)
    mask = jax.device_put(jnp.asarray((yp >= 0).astype(np.float32)),
                          row_sh)
    params = dgcn.init_params(jax.random.PRNGKey(0), f_in, f_hid, f_out)
    step = dgcn.make_train_step(mesh, adj)

    vols = trace_volumes(f"gcn d={d}", lambda p, a, b, c: step(p, a, b, c),
                         params, xd, yd, mask)
    ici_bytes = 4 * sum(vols.values())
    # 2 GCN layers x (fwd + bwd transpose) ~ 4 SpMM passes per step
    local = 4 * shard_local_bytes(adj, f_hid)
    row = {
        "model": "gcn-2layer", "graph": graph, "shards": d,
        "f_hidden": f_hid,
        "ici_bytes_per_dev_per_step": ici_bytes,
        "local_hbm_bytes_per_dev_per_step": local,
        "comm_compute_byte_ratio": round(ici_bytes / max(local, 1), 4),
        "proj_ici_ms": round(ici_bytes / ICI_GBPS / 1e6, 3),
        "proj_hbm_ms": round(local / HBM_GBPS / 1e6, 3),
        "ici_bound": ici_bytes / ICI_GBPS > local / HBM_GBPS,
        "collectives": {k: int(v) for k, v in vols.items()},
    }
    results.append(row)
    log(f"  -> {json.dumps(row)}")


def gat_row(graph, rowptr, col, m, n, h, f, d, results):
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.dist import gat as dgat
    from dgsparse_tpu.dist.shard import pad_nodes, shard_csr

    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(m, n), build_plans=False)
    adj = shard_csr(sp, d, balance="edges")
    mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))
    rng = np.random.default_rng(1)
    hd = jax.device_put(
        pad_nodes(jnp.asarray(
            rng.standard_normal((m, h, f)).astype(np.float32)), d),
        NamedSharding(mesh, P("graph")))
    sd = jax.device_put(
        pad_nodes(jnp.asarray(
            rng.standard_normal((m, h)).astype(np.float32)), d),
        NamedSharding(mesh, P("graph")))
    ss = jax.device_put(
        pad_nodes(jnp.asarray(
            rng.standard_normal((m, h)).astype(np.float32)), d),
        NamedSharding(mesh, P("graph")))
    vols = trace_volumes(
        f"gat d={d}",
        lambda a, b, c: dgat.gat_aggregate_sharded(adj, a, b, c, mesh),
        hd, sd, ss)
    ici_bytes = 4 * sum(vols.values())
    local = shard_local_bytes(adj, h * f) * 2   # scores + aggregate passes
    row = {
        "model": "gat-aggregate", "graph": graph, "shards": d,
        "heads": h, "f_per_head": f,
        "ici_bytes_per_dev_per_step": ici_bytes,
        "local_hbm_bytes_per_dev_per_step": local,
        "comm_compute_byte_ratio": round(ici_bytes / max(local, 1), 4),
        "proj_ici_ms": round(ici_bytes / ICI_GBPS / 1e6, 3),
        "proj_hbm_ms": round(local / HBM_GBPS / 1e6, 3),
        "ici_bound": ici_bytes / ICI_GBPS > local / HBM_GBPS,
        "collectives": {k: int(v) for k, v in vols.items()},
    }
    results.append(row)
    log(f"  -> {json.dumps(row)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1/8-scale reddit sample (same degree structure)")
    args = ap.parse_args()
    results = []
    for graph in ("arxiv-scale", "reddit-scale"):
        rowptr, col, m, n = make_graph(graph, quick=args.quick)
        log(f"{graph}: M={m} nnz={len(col)}")
        for d in (2, 4, 8):
            gcn_row(graph, rowptr, col, m, n, 128, 64,
                    40 if graph == "arxiv-scale" else 41, d, results)
            gat_row(graph, rowptr, col, m, n, 4, 16, d, results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_dist_projection.json")
    with open(out, "w") as fh:
        json.dump({"assumptions": {"hbm_gbps": HBM_GBPS,
                                   "ici_gbps": ICI_GBPS,
                                   "quick": args.quick},
                   "rows": results}, fh, indent=1)
    print(json.dumps(results, indent=1))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
