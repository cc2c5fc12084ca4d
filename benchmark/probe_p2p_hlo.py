"""Dump and summarize the OPTIMIZED HLO of the p2p headline forward.

DESIGN.md's open item: ~220 us of the p2p PALLAS_ROW_TILE forward is
unattributed above the gather+recombine floor. Instead of a profiler
trace (tensorboard plumbing over the tunnel), ask the compiler: lower
the exact public-spmm computation, compile it for the real backend, and
report every instruction whose output is large enough to matter
(>=1 MB), plus the compiler's own cost analysis. Extra full-size buffer
materializations (copies, transposes, un-fused elementwise passes) show
up directly as >=19.6 MB (=153.6K slots x 32 x 4 B) outputs.

Run on TPU: python benchmark/probe_p2p_hlo.py
Writes benchmark/results_p2p_hlo.json (summary only, not the HLO text).
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")


def _bytes_of(shape_str):
    """Total bytes of the first shape literal in an HLO result type."""
    m = _SHAPE.search(shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    itemsize = {"bf16": 2, "f16": 2, "s8": 1, "u8": 1, "pred": 1}.get(dt, 4)
    return n * itemsize


def main():
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.testing import load_mtx

    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    rowptr, col, _vals, (m, n) = load_mtx(mtx)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               None, (m, n))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))

    fn = jax.jit(lambda x, s: spmm(s, x, "sum",
                                   Algorithm.PALLAS_ROW_TILE))
    lowered = fn.lower(b, sp)
    compiled = lowered.compile()
    txt = compiled.as_text()
    log(f"optimized HLO: {len(txt.splitlines())} lines")

    # per-instruction summary, ENTRY computation only — fusion-internal
    # instructions don't materialize buffers and must not be counted
    rows = []
    in_entry = False
    depth = 0
    for line in txt.splitlines():
        ls = line.strip()
        if ls.startswith("ENTRY"):
            in_entry = True
            depth = 0
        if not in_entry:
            continue
        depth += ls.count("{") - ls.count("}")
        if depth <= 0 and "}" in ls and not ls.startswith("ENTRY"):
            in_entry = False
        mo = re.match(r"(%?[\w.\-]+) = (\S+\[[^\]]*\][^ ]*) (\S+?)\(", ls)
        if not mo:
            continue
        name, shape, opcode = mo.groups()
        by = _bytes_of(shape)
        if by >= (1 << 20):
            rows.append({"name": name, "op": opcode, "shape": shape[:80],
                         "mb": round(by / 2**20, 2)})
    rows.sort(key=lambda r: -r["mb"])
    opsum = {}
    for r in rows:
        opsum[r["op"]] = opsum.get(r["op"], 0.0) + r["mb"]
    log("== >=1MB outputs by opcode (MB) ==")
    for k, v in sorted(opsum.items(), key=lambda kv: -kv[1]):
        log(f"  {k:24s} {v:9.1f} MB")
    log("== top 25 instructions ==")
    for r in rows[:25]:
        log(f"  {r['mb']:8.1f} MB  {r['op']:18s} {r['shape']}")

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    keep = {k: float(v) for k, v in (ca or {}).items()
            if k in ("bytes accessed", "flops", "transcendentals",
                     "utilization operand 0 {}", "bytes accessed output {}")
            or k.startswith("bytes accessed")}
    log("cost analysis:", json.dumps(keep, indent=1)[:600])

    out = {"backend": jax.default_backend(),
           "big_outputs_by_opcode_mb": opsum,
           "top": rows[:40], "cost_analysis": keep}
    path = os.path.join(os.path.dirname(__file__),
                        "results_p2p_hlo.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
