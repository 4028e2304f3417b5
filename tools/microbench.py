"""Empirical machine ceilings for the roofline analysis (DESIGN.md).

The published numbers (819 GB/s HBM, 197 bf16 TFLOP/s MXU) say nothing
about the two limits that actually bind FEM operators on this chip: VPU
elementwise throughput and gather issue rate. This measures, on the real
chip, through the same relay the solvers use:

  - hbm_stream_GBps: y = a*x + b on 64M f32 elements (3 vectors traffic)
  - vpu_fma_GFLOPs:  64 chained FMAs on a VMEM-resident-sized block,
                     iterated — flops per byte high enough to be compute
                     bound
  - gather_rows_per_s: x[idx] for 4M random int32 indices into a 1M-row
                     (rows, 8) f32 table — the unstructured matvec's
                     bounding primitive, in rows/s
  - mxu_f32_TFLOPs:  4096^3 matmul (default precision = bf16 passes)

Appends JSON lines to BENCH_extra.json; stderr only.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fem_tpu.utils import jaxcache

jaxcache.enable(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = acc + jnp.sum(fn(*args))
    _ = float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    recs = []

    def rec(**kw):
        recs.append(kw)
        log(json.dumps(kw))

    n = 64 * 1024 * 1024
    x = jnp.ones(n, jnp.float32)
    b = jnp.full(n, 0.5, jnp.float32)

    @jax.jit
    def axpb(x, b):
        return 1.0001 * x + b

    dt = timeit(axpb, x, b)
    rec(metric="micro_hbm_stream_GBps", value=round(3 * n * 4 / dt / 1e9, 1),
        ms=round(dt * 1e3, 3))

    @jax.jit
    def fma_chain(x):
        y = x
        for _ in range(64):
            y = y * 1.0000001 + 0.0000001
        return y

    m = 8 * 1024 * 1024
    xs = jnp.ones(m, jnp.float32)
    dt = timeit(fma_chain, xs)
    rec(metric="micro_vpu_fma_GFLOPs",
        value=round(64 * 2 * m / dt / 1e9, 1), ms=round(dt * 1e3, 3))

    rows, width, ng = 1_000_000, 8, 4_000_000
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((rows, width)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, rows, size=ng), jnp.int32)

    @jax.jit
    def gather_rows(table, idx):
        return table.at[idx].get(mode="promise_in_bounds")

    dt = timeit(gather_rows, table, idx)
    rec(metric="micro_gather_Mrows_per_s", value=round(ng / dt / 1e6, 1),
        ms=round(dt * 1e3, 3), note=f"{rows}x{width} f32 table, {ng} idx")

    # scalar (width-1) gather for comparison
    flat = jnp.asarray(rng.standard_normal(rows * width), jnp.float32)
    idxs = jnp.asarray(rng.integers(0, rows * width, size=ng), jnp.int32)

    @jax.jit
    def gather_scalar(flat, idx):
        return flat.at[idx].get(mode="promise_in_bounds")

    dt = timeit(gather_scalar, flat, idxs)
    rec(metric="micro_gather_Mscalars_per_s", value=round(ng / dt / 1e6, 1),
        ms=round(dt * 1e3, 3))

    k = 4096
    A = jnp.ones((k, k), jnp.float32)

    @jax.jit
    def mm(A):
        return A @ A

    dt = timeit(mm, A, iters=10)
    rec(metric="micro_mxu_TFLOPs", value=round(2 * k**3 / dt / 1e12, 1),
        ms=round(dt * 1e3, 3), note="f32 in, default precision (bf16 MXU)")

    try:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_extra.json")
        with open(path, "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
