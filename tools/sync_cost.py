"""Measure relay dispatch/sync costs for the structured MG solve's programs.

The chunk-size A/B (tools/solve_ab.py, BENCH_extra.json `config` records)
showed the 1.59M-dof solve is bound by HOST ROUND TRIPS, not compute:
chunk=1 (one blocking float() per iteration) runs 88 ms/iter while the
same iteration inside a chunk=4 program costs ~37 ms and the standalone
V-cycle+matvec sum only ~26 ms. This isolates the cost of
  (a) a dispatch WITHOUT sync (enqueue only),
  (b) a blocking float() pull after one program,
  (c) a blocking pull issued while one more program is speculatively
      queued behind it (does the pull wait for the queue to drain?).
(c) decides whether cg.pcg_chunked should pipeline chunk k+1's dispatch
before reading chunk k's residual norm: if the pull only waits for its
own dependency, speculation hides the sync latency entirely.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fem_tpu.utils import jaxcache

jaxcache.enable(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from fem_tpu.ops import structured
    from fem_tpu.ops.stiffness import lame

    n = int(os.environ.get("FEM_TPU_BENCH_N", "80"))
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    x = jnp.ones((256, 256), jnp.float32)
    float(jnp.sum(jax.device_put(x, tpu) @ jax.device_put(x, tpu)))
    log("preflight ok")

    with jax.default_device(cpu):
        lam, mu = lame(jnp.asarray(200e9), jnp.asarray(0.3))
        op = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam, mu,
                              dtype=jnp.float32).with_impl("planes")
        rng = np.random.default_rng(0)
        g = jnp.asarray(
            rng.standard_normal((n + 1, n + 1, n + 1, 3)), jnp.float32)
    op, g = jax.device_put((op, g), tpu)

    # program under test: one masked-matvec-like step returning state + norm
    # (the same shape of result as pcg_chunked's advance)
    @jax.jit
    def step(op, v):
        out = structured.matvec_g(op, v)
        return out, jnp.sqrt(jnp.sum(out * out))

    out, rn = step(op, g)
    float(rn)  # warm

    N = 24

    # (a) N chained dispatches, one final sync
    t0 = time.perf_counter()
    v = g
    for _ in range(N):
        v, rn = step(op, v)
    _ = float(rn)
    dt_a = (time.perf_counter() - t0) / N * 1e3
    log(f"(a) chained, 1 final sync      {dt_a:8.2f} ms/step")

    # (b) dispatch + blocking pull each step
    t0 = time.perf_counter()
    v = g
    for _ in range(N):
        v, rn = step(op, v)
        _ = float(rn)
    dt_b = (time.perf_counter() - t0) / N * 1e3
    log(f"(b) sync every step            {dt_b:8.2f} ms/step")

    # (c) speculative: dispatch step k+1 before pulling step k's norm
    t0 = time.perf_counter()
    v, rn = step(op, g)
    for _ in range(N - 1):
        v2, rn2 = step(op, v)  # queued behind step k
        _ = float(rn)          # pull step k's norm
        v, rn = v2, rn2
    _ = float(rn)
    dt_c = (time.perf_counter() - t0) / N * 1e3
    log(f"(c) 1-deep speculative pipeline{dt_c:8.2f} ms/step")

    # (d) device_put of a tiny array + pull (pure round-trip latency)
    t0 = time.perf_counter()
    for _ in range(N):
        _ = float(jnp.sum(jax.device_put(jnp.ones((8,), jnp.float32), tpu)))
    dt_d = (time.perf_counter() - t0) / N * 1e3
    log(f"(d) tiny put+pull round trip   {dt_d:8.2f} ms")

    import json
    rec = {"metric": "sync_cost_ms", "chained": round(dt_a, 2),
           "sync_each": round(dt_b, 2), "speculative": round(dt_c, 2),
           "tiny_roundtrip": round(dt_d, 2), "ndof": int(op.ndof)}
    log(json.dumps(rec))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_extra.json"), "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
