"""A/B the planes vs planes27 stencil matvec schedules on the real chip.

planes27 computes interior nodes with the collapsed 27-point constant
stencil (243 FMA terms/node vs planes' 576) plus exact boundary-face
recomputation — the hypothesis is ~2x on the VPU-issue-bound planes
schedule (DESIGN.md §6). Also cross-checks the two outputs on-chip at
full size to catch any new silent-miscompile class.

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

from fem_tpu.ops import structured
from fem_tpu.ops.stiffness import lame

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
    n = int(os.environ.get("FEM_TPU_AB_N", "80"))
    log(f"probe: tiny matmul")
    x = jnp.ones((128, 128), jnp.float32)
    _ = float(jnp.sum(x @ x))
    log("probe ok")

    lam, mu = lame(jnp.asarray(200e9, jnp.float32),
                   jnp.asarray(0.3, jnp.float32))
    shape = (n + 1, n + 1, n + 1)
    op = structured.build((10.0 / n, 1.0 / n, 1.0 / n), shape,
                          lam, mu).astype(jnp.float32)
    ndof = op.ndof
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal(shape + (3,)), jnp.float32)
    log(f"n={n} ndof={ndof}")

    planes = jax.jit(lambda o, v: structured._planes_core(
        o, jnp.moveaxis(v, -1, 0)))
    planes27 = jax.jit(lambda o, v: structured._planes27_core(
        o, jnp.moveaxis(v, -1, 0)))

    y0 = planes(op, g)
    y1 = planes27(op, g)
    rel = float(jnp.linalg.norm((y1 - y0).reshape(-1)) /
                jnp.linalg.norm(y0.reshape(-1)))
    log(f"on-chip planes27 vs planes rel diff: {rel:.3e}")

    t_planes = timeit(planes, op, g)
    t_27 = timeit(planes27, op, g)
    log(f"planes   {t_planes*1e3:8.2f} ms")
    log(f"planes27 {t_27*1e3:8.2f} ms  ({t_planes/t_27:.2f}x)")

    recs = [
        dict(metric="stencil_matvec_planes_ms", value=t_planes * 1e3,
             unit="ms", ndof=ndof),
        dict(metric="stencil_matvec_planes27_ms", value=t_27 * 1e3,
             unit="ms", ndof=ndof, rel_vs_planes=rel),
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_extra.json"), "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    log("done")


if __name__ == "__main__":
    main()
