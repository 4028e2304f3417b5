"""A/B the cohesive Newton inner-solve building blocks at bench scale.

Times, on the live backend:
  - flat jac matvec (newton._mf_jac_mv)   vs cm tier (_mf_jac_mv_cm)
  - flat V-cycle    (newton._mf_amg_pc)   vs cm tier (_mf_amg_pc_cm)
  - a full chunked AMG-CG inner solve per variant, degree 3 vs 2
Run: python tools/coh_ab.py [nx ny_half]   (default 360 72 = the bench deck)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.solver import amg as amg_mod
from fem_tpu.solver import cg as cg_mod
from fem_tpu.solver import newton

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 360
nyh = int(sys.argv[2]) if len(sys.argv) > 2 else 72

p = meshgen.cohesive_interface_problem(
    nx, nyh, lx=5.0, ly_half=1.0, E=3640.0, open_disp=0.015, t=1.0, dt=0.5,
    coh_props=(100.0, 0.01, 0.01, 1.0, 0.0, 0.0))
s = System(p, dtype=jnp.float64)
print(f"ndof={s.ndof}", flush=True)
t0 = time.perf_counter()
ops0 = newton._matfree_amg_cache(s)
print(f"cache build: {time.perf_counter() - t0:.1f}s", flush=True)
h = ops0["hier"]
print(f"degree={h.degree}; levels:", flush=True)
for i, lv in enumerate(h.levels):
    kind = (f"dense {lv.dense_op.shape}" if lv.dense_op.shape[0] > 0
            else f"ell n={lv.ell_vals.shape[0]} w={lv.ell_vals.shape[1]}")
    print(f"  L{i + 1}: {kind}", flush=True)
print(f"  coarse inv: {h.coarse_inv.shape}", flush=True)

e = s.blocks["coh"]
u0 = jnp.zeros(s.ndof, dtype=jnp.float32)
ke32 = newton._coh_ke(ops0["ecoords32"], ops0["props32"],
                      jnp.asarray(np.asarray(e["edofs"])), s.dt, u0,
                      quirks=False)
ops_flat = dict(ops0, ke=ke32)
for k in ("ecoords32", "props32", "fop_cm", "mf_cm", "keep_cm", "ed_node",
          "ed_comp"):
    ops_flat.pop(k, None)
has_cm = "fop_cm" in ops0
ops_cm = None
if has_cm:
    ops_cm = dict(ops0, ke=ke32)
    ops_cm.pop("ecoords32")
    ops_cm.pop("props32")
    ops_cm.pop("fop", None)

rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal(s.ndof), jnp.float32)
pdim = s.pdim
v_cm = v.reshape(-1, pdim).T


def timeit(f, *a, iters=30):
    g = jax.jit(lambda *aa: jnp.sum(f(*aa)))
    float(g(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


print(f"flat jac matvec: {timeit(newton._mf_jac_mv, ops_flat, v):.2f} ms",
      flush=True)
print(f"flat V-cycle:    {timeit(newton._mf_amg_pc, ops_flat, v):.2f} ms",
      flush=True)
if has_cm:
    print(f"cm jac matvec:   "
          f"{timeit(newton._mf_jac_mv_cm, ops_cm, v_cm):.2f} ms", flush=True)
    print(f"cm V-cycle:      "
          f"{timeit(newton._mf_amg_pc_cm, ops_cm, v_cm):.2f} ms", flush=True)


def solve(mv, pc, ops, r, tag, chunk=2, pipeline=False):
    t0 = time.perf_counter()
    res = cg_mod.pcg_chunked(mv, r, pc, ops, rtol=3e-5, maxiter=200,
                             chunk=chunk, pipeline=pipeline)
    _ = float(jnp.sum(res.x))
    cold = time.perf_counter() - t0
    best = None
    for _rep in range(3):
        t0 = time.perf_counter()
        res = cg_mod.pcg_chunked(mv, r, pc, ops, rtol=3e-5, maxiter=200,
                                 chunk=chunk, pipeline=pipeline)
        _ = float(jnp.sum(res.x))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best * 1e3:.0f} ms steady ({int(res.iters)} its, "
          f"cold {cold:.1f}s)", flush=True)


solve(newton._mf_jac_mv, newton._mf_amg_pc, ops_flat, v, "flat inner solve")
if has_cm:
    solve(newton._mf_jac_mv_cm, newton._mf_amg_pc_cm, ops_cm, v_cm,
          "cm inner solve  ")
    # chunk/pipeline sweep on the production (cm) tier: the inner solves
    # are short (6-26 its), so the chunked dispatch's per-chunk ~30 ms
    # blocking pull can dominate — pipeline hides it only when chunk
    # compute >= the pull, larger chunks amortize it at overshoot cost
    for ch in (2, 4, 6):
        for pipe in (False, True):
            solve(newton._mf_jac_mv_cm, newton._mf_amg_pc_cm, ops_cm, v_cm,
                  f"cm chunk{ch} pipe={int(pipe)}", chunk=ch, pipeline=pipe)

# degree-2 variant of the same hierarchy (cheaper smoothing, more CG its)
h2 = amg_mod.AMGPrecond(levels=h.levels, coarse_inv=h.coarse_inv, degree=2)
if has_cm:
    ops_d2 = dict(ops_cm, hier=h2)
    solve(newton._mf_jac_mv_cm, newton._mf_amg_pc_cm, ops_d2, v_cm,
          "cm d2 inner     ")
else:
    ops_d2 = dict(ops_flat, hier=h2)
    solve(newton._mf_jac_mv, newton._mf_amg_pc, ops_d2, v,
          "flat d2 inner   ")
