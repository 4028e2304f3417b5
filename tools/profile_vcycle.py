"""Time every stage of the production cm V-cycle at bench scale.

Decomposes newton._mf_amg_pc_cm (= amg.v_cycle_cm over the cohesive
hierarchy) into: fine Chebyshev, fine residual, block restrict, the full
coarse sub-V (levels 1..), block prolong, and the tail Chebyshev — each
timed as its own jitted program on the live backend. Answers WHERE the
~100 ms/apply at 1M dofs goes (the cm fine matvec itself is ~1.4 ms).

Run: python tools/profile_vcycle.py [nx ny_half]   (default 1120 224)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.solver import amg as amg_mod
from fem_tpu.solver import newton

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1120
nyh = int(sys.argv[2]) if len(sys.argv) > 2 else 224

p = meshgen.cohesive_interface_problem(
    nx, nyh, lx=5.0, ly_half=1.0, E=3640.0, open_disp=0.015, t=1.0, dt=0.5,
    coh_props=(100.0, 0.01, 0.01, 1.0, 0.0, 0.0))
s = System(p, dtype=jnp.float64)
print(f"ndof={s.ndof}", flush=True)
t0 = time.perf_counter()
ops0 = newton._matfree_amg_cache(s)
print(f"cache build: {time.perf_counter() - t0:.1f}s", flush=True)
h = ops0["hier"]

e = s.blocks["coh"]
u0 = jnp.zeros(s.ndof, dtype=jnp.float32)
ke32 = newton._coh_ke(ops0["ecoords32"], ops0["props32"],
                      jnp.asarray(np.asarray(e["edofs"])), s.dt, u0,
                      quirks=False)
ops = dict(ops0, ke=ke32)
ops.pop("ecoords32")
ops.pop("props32")
ops.pop("fop", None)

rng = np.random.default_rng(0)
pdim = s.pdim
nnds = s.ndof // pdim
r_cm = jnp.asarray(rng.standard_normal((pdim, nnds)), jnp.float32)


def timeit(f, *a, iters=30):
    g = jax.jit(lambda *aa: jnp.sum(f(*aa)))
    float(g(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


lv = h.levels[0]
mv = lambda v: newton._mf_jac_mv_cm(ops, v)

print(f"degree={h.degree}", flush=True)
print(f"fine matvec:        {timeit(mv, r_cm):7.2f} ms", flush=True)
print(f"fine cheb(d):       "
      f"{timeit(lambda b: amg_mod._chebyshev_cm(mv, lv, jnp.zeros_like(b), b, h.degree), r_cm):7.2f} ms",
      flush=True)
print(f"block restrict:     "
      f"{timeit(lambda rr: amg_mod._restrict_blk(lv, rr), r_cm):7.2f} ms",
      flush=True)

rc = amg_mod._restrict_blk(lv, r_cm)
rc = jax.block_until_ready(rc)
print(f"coarse n = {rc.shape}", flush=True)


def coarse_sub_v(rc_):
    nxt = h.levels[1]
    return amg_mod._v(h, 1, lambda v: amg_mod._lv_matvec(nxt, v), rc_)


print(f"coarse sub-V (L1+): {timeit(coarse_sub_v, rc):7.2f} ms", flush=True)
xc = coarse_sub_v(rc)
xc = jax.block_until_ready(xc)
print(f"block prolong:      "
      f"{timeit(lambda xx: amg_mod._prolong_blk(lv, xx), xc):7.2f} ms",
      flush=True)

# the coarse levels one by one
for i in range(1, len(h.levels)):
    lvi = h.levels[i]
    n_i = (lvi.dense_op.shape[0] if lvi.dense_op.shape[0] > 0
           else lvi.ell_vals.shape[0])
    if n_i == 0:
        continue
    xi = jnp.asarray(rng.standard_normal(n_i), jnp.float32)
    ms = timeit(lambda v: amg_mod._lv_matvec(lvi, v), xi)
    kind = "dense" if lvi.dense_op.shape[0] > 0 else \
        f"ell w={lvi.ell_vals.shape[1]}"
    print(f"  L{i} matvec (n={n_i}, {kind}): {ms:7.2f} ms", flush=True)

print(f"full cm V-cycle:    "
      f"{timeit(lambda b: amg_mod.v_cycle_cm(h, mv, b), r_cm):7.2f} ms",
      flush=True)
