"""Per-op wall breakdown of the cohesive Newton inner solve at 105k dofs:
fine jac matvec vs AMG V-cycle application (the chunked-CG iteration body
= 1 matvec + 1 V-cycle + ~1.4 ms relay dispatch)."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.solver import newton, amg as amg_mod

p = meshgen.cohesive_interface_problem(
    360, 72, lx=5.0, ly_half=1.0, E=3640.0, open_disp=0.015, t=1.0, dt=0.5,
    coh_props=(100.0, 0.01, 0.01, 1.0, 0.0, 0.0))
s = System(p, dtype=jnp.float64)
print(f"ndof={s.ndof}", file=sys.stderr, flush=True)
t0 = time.perf_counter()
ops0 = newton._matfree_amg_cache(s)
print(f"cache build: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
e = s.blocks["coh"]
u0 = jnp.zeros(s.ndof, dtype=jnp.float32)
ke32 = newton._coh_ke(ops0["ecoords32"], ops0["props32"],
                      jnp.asarray(np.asarray(e["edofs"])), s.dt, u0,
                      quirks=False)
ops = dict(ops0, ke=ke32)
v = jnp.asarray(np.random.default_rng(0).standard_normal(s.ndof), jnp.float32)

def timeit(f, *a, iters=50):
    g = jax.jit(lambda *aa: jnp.sum(f(*aa)))
    float(g(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3

mv = timeit(lambda ops_, vv: newton._mf_jac_mv(ops_, vv), ops, v)
print(f"jac matvec: {mv:.2f} ms", flush=True)
vc = timeit(lambda ops_, vv: amg_mod.v_cycle(
    ops_["hier"], lambda x: newton._mf_jac_mv(ops_, x), vv), ops, v)
print(f"V-cycle:    {vc:.2f} ms", flush=True)
h = ops["hier"]
print(f"levels: fine + {len(h.levels)} ELL + dense {h.coarse_inv.shape}",
      flush=True)
for i, lv in enumerate(h.levels):
    if lv.dense_op.shape[0] > 0:
        print(f"  L{i+1}: dense {lv.dense_op.shape}", flush=True)
    else:
        print(f"  L{i+1}: n={lv.ell_vals.shape[0]} "
              f"w={lv.ell_vals.shape[1]}", flush=True)
