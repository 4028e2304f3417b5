"""V-cycle level breakdown for the cohesive 105k hierarchy."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.solver import newton, amg as amg_mod

p = meshgen.cohesive_interface_problem(
    360, 72, lx=5.0, ly_half=1.0, E=3640.0, open_disp=0.015, t=1.0, dt=0.5,
    coh_props=(100.0, 0.01, 0.01, 1.0, 0.0, 0.0))
s = System(p, dtype=jnp.float64)
ops0 = newton._matfree_amg_cache(s)
h = ops0["hier"]
print(f"degree={h.degree}", flush=True)
for i, lv in enumerate(h.levels):
    print(f"  L{i}: ell {lv.ell_vals.shape}, P {lv.p_vals.shape}", flush=True)
print(f"  coarse dense: {h.coarse_inv.shape}", flush=True)

def timeit(f, *a, iters=50):
    g = jax.jit(lambda *aa: jnp.sum(f(*aa)))
    float(g(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3

rng = np.random.default_rng(0)
for i, lv in enumerate(h.levels):
    if lv.ell_vals.shape[0] == 0:
        continue
    n = lv.ell_vals.shape[0]
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ms = timeit(lambda vals, cols, xx: jnp.sum(
        vals * xx[cols], axis=1), lv.ell_vals, lv.ell_cols, x)
    print(f"  L{i} ell matvec (n={n} w={lv.ell_vals.shape[1]}): {ms:.2f} ms",
          flush=True)
