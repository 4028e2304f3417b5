import time, numpy as np, jax, jax.numpy as jnp
from fem_tpu.ops import elements, stiffness

et = elements.get("hex")
ne = 131072
rng = np.random.default_rng(0)
base = np.array([[0,0,0],[1,0,0],[1,1,0],[0,1,0],[0,0,1],[1,0,1],[1,1,1],[0,1,1]], np.float32)
off = rng.normal(size=(ne,1,3)).astype(np.float32)
jit_ = 0.05*rng.normal(size=(ne,8,3)).astype(np.float32)
ec = jnp.asarray(np.transpose(base[None]+off+jit_, (2,1,0)))
lam, mu = stiffness.lame(jnp.full(ne, 200e9, jnp.float32), jnp.full(ne, 0.3, jnp.float32))

for name, fn in (("v1", stiffness.element_stiffness_lame_batchlast),
                 ("v2", stiffness.element_stiffness_lame_batchlast_v2)):
    f = jax.jit(lambda e, fn=fn: jnp.sum(fn(et, e, lam, mu)))
    s0 = float(f(ec))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(ec)
    float(out)
    dt = (time.perf_counter()-t0)/20
    print(f"{name}: {dt*1e3:.2f} ms/iter -> {ne/dt:.3e} elems/s  (sum={s0:.6e})", flush=True)
