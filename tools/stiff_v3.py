"""A/B: v1, v2, and v3 = v1-style J einsum + v2-style adjugate/1-recip."""
import time, numpy as np, jax, jax.numpy as jnp
from fem_tpu.ops import elements, stiffness

et = elements.get("hex")
ne = 131072
rng = np.random.default_rng(0)
base = np.array([[0,0,0],[1,0,0],[1,1,0],[0,1,0],[0,0,1],[1,0,1],[1,1,1],[0,1,1]], np.float32)
ec = jnp.asarray(np.transpose(base[None]+rng.normal(size=(ne,1,3)).astype(np.float32)
                 +0.05*rng.normal(size=(ne,8,3)).astype(np.float32), (2,1,0)))
lam, mu = stiffness.lame(jnp.full(ne, 200e9, jnp.float32), jnp.full(ne, 0.3, jnp.float32))

def v3(et, ecl, lam, mu):
    dN = jnp.asarray(et.dN, dtype=ecl.dtype)
    w = jnp.asarray(et.weights, dtype=ecl.dtype)
    J = jnp.einsum("ipa,dae->ipde", dN, ecl)  # J[i,p,d,e] as v1
    j = [[J[:, p, d] for d in range(3)] for p in range(3)]
    a00 = j[1][1]*j[2][2] - j[1][2]*j[2][1]
    a10 = j[1][2]*j[2][0] - j[1][0]*j[2][2]
    a20 = j[1][0]*j[2][1] - j[1][1]*j[2][0]
    det = j[0][0]*a00 + j[0][1]*a10 + j[0][2]*a20
    adj = [[a00, j[0][2]*j[2][1]-j[0][1]*j[2][2], j[0][1]*j[1][2]-j[0][2]*j[1][1]],
           [a10, j[0][0]*j[2][2]-j[0][2]*j[2][0], j[0][2]*j[1][0]-j[0][0]*j[1][2]],
           [a20, j[0][1]*j[2][0]-j[0][0]*j[2][1], j[0][0]*j[1][1]-j[0][1]*j[1][0]]]
    G = jnp.stack([sum(adj[p][q][:, None, :] * dN[:, q, :, None] for q in range(3))
                   for p in range(3)], axis=1)  # (nip, p, a, e)
    r = w[:, None] / det
    Gr = G * r[:, None, None, :]
    H = jnp.sum(Gr[:, :, :, None, None, :] * G[:, None, None, :, :, :], axis=0)
    term = lam * H + mu * jnp.transpose(H, (2, 1, 0, 3, 4))
    ke = jnp.transpose(term, (1, 0, 3, 2, 4))
    tr = jnp.einsum("kakbe->abe", H)
    eye = jnp.eye(3, dtype=ecl.dtype)
    return ke + mu * tr[:, None, :, None, :] * eye[None, :, None, :, None]

for name, fn in (("v1", stiffness.element_stiffness_lame_batchlast),
                 ("v2", stiffness.element_stiffness_lame_batchlast_v2),
                 ("v3", v3)):
    f = jax.jit(lambda e, fn=fn: jnp.sum(fn(et, e, lam, mu)))
    float(f(ec))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(ec)
    float(out)
    dt = (time.perf_counter()-t0)/20
    print(f"{name}: {dt*1e3:.2f} ms/iter -> {ne/dt:.3e} elems/s", flush=True)
