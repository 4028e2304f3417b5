"""Stage timing for the batch-last hex8 stiffness kernel (v1)."""
import time, numpy as np, jax, jax.numpy as jnp
from fem_tpu.ops import elements, stiffness

et = elements.get("hex")
ne = 131072
rng = np.random.default_rng(0)
base = np.array([[0,0,0],[1,0,0],[1,1,0],[0,1,0],[0,0,1],[1,0,1],[1,1,1],[0,1,1]], np.float32)
ec = jnp.asarray(np.transpose(base[None]+rng.normal(size=(ne,1,3)).astype(np.float32)
                 +0.05*rng.normal(size=(ne,8,3)).astype(np.float32), (2,1,0)))
lam, mu = stiffness.lame(jnp.full(ne, 200e9, jnp.float32), jnp.full(ne, 0.3, jnp.float32))
dN = jnp.asarray(et.dN, dtype=ec.dtype)
w = jnp.asarray(et.weights, dtype=ec.dtype)

def stage_dNx(ecl):
    J = jnp.einsum("ipa,dae->ipde", dN, ecl)
    det, inv = stiffness._det_inv_batchlast(J)
    dNx = jnp.einsum("ipqe,iqa->ipae", inv, dN)
    s = det * w[:, None]
    return dNx, s

def stage_H(dNx, s):
    return jnp.sum(dNx[:, :, :, None, None, :] * dNx[:, None, None, :, :, :]
                   * s[:, None, None, None, None, :], axis=0)

def stage_tail(H):
    term = lam * H + mu * jnp.transpose(H, (2, 1, 0, 3, 4))
    ke = jnp.transpose(term, (1, 0, 3, 2, 4))
    tr = jnp.einsum("kakbe->abe", H)
    eye = jnp.eye(3, dtype=H.dtype)
    return ke + mu * tr[:, None, :, None, :] * eye[None, :, None, :, None]

def t(f, *a, iters=20):
    g = jax.jit(lambda *aa: jax.tree_util.tree_map(jnp.sum, f(*aa)))
    r = g(*a); jax.tree_util.tree_map(float, r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(*a)
    jax.tree_util.tree_map(float, r)
    return (time.perf_counter()-t0)/iters*1e3

print("dNx stage:", round(t(stage_dNx, ec), 2), "ms", flush=True)
dNx, s = jax.jit(stage_dNx)(ec)
print("H stage:", round(t(stage_H, dNx, s), 2), "ms", flush=True)
H = jax.jit(stage_H)(dNx, s)
print("tail stage:", round(t(stage_tail, H), 2), "ms", flush=True)
