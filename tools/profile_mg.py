"""Per-phase TPU profile of the structured MG-IR big solve at bench scale.

The solve-level record shows planes27 (3.3 ms standalone matvec, 6x the
planes schedule) did NOT move the fused solve (1.02 -> 1.06 s at 1.59M
dofs): inside the fused chunk program something other than the standalone
matvec binds. This times each phase as its own jitted program on the chip:

  - matvec_g f32 (planes / planes27), masked matvec
  - full fused V-cycle (chebyshev deg 3, jacobi nu 2+2)
  - restrict_g / prolong_g at the fine level
  - f64 masked matvec (the IR outer true-residual cost)
  - one complete MG-CG iteration body (A + V-cycle + dots), both smoothers

All setup on the CPU backend (the bench_big_solve pattern), results to
stderr + JSON appended to BENCH_extra.json.
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


RESULTS = {}


def _force(out):
    """Force execution (float(sum) — block_until_ready is unreliable through
    the relay); handles tuple-returning programs by forcing every leaf."""
    return sum(float(jnp.sum(o)) for o in jax.tree_util.tree_leaves(out))


def timeit(name, fn, *args, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    log(f"{name:34s} {dt:9.3f} ms   (cold {cold:.1f}s)")
    RESULTS[name] = round(dt, 3)
    return dt


def main():
    import fem_tpu  # noqa: F401  (enables x64)
    from fem_tpu.io import meshgen
    from fem_tpu.models.system import System
    from fem_tpu.ops import structured
    from fem_tpu.ops.stiffness import lame
    from fem_tpu.solver import multigrid

    n = int(os.environ.get("FEM_TPU_BENCH_N", "80"))
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    log(f"TPU preflight: {jax.devices()}")
    x = jnp.ones((256, 256), jnp.float32)
    float(jnp.sum(jax.device_put(x, tpu) @ jax.device_put(x, tpu)))
    log("preflight ok")

    with jax.default_device(cpu):
        problem = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0,
                                          E=200e9, nu=0.3, tip_load=-1e6)
        system = System(problem, dtype=jnp.float64)
        ndof = system.ndof
        log(f"{problem.nels} hex8 elements, {ndof} dofs")
        lam, mu = lame(jnp.asarray(200e9), jnp.asarray(0.3))
        op64 = structured.build(
            (1.0 / n,) * 3, (n + 1,) * 3, lam, mu
        ).with_impl("planes27")
        op32 = op64.astype(jnp.float32)
        hier_c = multigrid.build(op32, system.bc_dofs, smoother="chebyshev")
        hier_j = multigrid.build(op32, system.bc_dofs, smoother="jacobi")
        bc_mask = jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True)
        mf32 = jnp.asarray(bc_mask, jnp.float32)
        rng = np.random.default_rng(0)
        u_np = rng.standard_normal(ndof)
    gsh = (n + 1, n + 1, n + 1, 3)
    op64, op32, hier_c, hier_j, mf32 = jax.device_put(
        (op64, op32, hier_c, hier_j, mf32), tpu)
    u32 = jax.device_put(jnp.asarray(u_np, jnp.float32).reshape(gsh), tpu)
    u64 = jax.device_put(jnp.asarray(u_np, jnp.float64).reshape(gsh), tpu)
    mf32_g = mf32.reshape(gsh)
    mf64_g = jax.device_put(
        jnp.asarray(np.asarray(bc_mask), jnp.float64).reshape(gsh), tpu)
    op32_p = op32.with_impl("planes")
    log("setup done, arrays on device")

    mv27 = jax.jit(structured.matvec_g)
    timeit("matvec_g planes27 f32", mv27, op32, u32)
    mvp = jax.jit(structured.matvec_g)
    timeit("matvec_g planes f32", mvp, op32_p, u32)

    @jax.jit
    def mv_masked(op, v, mf):
        keep = 1.0 - mf
        return structured.matvec_g(op, v * keep) * keep + v * mf

    timeit("masked matvec planes27 f32", mv_masked, op32, u32, mf32_g)
    timeit("masked matvec f64 (IR resid)", mv_masked, op64, u64, mf64_g)

    vc = jax.jit(multigrid.v_cycle_g)
    timeit("v_cycle chebyshev(3)", vc, hier_c, u32)
    timeit("v_cycle jacobi(2,2)", vc, hier_j, u32)

    # fine-level smoother alone (the dominant term on paper)
    cheb = jax.jit(multigrid._cheb_g, static_argnames=("degree",))
    timeit("fine chebyshev(3) smooth", cheb, hier_c.levels[0], 3,
           jnp.zeros_like(u32), u32)

    shape0 = hier_c.levels[0].op.shape
    rg = jax.jit(lambda a, m: a * (1.0 - m))(u32, mf32_g)
    rst = jax.jit(multigrid.restrict_g, static_argnames=("fine_shape", "pdim"))
    timeit("restrict_g fine->L1", rst, rg, shape0, 3)
    csh = hier_c.levels[1].op.shape + (3,)
    xc = jax.device_put(jnp.asarray(
        rng.standard_normal(int(np.prod(csh))), jnp.float32).reshape(csh), tpu)
    prl = jax.jit(multigrid.prolong_g, static_argnames=("fine_shape", "pdim"))
    timeit("prolong_g L1->fine", prl, xc, shape0, 3)

    # level-1 (41^3) V-cycle work: one masked matvec there
    l1 = hier_c.levels[1]
    u1 = jax.device_put(jnp.asarray(
        rng.standard_normal(int(np.prod(csh))), jnp.float32).reshape(csh), tpu)
    mf1 = l1.maskf.reshape(csh)
    timeit("masked matvec L1 (41^3)", mv_masked, l1.op, u1, mf1)

    # one full MG-CG iteration body (A matvec + V-cycle + CG vector algebra)
    def cg_iter(h, op, mf, x, r, p, z_unused):
        keep = 1.0 - mf
        Ap = structured.matvec_g(op, p * keep) * keep + p * mf
        pAp = jnp.sum(p * Ap)
        rz = jnp.sum(r * r)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = multigrid.v_cycle_g(h, r)
        beta = jnp.sum(r * z) / rz
        p = z + beta * p
        return x, r, p

    ci = jax.jit(cg_iter)
    timeit("full MG-CG iter chebyshev", ci, hier_c, op32, mf32_g,
           u32, u32, u32, u32)
    timeit("full MG-CG iter jacobi", ci, hier_j, op32, mf32_g,
           u32, u32, u32, u32)

    rec = {"metric": "mg_profile", "ndof": int(ndof), **RESULTS}
    log(json.dumps(rec))
    try:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_extra.json")
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
