"""Per-piece wall profile of the ELL/cm geometric cycle on the TPU.

Times each device program standalone (chained batched dispatches, scalar
pull to force execution): fine block-stencil matvec, fine Chebyshev(3),
restrict/prolong gathers per level, mid-level cycles, dense coarse apply,
and the full v_cycle_ell — to find where the ~60 ms/iteration at 1.07M
goes (the full solve is 24 its; compute floor is far lower).

Env: N (default 55), REPS (default 20).
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

N = int(os.environ.get("N", "55"))
REPS = int(os.environ.get("REPS", "20"))


def bench(name, fn, *args, reps=REPS):
    out = fn(*args)
    _ = float(jnp.sum(out))  # compile + force
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"piece": name, "ms": round(dt * 1e3, 3)}),
          flush=True)
    return dt


def main():
    from fem_tpu.io import meshgen
    from fem_tpu.models.system import System
    from fem_tpu.ops import blockstencil as bs
    from fem_tpu.solver import amg, cg, gmg

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        p = meshgen.hex_box_problem(N, N, N, lx=1.0, ly=1.0, lz=1.0,
                                    E=200e9, nu=0.3, tip_load=-1e6,
                                    jitter=0.25)
        s = System(p, dtype=jnp.float64)
        A = amg.assemble_csr(s)
        dims = bs.detect(A, s.pdim, s.nnds)
        h = gmg.build_lattice_ell(A, s.pdim, dims, bc_dofs=s.bc_dofs,
                                  dtype=jnp.float32)
        op = bs.build(A, s.pdim, dims, dtype=jnp.float32)
        bc = np.zeros(s.ndof, dtype=bool)
        bc[np.asarray(s.bc_dofs)] = True
        mf = jnp.asarray(bc.reshape(-1, s.pdim).T.astype(np.float32))
        rng = np.random.default_rng(0)
        r_cm = jnp.asarray(
            rng.standard_normal((s.pdim, s.nnds)).astype(np.float32))
    op, h, mf, r_cm = jax.device_put((op, h, mf, r_cm), tpu)
    print(f"# ndof={s.ndof} levels={len(h.levels)} "
          f"coarse_n={h.coarse_inv.shape[0]}", file=sys.stderr, flush=True)

    # every big array rides as a jit ARGUMENT — closures embed them as
    # HLO constants and hang the relay at this size (CLAUDE.md, HTTP 413)
    @jax.jit
    def fine_mv_j(op_, mf_, v):
        keep = 1.0 - mf_
        return bs.matvec_cm(op_, v * keep) * keep + v * mf_

    bench("fine_matvec_cm", fine_mv_j, op, mf, r_cm)

    lv0 = h.levels[0]

    @jax.jit
    def cheb_fine_j(op_, mf_, lv_, b):
        keep = 1.0 - mf_

        def mv(v):
            return bs.matvec_cm(op_, v * keep) * keep + v * mf_

        return gmg._cheb_cm(mv, lv_, jnp.zeros_like(b), b, 3)

    bench("fine_chebyshev3", cheb_fine_j, op, mf, lv0, r_cm)

    @jax.jit
    def restrict_j(lv_, r):
        return gmg.restrict_cm(lv_, r)

    @jax.jit
    def prolong_j(lv_, x):
        return gmg.prolong_cm(lv_, x)

    bench("restrict_fine", restrict_j, lv0, r_cm)
    nc0 = lv0.rt_vals.shape[1]
    xc0 = jax.device_put(jnp.asarray(
        rng.standard_normal((s.pdim, nc0)).astype(np.float32)), tpu)
    bench("prolong_fine", prolong_j, lv0, xc0)

    @jax.jit
    def mid_mv_j(lv_, v):
        return bs.matvec_cm(lv_.op, v)

    @jax.jit
    def mid_cheb_j(lv_, b):
        return gmg._cheb_cm(lambda v: bs.matvec_cm(lv_.op, v), lv_,
                            jnp.zeros_like(b), b, 3)

    for i in range(1, len(h.levels)):
        lv = h.levels[i]
        ncl = lv.dinv_cm.shape[1]
        rl = jax.device_put(jnp.asarray(
            rng.standard_normal((s.pdim, ncl)).astype(np.float32)), tpu)
        bench(f"mid{i}_matvec", mid_mv_j, lv, rl)
        bench(f"mid{i}_cheb3", mid_cheb_j, lv, rl)
        bench(f"restrict_mid{i}", restrict_j, lv, rl)
        ncn = lv.rt_vals.shape[1]
        xcl = jax.device_put(jnp.asarray(
            rng.standard_normal((s.pdim, ncn)).astype(np.float32)), tpu)
        bench(f"prolong_mid{i}", prolong_j, lv, xcl)

    ncc = h.coarse_inv.shape[0]
    rcc = jax.device_put(jnp.asarray(
        rng.standard_normal((s.pdim, ncc // s.pdim)).astype(np.float32)),
        tpu)

    @jax.jit
    def coarse_j(ci, r):
        return jnp.matmul(ci, r.T.reshape(-1),
                          precision=jax.lax.Precision.HIGHEST)

    bench("coarse_dense", coarse_j, h.coarse_inv, rcc)

    @jax.jit
    def vcycle_j(op_, mf_, h_, r):
        keep = 1.0 - mf_

        def mv(v):
            return bs.matvec_cm(op_, v * keep) * keep + v * mf_

        return gmg.v_cycle_ell(h_, mv, r)

    bench("v_cycle_ell_full", vcycle_j, op, mf, h, r_cm)

    # one full fused CG chunk (4 its) — the production program; the mask
    # rides in the operand pytree (no big closure constants)
    def mv32(ops, v):
        o, _, mf_ = ops
        keep_ = 1.0 - mf_
        return bs.matvec_cm(o, v * keep_) * keep_ + v * mf_

    def pc32(ops, r):
        _, hh, _ = ops
        return gmg.v_cycle_ell(hh, lambda v: mv32(ops, v), r)

    first, advance, _ = cg._chunk_programs(mv32, pc32, 4)
    r, z, rz = first((op, h, mf), r_cm)
    st = advance((op, h, mf), jnp.zeros_like(r_cm), r, z, rz)
    _ = float(st[4])
    t0 = time.perf_counter()
    for _ in range(REPS):
        st = advance((op, h, mf), st[0], st[1], st[2], st[3])
    _ = float(st[4])
    dt = (time.perf_counter() - t0) / REPS
    print(json.dumps({"piece": "cg_chunk4 (4 its)",
                      "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
