"""Solve-level A/B: f32 vs bf16-weights GMG-ELL preconditioner cycle.

The GMG-ELL iteration at 1.07M dofs is bandwidth-bound on the fine
block-stencil coefficient reads: the (27, pdim, pdim, *dims) vals array
(348 MB f32) streams 4x per CG iteration (1 CG matvec + 3 Chebyshev
applies), and tools/profile_gmg_ell.py puts the fine Chebyshev at
9.3 ms of the 18.9 ms/iteration. Casting the PRECONDITIONER's weights
(hierarchy + a second fine-op copy) to bf16 halves that dominant
traffic. The CG matvec stays f32: iterative refinement's contraction is
~kappa * operator-rounding, so a bf16 CG operator would stall the f64
outer loop, while the preconditioner only shifts the inner iteration
count (PCG tolerates an approximate, slightly nonlinear M^-1).

Standalone piece timings are NOT trustable on this relay (CLAUDE.md
TIMING TRAP) — this tool times the fused chunk program AND runs the
full production IR solve (cg.ir_pcg_chunked, same config as
bench.bench_amg_solve) both ways, reporting wall / inner iterations /
final relative residual as JSON lines.

Env: N (default 55 -> 527k dofs), REPS (default 20).
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# operand pytree: (op64, op32, h32, op_lo, h_lo, mf64, mf32, mf_lo, F64)
# module-level functions so the chunk-program cache keys stay stable


def mv32(ops, v):
    op32, mf32 = ops[1], ops[6]
    keep = 1.0 - mf32
    from fem_tpu.ops import blockstencil as bs
    return bs.matvec_cm(op32, v * keep) * keep + v * mf32


def pc32(ops, r):
    op32, h32, mf32 = ops[1], ops[2], ops[6]
    keep = 1.0 - mf32
    from fem_tpu.ops import blockstencil as bs
    from fem_tpu.solver import gmg

    def fine(v):
        return bs.matvec_cm(op32, v * keep) * keep + v * mf32

    return gmg.v_cycle_ell(h32, fine, r)


def pc_lo(ops, r):
    op_lo, h_lo, mf_lo = ops[3], ops[4], ops[7]
    keep = 1.0 - mf_lo
    from fem_tpu.ops import blockstencil as bs
    from fem_tpu.solver import gmg

    def fine(v):
        return bs.matvec_cm(op_lo, v * keep) * keep + v * mf_lo

    out = gmg.v_cycle_ell(h_lo, fine, r.astype(op_lo.vals.dtype))
    return out.astype(r.dtype)


def main():
    from fem_tpu.io import meshgen
    from fem_tpu.models.system import System
    from fem_tpu.ops import blockstencil as bs
    from fem_tpu.solver import amg, cg, gmg

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        p = meshgen.hex_box_problem(N, N, N, lx=1.0, ly=1.0, lz=1.0,
                                    E=200e9, nu=0.3, tip_load=-1e6,
                                    jitter=0.25)
        s = System(p, dtype=jnp.float64)
        A = amg.assemble_csr(s)
        dims = bs.detect(A, s.pdim, s.nnds)
        h32 = gmg.build_lattice_ell(A, s.pdim, dims, bc_dofs=s.bc_dofs,
                                    dtype=jnp.float32)
        op64 = bs.build(A, s.pdim, dims)
        op32 = op64.astype(jnp.float32)
        op_lo = op64.astype(jnp.bfloat16)
        h_lo = h32.astype(jnp.bfloat16)
        bc = np.zeros(s.ndof, dtype=bool)
        bc[np.asarray(s.bc_dofs)] = True
        bc_cm = bc.reshape(-1, s.pdim).T
        mf64 = jnp.asarray(bc_cm.astype(np.float64))
        mf32 = jnp.asarray(bc_cm.astype(np.float32))
        mf_lo = jnp.asarray(bc_cm.astype(np.float32)).astype(jnp.bfloat16)
        F64 = jnp.asarray(
            np.asarray(s.rhs(0.0)).reshape(-1, s.pdim).T)
        rng = np.random.default_rng(0)
        r_cm = jnp.asarray(
            rng.standard_normal((s.pdim, s.nnds)).astype(np.float32))
    log(f"setup done ndof={s.ndof} levels={len(h32.levels)} "
        f"({time.perf_counter() - t0:.1f}s)")
    ops = jax.device_put(
        (op64, op32, h32, op_lo, h_lo, mf64, mf32, mf_lo, F64), tpu)
    r_cm = jax.device_put(r_cm, tpu)
    op64d, F64d, mf64d = ops[0], ops[8], ops[5]

    # ---- fused chunk timing (the production program shape) ----
    def chunk_time(pc, tag):
        first, advance, _ = cg._chunk_programs(mv32, pc, 4)
        r, z, rz = first(ops, r_cm)
        st = advance(ops, jnp.zeros_like(r_cm), r, z, rz)
        _ = float(st[4])
        t0 = time.perf_counter()
        for _ in range(REPS):
            st = advance(ops, st[0], st[1], st[2], st[3])
        _ = float(st[4])
        dt = (time.perf_counter() - t0) / REPS
        print(json.dumps({"piece": f"cg_chunk4[{tag}]",
                          "ms_per_iter": round(dt * 1e3 / 4, 3)}),
              flush=True)

    chunk_time(pc32, "f32")
    chunk_time(pc_lo, "bf16pc")

    # ---- full production IR solve (bench.bench_amg_solve config) ----
    @jax.jit
    def true_resid(fop, Fv, mf, x2):
        keep = 1.0 - mf
        ax = bs.matvec_cm(fop, x2 * keep) * keep + x2 * mf
        r = Fv * keep - ax
        return r, r.astype(jnp.float32), jnp.sqrt(jnp.sum(r * r))

    def _tr(x2):
        _, r32, rn_dev = true_resid(op64d, F64d, mf64d, x2)
        return r32, rn_dev

    def _comb(x2, dx32):
        return x2 + dx32.astype(jnp.float64) * (1.0 - mf64d)

    def solve(pc, tag, reps=3):
        _, _, r0n_dev = true_resid(op64d, F64d, mf64d,
                                   jnp.zeros_like(F64d, dtype=jnp.float64))
        r0n = max(float(r0n_dev), 1e-300)
        walls = []
        for i in range(reps):
            t0 = time.perf_counter()
            x, inner, rel = cg.ir_pcg_chunked(
                _tr, _comb, mv32, pc, ops,
                jnp.zeros_like(F64d, dtype=jnp.float64),
                rtol=1e-9, maxcycles=6, maxiter=120, chunk=4, adapt=True)
            _, _, rn = true_resid(op64d, F64d, mf64d, x)
            rfin = float(rn)
            walls.append(time.perf_counter() - t0)
            print(json.dumps({
                "solve": tag, "run": i, "wall_s": round(walls[-1], 3),
                "inner_its": int(inner), "rel_est": float(rel),
                "rel_final": rfin / r0n,
            }), flush=True)
        print(json.dumps({"solve": tag, "min_wall_s": round(min(walls), 3),
                          "ndof": s.ndof}), flush=True)

    solve(pc32, "f32")
    solve(pc_lo, "bf16pc")


if __name__ == "__main__":
    main()
