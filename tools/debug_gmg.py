"""Diagnose the n=70 (1.07M-dof) GMG NaN (BENCH_extra tail: rel_residual
NaN, 120 inner iters) by separating TPU miscompile from algorithmic
divergence.

Stages (env STAGE, comma list; default "vcycle"):
  vcycle — apply mv32 and one GMG V-cycle to a fixed vector on the TARGET
           device AND on the CPU backend; print rel diffs.
  cg     — run one chunk (4 its) of pcg_chunked on both backends; compare.
  solve  — run the bench IR loop with per-cycle residual logging.

Env: N (default 70), PLAT (tpu|cpu, default tpu), DEGREE, COARSE_MAX.
"""
import os
import sys
import time

N = int(os.environ.get("N", "70"))
PLAT = os.environ.get("PLAT", "tpu")
STAGES = os.environ.get("STAGE", "vcycle").split(",")
if PLAT == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if PLAT == "cpu":
    jax.config.update("jax_platforms", "cpu")
from fem_tpu.utils import jaxcache

jaxcache.enable(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def log(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    from fem_tpu.io import meshgen
    from fem_tpu.models.system import System
    from fem_tpu.solver import amg, cg, gmg
    from fem_tpu.ops import blockstencil as bs

    cpu = jax.devices("cpu")[0]
    tgt = jax.devices()[0] if PLAT != "cpu" else cpu
    n = N
    with jax.default_device(cpu):
        p = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0,
                                    E=200e9, nu=0.3, tip_load=-1e6,
                                    jitter=0.25)
        s = System(p, dtype=jnp.float64)
        log(f"ndof={s.ndof}")
        A_csr = amg.assemble_csr(s)
        dims = bs.detect(A_csr, s.pdim, s.nnds)
        log(f"dims={dims}")
        h32 = gmg.build_lattice(
            A_csr, s.pdim, dims, bc_dofs=s.bc_dofs,
            coarse_max=int(os.environ.get("COARSE_MAX", "2400")),
            degree=int(os.environ.get("DEGREE", "3")),
            dtype=jnp.float32)
        for i, lv in enumerate(h32.levels):
            log(f"  gmg level {i}: dims={lv.dims} theta={lv.theta:.4g} "
                f"delta={lv.delta:.4g} coarsen={lv.coarsen}")
        log(f"  coarse dims={h32.coarse_dims} "
            f"inv n={h32.coarse_inv.shape}")
        op64 = bs.build(A_csr, s.pdim, dims)
        op32 = op64.astype(jnp.float32)
        del A_csr
        bc_mask = np.zeros(s.ndof, bool)
        bc_mask[np.asarray(s.bc_dofs)] = True
        nnds = s.ndof // s.pdim
        mf32_cm = jnp.asarray(
            bc_mask.astype(np.float32).reshape(nnds, s.pdim).T)
        F = s.rhs(0.0)
        F_cm = jnp.asarray(np.asarray(F).reshape(nnds, s.pdim).T)
        rng = np.random.default_rng(0)
        v_cm = jnp.asarray(rng.standard_normal(
            (s.pdim, nnds)).astype(np.float32))

    def mk(dev):
        return jax.device_put((op32, h32, mf32_cm, v_cm), dev)

    def mv32(ops, v):
        o, _, mf = ops
        keep = 1.0 - mf
        return bs.matvec_cm(o, v * keep) * keep + v * mf

    def pc32(ops, r):
        o, hh, mf = ops
        keep = 1.0 - mf

        def fine_mv(v):
            return bs.matvec_cm(o, v * keep) * keep + v * mf

        return gmg.v_cycle_cm(hh, fine_mv, r)

    def pull(x):
        return np.asarray(jax.device_get(x))

    if any(st in STAGES
           for st in ("gvcycle", "gcheb", "gtrans", "gcg", "gdepth")):
        # GRID-form stages (round 4): the bench moved to bs.matvec_g +
        # gmg.v_cycle_g and still NaNs at n=70 — isolate which grid piece
        # diverges between TPU and CPU.
        gsh = (s.pdim,) + tuple(dims)
        with jax.default_device(cpu):
            mf_g_host = mf32_cm.reshape(gsh)
            v_g_host = v_cm.reshape(gsh)

        def mkg(dev):
            return jax.device_put((op32, h32, mf_g_host, v_g_host), dev)

        def mv_g(ops, v):
            o, _, mf = ops
            keep = 1.0 - mf
            return bs.matvec_g(o, v * keep) * keep + v * mf

        def pc_g(ops, r):
            o, hh, mf = ops
            keep = 1.0 - mf

            def fine_mv(v):
                return bs.matvec_g(o, v * keep) * keep + v * mf

            return gmg.v_cycle_g(hh, fine_mv, r)

        def cheb_g(ops, r):
            o, hh, mf = ops
            keep = 1.0 - mf

            def fine_mv(v):
                return bs.matvec_g(o, v * keep) * keep + v * mf

            lv = hh.levels[0]
            return gmg._cheb_g(fine_mv, lv, jnp.zeros_like(r), r, hh.degree)

        def trans_g(ops, r):
            _, hh, _ = ops
            lv = hh.levels[0]
            rc = gmg.restrict_g(r, lv.coarsen)
            return gmg.prolong_g(rc, lv.dims, lv.coarsen)

        fns = {"gcheb": cheb_g, "gtrans": trans_g, "gvcycle": pc_g}
        o_c, h_c, mf_c, v_c = mkg(cpu)
        if PLAT != "cpu":
            o_t, h_t, mf_t, v_t = mkg(tgt)
        mv_cpu = pull(jax.jit(mv_g)((o_c, h_c, mf_c), v_c))
        log(f"cpu: |mv_g|={np.linalg.norm(mv_cpu):.6e}")
        if PLAT != "cpu":
            mv_t = pull(jax.jit(mv_g)((o_t, h_t, mf_t), v_t))
            d = np.linalg.norm(mv_t - mv_cpu) / np.linalg.norm(mv_cpu)
            log(f"tpu mv_g: rel={d:.3e} finite={np.isfinite(mv_t).all()}")
        for name in ("gcheb", "gtrans", "gvcycle"):
            if name not in STAGES:
                continue
            f = fns[name]
            z_cpu = pull(jax.jit(f)((o_c, h_c, mf_c), v_c))
            log(f"cpu {name}: |z|={np.linalg.norm(z_cpu):.6e} "
                f"finite={np.isfinite(z_cpu).all()}")
            if PLAT != "cpu":
                z_t = pull(jax.jit(f)((o_t, h_t, mf_t), v_t))
                d = np.linalg.norm(z_t - z_cpu) / max(
                    np.linalg.norm(z_cpu), 1e-30)
                ok = np.isfinite(z_t).all()
                log(f"tpu {name}: rel={d:.3e} finite={ok}")
                if d > 1e-3 or not ok:
                    err = np.abs(z_t - z_cpu).reshape(s.pdim, -1)
                    bad = np.argwhere(err > err.max() * 0.5)
                    log(f"  worst err={err.max():.3e} at flat idx "
                        f"{bad[:10].tolist()} of {err.shape}")

        if "gdepth" in STAGES:
            # bisect the fused V-cycle: every piece is exact standalone
            # (gcheb/gtrans/mv_g) but the full recursion NaNs — find the
            # minimal fused composition that corrupts.
            def mk_partial(depth, with_coarse):
                def f(ops, r):
                    o, hh, mf = ops
                    keep = 1.0 - mf

                    def fine_mv(v):
                        return bs.matvec_g(o, v * keep) * keep + v * mf

                    def go(i, mvf, rg):
                        lv = hh.levels[i]
                        x = gmg._cheb_g(mvf, lv, jnp.zeros_like(rg), rg,
                                        hh.degree)
                        res = rg - mvf(x)
                        rc = gmg.restrict_g(res, lv.coarsen)
                        if i + 1 > depth or i + 1 == len(hh.levels):
                            if with_coarse and i + 1 == len(hh.levels):
                                pdim = hh.pdim
                                rf = rc.reshape(pdim, -1).T.reshape(-1)
                                xf = jnp.matmul(
                                    hh.coarse_inv, rf,
                                    precision=jax.lax.Precision.HIGHEST)
                                xc = xf.reshape(-1, pdim).T.reshape(rc.shape)
                            else:
                                xc = jnp.zeros_like(rc)
                        else:
                            nxt = hh.levels[i + 1]
                            xc = go(i + 1,
                                    lambda v: bs.matvec_g(nxt.op, v), rc)
                        x = x + gmg.prolong_g(xc, lv.dims, lv.coarsen)
                        return gmg._cheb_g(mvf, lv, x, rg, hh.degree)

                    return go(0, fine_mv, r)
                return f

            def lvl2_standalone(ops, r):
                # transfers down to level 2, cheb there, transfers back —
                # no level-0/1 smoothing: isolates "level-2 apply is bad"
                # from "the fused program got too deep"
                _, hh, _ = ops
                l0, l1, l2 = hh.levels[0], hh.levels[1], hh.levels[2]
                rc1 = gmg.restrict_g(r, l0.coarsen)
                rc2 = gmg.restrict_g(rc1, l1.coarsen)
                x2 = gmg._cheb_g(lambda v: bs.matvec_g(l2.op, v), l2,
                                 jnp.zeros_like(rc2), rc2, hh.degree)
                x1 = gmg.prolong_g(x2, l1.dims, l1.coarsen)
                return gmg.prolong_g(x1, l0.dims, l0.coarsen)

            def mk_barrier():
                def f(ops, r):
                    o, hh, mf = ops
                    keep = 1.0 - mf

                    def fine_mv(v):
                        return bs.matvec_g(o, v * keep) * keep + v * mf

                    def go(i, mvf, rg):
                        lv = hh.levels[i]
                        x = gmg._cheb_g(mvf, lv, jnp.zeros_like(rg), rg,
                                        hh.degree)
                        res = rg - mvf(x)
                        rc = gmg.restrict_g(res, lv.coarsen)
                        if i + 1 == 3 or i + 1 == len(hh.levels):
                            xc = jnp.zeros_like(rc)
                        else:
                            nxt = hh.levels[i + 1]
                            rc = jax.lax.optimization_barrier(rc)
                            xc = go(i + 1,
                                    lambda v: bs.matvec_g(nxt.op, v), rc)
                            xc = jax.lax.optimization_barrier(xc)
                        x = x + gmg.prolong_g(xc, lv.dims, lv.coarsen)
                        return gmg._cheb_g(mvf, lv, x, rg, hh.degree)

                    return go(0, fine_mv, r)
                return f

            for depth, wc, tag in ((0, False, "d0-nocoarse"),
                                   (1, False, "d1-nocoarse"),
                                   (2, False, "d2-nocoarse"),
                                   (2, False, "d2-barrier"),
                                   (-1, False, "lvl2-standalone"),
                                   (3, True, "full")):
                if tag == "lvl2-standalone":
                    f = lvl2_standalone
                elif tag == "d2-barrier":
                    f = mk_barrier()
                else:
                    f = mk_partial(depth, wc)
                z_cpu = pull(jax.jit(f)((o_c, h_c, mf_c), v_c))
                line = (f"{tag}: cpu |z|={np.linalg.norm(z_cpu):.6e} "
                        f"finite={np.isfinite(z_cpu).all()}")
                if PLAT != "cpu":
                    z_t = pull(jax.jit(f)((o_t, h_t, mf_t), v_t))
                    d = np.linalg.norm(z_t - z_cpu) / max(
                        np.linalg.norm(z_cpu), 1e-30)
                    line += (f" | tpu rel={d:.3e} "
                             f"finite={np.isfinite(z_t).all()}")
                log(line)

        if "gcg" in STAGES and PLAT != "cpu":
            for dev, tag in ((cpu, "cpu"), (tgt, "tpu")):
                o_d, h_d, mf_d, _ = mkg(dev)
                F_d = jax.device_put(
                    F_cm.reshape(gsh).astype(jnp.float32), dev)
                res_d = cg.pcg_chunked(mv_g, F_d, pc_g, (o_d, h_d, mf_d),
                                       rtol=1e-30, maxiter=8, chunk=4,
                                       pipeline=False)
                x_d = pull(res_d.x)
                log(f"{tag} gcg8: |x|={np.linalg.norm(x_d):.6e} "
                    f"finite={np.isfinite(x_d).all()} "
                    f"rn={float(res_d.resnorm):.6e}")

    if "vcycle" in STAGES:
        o_c, h_c, mf_c, v_c = mk(cpu)
        ops_c = (o_c, h_c, mf_c)
        # jit follows input placement: ops_c/v_c live on the cpu device
        mv_cpu = pull(jax.jit(mv32)(ops_c, v_c))
        pc_cpu = pull(jax.jit(pc32)(ops_c, v_c))
        log(f"cpu: |mv|={np.linalg.norm(mv_cpu):.6e} "
            f"|pc|={np.linalg.norm(pc_cpu):.6e} "
            f"finite={np.isfinite(pc_cpu).all()}")
        if PLAT != "cpu":
            o_t, h_t, mf_t, v_t = mk(tgt)
            ops_t = (o_t, h_t, mf_t)
            mv_t = pull(jax.jit(mv32)(ops_t, v_t))
            pc_t = pull(jax.jit(pc32)(ops_t, v_t))
            dmv = np.linalg.norm(mv_t - mv_cpu) / np.linalg.norm(mv_cpu)
            dpc = np.linalg.norm(pc_t - pc_cpu) / np.linalg.norm(pc_cpu)
            log(f"tpu vs cpu: mv rel={dmv:.3e} pc rel={dpc:.3e} "
                f"pc finite={np.isfinite(pc_t).all()}")
            # locate worst rows if bad
            if dpc > 1e-3 or not np.isfinite(pc_t).all():
                err = np.abs(pc_t - pc_cpu)
                bad = np.argwhere(err > err.max() * 0.5)
                log(f"  worst err={err.max():.3e} at {bad[:10].tolist()} "
                    f"of shape {err.shape}")

    if "cg" in STAGES:
        o_c, h_c, mf_c, v_c = mk(cpu)
        F_c = jax.device_put(F_cm.astype(jnp.float32), cpu)
        res_c = cg.pcg_chunked(mv32, F_c, pc32, (o_c, h_c, mf_c),
                               rtol=1e-30, maxiter=4, chunk=4,
                               pipeline=False)
        x_c = pull(res_c.x)
        log(f"cpu cg4: |x|={np.linalg.norm(x_c):.6e} "
            f"finite={np.isfinite(x_c).all()}")
        if PLAT != "cpu":
            o_t, h_t, mf_t, _ = mk(tgt)
            F_t = jax.device_put(F_cm.astype(jnp.float32), tgt)
            res_t = cg.pcg_chunked(mv32, F_t, pc32, (o_t, h_t, mf_t),
                                   rtol=1e-30, maxiter=4, chunk=4,
                                   pipeline=False)
            x_t = pull(res_t.x)
            d = np.linalg.norm(x_t - x_c) / max(np.linalg.norm(x_c), 1e-30)
            log(f"tpu cg4: rel={d:.3e} finite={np.isfinite(x_t).all()}")

    if "solve" in STAGES:
        dev = tgt
        o_t, h_t, mf_t, _ = mk(dev)
        mf64_cm = mf_t.astype(jnp.float64)
        op64_d = jax.device_put(op64, dev)
        F64 = jax.device_put(F_cm, dev).astype(jnp.float64)

        @jax.jit
        def true_resid(fop, Fv, mf, x2):
            keep = 1.0 - mf
            ax = bs.matvec_cm(fop, x2 * keep) * keep + x2 * mf
            r = Fv * keep - ax
            return r, r.astype(jnp.float32), jnp.sqrt(jnp.sum(r * r))

        x = jnp.zeros_like(F64)
        r0 = None
        for k in range(6):
            _, r32, rn_dev = true_resid(op64_d, F64, mf64_cm, x)
            rn = float(rn_dev)
            if r0 is None:
                r0 = rn
            log(f"cycle {k}: rn={rn:.6e} rel={rn / r0:.3e}")
            if rn <= 1e-9 * r0 or not np.isfinite(rn):
                break
            cyc_rtol = float(np.clip(0.5 * 1e-9 * r0 / rn, 1e-5, 0.5))
            res = cg.pcg_chunked(mv32, r32, pc32, (o_t, h_t, mf_t),
                                 rtol=cyc_rtol, maxiter=120,
                                 chunk=4, pipeline=False, bnorm=rn)
            log(f"  inner iters={int(res.iters)} "
                f"|dx|={float(jnp.linalg.norm(res.x)):.3e}")
            x = x + res.x.astype(jnp.float64) * (1.0 - mf64_cm)


if __name__ == "__main__":
    main()
