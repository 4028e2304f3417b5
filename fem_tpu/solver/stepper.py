"""Incremental quasi-static time stepping — the driver loop.

Mirrors main.F90:216-296: for interval k = 1,2,..., t_init = dt*(k-1) until
t_init >= t; each step forms the time-windowed RHS, solves (direct KSP for
linear decks, Newton/SNES for cohesive decks), accumulates
aggregate_u += du and aggregate_stress += nodal stress of the increment.
`stype == "explicit"` is accepted but performs no solve, writing zeros — the
reference behaves the same (main.F90:199,238; SURVEY.md §2d.6).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.config import Config
from fem_tpu.models.problem import Problem
from fem_tpu.models.system import PENALTY, System
from fem_tpu.solver import cg, direct, newton


# ---------------------------------------------------------------------------
# Module-level chunked-CG operator/preconditioner functions.
#
# These are the functions handed to cg.pcg_chunked, whose trace+compile cache
# keys on function IDENTITY — per-run closures would retrace the minutes-long
# chunk program every stepper.run() and pin dead hierarchies in the cache
# (ADVICE r2). All state (operator, hierarchy, float masks) rides in the
# `ops` operand pytree instead.
# ---------------------------------------------------------------------------


def _st_mv_g(ops, vg):
    """Masked structured stencil matvec on GRID-shaped state."""
    from fem_tpu.ops import structured

    mf = ops["mf_g"]
    keep = 1.0 - mf
    return structured.matvec_g(ops["op"], vg * keep) * keep + vg * mf


def _st_pc_g(ops, rg):
    from fem_tpu.solver import multigrid

    return multigrid.v_cycle_g(ops["hier"], rg)


@jax.jit
def _st_true_resid_g(op, bg, mf, xg):
    from fem_tpu.ops import structured

    keep = 1.0 - mf
    ax = structured.matvec_g(op, xg * keep) * keep + xg * mf
    r = bg - ax
    # norm rides the same program/pull: the production solves are relay-
    # round-trip-bound (tools/sync_cost.py), one blocking pull ~tens of ms
    return r, jnp.sqrt(jnp.sum(r * r))


def _mv_any_cm(op, v):
    """Component-major K @ v for either fine-operator tier: the fused
    gather schedule (any topology) or the lattice block stencil (zero
    gathers — ops/blockstencil.py). Dispatch is on the operand's pytree
    type, resolved at trace time."""
    from fem_tpu.ops import blockstencil as bs_mod
    from fem_tpu.ops import operator as op_mod

    if isinstance(op, bs_mod.BlockStencilOperator):
        return bs_mod.matvec_cm(op, v)
    return op_mod.matvec_cm(op, v)


def _amg_mv_cm(ops, v):
    """Masked unstructured matvec in component-major (pdim, nnds)."""
    mf = ops["mf_cm"]
    keep = 1.0 - mf
    return _mv_any_cm(ops["op"], v * keep) * keep + v * mf


def _amg_pc_cm(ops, r):
    from fem_tpu.solver import amg as amg_mod

    return amg_mod.v_cycle_cm(ops["hier"], lambda v: _amg_mv_cm(ops, v), r)


def _gmg_pc_cm(ops, r):
    """Geometric lattice-MG V-cycle (solver/gmg.py): preferred over the SA
    cycle on lattice-topology decks — every level is a gather-free block
    stencil (the SA cycle's cost is its first coarse level's ELL gather
    matvec; see gmg.py's measurements)."""
    from fem_tpu.solver import gmg as gmg_mod

    return gmg_mod.v_cycle_cm(ops["hier"], lambda v: _amg_mv_cm(ops, v), r)


def _gmg_pc_ell(ops, r):
    """ELL/cm-shaped geometric cycle (gmg.build_lattice_ell) — the
    production 3D-lattice preconditioner: component-major state end-to-end,
    the program shape miscompile #6 never hits (grid-state 3D cycles are
    declined by gmg.build_lattice on TPU-class backends)."""
    from fem_tpu.solver import gmg as gmg_mod

    return gmg_mod.v_cycle_ell(ops["hier"], lambda v: _amg_mv_cm(ops, v),
                               r)


def _gmg_mv_g(ops, v):
    """Masked lattice-stencil matvec in GRID shape (pdim, *dims) — the
    TPU-safe solver state for fused chunk programs at ~1M dofs: the
    component-major (pdim, nnds) form fuses the float-mask multiply onto
    matvec_cm's trailing grid->cm reshape and silently corrupts the array
    tail (miscompile class #5, CLAUDE.md; observed as a NaN GMG solve at
    ndof=1073733 while exact at 526848 and exact on CPU —
    tools/debug_gmg.py). Grid-shaped combines are exact, as proven by
    structured.matvec_g at 1.59M."""
    from fem_tpu.ops import blockstencil as bs_mod

    mf = ops["mf_g"]
    keep = 1.0 - mf
    return bs_mod.matvec_g(ops["op"], v * keep) * keep + v * mf


def _gmg_pc_g(ops, r):
    from fem_tpu.solver import gmg as gmg_mod

    return gmg_mod.v_cycle_g(ops["hier"], lambda v: _gmg_mv_g(ops, v), r)


@jax.jit
def _gmg_true_resid_cm(fop, b_cm, mf_g, x_cm):
    """f64 true residual for the grid-state GMG route: cm in/out at the
    jit boundary (reshape of jit inputs and a trailing reshape as the
    LAST op are safe — CLAUDE.md #5), grid-shaped combines inside."""
    from fem_tpu.ops import blockstencil as bs_mod

    gsh = mf_g.shape
    keep = 1.0 - mf_g
    xg = x_cm.reshape(gsh)
    ax = bs_mod.matvec_g(fop, xg * keep) * keep + xg * mf_g
    r = b_cm.reshape(gsh) - ax
    rn = jnp.sqrt(jnp.sum(r * r))
    return r.reshape(b_cm.shape), rn


@jax.jit
def _amg_true_resid_cm(fop, bg, mf, x):
    keep = 1.0 - mf
    ax = _mv_any_cm(fop, x * keep) * keep + x * mf
    r = bg - ax
    return r, jnp.sqrt(jnp.sum(r * r))


def _lattice_csr(system, n):
    """Assemble the elastic CSR once and probe tier-2 (lattice-topology)
    eligibility. Returns (A_csr, dims_or_None)."""
    from fem_tpu.ops import blockstencil as bs_mod
    from fem_tpu.solver import amg as amg_mod

    A = amg_mod.assemble_csr(system)
    return A, bs_mod.detect(A, system.pdim, n // system.pdim)


def _ir_outer(true_resid, inner, combine, b, x, the_rtol, budget, use_ir):
    """The f64/f32 iterative-refinement outer loop, shared by every solver
    branch (structured grid-shaped, unstructured component-major, halo
    DOF-sharded, element-sharded) — mirroring the f64 accuracy MUMPS
    delivers on any mesh (main.F90:354-390) at f32 inner speed.

    `true_resid(b, x) -> (r, rn_device)` and `combine(x, dx) -> x` operate
    on the branch's native solver-state shape (grid / component-major /
    flat) — the residual NORM is computed inside the true-residual program
    so it rides the same dispatch and blocking pull (each avoided host
    round trip is ~tens of ms on the relay, tools/sync_cost.py);
    `inner(r, cyc_rtol, cap, rn) -> (dx, iters)` runs one chunked inner
    solve in the inner dtype, passing rn down as pcg_chunked's bnorm so
    the inner solve skips its own ||b|| pull. Per-cycle tolerance asks
    only for the REMAINING reduction, floored at 1e-5 (f32 CG's reliable
    single-cycle reach) — the last cycle otherwise overshoots ~100x in
    wasted iterations. With `use_ir=False` (f32 config) one inner call at
    the target rtol is made and the loop exits with the measured true
    residual.

    Returns (x, inner_total, rn)."""
    r0n = max(float(jnp.sqrt(jnp.sum(b * b))), 1e-300)
    inner_total = 0
    rn = r0n
    for _ in range(12):
        r, rn_dev = true_resid(b, x)
        rn = float(rn_dev)
        if rn <= the_rtol * r0n or inner_total >= budget:
            break
        if use_ir:
            cyc_rtol = float(np.clip(0.5 * the_rtol * r0n / rn, 1e-5, 0.5))
            cap = min(120, budget - inner_total)
        else:
            cyc_rtol = the_rtol * r0n / rn
            cap = budget - inner_total
        dx, iters = inner(r, cyc_rtol, cap, rn)
        inner_total += int(iters)
        x = combine(x, dx)
        if not use_ir:
            r, rn_dev = true_resid(b, x)
            rn = float(rn_dev)
            break
    return x, inner_total, rn


@dataclasses.dataclass
class StepResult:
    aggregate_u: np.ndarray  # (ndof,)
    aggregate_stress: np.ndarray  # (nnds, cpdim)
    du: np.ndarray  # last increment
    newton_iters: List[int]
    krylov_iters: List[int]
    nsteps: int
    timers: object = None  # utils.timing.Timers (phase wall-clock totals)
    # per-step GMRES indefinite-tangent fallback counts (matfree Newton)
    gmres_fallbacks: List[int] = dataclasses.field(default_factory=list)


def run(
    problem: Problem,
    config: Optional[Config] = None,
    log: Optional[Callable[[str], None]] = None,
) -> StepResult:
    config = config or Config()
    log = log or (lambda msg: None)
    from fem_tpu.utils.timing import Timers

    tm = Timers()
    dtype = jnp.dtype(config.dtype)
    system = System(problem, dtype=dtype, plane_stress=config.plane_stress)
    n = system.ndof

    solver_kind = config.resolve_solver(n)
    bc_mode = config.resolve_bc_mode(solver_kind)

    aggregate_u = jnp.zeros(n, dtype=dtype)
    aggregate_stress = jnp.zeros((system.nnds, system.cpdim), dtype=dtype)
    du = jnp.zeros(n, dtype=dtype)  # warm start: Vec_U never zeroed
    newton_iters: List[int] = []
    krylov_iters: List[int] = []
    gmres_fallbacks: List[int] = []
    first_step = 1

    resumed_creep = None
    resumed = False
    if config.checkpoint_dir and config.resume:
        from fem_tpu.utils import checkpoint as ckpt

        path = ckpt.latest(config.checkpoint_dir)
        if path is not None:
            step, agg_u, agg_s, du_np, creep_np = ckpt.load(path)
            aggregate_u = jnp.asarray(agg_u, dtype=dtype)
            aggregate_stress = jnp.asarray(agg_s, dtype=dtype)
            du = jnp.asarray(du_np, dtype=dtype)
            first_step = step + 1
            resumed = True
            resumed_creep = {
                name: jnp.asarray(sigma, dtype=dtype)
                for name, sigma in creep_np.items()
            }
            log(f"Resumed from {path} (next interval {first_step})")

    nsteps = problem.nsteps
    nonlinear = problem.has_cohesive
    explicit = problem.stype == "explicit"
    creep_state = None
    if config.viscoelastic and not explicit:
        if nonlinear:
            raise NotImplementedError(
                "viscoelastic + cohesive in one run is not supported yet"
            )
        creep_state = system.creep_state_init()
        if not creep_state:
            creep_state = None
        elif resumed:
            # The accumulated per-ip creep stress is part of the restartable
            # state; resuming without it would silently re-zero the creep
            # history (ADVICE r1). Old checkpoints without it are refused.
            if set(resumed_creep) != set(creep_state):
                raise ValueError(
                    "checkpoint has no creep state for this viscoelastic "
                    "run; it predates creep checkpointing — rerun with "
                    "--no-resume or a fresh --checkpoint-dir"
                )
            creep_state = resumed_creep

    # Device mesh for multi-chip runs (the reference's `mpiexec -n <cores>`,
    # main.F90:32): shards the linear path's operator over a 1D jax mesh.
    dev_mesh = None
    if config.n_devices and config.n_devices > 1:
        from fem_tpu.parallel import make_mesh

        dev_mesh = make_mesh(config.n_devices)
        log(f"    Sharding over {config.n_devices} devices")

    # Nonlinear (cohesive) decks shard the ELASTIC operator over the mesh;
    # newton.solve_step_matfree runs its residual/Jacobian matvecs and AMG
    # fine smoother element-sharded (VERDICT r2 missing #4 — --devices used
    # to be ignored on this path).
    sharded_nl = None
    if (dev_mesh is not None and nonlinear and not explicit
            and config.resolve_solver(n) != "direct"
            and config.formulation != "total"):
        from fem_tpu.parallel import ShardedOperator

        log("    Nonlinear path: fused operator sharded over the mesh")
        sharded_nl = ShardedOperator(system, dev_mesh)

    # Linear path setup: K is constant; factorize/prepare once
    # (the reference configures the KSP once, main.F90:199-214).
    import time as _time

    _setup_t0 = _time.perf_counter()
    fac = None
    matvec = diag = None
    if not explicit and not nonlinear:
        if solver_kind == "direct":
            K = system.dense_K()
            _kscale = float(jnp.max(jnp.abs(K)))  # physical, pre-penalty
            if bc_mode == "penalty":
                K = K.at[system.bc_dofs, system.bc_dofs].set(PENALTY)
                fac = direct.factorize(K)
            else:
                bc_mask = jnp.zeros(n, dtype=bool).at[system.bc_dofs].set(True)
                Ke = jnp.where(bc_mask[:, None] | bc_mask[None, :], 0.0, K)
                Ke = Ke.at[system.bc_dofs, system.bc_dofs].set(1.0)
                fac = direct.factorize(Ke)
                K_unconstrained = K
            # MUMPS-grade factorization telemetry: the reference prints the
            # determinant (mantissa x 2^exp) and its null-pivot settings
            # after every factorization (main.F90:379-390)
            _m, _e, _nn = direct.det_report(fac, ref_scale=_kscale)
            log(f"    Direct LU: det(K) = {_m:.6f} * 2^{_e}"
                + (f", {_nn} null pivot(s)" if _nn else ""))
        else:
            from fem_tpu.ops import operator as op_mod
            from fem_tpu.ops import structured

            rtol, atol, maxiter = config.rtol, config.atol, config.maxiter
            spec = structured.detect(problem)

            _lat_memo = {}

            def _lat_info():
                """Memoized (A_csr, lattice_dims_or_None) — evaluated in
                the branch-chain condition below and reused by whichever
                multi-device AMG branch is taken (no cross-branch variable
                coupling)."""
                if "v" not in _lat_memo:
                    _lat_memo["v"] = _lattice_csr(system, n)
                return _lat_memo["v"]
            if spec is not None:
                # Structured box grid: stencil operator + geometric multigrid,
                # host-driven CG (lax loops around V-cycles miscompile on the
                # current TPU backend — cg.pcg_host).
                from fem_tpu.ops.stiffness import lame
                from fem_tpu.solver import multigrid

                log("    Structured grid detected: stencil + multigrid path")
                lam_s, mu_s = lame(
                    jnp.asarray(spec["E"], dtype=dtype),
                    jnp.asarray(spec["nu"], dtype=dtype),
                )
                st_op = structured.build(
                    spec["cell_sizes"], spec["node_shape"], lam_s, mu_s,
                    dtype=dtype,
                )
                bc_mask = jnp.zeros(n, dtype=bool).at[system.bc_dofs].set(True)
                # eager float mask: in-jit bool casts miscompile on this TPU
                # backend at large sizes (CLAUDE.md)
                mf_s = jnp.asarray(bc_mask, dtype=dtype)

                sharded = False
                st_embed = st_extract = None
                op_pad = None
                if dev_mesh is not None:
                    cells_x = st_op.shape[0] - 1
                    nd_ = dev_mesh.devices.size
                    sharded = True
                    if cells_x % nd_ == 0:
                        log("    Stencil matvec sharded (slab + psum halo)")
                    else:
                        # zero-material phantom cells pad the leading axis;
                        # the shard matvec runs on the padded operator via
                        # embed/extract shims while the MG preconditioner
                        # stays on the original grid
                        log(f"    Stencil matvec sharded ({cells_x} cells "
                            f"padded to {nd_}-device slabs)")
                        op_pad, st_embed, st_extract = structured.pad_for_devices(
                            st_op, nd_
                        )

                gsh = st_op.shape + (st_op.pdim,)
                mf_g = mf_s.reshape(gsh)

                # Small decks: per-level host-driven V-cycle dispatches —
                # correct everywhere and avoids tracing a chunk program per
                # tiny problem (test-suite latency). At scale the fused
                # chunked path wins by ~40x (BASELINE.md).
                small = n < config.structured_big_threshold
                if sharded or small:
                    # Chebyshev(3) smoothing: ~2.2x fewer MG-CG iterations
                    # than V(2,2) Jacobi at ~1.4x the per-cycle matvecs
                    # (test_mg_chebyshev_smoother)
                    hier = multigrid.build(st_op, system.bc_dofs,
                                           smoother="chebyshev")
                    # flat vectors + host-driven V-cycle (per-level
                    # dispatches); the slab-sharded matvec when a mesh fits.
                    # On padded grids the shard matvec runs on the padded
                    # operator with embed/extract shims (phantom cells carry
                    # zero material, so real dofs are untouched); the MG
                    # preconditioner stays on the original grid.
                    if sharded and st_embed is not None:
                        def st_matvec(o, v):
                            return st_extract(
                                structured.matvec_sharded(
                                    op_pad, st_embed(v), dev_mesh
                                )
                            )
                    elif sharded:
                        def st_matvec(o, v):
                            return structured.matvec_sharded(o, v, dev_mesh)
                    else:
                        st_matvec = structured.matvec

                    def _mv(ops, v):
                        o, _ = ops
                        keep = 1.0 - mf_s
                        return st_matvec(o, v * keep) * keep + v * mf_s

                    if sharded and st_embed is None:
                        # distributed preconditioner: the V-cycle's fine
                        # level (its dominant cost) runs on the slab-sharded
                        # matvec; coarser levels are tiny and replicated
                        log("    MG fine level sharded over the slab mesh")

                        def _pc(ops, r):
                            _, h = ops
                            return multigrid.v_cycle_host_sharded(
                                h, r, dev_mesh
                            )
                    else:
                        def _pc(ops, r):
                            _, h = ops
                            return multigrid.v_cycle_host(h, r)

                    def _cg_solve(op_unused, F, dg_unused, bc_dofs, bc_vals, x0):
                        ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(bc_vals)
                        b = cg.constrained_rhs(
                            lambda v: st_matvec(st_op, v), F, bc_mask, ubc,
                        )
                        res = cg.pcg_host_split(
                            _mv, b, _pc, (st_op, hier),
                            rtol=rtol if rtol else 1e-9,
                            maxiter=maxiter if maxiter else 400,
                        )
                        return cg.CGResult(
                            x=res.x * (1.0 - mf_s) + ubc * mf_s,
                            iters=res.iters, resnorm=res.resnorm,
                        )
                else:
                    # single-device production path: GRID-shaped chunked
                    # MG-CG with the per-corner planes stencil pinned ON
                    # the operator (with_impl — no global MATVEC_IMPL
                    # mutation, ADVICE r2). planes beats planes27 INSIDE
                    # fused solve programs by ~7 ms/MG-CG-iteration at
                    # 1.59M dofs (0.887 vs 1.064 s solve wall, round-3
                    # solve-level A/B in BENCH_extra.json `config` records;
                    # planes27's 6x standalone-matvec win was an artifact
                    # of batched-dispatch timing, tools/solve_ab.py).
                    # Grid-shaped state sidesteps TPU miscompile #5
                    # (flat elementwise on matvec outputs corrupts at
                    # ~1.6M dofs; see structured.matvec_g). With an f64
                    # config dtype the inner iterations run in f32 under
                    # f64 iterative refinement (TPU f64 is ~10x emulated;
                    # the bench big-solve pattern, BASELINE.md).
                    st_p = st_op.with_impl("planes")
                    use_ir = jnp.dtype(dtype) == jnp.dtype(jnp.float64)
                    inner_dtype = jnp.float32 if use_ir else dtype
                    st_i = st_p.astype(inner_dtype)
                    hier_i = multigrid.build(st_i, system.bc_dofs,
                                             smoother="chebyshev")
                    mf_i_g = jnp.asarray(np.asarray(mf_g), dtype=inner_dtype)
                    st_ops = {"op": st_i, "hier": hier_i, "mf_g": mf_i_g}
                    if use_ir:
                        log("    f64/f32 iterative refinement (chunked MG-CG inner)")

                        def _cg_solve(op_unused, F, dg_unused, bc_dofs, bc_vals, x0):
                            ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(bc_vals)
                            ubc_g = ubc.reshape(gsh)
                            keep = 1.0 - mf_g
                            Fg = F.reshape(gsh)
                            b = (
                                Fg - structured.matvec_g(st_p, ubc_g)
                            ) * keep + ubc_g * mf_g
                            the_rtol = rtol if rtol else 1e-9
                            # warm start (the reference never zeroes Vec_U);
                            # convergence is relative to ||b|| (KSP default)
                            x = (
                                x0.reshape(gsh) * keep + ubc_g * mf_g
                                if x0 is not None else ubc_g
                            )
                            # config.maxiter = TOTAL inner-iteration budget
                            # across refinement cycles (<=120 per cycle)
                            budget = maxiter if maxiter else 600

                            def _inner(r, cyc_rtol, cap, rn):
                                res = cg.pcg_chunked(
                                    _st_mv_g, r.astype(inner_dtype),
                                    _st_pc_g, st_ops, rtol=cyc_rtol,
                                    maxiter=cap, chunk=4, pipeline=True,
                                    bnorm=rn,
                                )
                                return res.x, res.iters

                            x, inner_total, rn = _ir_outer(
                                lambda bb, xx: _st_true_resid_g(
                                    st_p, bb, mf_g, xx),
                                _inner,
                                lambda xx, dx: (xx + dx.astype(dtype))
                                * keep + ubc_g * mf_g,
                                b, x, the_rtol, budget, True,
                            )
                            return cg.CGResult(
                                x=x.reshape(-1),
                                iters=jnp.asarray(inner_total),
                                resnorm=jnp.asarray(rn),
                            )
                    else:
                        def _cg_solve(op_unused, F, dg_unused, bc_dofs, bc_vals, x0):
                            ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(bc_vals)
                            ubc_g = ubc.reshape(gsh)
                            keep = 1.0 - mf_g
                            Fg = F.reshape(gsh)
                            b = (
                                Fg - structured.matvec_g(st_p, ubc_g)
                            ) * keep + ubc_g * mf_g
                            x0g = (
                                x0.reshape(gsh) * keep + ubc_g * mf_g
                                if x0 is not None else None
                            )
                            res = cg.pcg_chunked(
                                _st_mv_g, b, _st_pc_g, st_ops,
                                rtol=rtol if rtol else 1e-9,
                                maxiter=maxiter if maxiter else 400,
                                chunk=4, pipeline=True, x0=x0g,
                            )
                            x = res.x * keep + ubc_g * mf_g
                            return cg.CGResult(
                                x=x.reshape(-1),
                                iters=res.iters, resnorm=res.resnorm,
                            )

                op = diag = None
            elif (dev_mesh is not None
                  and config.resolve_precond(n) == "amg"
                  and _lat_info()[1] is not None):
                # Lattice-topology deck over multiple devices: DOF-sharded
                # slab layout (VERDICT r2 weak #6 — the element-sharded
                # path psums a full O(ndof) vector per matvec; here every
                # fine matvec, CG and V-cycle smoother alike, exchanges
                # exactly TWO boundary node planes via ppermute). Coarse
                # AMG levels are tiny and stay replicated. f64 configs keep
                # the f64/f32 IR outer loop: --devices changes neither
                # accuracy nor iteration counts (tests/test_parallel.py).
                from jax.sharding import NamedSharding, PartitionSpec as JP

                from fem_tpu.ops import blockstencil as bs_mod
                from fem_tpu.solver import amg as amg_mod

                A_csr, halo_dims = _lat_info()
                log("    Lattice topology: DOF-sharded halo block stencil")
                use_ir = jnp.dtype(dtype) == jnp.dtype(jnp.float64)
                if use_ir:
                    log("    f64/f32 iterative refinement "
                        "(chunked AMG-CG inner)")
                inner_dtype = jnp.float32 if use_ir else dtype
                nd_ = dev_mesh.devices.size
                pdim_ = system.pdim
                nnds_ = n // pdim_
                op64 = bs_mod.build(A_csr, pdim_, halo_dims, dtype=dtype)
                # same GMG-over-SA preference as the single-device branch:
                # the V-cycle's coarse levels stay replicated (tiny) either
                # way, but GMG's are gather-free block stencils (gmg.py)
                hier_i = None
                gmg_min = int(os.environ.get("FEM_TPU_GMG_MIN", "20000"))
                if (n > gmg_min
                        and os.environ.get("FEM_TPU_NO_GMG", "0") != "1"):
                    from fem_tpu.solver import gmg as gmg_mod

                    hier_i = gmg_mod.build_lattice(
                        A_csr, pdim_, halo_dims,
                        bc_dofs=system.bc_dofs, dtype=inner_dtype)
                    if hier_i is None:
                        # 3D on TPU-class backends: ELL/cm cycle (the
                        # miscompile-#6-safe program shape)
                        hier_i = gmg_mod.build_lattice_ell(
                            A_csr, pdim_, halo_dims,
                            bc_dofs=system.bc_dofs, dtype=inner_dtype)
                    if hier_i is not None:
                        log("    Geometric lattice-MG preconditioner")
                if hier_i is None:
                    hier_i = amg_mod.build(system, system.bc_dofs,
                                           dtype=inner_dtype,
                                           coarse_max=20000, A=A_csr)
                del A_csr
                opp = bs_mod.pad_rows(op64, nd_)
                opp_i = opp.astype(inner_dtype)
                del op64
                ax0 = dev_mesh.axis_names[0]
                shd = NamedSharding(dev_mesh, JP(ax0))
                vals_b64 = jax.device_put(bs_mod.vals_to_slabs(opp, nd_),
                                          shd)
                # f32 configs: inner == outer operator; don't hold the
                # 27*pdim^2-block coefficient array in HBM twice
                vals_bi = (
                    vals_b64 if not use_ir
                    else jax.device_put(bs_mod.vals_to_slabs(opp_i, nd_),
                                        shd)
                )
                ml64, mr64 = (jax.device_put(m, shd)
                              for m in bs_mod.halo_masks(nd_, dtype))
                mli, mri = (jax.device_put(m, shd)
                            for m in bs_mod.halo_masks(nd_, inner_dtype))
                # eager float masks (in-jit bool casts miscompile at scale)
                bc_np = np.zeros(n, dtype=bool)
                bc_np[np.asarray(system.bc_dofs)] = True
                mf_cm64 = jnp.asarray(
                    bc_np.reshape(nnds_, pdim_).T.astype(np.float64),
                    dtype=dtype)
                mf_cm_i = jnp.asarray(np.asarray(mf_cm64),
                                      dtype=inner_dtype)

                def _cm2b(v_cm):
                    g = v_cm.reshape((pdim_,) + halo_dims)
                    return bs_mod.u_to_slabs(
                        bs_mod.embed_rows_g(g, opp.dims[0]), nd_)

                def _b2cm(vb):
                    return bs_mod.u_from_slabs(vb)[
                        :, : halo_dims[0]].reshape(pdim_, -1)

                def _hmv_i(ops_, v):
                    # mask rides in the operand pytree, not as a closure
                    # constant (ndof-sized HLO constants are the relay-413
                    # risk, CLAUDE.md)
                    mfc = ops_["mf"]
                    keep = 1.0 - mfc
                    ob = bs_mod.halo_matvec_g(
                        opp_i, ops_["vals"], _cm2b(v * keep), dev_mesh,
                        ops_["ml"], ops_["mr"])
                    return _b2cm(ob) * keep + v * mfc

                def _hpc(ops_, r):
                    from fem_tpu.solver import gmg as gmg_mod

                    h_ = ops_["hier"]
                    if isinstance(h_, gmg_mod.GMGEllPrecond):
                        vc = gmg_mod.v_cycle_ell
                    elif isinstance(h_, gmg_mod.GMGPrecond):
                        vc = gmg_mod.v_cycle_cm
                    else:
                        vc = amg_mod.v_cycle_cm
                    return vc(h_, lambda v: _hmv_i(ops_, v), r)

                hops = {"vals": vals_bi, "ml": mli, "mr": mri,
                        "hier": hier_i, "mf": mf_cm_i}

                @jax.jit
                def _htrue(vals, a, b_, mfc, Fv, x):
                    # mask rides as an ARGUMENT (ndof-sized closure
                    # constants are the documented relay-413 risk)
                    keep = 1.0 - mfc
                    ob = bs_mod.halo_matvec_g(
                        opp, vals, _cm2b(x * keep), dev_mesh, a, b_)
                    ax_ = _b2cm(ob) * keep + x * mfc
                    r = Fv - ax_
                    return r, jnp.sqrt(jnp.sum(r * r))

                def _cg_solve(op_unused, F, dg_unused, bc_dofs, bc_vals,
                              x0):
                    ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(
                        bc_vals)
                    ubc_cm = ubc.reshape(nnds_, pdim_).T
                    keep = 1.0 - mf_cm64
                    F_cm = F.reshape(nnds_, pdim_).T
                    # UNMASKED K @ u_bc: the prescribed-displacement lift
                    # rides the BC-column couplings
                    k_ubc = _b2cm(bs_mod.halo_matvec_g(
                        opp, vals_b64, _cm2b(ubc_cm), dev_mesh, ml64,
                        mr64))
                    b = (F_cm - k_ubc) * keep + ubc_cm * mf_cm64
                    the_rtol = rtol if rtol else 1e-9
                    x = (
                        x0.reshape(nnds_, pdim_).T * keep
                        + ubc_cm * mf_cm64
                        if x0 is not None else ubc_cm
                    )
                    budget = maxiter if maxiter else 600

                    def _inner(r, cyc_rtol, cap, rn):
                        res = cg.pcg_chunked(
                            _hmv_i, r.astype(inner_dtype), _hpc, hops,
                            rtol=cyc_rtol, maxiter=cap, chunk=4,
                            pipeline=True, bnorm=rn,
                        )
                        return res.x, res.iters

                    x, inner_total, rn = _ir_outer(
                        lambda bb, xx: _htrue(
                            vals_b64, ml64, mr64, mf_cm64, bb, xx),
                        _inner,
                        lambda xx, dx: (xx + dx.astype(dtype)) * keep
                        + ubc_cm * mf_cm64,
                        b, x, the_rtol, budget, use_ir,
                    )
                    return cg.CGResult(
                        x=x.T.reshape(-1),
                        iters=jnp.asarray(inner_total),
                        resnorm=jnp.asarray(rn),
                    )

                op = diag = None
            elif dev_mesh is not None:
                # Unstructured deck over multiple devices. Preferred tier:
                # DOF-sharded halo-gather layout (general topology; four
                # (pdim, B) ppermute bands per matvec — the distributed-Mat
                # + VecScatter role, m_global.F90:549-564). Falls back to
                # the element-sharded psum operator when the mesh has no
                # slab locality (reach > slab) or is multi-block.
                from fem_tpu.parallel import ShardedOperator
                from fem_tpu.parallel import halo_gather as hg_mod

                hg64 = hg_pos = None
                if config.resolve_precond(n) == "amg":
                    try:
                        hg64, hg_pos = hg_mod.build(
                            system, dev_mesh.devices.size)
                    except ValueError as e:
                        log(f"    (halo-gather layout unavailable: {e})")
                if hg64 is not None:
                    from fem_tpu.solver import amg as amg_mod

                    nd_ = dev_mesh.devices.size
                    pdim_ = system.pdim
                    nnds_ = n // pdim_
                    S_ = hg64.S
                    nds_ = nd_ * S_
                    log("    DOF-sharded halo-gather operator "
                        f"(S={S_}, B={hg64.B})")
                    log("    AMG preconditioner on the slab-permuted "
                        "operator")
                    use_ir = jnp.dtype(dtype) == jnp.dtype(jnp.float64)
                    if use_ir:
                        log("    f64/f32 iterative refinement "
                            "(chunked AMG-CG inner)")
                    inner_dtype = jnp.float32 if use_ir else dtype
                    hg64 = hg_mod.device_put(hg64, dev_mesh)
                    hgi = hg64.astype(inner_dtype) if use_ir else hg64
                    # AMG hierarchy on the slab-PERMUTED matrix, so the
                    # V-cycle runs directly on slab-ordered cm state (no
                    # per-iteration permutation gathers)
                    order_ = np.argsort(hg_pos)
                    idx = (order_[:, None] * pdim_
                           + np.arange(pdim_)[None, :]).reshape(-1)
                    A_p = _lat_info()[0][idx][:, idx]
                    bcd = np.asarray(system.bc_dofs)
                    pos_dof = (hg_pos[bcd // pdim_] * pdim_
                               + bcd % pdim_)

                    class _PermView:
                        """amg.build only reads .pdim and .problem.coords
                        — feed it the slab-permuted versions."""

                    pv = _PermView()
                    pv.pdim = pdim_
                    pv.problem = _PermView()
                    pv.problem.coords = np.asarray(
                        system.problem.coords)[order_]
                    hier_i = amg_mod.build(pv, pos_dof, dtype=inner_dtype,
                                           coarse_max=20000, A=A_p)
                    # slab-ordered padded cm float masks, eager
                    bc_pp = np.zeros((nds_, pdim_), dtype=bool)
                    bc2 = np.zeros((nnds_, pdim_), dtype=bool)
                    bc2[bcd // pdim_, bcd % pdim_] = True
                    bc_pp[hg_pos] = bc2
                    mfp64 = jnp.asarray(bc_pp.T, dtype=dtype)
                    mfp_i = jnp.asarray(bc_pp.T, dtype=inner_dtype)
                    npad_tail = nds_ - nnds_

                    def _hgmv(ops_, vp):
                        mfc = ops_["mf"]
                        keep = 1.0 - mfc
                        av = hg_mod.matvec_cm_sharded(
                            ops_["op"], vp * keep, dev_mesh)
                        return av * keep + vp * mfc

                    def _hgpc(ops_, rp):
                        # the hierarchy lives on the REAL (unpadded)
                        # slab-ordered nodes; pad/slice at the boundary
                        def mv_real(v):
                            vp = jnp.pad(v, ((0, 0), (0, npad_tail)))
                            return _hgmv(ops_, vp)[:, :nnds_]

                        z = amg_mod.v_cycle_cm(ops_["hier"], mv_real,
                                               rp[:, :nnds_])
                        return jnp.pad(z, ((0, 0), (0, npad_tail)))

                    hg_ops = {"op": hgi, "hier": hier_i, "mf": mfp_i}

                    @jax.jit
                    def _hgtrue(op_, mfc, b_, x_):
                        keep = 1.0 - mfc
                        av = hg_mod.matvec_cm_sharded(op_, x_ * keep,
                                                      dev_mesh)
                        r = b_ - (av * keep + x_ * mfc)
                        return r, jnp.sqrt(jnp.sum(r * r))

                    def _cg_solve(op_unused, F, dg_unused, bc_dofs,
                                  bc_vals, x0):
                        ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(
                            bc_vals)
                        ubc_p = hg_mod.to_padded_cm(ubc, hg_pos, nd_, S_,
                                                    pdim_)
                        keep = 1.0 - mfp64
                        Fp = hg_mod.to_padded_cm(F, hg_pos, nd_, S_, pdim_)
                        # UNMASKED K @ u_bc: the prescribed-displacement
                        # lift rides the BC-column couplings
                        k_ubc = hg_mod.matvec_cm_sharded(hg64, ubc_p,
                                                         dev_mesh)
                        b = (Fp - k_ubc) * keep + ubc_p * mfp64
                        the_rtol = rtol if rtol else 1e-9
                        x = (
                            hg_mod.to_padded_cm(x0, hg_pos, nd_, S_, pdim_)
                            * keep + ubc_p * mfp64
                            if x0 is not None else ubc_p
                        )
                        budget = maxiter if maxiter else 600

                        def _inner(r, cyc_rtol, cap, rn):
                            res = cg.pcg_chunked(
                                _hgmv, r.astype(inner_dtype), _hgpc,
                                hg_ops, rtol=cyc_rtol, maxiter=cap,
                                chunk=4, pipeline=True, bnorm=rn,
                            )
                            return res.x, res.iters

                        x, inner_total, rn = _ir_outer(
                            lambda bb, xx: _hgtrue(hg64, mfp64, bb, xx),
                            _inner,
                            lambda xx, dx: (xx + dx.astype(dtype)) * keep
                            + ubc_p * mfp64,
                            b, x, the_rtol, budget, use_ir,
                        )
                        return cg.CGResult(
                            x=hg_mod.from_padded_cm(x, hg_pos, pdim_),
                            iters=jnp.asarray(inner_total),
                            resnorm=jnp.asarray(rn),
                        )

                    op = diag = None
                elif config.resolve_precond(n) == "amg":
                    # Element-sharded fused operator (domain-decomposition
                    # DP, psum shared-dof reduction — SURVEY.md §2c); the
                    # sharded blocks are jit ARGUMENTS, not closure
                    # constants.
                    log("    Fused operator sharded over the device mesh")
                    sop = ShardedOperator(system, dev_mesh)
                    # Multi-device + strong preconditioner (VERDICT r2
                    # missing #3: --devices used to DOWNGRADE the algorithm
                    # from AMG to Jacobi). The V-cycle's fine-level smoother
                    # matvecs run element-sharded (psum over ICI); the
                    # coarse ELL levels are tiny and replicated. f64 configs
                    # keep the f64/f32 IR outer loop, so asking for devices
                    # changes neither accuracy nor iteration counts
                    # (tests/test_parallel.py asserts parity).
                    from fem_tpu.ops import operator as op_fused
                    from fem_tpu.solver import amg as amg_mod

                    log("    AMG preconditioner over the sharded operator")
                    use_ir = jnp.dtype(dtype) == jnp.dtype(jnp.float64)
                    if use_ir:
                        log("    f64/f32 iterative refinement "
                            "(chunked AMG-CG inner)")
                    inner_dtype = jnp.float32 if use_ir else dtype
                    # the preceding halo-branch condition already assembled
                    # the CSR (same precond==amg guard) — _lat_memo is a hit
                    hier_i = amg_mod.build(system, system.bc_dofs,
                                           dtype=inner_dtype,
                                           coarse_max=20000,
                                           A=_lat_info()[0])
                    pdim_ = system.pdim
                    nnds_ = n // pdim_
                    bc_np = np.zeros(n, dtype=bool)
                    bc_np[np.asarray(system.bc_dofs)] = True
                    # (nnds, pdim)-shaped float masks, precomputed eagerly:
                    # solver state stays 2-D through the fused chunk
                    # programs (flat elementwise combines on matvec outputs
                    # are TPU miscompile #5, CLAUDE.md), and the masks ride
                    # the operand pytree, not closures (relay-413 risk)
                    bc2 = bc_np.reshape(nnds_, pdim_)
                    mf64_2 = jnp.asarray(bc2, dtype=dtype)
                    mf_i2 = jnp.asarray(bc2, dtype=inner_dtype)

                    def _cast_block(b):
                        return op_fused.FusedBlock(
                            edofs_t=b.edofs_t, conn_t=b.conn_t,
                            dNx=b.dNx.astype(inner_dtype),
                            scale=b.scale.astype(inner_dtype),
                            lam=b.lam.astype(inner_dtype),
                            mu=b.mu.astype(inner_dtype),
                        )

                    blocks_i = (
                        [_cast_block(b) for b in sop.blocks]
                        if use_ir else sop.blocks
                    )

                    # per-run closures: the shard_map'd matvec (bound to the
                    # device mesh) cannot ride in the operand pytree; the
                    # bounded chunk-program cache absorbs the per-run
                    # traces. Solver state is (nnds, pdim) 2-D (a free
                    # bitcast of the flat dof vector) so every elementwise
                    # combine on a matvec OUTPUT is non-flat — TPU
                    # miscompile #5 corrupts flat combines at >=1.59M dofs.
                    def _smv(ops_, v2):
                        mfc = ops_["mf"]
                        keep = 1.0 - mfc
                        av = sop.matvec((v2 * keep).reshape(-1),
                                        blocks=ops_["blocks"])
                        return (av.reshape(v2.shape) * keep + v2 * mfc)

                    def _spc(ops_, r2):
                        return amg_mod.v_cycle(
                            ops_["hier"],
                            lambda v: _smv(ops_, v.reshape(r2.shape)
                                           ).reshape(-1),
                            r2.reshape(-1),
                        ).reshape(r2.shape)

                    @jax.jit
                    def _strue(blocks, mfc, b2, x2):
                        keep = 1.0 - mfc
                        av = sop.matvec((x2 * keep).reshape(-1),
                                        blocks=blocks)
                        r = b2 - (av.reshape(x2.shape) * keep + x2 * mfc)
                        return r, jnp.sqrt(jnp.sum(r * r))

                    sops_i = {"blocks": blocks_i, "hier": hier_i,
                              "mf": mf_i2}

                    def _cg_solve(op_unused, F, dg_unused, bc_dofs, bc_vals,
                                  x0):
                        ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(
                            bc_vals
                        )
                        ubc2 = ubc.reshape(nnds_, pdim_)
                        keep = 1.0 - mf64_2
                        b = (
                            (F - sop.matvec(ubc)).reshape(nnds_, pdim_)
                            * keep + ubc2 * mf64_2
                        )
                        the_rtol = rtol if rtol else 1e-9
                        x = (
                            x0.reshape(nnds_, pdim_) * keep + ubc2 * mf64_2
                            if x0 is not None else ubc2
                        )
                        budget = maxiter if maxiter else 600

                        def _inner(r, cyc_rtol, cap, rn):
                            res = cg.pcg_chunked(
                                _smv, r.astype(inner_dtype), _spc, sops_i,
                                rtol=cyc_rtol, maxiter=cap, chunk=4,
                                pipeline=True, bnorm=rn,
                            )
                            return res.x, res.iters

                        x, inner_total, rn = _ir_outer(
                            lambda bb, xx: _strue(
                                sop.blocks, mf64_2, bb, xx),
                            _inner,
                            lambda xx, dx: (xx + dx.astype(dtype)) * keep
                            + ubc2 * mf64_2,
                            b, x, the_rtol, budget, use_ir,
                        )
                        return cg.CGResult(
                            x=x.reshape(-1), iters=jnp.asarray(inner_total),
                            resnorm=jnp.asarray(rn),
                        )

                    op = diag = None
                else:
                    log("    Fused operator sharded over the device mesh")
                    sop = ShardedOperator(system, dev_mesh)
                    op = sop.blocks
                    diag = sop.diag()

                    @jax.jit
                    def _cg_solve(blocks, F, dg, bc_dofs, bc_vals, x0):
                        return cg.solve_eliminated(
                            lambda v: sop.matvec(v, blocks=blocks), F, dg,
                            bc_dofs, bc_vals,
                            x0=x0, rtol=rtol, atol=atol, maxiter=maxiter,
                        )
            elif config.resolve_precond(n) == "amg":
                # Unstructured at scale: smoothed-aggregation AMG around the
                # fused matrix-free operator — the mesh-agnostic half of
                # MUMPS' role (main.F90:354-390). Host-side setup, device
                # cycles; chunked CG dispatches (lax loops with V-cycle
                # bodies miscompile on this TPU backend).
                from fem_tpu.solver import amg as amg_mod

                log("    AMG preconditioner (smoothed aggregation)")
                # f64 configs run f32 chunked AMG-CG inside f64 iterative
                # refinement — MUMPS-grade accuracy on ANY mesh at f32 speed
                # (main.F90:354-390; VERDICT r2 missing #2). The hierarchy
                # and inner operator are built directly in the inner dtype.
                use_ir = jnp.dtype(dtype) == jnp.dtype(jnp.float64)
                inner_dtype = jnp.float32 if use_ir else dtype
                from fem_tpu.ops import blockstencil as bs_mod

                A_csr = amg_mod.assemble_csr(system)
                dims = bs_mod.detect(A_csr, system.pdim,
                                     n // system.pdim)
                if dims is not None:
                    # lattice topology (jittered/graded grid): the fine
                    # matvec runs as a variable-coefficient block stencil
                    # — static shifted slices, zero gather indices
                    log("    Lattice topology: block-stencil fine operator")
                    op = bs_mod.build(A_csr, system.pdim, dims, dtype=dtype)
                    op_i = op.astype(inner_dtype) if use_ir else op
                else:
                    op = op_mod.build(system)
                    op_i = op.astype(inner_dtype) if use_ir else op
                hier_i = None
                pc_fn = _amg_pc_cm
                # below SA's dense-coarse cap (20k dofs) the SA hierarchy
                # IS a direct factorization (the MUMPS shape) — strictly
                # fewer iterations and no f32 recurrence drift; GMG's
                # gather-free cycles only pay at scale. FEM_TPU_GMG_MIN
                # lets tests drive the GMG route on tiny decks.
                gmg_min = int(os.environ.get("FEM_TPU_GMG_MIN", "20000"))
                if (dims is not None and n > gmg_min
                        and os.environ.get("FEM_TPU_NO_GMG", "0") != "1"):
                    # geometric lattice MG: gather-free at every level and
                    # fewer iterations than SA (solver/gmg.py); SA remains
                    # the general-topology path
                    from fem_tpu.solver import gmg as gmg_mod

                    hier_i = gmg_mod.build_lattice(
                        A_csr, system.pdim, dims,
                        bc_dofs=system.bc_dofs, dtype=inner_dtype)
                    if hier_i is not None:
                        pc_fn = _gmg_pc_g
                        log("    Geometric lattice-MG preconditioner")
                    else:
                        # 3D lattices on TPU-class backends: grid-state
                        # cycles are declined (miscompile #6); the ELL/cm
                        # program shape is the safe geometric cycle
                        hier_i = gmg_mod.build_lattice_ell(
                            A_csr, system.pdim, dims,
                            bc_dofs=system.bc_dofs, dtype=inner_dtype)
                        if hier_i is not None:
                            pc_fn = _gmg_pc_ell
                            log("    Geometric lattice-MG preconditioner"
                                " (ELL/cm cycle)")
                if hier_i is None:
                    hier_i = amg_mod.build(system, system.bc_dofs,
                                           dtype=inner_dtype,
                                           coarse_max=20000, A=A_csr)
                del A_csr
                # GMG carries GRID-shaped (pdim, *dims) solver state through
                # the fused chunk programs (see _gmg_mv_g: the cm form hits
                # TPU miscompile #5 at ~1M dofs); SA keeps component-major.
                use_grid = pc_fn is _gmg_pc_g
                bc_mask = jnp.zeros(n, dtype=bool).at[system.bc_dofs].set(True)
                mf_s = jnp.asarray(bc_mask, dtype=dtype)
                # component-major state: the fused matvec's fastest layout
                # (operator.matvec_cm); the mask transposes are eager
                nnds_ = n // system.pdim
                mf_cm = jnp.asarray(
                    np.asarray(mf_s).reshape(nnds_, system.pdim).T
                )
                mf_cm_i = jnp.asarray(np.asarray(mf_cm), dtype=inner_dtype)
                if use_grid:
                    gdims = (system.pdim,) + tuple(dims)
                    amg_ops = {"op": op_i, "hier": hier_i,
                               "mf_g": mf_cm_i.reshape(gdims)}
                    if use_ir:
                        # outer-precision grid mask, used only by the IR
                        # true-residual program (_tr) — eager, outside jit
                        mf_g = mf_cm.reshape(gdims)
                else:
                    amg_ops = {"op": op_i, "hier": hier_i, "mf_cm": mf_cm_i}

                if use_ir:
                    log("    f64/f32 iterative refinement (chunked AMG-CG inner)")

                    def _cg_solve(op_unused, F, dg_unused, bc_dofs, bc_vals, x0):
                        ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(bc_vals)
                        ubc_cm = ubc.reshape(nnds_, system.pdim).T
                        keep = 1.0 - mf_cm
                        F_cm = F.reshape(nnds_, system.pdim).T
                        b = (
                            F_cm - _mv_any_cm(op, ubc_cm)
                        ) * keep + ubc_cm * mf_cm
                        the_rtol = rtol if rtol else 1e-9
                        x = (
                            x0.reshape(nnds_, system.pdim).T * keep
                            + ubc_cm * mf_cm
                            if x0 is not None else ubc_cm
                        )
                        # config.maxiter = TOTAL inner budget across cycles
                        budget = maxiter if maxiter else 600

                        def _inner(r, cyc_rtol, cap, rn):
                            r_i = r.astype(inner_dtype)
                            if use_grid:
                                res = cg.pcg_chunked(
                                    _gmg_mv_g, r_i.reshape(gdims),
                                    pc_fn, amg_ops, rtol=cyc_rtol,
                                    maxiter=cap, chunk=4, pipeline=True,
                                    bnorm=rn,
                                )
                                # eager reshape back to cm — outside jit
                                return res.x.reshape(r.shape), res.iters
                            res = cg.pcg_chunked(
                                _amg_mv_cm, r_i,
                                pc_fn, amg_ops, rtol=cyc_rtol,
                                maxiter=cap, chunk=4, pipeline=True,
                                bnorm=rn,
                            )
                            return res.x, res.iters

                        if use_grid:
                            def _tr(bb, xx):
                                return _gmg_true_resid_cm(op, bb, mf_g, xx)
                        else:
                            def _tr(bb, xx):
                                return _amg_true_resid_cm(op, bb, mf_cm, xx)

                        x, inner_total, rn = _ir_outer(
                            _tr,
                            _inner,
                            lambda xx, dx: (xx + dx.astype(dtype)) * keep
                            + ubc_cm * mf_cm,
                            b, x, the_rtol, budget, True,
                        )
                        return cg.CGResult(
                            x=x.T.reshape(-1),
                            iters=jnp.asarray(inner_total),
                            resnorm=jnp.asarray(rn),
                        )
                else:
                    def _cg_solve(op_unused, F, dg_unused, bc_dofs, bc_vals, x0):
                        ubc = jnp.zeros(n, dtype=dtype).at[bc_dofs].set(bc_vals)
                        ubc_cm = ubc.reshape(nnds_, system.pdim).T
                        keep = 1.0 - mf_cm
                        F_cm = F.reshape(nnds_, system.pdim).T
                        b = (
                            F_cm - _mv_any_cm(op, ubc_cm)
                        ) * keep + ubc_cm * mf_cm
                        x0cm = (
                            x0.reshape(nnds_, system.pdim).T * keep
                            + ubc_cm * mf_cm
                            if x0 is not None else None
                        )
                        if use_grid:
                            res = cg.pcg_chunked(
                                _gmg_mv_g, b.reshape(gdims), pc_fn, amg_ops,
                                rtol=rtol if rtol else 1e-9,
                                maxiter=maxiter if maxiter else 400,
                                x0=(x0cm.reshape(gdims)
                                    if x0cm is not None else None),
                                pipeline=True,
                            )
                            xs = res.x.reshape(b.shape)  # eager
                        else:
                            res = cg.pcg_chunked(
                                _amg_mv_cm, b, pc_fn, amg_ops,
                                rtol=rtol if rtol else 1e-9,
                                maxiter=maxiter if maxiter else 400,
                                x0=x0cm, pipeline=True,
                            )
                            xs = res.x
                        x = xs * keep + ubc_cm * mf_cm
                        return cg.CGResult(
                            x=x.T.reshape(-1),
                            iters=res.iters, resnorm=res.resnorm,
                        )

                if pc_fn in (_gmg_pc_g, _gmg_pc_ell):
                    # Production acceptance test (VERDICT r4 #3: the
                    # MUMPS reliability bar must live in the solver, not
                    # just the bench). Miscompile #6 is BINARY-dependent:
                    # a recompile of a clean geometric cycle can come back
                    # silently corrupt (NaN or ~1e8 spikes that blow up
                    # the inner iteration count). If a GMG-preconditioned
                    # step returns a non-finite residual or exhausts its
                    # iteration budget unconverged, demote to the SA-AMG
                    # hierarchy (exact at all sizes) and re-solve; the
                    # demotion is permanent for the run. Exercised by
                    # tests/test_gmg.py::test_stepper_demotes_poisoned_gmg.
                    _base_cg_solve = _cg_solve

                    def _cg_solve(op_a, F, dg, bc_dofs_a, bc_vals_a, x0):
                        nonlocal pc_fn, amg_ops, use_grid
                        res = _base_cg_solve(op_a, F, dg, bc_dofs_a,
                                             bc_vals_a, x0)
                        if pc_fn not in (_gmg_pc_g, _gmg_pc_ell):
                            return res  # already demoted
                        rn = float(res.resnorm)
                        budget = maxiter if maxiter else 600
                        if np.isfinite(rn) and int(res.iters) < budget:
                            return res
                        log("    GMG acceptance FAILED ("
                            + ("non-finite residual" if not np.isfinite(rn)
                               else f"{int(res.iters)} inner iterations")
                            + ") -> SA-AMG demotion")
                        hier_sa = amg_mod.build(
                            system, system.bc_dofs, dtype=inner_dtype,
                            coarse_max=20000)
                        amg_ops = {"op": op_i, "hier": hier_sa,
                                   "mf_cm": mf_cm_i}
                        pc_fn = _amg_pc_cm
                        use_grid = False
                        return _base_cg_solve(op_a, F, dg, bc_dofs_a,
                                              bc_vals_a, x0)

                diag = None
            else:
                op = op_mod.build(system)
                diag = op_mod.diag(op)

                @jax.jit
                def _cg_solve(op, F, dg, bc_dofs, bc_vals, x0):
                    return cg.solve_eliminated(
                        lambda v: op_mod.matvec(op, v), F, dg, bc_dofs, bc_vals,
                        x0=x0, rtol=rtol, atol=atol, maxiter=maxiter,
                    )

    tm.totals["setup"] += _time.perf_counter() - _setup_t0
    tm.counts["setup"] += 1

    bc_step_vals = system.bc_step_vals()

    for k in range(first_step, nsteps + 1):
        t_init = problem.dt * (k - 1)
        log(f"Interval: {k}")
        if explicit:
            continue
        with tm.phase("rhs"):
            F = system.rhs(t_init)
            if creep_state is not None:
                F = F + system.creep_force(creep_state)

        if nonlinear:
            with tm.phase("newton"):
                if config.formulation == "total":
                    res = newton.solve_step_total(
                        system, config, aggregate_u, du, t_init + problem.dt
                    )
                elif solver_kind == "direct":
                    step_fn = (
                        newton.solve_step_jit if config.jit_newton
                        else newton.solve_step
                    )
                    res = step_fn(
                        system, config, aggregate_u, du, F, bc_mode=bc_mode
                    )
                else:
                    res = newton.solve_step_matfree(
                        system, config, aggregate_u, du, F,
                        sharded_op=sharded_nl,
                        log=lambda m: log("    " + m),
                    )
            du = res.du
            newton_iters.append(res.iters)
            krylov_iters.append(int(getattr(res, "inner_iters", 0)))
            gmres_fallbacks.append(int(getattr(res, "gmres_fallbacks", 0)))
            log(f"    SNES Iteration Count: {res.iters}")
        elif solver_kind == "direct":
            with tm.phase("solve"):
                if bc_mode == "penalty":
                    Fp = F.at[system.bc_dofs].set(PENALTY * bc_step_vals)
                    du = direct.solve_factorized(fac, Fp)
                else:
                    ubc = jnp.zeros(n, dtype=dtype).at[system.bc_dofs].set(
                        bc_step_vals
                    )
                    Fe = F - K_unconstrained @ ubc
                    bc_mask = jnp.zeros(n, dtype=bool).at[system.bc_dofs].set(
                        True
                    )
                    Fe = jnp.where(bc_mask, ubc, Fe)
                    du = direct.solve_factorized(fac, Fe)
        else:
            with tm.phase("solve"):
                res = _cg_solve(op, F, diag, system.bc_dofs, bc_step_vals, du)
                du = res.x
                krylov_iters.append(int(res.iters))

        aggregate_u = aggregate_u + du
        with tm.phase("stress"):
            if creep_state is not None:
                creep_state = system.creep_stress_update(creep_state, du)
                aggregate_stress = system.nodal_average_state(creep_state)
            else:
                stress_inc = system.stress_increment(du)
                aggregate_stress = aggregate_stress + stress_inc

        if config.checkpoint_dir and k % max(config.checkpoint_every, 1) == 0:
            from fem_tpu.utils import checkpoint as ckpt

            ckpt.save(config.checkpoint_dir, k, aggregate_u,
                      aggregate_stress, du, creep_state=creep_state)

    if config.timing:
        log("Phase timers:\n" + tm.report())

    return StepResult(
        aggregate_u=np.asarray(aggregate_u),
        aggregate_stress=np.asarray(aggregate_stress),
        du=np.asarray(du),
        newton_iters=newton_iters,
        krylov_iters=krylov_iters,
        nsteps=nsteps,
        timers=tm,
        gmres_fallbacks=gmres_fallbacks,
    )
