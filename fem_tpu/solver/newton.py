"""Newton-with-line-search for the cohesive nonlinear step (SNES equivalent).

Replicates the reference's SNESNEWTONLS setup (main.F90:199-214, callbacks
CalcJacobian m_global.F90:98-158 and CalcResidual m_global.F90:161-235):

  residual  R(du) = J(du) @ du - F_ext - F_coh(aggregate_u + du)
            with the BC rows overridden (penalty: R_bc = p*du_bc - p*u_bc_step)
  jacobian  J(du) = K_elastic + K_coh(aggregate_u + du) + BC rows

Note the reference residual multiplies by the *Jacobian* (elastic + cohesive
tangent), not the plain elastic K (MatMultAdd(Jacobian, du, ...),
m_global.F90:226). `formulation="reference"` reproduces that;
`formulation="standard"` uses the textbook incremental residual
R = K_el @ du - F_ext - F_coh(aggregate_u + du), whose consistent Jacobian is
the same J. Both share fixed points when K_coh @ du ~ 0 (the shipped decks'
cohesive elements sit on initially-closed interfaces).

Newton controls mirror SNES defaults: rtol 1e-8 (relative to the first
residual of each solve), atol 1e-50, stol 1e-8, max 50 iterations, with a
backtracking line search.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fem_tpu.config import Config
from fem_tpu.models.system import PENALTY, System
from fem_tpu.solver import direct


class NewtonResult(NamedTuple):
    du: jnp.ndarray
    iters: int
    resnorm: float
    converged: bool


def solve_step(
    system: System,
    config: Config,
    aggregate_u,
    du0,
    F_ext,
    bc_mode: str = "penalty",
):
    """One nonlinear load increment. du0 is the warm start (the reference
    never zeroes Vec_U between steps, main.F90:230)."""
    quirks = config.quirks
    reference_form = config.resolve_formulation(bc_mode) == "reference"
    bc_dofs = system.bc_dofs
    bc_vals = system.bc_step_vals()
    n = system.ndof
    bc_mask = jnp.zeros(n, dtype=bool).at[bc_dofs].set(True)
    ubc = jnp.zeros(n, dtype=F_ext.dtype).at[bc_dofs].set(bc_vals)

    K_el = system.dense_K()

    def jacobian_raw(du):
        """K_el + cohesive tangent, no BC treatment."""
        return K_el + system.coh_stiffness_dense(aggregate_u + du, quirks)

    def jacobian(du):
        """BC-treated Jacobian used for the linear solves."""
        J = jacobian_raw(du)
        if bc_mode == "penalty":
            J = J.at[bc_dofs, bc_dofs].set(PENALTY)
        else:
            J = jnp.where(bc_mask[:, None] | bc_mask[None, :], 0.0, J)
            J = J.at[bc_dofs, bc_dofs].set(1.0)
        return J

    def residual(du, J_solve):
        # F = F_ext + F_coh, then BC rows inserted, then R = J du - F
        # (m_global.F90:186-226). The multiply must use the RAW operator so
        # free equations see the K[free,bc] * u_bc coupling; only the bc ROWS
        # are overridden.
        del J_solve
        F = F_ext + system.coh_force(aggregate_u + du, quirks)
        if bc_mode == "penalty":
            F = F.at[bc_dofs].set(PENALTY * bc_vals)
            mul = jacobian_raw(du) if reference_form else K_el
            mul = mul.at[bc_dofs, bc_dofs].set(PENALTY)
            return mul @ du - F
        mul = jacobian_raw(du) if reference_form else K_el
        R = mul @ du - F
        return jnp.where(bc_mask, du - ubc, R)

    du = du0
    if bc_mode == "eliminate":
        du = jnp.where(bc_mask, ubc, du)

    J = jacobian(du)
    R = residual(du, J)
    r0 = float(jnp.linalg.norm(R))
    rnorm = r0
    tol = max(config.newton_rtol * r0, config.newton_atol)

    iters = 0
    converged = rnorm <= tol
    while not converged and iters < config.newton_maxit:
        delta = _robust_solve(J, -R)
        # Backtracking line search (SNESNEWTONLS-style sufficient decrease).
        lam = 1.0
        best_lam, best_r = None, rnorm
        for _ in range(20):
            du_trial = du + lam * delta
            if bc_mode == "eliminate":
                du_trial = jnp.where(bc_mask, ubc, du_trial)
            R_trial = residual(du_trial, J)
            r_trial = float(jnp.linalg.norm(R_trial))
            if jnp.isfinite(jnp.asarray(r_trial)) and r_trial < best_r:
                best_lam, best_r = lam, r_trial
                if r_trial <= (1.0 - 1e-4 * lam) * rnorm:
                    break
            lam *= 0.5
        if best_lam is None:
            # Line search failed to find any decrease: stagnation
            # (SNES would report a line-search failure and stop).
            break
        du_new = du + best_lam * delta
        if bc_mode == "eliminate":
            du_new = jnp.where(bc_mask, ubc, du_new)
        step_norm = float(jnp.linalg.norm(du_new - du))
        du = du_new
        iters += 1
        J = jacobian(du)
        R = residual(du, J)
        rnorm = float(jnp.linalg.norm(R))
        if rnorm <= tol:
            converged = True
            break
        if step_norm <= config.newton_stol * max(float(jnp.linalg.norm(du)), 1e-300):
            converged = True
            break

    return NewtonResult(du=du, iters=iters, resnorm=rnorm, converged=converged)


def solve_step_total(
    system: System,
    config: Config,
    aggregate_u,
    du0,
    t_end,
):
    """True-equilibrium Newton for the cohesive step (formulation="total").

    The reference's incremental scheme re-applies the TOTAL cohesive force
    as a load every increment (CalcResidual copies Vec_F and adds
    F_coh(aggregate+du) each step, m_global.F90:186-206, while the elastic
    term only sees the increment), so over k steps it solves
    K u = F_ext + sum_j F_coh(u_j) — a drifting approximation, visible in
    its own captured log where u grows linearly under constant BCs. This
    solver instead converges the actual equilibrium at time t_end:

        R(u) = K_el u - F_ext_cumulative(t_end) - F_coh(u),   u = agg + du

    with consistent Jacobian K_el + K_coh(u), eliminated BCs pinned to the
    total ramp value. This is what matches the Abaqus UEL cross-validation.
    """
    quirks = config.quirks
    bc_dofs = system.bc_dofs
    bc_vals = system.bc_total_vals(t_end)
    n = system.ndof
    bc_mask = jnp.zeros(n, dtype=bool).at[bc_dofs].set(True)
    u_bc = jnp.zeros(n, dtype=system.dtype).at[bc_dofs].set(bc_vals)
    F_ext = system.rhs_cumulative(t_end)

    K_el = system.dense_K()

    def residual(u):
        F = F_ext + system.coh_force(u, quirks)
        R = K_el @ u - F
        return jnp.where(bc_mask, u - u_bc, R)

    def jacobian(u):
        J = K_el + system.coh_stiffness_dense(u, quirks)
        J = jnp.where(bc_mask[:, None] | bc_mask[None, :], 0.0, J)
        return J.at[bc_dofs, bc_dofs].set(1.0)

    def pin(u):
        mf = bc_mask.astype(u.dtype)
        return u * (1.0 - mf) + u_bc * mf

    u = pin(aggregate_u + du0)
    R = residual(u)
    r0 = float(jnp.linalg.norm(R))
    rnorm = r0
    tol = max(config.newton_rtol * r0, config.newton_atol)
    iters = 0
    converged = rnorm <= tol
    while not converged and iters < config.newton_maxit:
        J = jacobian(u)
        delta = _robust_solve(J, -R)
        lam = 1.0
        best_lam, best_r = None, rnorm
        for _ in range(25):
            r_trial = float(jnp.linalg.norm(residual(pin(u + lam * delta))))
            if jnp.isfinite(jnp.asarray(r_trial)) and r_trial < best_r:
                best_lam, best_r = lam, r_trial
                if r_trial <= (1.0 - 1e-4 * lam) * rnorm:
                    break
            lam *= 0.5
        if best_lam is None:
            break
        u_new = pin(u + best_lam * delta)
        step_norm = float(jnp.linalg.norm(u_new - u))
        u = u_new
        iters += 1
        R = residual(u)
        rnorm = float(jnp.linalg.norm(R))
        if rnorm <= tol:
            converged = True
            break
        if step_norm <= config.newton_stol * max(float(jnp.linalg.norm(u)), 1e-300):
            converged = True
            break

    return NewtonResult(du=u - aggregate_u, iters=iters, resnorm=rnorm,
                        converged=converged)


def solve_step_matfree(
    system: System,
    config: Config,
    aggregate_u,
    du0,
    F_ext,
):
    """Matrix-free Newton-Krylov for large cohesive problems.

    Same residual/Jacobian semantics as solve_step (eliminate BC mode), but
    J delta = -R is solved by Jacobi-PCG with
    J v = K_el v + K_coh(u) v applied matrix-free — no dense assembly, so it
    scales to meshes where the dense SNES path cannot. The cohesive tangent
    can lose definiteness past the traction peak; the Krylov iteration cap +
    backtracking line search keep the outer iteration safe (the reference
    leans on MUMPS pivoting there instead, main.F90:365-371).
    """
    quirks = config.quirks
    reference_form = config.resolve_formulation("eliminate") == "reference"
    bc_dofs = system.bc_dofs
    bc_vals = system.bc_step_vals()
    n = system.ndof
    bc_mask = jnp.zeros(n, dtype=bool).at[bc_dofs].set(True)
    ubc = jnp.zeros(n, dtype=F_ext.dtype).at[bc_dofs].set(bc_vals)

    from fem_tpu.solver import cg as cg_mod

    el_diag = system.diag_fused()

    def jac_matvec(du, v):
        out = system.matvec_fused(v) + system.coh_matvec(
            aggregate_u + du, v, quirks
        )
        return out

    mf = bc_mask.astype(F_ext.dtype)
    keep = 1.0 - mf

    def residual(du):
        # float-mask arithmetic: bool selects on matvec outputs miscompile
        # on TPU at large sizes (see cg.masked_operator)
        F = F_ext + system.coh_force(aggregate_u + du, quirks)
        if reference_form:
            R = jac_matvec(du, du) - F
        else:
            R = system.matvec_fused(du) - F
        return R * keep + (du - ubc) * mf

    def pin(du):
        return du * keep + ubc * mf

    du = pin(du0)
    R = residual(du)
    r0 = float(jnp.linalg.norm(R))
    rnorm = r0
    tol = max(config.newton_rtol * r0, config.newton_atol)

    iters = 0
    converged = rnorm <= tol
    while not converged and iters < config.newton_maxit:
        mv = cg_mod.masked_operator(lambda v: jac_matvec(du, v), bc_mask)
        diag = el_diag + _coh_diag(system, aggregate_u + du, quirks)
        diag = jnp.where(bc_mask, 1.0, diag)
        diag = jnp.where(jnp.abs(diag) < 1e-30, 1.0, diag)
        res = cg_mod.pcg(
            mv, jnp.where(bc_mask, 0.0, -R), diag=jnp.abs(diag),
            rtol=1e-6, maxiter=max(200, int(jnp.sqrt(n)) * 4),
        )
        delta = jnp.where(bc_mask, 0.0, res.x)
        lam = 1.0
        best_lam, best_r = None, rnorm
        for _ in range(20):
            R_trial = residual(pin(du + lam * delta))
            r_trial = float(jnp.linalg.norm(R_trial))
            if jnp.isfinite(jnp.asarray(r_trial)) and r_trial < best_r:
                best_lam, best_r = lam, r_trial
                if r_trial <= (1.0 - 1e-4 * lam) * rnorm:
                    break
            lam *= 0.5
        if best_lam is None:
            break
        du_new = pin(du + best_lam * delta)
        step_norm = float(jnp.linalg.norm(du_new - du))
        du = du_new
        iters += 1
        R = residual(du)
        rnorm = float(jnp.linalg.norm(R))
        if rnorm <= tol:
            converged = True
            break
        if step_norm <= config.newton_stol * max(float(jnp.linalg.norm(du)), 1e-300):
            converged = True
            break

    return NewtonResult(du=du, iters=iters, resnorm=rnorm, converged=converged)


def _coh_diag(system: System, u_total, quirks: bool):
    """Diagonal of the cohesive tangent contribution (for Jacobi)."""
    from fem_tpu.ops import cohesive as coh_ops

    e = system.blocks["coh"]
    ue = u_total[e["edofs"]]
    ke = coh_ops.element_stiffness(e["ecoords"], e["props"], ue, system.dt, quirks)
    d = jnp.diagonal(ke, axis1=1, axis2=2)
    out = jnp.zeros(system.ndof, dtype=u_total.dtype)
    return out.at[e["edofs"].reshape(-1)].add(d.reshape(-1))


def _robust_solve(J, rhs):
    """Dense solve with null-pivot regularization.

    The reference relies on MUMPS null-pivot detection (icntl(24)=1 with
    cntl(3)=1e-6, main.F90:365-371) so that fully-separated cohesive
    interfaces — which leave dofs with ~zero stiffness — still factorize.
    Equivalent here: dofs whose Jacobian row is numerically null are pinned
    (unit diagonal, zero rhs), i.e. they receive no Newton correction; if the
    solve still fails, fall back to a least-squares solution.
    """
    row_scale = jnp.max(jnp.abs(J), axis=1)
    ref = jnp.max(row_scale)
    null = row_scale <= 1e-12 * ref
    if bool(jnp.any(null)):
        Jr = jnp.where(null[:, None] | null[None, :], 0.0, J)
        dofs = jnp.nonzero(null)[0]
        Jr = Jr.at[dofs, dofs].set(1.0)
        rhs = jnp.where(null, 0.0, rhs)
        J = Jr
    x = direct.solve(J, rhs)
    if not bool(jnp.all(jnp.isfinite(x))):
        x = jnp.linalg.lstsq(J, rhs, rcond=None)[0]
    return x
