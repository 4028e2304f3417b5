"""Viscoelastic (power-law creep) stepping: validated against the linear
Maxwell closed form.

For expn=1 pure shear, the 2D creep law gives beta_xy = sigma_xy/visc, so a
constant applied shear rate gamma' follows
    sigma_xy(t) = G gamma' tau (1 - exp(-t/tau)),  tau = visc/G
— the classical Maxwell ramp response. A single quad element driven by a
linearly ramped shear displacement must track it to O(dt)."""

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.models.problem import Block, Problem
from fem_tpu.solver import stepper


def _shear_problem(E, nu, visc, gamma_total, t, dt):
    # unit square, bottom edge fixed, top edge driven +x by gamma_total
    # (engineering shear), y pinned everywhere -> homogeneous pure shear.
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    blocks = {
        "qua": Block(
            "qua",
            conn=np.array([[0, 1, 2, 3]], dtype=np.int32),
            mat=np.zeros(1, dtype=np.int32),
            nlmat=np.full(1, -1, dtype=np.int32),
            eids=np.zeros(1, dtype=np.int32),
        )
    }
    bc_dofs, bc_vals = [], []
    for n in range(4):
        ux = gamma_total if coords[n, 1] == 1.0 else 0.0
        bc_dofs += [2 * n, 2 * n + 1]
        bc_vals += [ux, 0.0]
    return Problem(
        stype="implicit", pdim=2, t=t, dt=dt, coords=coords, blocks=blocks,
        mats=np.array([[E, nu, visc, 1.0, 0.0]]),
        coh_laws=np.zeros(0, dtype=np.int32), coh_props=np.zeros((0, 6)),
        bc_dofs=np.array(bc_dofs, dtype=np.int32), bc_vals=np.array(bc_vals),
        force_dofs=np.zeros((0, 2), dtype=np.int32),
        force_vec=np.zeros((0, 2)), force_t1=np.zeros(0), force_t2=np.zeros(0),
        trac_dofs=np.zeros((0, 2, 2), dtype=np.int32),
        trac_nodal_vec=np.zeros((0, 2)), trac_t1=np.zeros(0),
        trac_t2=np.zeros(0),
    )


def test_maxwell_shear_ramp():
    E, nu = 100.0, 0.0
    G = E / (2 * (1 + nu))
    visc = 20.0
    tau = visc / G
    gamma_total, T = 0.02, 2.0
    dt = 0.01
    p = _shear_problem(E, nu, visc, gamma_total, T, dt)
    res = stepper.run(p, Config(viscoelastic=True, solver="direct",
                                bc_mode="eliminate"))
    gdot = gamma_total / T
    sigma_exact = G * gdot * tau * (1 - np.exp(-T / tau))
    sigma_fem = res.aggregate_stress[0, 2]  # sigma_xy at a node
    assert abs(sigma_fem - sigma_exact) < 0.03 * abs(sigma_exact), (
        sigma_fem, sigma_exact
    )
    # displacement is the prescribed ramp regardless of creep
    u = res.aggregate_u.reshape(4, 2)
    np.testing.assert_allclose(u[2, 0], gamma_total, atol=1e-10)


def test_without_flag_stays_elastic():
    p = _shear_problem(100.0, 0.0, 20.0, 0.02, 2.0, 0.5)
    res_off = stepper.run(p, Config(viscoelastic=False))
    G = 50.0
    np.testing.assert_allclose(
        res_off.aggregate_stress[0, 2], G * 0.02, rtol=1e-8
    )


def test_zero_viscosity_materials_noop():
    # visc column = 0 -> creep state empty -> identical to elastic run
    p = _shear_problem(100.0, 0.0, 0.0, 0.02, 1.0, 0.5)
    a = stepper.run(p, Config(viscoelastic=True))
    b = stepper.run(p, Config(viscoelastic=False))
    np.testing.assert_array_equal(a.aggregate_u, b.aggregate_u)
