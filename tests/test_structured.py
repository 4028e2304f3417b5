"""Stencil (structured-grid) operator vs the general fused operator: both
must produce identical K @ u on uniform box meshes."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.ops import operator as op_mod
from fem_tpu.ops import structured

pytestmark = pytest.mark.slow  # ~571s on this host (round-4 module timing); the fast gate runs -m 'not slow'



def test_stencil_matches_fused_3d():
    nx, ny, nz = 5, 4, 3
    lx, ly, lz = 2.5, 1.0, 0.9
    E, nu = 123.0, 0.31
    problem = meshgen.hex_box_problem(nx, ny, nz, lx=lx, ly=ly, lz=lz,
                                      E=E, nu=nu)
    system = System(problem)
    fused = system.fused_operator()
    from fem_tpu.ops.stiffness import lame

    lam, mu = lame(jnp.asarray(E), jnp.asarray(nu))
    op = structured.build(
        (lx / nx, ly / ny, lz / nz), (nx + 1, ny + 1, nz + 1), lam, mu
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=system.ndof))
    a = np.asarray(op_mod.matvec(fused, u))
    b = np.asarray(structured.matvec(op, u))
    np.testing.assert_allclose(b, a, rtol=1e-11, atol=1e-11 * np.abs(a).max())
    da = np.asarray(op_mod.diag(fused))
    db = np.asarray(structured.diag(op))
    np.testing.assert_allclose(db, da, rtol=1e-11)


def test_stencil_matches_fused_2d():
    nx, ny = 6, 4
    lx, ly = 3.0, 1.5
    E, nu = 77.0, 0.22
    problem = meshgen.quad_grid_problem(nx, ny, lx=lx, ly=ly, E=E, nu=nu)
    system = System(problem)
    fused = system.fused_operator()
    from fem_tpu.ops.stiffness import lame

    lam, mu = lame(jnp.asarray(E), jnp.asarray(nu))
    # 2D grid numbering is y-major: node_shape = (nny, nnx)
    op = structured.build((lx / nx, ly / ny), (ny + 1, nx + 1), lam, mu)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=system.ndof))
    a = np.asarray(op_mod.matvec(fused, u))
    b = np.asarray(structured.matvec(op, u))
    np.testing.assert_allclose(b, a, rtol=1e-11, atol=1e-11 * np.abs(a).max())
    np.testing.assert_allclose(
        np.asarray(structured.diag(op)), np.asarray(op_mod.diag(fused)),
        rtol=1e-11,
    )


def test_stencil_heterogeneous_material():
    """Per-cell (lam, mu) fields through the two-matmul decomposition."""
    nx, ny, nz = 4, 3, 2
    problem = meshgen.hex_box_problem(nx, ny, nz, lx=1.0, ly=1.0, lz=1.0)
    system = System(problem)
    rng = np.random.default_rng(2)
    lam_f = jnp.asarray(rng.uniform(50, 150, size=(nx, ny, nz)))
    mu_f = jnp.asarray(rng.uniform(30, 80, size=(nx, ny, nz)))
    op = structured.build(
        (1.0 / nx, 1.0 / ny, 1.0 / nz), (nx + 1, ny + 1, nz + 1), lam_f, mu_f
    )
    # reference: per-element generic stiffness with matching lam/mu
    from fem_tpu.ops import elements, stiffness as stiff_ops

    et = elements.get("hex")
    conn = jnp.asarray(problem.blocks["hex"].conn)
    ecoords = jnp.asarray(problem.coords)[conn]
    # meshgen cell ordering: i (x) outer, then j, then k -> reshape matches
    ke = stiff_ops.element_stiffness_lame(
        et, ecoords, lam_f.reshape(-1), mu_f.reshape(-1)
    )
    edofs = stiff_ops.element_dofs(et, conn)
    u = jnp.asarray(rng.normal(size=system.ndof))
    fe = jnp.einsum("eab,eb->ea", ke, u[edofs])
    ref = np.zeros(system.ndof)
    np.add.at(ref, np.asarray(edofs).reshape(-1), np.asarray(fe).reshape(-1))
    got = np.asarray(structured.matvec(op, u))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10 * np.abs(ref).max())


def test_stencil_solve_matches_direct():
    """Full CG solve with the stencil operator vs dense direct."""
    from fem_tpu.config import Config
    from fem_tpu.ops.stiffness import lame
    from fem_tpu.solver import cg, stepper

    nx, ny, nz = 4, 4, 4
    problem = meshgen.hex_box_problem(nx, ny, nz, lx=1.0, ly=1.0, lz=1.0,
                                      E=500.0, tip_load=-2.0)
    system = System(problem)
    lam, mu = lame(jnp.asarray(500.0), jnp.asarray(0.3))
    op = structured.build(
        (1.0 / nx, 1.0 / ny, 1.0 / nz), (nx + 1, ny + 1, nz + 1), lam, mu
    )
    res = cg.solve_eliminated(
        lambda v: structured.matvec(op, v),
        system.rhs(0.0),
        structured.diag(op),
        system.bc_dofs,
        system.bc_step_vals(),
        rtol=1e-12,
    )
    ref = stepper.run(problem, Config(solver="direct"))
    np.testing.assert_allclose(
        np.asarray(res.x), ref.du, atol=1e-8 * np.abs(ref.du).max()
    )


def test_detect_and_stepper_structured_path():
    """Structured decks are auto-detected and routed onto the stencil+MG
    path; results match the dense direct solve."""
    from fem_tpu.config import Config
    from fem_tpu.solver import stepper

    problem = meshgen.quad_grid_problem(8, 8, lx=2.0, ly=1.0, E=120.0,
                                        nu=0.3, tip_force=(0.0, -1.0))
    spec = structured.detect(problem)
    assert spec is not None
    assert spec["node_shape"] == (9, 9)
    np.testing.assert_allclose(spec["cell_sizes"], (0.25, 0.125))

    logs = []
    res_cg = stepper.run(problem, Config(solver="cg"), log=logs.append)
    assert any("Structured grid detected" in m for m in logs)
    res_d = stepper.run(problem, Config(solver="direct"))
    np.testing.assert_allclose(
        res_cg.aggregate_u, res_d.aggregate_u,
        atol=1e-7 * np.abs(res_d.aggregate_u).max(),
    )
    np.testing.assert_allclose(
        res_cg.aggregate_stress, res_d.aggregate_stress,
        atol=1e-6 * np.abs(res_d.aggregate_stress).max(),
    )


def test_detect_3d_and_rejections():
    p3 = meshgen.hex_box_problem(4, 3, 2, lx=1.0, ly=1.0, lz=1.0)
    spec = structured.detect(p3)
    assert spec is not None and spec["node_shape"] == (5, 4, 3)
    # non-grid meshes are rejected
    from fem_tpu.models import problem as pm

    tri_deck = (
        "implicit 2 10\n1 3 1 0 0 0 0 0\n1.0 1.0\n"
        "tri 1 2 3 1 0\n0 0\n1 0\n0 1\n100.0 0.3 0 1 0\n"
    )
    assert structured.detect(pm.load(tri_deck)) is None
    # cohesive meshes are rejected
    pc = meshgen.cohesive_interface_problem(4, 2)
    assert structured.detect(pc) is None
    # irregular spacing rejected
    pj = meshgen.quad_grid_problem(4, 4)
    pj.coords[7, 0] += 0.01
    assert structured.detect(pj) is None


def test_generated_strip_deck_uses_structured_path():
    from fem_tpu.config import Config
    from fem_tpu.models import problem as pm
    from fem_tpu.solver import stepper

    p = pm.load(meshgen.quad_strip_deck(12, 3))
    assert structured.detect(p) is not None
    logs = []
    res = stepper.run(p, Config(solver="cg"), log=logs.append)
    assert any("Structured grid" in m for m in logs)
    ref = stepper.run(p, Config(solver="direct", bc_mode="eliminate"))
    np.testing.assert_allclose(
        res.aggregate_u, ref.aggregate_u,
        atol=1e-7 * np.abs(ref.aggregate_u).max(),
    )


def test_stepper_structured_ir_path():
    """The large-structured stepper route (f64/f32 iterative refinement with
    chunked MG-CG) matches the small-path solve; threshold lowered so the
    route is exercised at test scale."""
    import numpy as np

    from fem_tpu.config import Config
    from fem_tpu.io import meshgen
    from fem_tpu.solver import stepper

    p = meshgen.hex_box_problem(8, 8, 8, lx=1.0, ly=1.0, lz=1.0,
                                E=200e9, nu=0.3, tip_load=-1e6)
    logs = []
    r_ir = stepper.run(
        p, Config(solver="cg", structured_big_threshold=1), log=logs.append
    )
    r_small = stepper.run(p, Config(solver="cg"))
    assert any("iterative refinement" in m for m in logs)
    nu_ = np.linalg.norm(r_small.aggregate_u)
    assert np.linalg.norm(r_ir.aggregate_u - r_small.aggregate_u) < 1e-8 * nu_
