"""Method-of-manufactured-solutions convergence: bilinear/trilinear elements
must converge at O(h^2) in the nodal L2 norm.

Exact field u = (x^2 - y^2, -2xy[, 0]) is divergence-free with harmonic
components, so the Navier equations are satisfied with zero body force for
ANY (lam, mu) — the solver sees it purely through Dirichlet data. This
validates the entire pipeline (tables -> B -> k_e -> assembly -> BC -> solve)
with no reference to the golden files."""

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import meshgen
from fem_tpu.models.problem import Problem
from fem_tpu.solver import stepper

pytestmark = pytest.mark.slow  # ~144s on this host (round-4 module timing); the fast gate runs -m 'not slow'



def _exact2d(xy):
    # e^x(cos y, -sin y): harmonic components, divergence-free -> satisfies
    # Navier with zero body force for any (lam, mu); non-polynomial, so the
    # FE solution is NOT nodally exact and the rate is observable.
    x, y = xy[:, 0], xy[:, 1]
    return np.stack([np.exp(x) * np.cos(y), -np.exp(x) * np.sin(y)], axis=1)


def _exact3d(xyz):
    x, y = xyz[:, 0], xyz[:, 1]
    return np.stack(
        [np.exp(x) * np.cos(y), -np.exp(x) * np.sin(y), np.zeros_like(x)],
        axis=1,
    )


def _with_dirichlet_everywhere(problem: Problem, exact):
    coords = problem.coords
    pdim = problem.pdim
    on_bnd = np.zeros(coords.shape[0], dtype=bool)
    for j in range(pdim):
        on_bnd |= np.isclose(coords[:, j], coords[:, j].min())
        on_bnd |= np.isclose(coords[:, j], coords[:, j].max())
    nodes = np.nonzero(on_bnd)[0]
    vals = exact(coords[nodes])
    bc_dofs = (nodes[:, None] * pdim + np.arange(pdim)[None, :]).reshape(-1)
    problem.bc_dofs = bc_dofs.astype(np.int32)
    problem.bc_vals = vals.reshape(-1)
    # clear loads
    problem.force_dofs = np.zeros((0, pdim), dtype=np.int32)
    problem.force_vec = np.zeros((0, pdim))
    problem.force_t1 = problem.force_t2 = np.zeros(0)
    return problem


def _l2_error(problem, result, exact):
    u = result.aggregate_u.reshape(problem.nnds, problem.pdim)
    ue = exact(problem.coords)
    return np.sqrt(np.mean((u - ue) ** 2))


def test_quad4_quadratic_field_nodally_exact():
    """u = (x^2-y^2, -2xy) (harmonic, div-free): bilinear elements on a
    rectangular grid reproduce it exactly at the nodes — a strong whole-
    pipeline identity check."""

    def quad_field(xy):
        x, y = xy[:, 0], xy[:, 1]
        return np.stack([x * x - y * y, -2 * x * y], axis=1)

    p = meshgen.quad_grid_problem(6, 6, E=100.0, nu=0.3)
    p = _with_dirichlet_everywhere(p, quad_field)
    res = stepper.run(p, Config(solver="direct", rtol=1e-13))
    assert _l2_error(p, res, quad_field) < 1e-12


@pytest.mark.parametrize("solver", ["direct", "cg"])
def test_quad4_second_order_convergence(solver):
    errors = []
    for n in (4, 8, 16):
        p = meshgen.quad_grid_problem(n, n, E=100.0, nu=0.3)
        p = _with_dirichlet_everywhere(p, _exact2d)
        res = stepper.run(p, Config(solver=solver, rtol=1e-12))
        errors.append(_l2_error(p, res, _exact2d))
    rate1 = np.log2(errors[0] / errors[1])
    rate2 = np.log2(errors[1] / errors[2])
    assert rate1 > 1.7, (errors, rate1)
    assert rate2 > 1.7, (errors, rate2)


def test_hex8_second_order_convergence():
    errors = []
    for n in (2, 4, 8):
        p = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0,
                                    E=10.0, nu=0.25, tip_load=0.0)
        p = _with_dirichlet_everywhere(p, _exact3d)
        res = stepper.run(p, Config(solver="direct", bc_mode="eliminate"))
        errors.append(_l2_error(p, res, _exact3d))
    rate = np.log2(errors[1] / errors[2])
    assert rate > 1.6, (errors, rate)


def test_tri3_converges():
    # split each quad into two tris: build from a deck for the tri path
    errors = []
    for n in (4, 8, 16):
        lines = [
            "implicit 2 10",
            f"{2 * n * n} {(n + 1) * (n + 1)} 1 0 0 0 0 0",
            "1.0 1.0",
        ]
        for i in range(n):
            for j in range(n):
                n1 = j + 1 + i * (n + 1)
                n2, n3, n4 = n1 + 1, n1 + 1 + (n + 1), n1 + (n + 1)
                lines.append(f"tri {n1} {n2} {n3} 1 0")
                lines.append(f"tri {n1} {n3} {n4} 1 0")
        for i in range(n + 1):
            for j in range(n + 1):
                lines.append(f"{j / n} {i / n}")
        lines.append("100.0 0.3 0.0 1.0 0.0")
        from fem_tpu.models import problem as pm

        p = pm.load("\n".join(lines) + "\n")
        p = _with_dirichlet_everywhere(p, _exact2d)
        res = stepper.run(p, Config(solver="direct", bc_mode="eliminate"))
        errors.append(_l2_error(p, res, _exact2d))
    rate = np.log2(errors[1] / errors[2])
    assert rate > 1.5, (errors, rate)
