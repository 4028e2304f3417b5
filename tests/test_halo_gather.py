"""DOF-sharded halo matvec for general unstructured meshes
(parallel/halo_gather.py): exact agreement with the single-device fused
operator, on jittered and scrambled-numbering decks, over the 8-device
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.ops import operator as op_mod
from fem_tpu.parallel import halo_gather as hg

pytestmark = pytest.mark.slow  # ~121s on this host (round-4 module timing); the fast gate runs -m 'not slow'



def _mesh(nd=8):
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:nd])
    return Mesh(devs, ("shard",))


def _check_matches(problem, rtol=1e-12):
    s = System(problem, dtype=jnp.float64)
    fop = s.fused_operator()
    mesh = _mesh()
    nd = mesh.devices.size
    op, pos = hg.build(s, nd)
    op = hg.device_put(op, mesh)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(s.ndof))
    up = hg.to_padded_cm(u, pos, nd, op.S, op.pdim)
    out_p = hg.matvec_cm_sharded(op, up, mesh)
    got = hg.from_padded_cm(out_p, pos, op.pdim)
    want = op_mod.matvec(fop, u)
    nw = float(jnp.linalg.norm(want))
    assert float(jnp.linalg.norm(got - want)) < rtol * nw
    return op


def test_halo_gather_jittered_hex():
    p = meshgen.hex_box_problem(12, 6, 6, jitter=0.25, seed=3)
    op = _check_matches(p)
    # the layout must actually be banded, not degenerate
    assert op.B < op.S


def test_halo_gather_scrambled_numbering():
    """Node numbering carries no locality; the coordinate slab order must
    recover it. (Mesh long enough in x that B < S under 8 slabs.)"""
    p = meshgen.permute_nodes(
        meshgen.hex_box_problem(24, 5, 5, jitter=0.2, seed=1), seed=7)
    _check_matches(p)


def test_halo_gather_quad_2d():
    p = meshgen.quad_grid_problem(24, 12)
    _check_matches(p)


def test_halo_gather_rejects_wide_reach():
    """A mesh whose elements reach past a whole slab (tiny cube over 8
    slabs) must refuse the banded layout so callers keep the psum path."""
    p = meshgen.hex_box_problem(4, 4, 4)
    s = System(p, dtype=jnp.float64)
    with pytest.raises(ValueError):
        hg.build(s, 8)


def test_halo_gather_cohesive_elastic_block():
    """A cohesive deck's ELASTIC operator is a single quad block — the
    banded layout applies to it (the seam nodes are spatially local)."""
    p = meshgen.cohesive_interface_problem(
        48, 6, lx=5.0, ly_half=1.0, E=3640.0, open_disp=0.015,
        t=1.0, dt=0.5, coh_props=(100.0, 0.01, 0.01, 1.0, 0.0, 0.0))
    _check_matches(p)
