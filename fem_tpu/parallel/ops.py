"""Sharded matrix-free FEM operators (shard_map + ICI collectives).

Replaces the reference's METIS partitioning + PETSc distributed assembly
(PartitionBroadcast m_io.F90:107-143, DistributeElements m_io.F90:200-237,
MatAssembly/VecScatter comms) with SPMD element sharding:

  - every element-type batch (k_e, dof indices) is sharded along the 1D
    device mesh axis ("domain decomposition" without any explicit send/recv);
  - the displacement vector is replicated (it is small relative to element
    data: ndof ~ nodes*pdim, while element data is O(ne*ndof_e^2));
  - the matvec is: local gather -> batched k_e @ u_e -> local scatter-add
    -> jax.lax.psum over the axis. The psum is exactly the shared-node
    reduction PETSc performed in MatAssembly (SURVEY.md §2c), riding ICI.

Partition quality does not matter here (unlike METIS): every device does
identical dense batched work, and the reduction cost is O(ndof) independent
of the partition, so plain block sharding is optimal. Load balance comes from
padding each type batch to a multiple of the axis size.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from fem_tpu.models.system import System
from fem_tpu.parallel.mesh import AXIS, make_mesh


def _pad_to_multiple(a: jnp.ndarray, m: int) -> jnp.ndarray:
    ne = a.shape[0]
    pad = (-ne) % m
    if pad == 0:
        return a
    widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, widths)


class ShardedOperator:
    """Element-sharded elastic operator over a 1D device mesh.

    Supports the two vector layouts from SURVEY.md §2c:
      - replicated DOF vector (default): matvec output psum'd to all devices;
      - use `matvec` inside jit; CG vector algebra stays replicated.
    """

    def __init__(self, system: System, mesh: Optional[Mesh] = None):
        self.system = system
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        nd = self.mesh.devices.size
        self.ndof = system.ndof

        elem_sharding = NamedSharding(self.mesh, P(self.axis))
        self.blocks = []
        for name, e in system.blocks.items():
            if e["ke"] is None:
                continue
            ke = _pad_to_multiple(e["ke"], nd)
            edofs = _pad_to_multiple(e["edofs"], nd)
            ke = jax.device_put(ke, elem_sharding)
            edofs = jax.device_put(edofs, elem_sharding)
            self.blocks.append((name, ke, edofs))

        axis = self.axis
        mesh = self.mesh
        ndof = self.ndof

        def local_mv(ke, edofs, u):
            ue = u[edofs]
            fe = jnp.einsum("eab,eb->ea", ke, ue)
            out = jnp.zeros(ndof, dtype=u.dtype)
            out = out.at[edofs.reshape(-1)].add(fe.reshape(-1))
            return jax.lax.psum(out, axis)

        self._block_mv = shard_map(
            local_mv,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=P(),
        )

        def local_diag(ke, edofs):
            d = jnp.diagonal(ke, axis1=1, axis2=2)
            out = jnp.zeros(ndof, dtype=ke.dtype)
            out = out.at[edofs.reshape(-1)].add(d.reshape(-1))
            return jax.lax.psum(out, axis)

        self._block_diag = shard_map(
            local_diag,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(),
        )

    def matvec(self, u):
        out = jnp.zeros(self.ndof, dtype=u.dtype)
        for _, ke, edofs in self.blocks:
            out = out + self._block_mv(ke, edofs, u)
        return out

    def diag(self):
        d = jnp.zeros(self.ndof, dtype=self.system.dtype)
        for _, ke, edofs in self.blocks:
            d = d + self._block_diag(ke, edofs)
        return d


def solve_step_sharded(system: System, op: ShardedOperator, t_init,
                       du0=None, rtol: float = 1e-9, maxiter: int = 0):
    """One elastic load increment with the sharded operator: RHS, eliminated
    BCs, Jacobi-PCG, stress recovery. jit-compatible end to end."""
    from fem_tpu.solver import cg

    F = system.rhs(t_init)
    res = cg.solve_eliminated(
        op.matvec,
        F,
        op.diag(),
        system.bc_dofs,
        system.bc_step_vals(),
        x0=du0,
        rtol=rtol,
        maxiter=maxiter,
    )
    stress = system.stress_increment(res.x)
    return res.x, stress, res.iters
