"""Variable-coefficient block-stencil operator for lattice-topology meshes.

The operator tiers for the elastic matvec (the reference's PETSc MatMult /
MUMPS workhorse, /root/reference/src/main.F90:157-171,354-390):

  1. ops/structured.py — geometrically uniform boxes: one CONSTANT 27-point
     stencil, no per-node coefficients at all.
  2. THIS MODULE — meshes whose assembled CONNECTIVITY is a lattice even
     though the geometry is not (jittered, graded, boundary-fitted grids —
     the common "mapped mesh" case in practice): per-node-pair (pdim, pdim)
     blocks laid out on a (noffs, pdim, pdim, NX[, NY[, NZ]]) grid, applied
     with STATIC shifted slices — zero gather indices.
  3. ops/operator.py — genuinely unstructured topology: the fused
     gather/scatter matvec (its floor is the XLA gather issue rate, see
     DESIGN.md roofline).

Why it matters on TPU: the tier-3 matvec at 527k dofs costs ~15 ms, bounded
by ~2.7M node-row gathers (input + assembly gathers at the measured XLA
gather rate), while its arithmetic is ~0.4 ms and its streaming traffic
<1 ms.  Tier 2 replaces every gather with a static slice of the padded
solution grid: traffic = one pass over the 27*pdim^2 coefficient blocks
(171 MB f32 at 527k dofs -> ~0.3 ms roofline), fully fusable by XLA.

Detection is EXACT and topology-only: from the assembled CSR, infer the
lattice strides from node 0's neighbor set, then verify that EVERY nonzero
block couples nodes whose lattice offsets lie in {-1,0,1}^dim.  Any mesh
that fails (tet meshes, cohesive interfaces, renumbered nodes, local
refinement) falls back to tier 3 — no behavioral risk.

Assembly consumes the RAW assembled matrix, so `matvec` reproduces
ops/operator.matvec exactly (same K, different schedule) — including the
BC-column couplings the prescribed-displacement lift `F - K @ u_bc` needs.
Solvers apply the same external float-mask arithmetic as the fused path
(cg.masked_operator semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockStencilOperator:
    # (noffs, pdim, pdim, *dims) — node grid trailing (lane-tiled), offset/
    # component axes leading. noffs = 3^dim.
    vals: jax.Array
    dims: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    pdim: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nnds(self):
        return int(np.prod(self.dims))

    @property
    def ndof(self):
        return self.nnds * self.pdim

    def astype(self, dtype):
        return BlockStencilOperator(self.vals.astype(dtype), self.dims,
                                    self.pdim)


def detect(A, pdim: int, nnds: int) -> Optional[Tuple[int, ...]]:
    """Infer lattice dims (NX[, NY[, NZ]]) from the assembled CSR's node
    connectivity, or None if the topology is not a lex-ordered lattice.

    Node ids must enumerate the lattice lexicographically (last axis
    fastest) — the layout every generated/mapped grid deck uses. The check
    is exact: strides are inferred from node 0 (a lattice corner), then
    every nonzero block must couple nodes at {-1,0,1}^dim offsets.
    """
    if A.shape[0] != pdim * nnds:
        return None
    # node-0 neighborhood from its pdim dof rows
    j0 = np.unique(A.indices[: A.indptr[pdim]] // pdim)
    d0 = np.unique(j0[j0 > 0])
    if d0.size == 3:  # 2D corner: {1, NY, NY+1}
        if d0[0] != 1 or d0[2] != d0[1] + 1:
            return None
        NY = int(d0[1])
        if NY <= 1 or nnds % NY:
            return None
        dims = (nnds // NY, NY)
    elif d0.size == 7:  # 3D corner: {1, NZ, NZ+1, NYNZ, +1, +NZ, +NZ+1}
        NZ, NYNZ = int(d0[1]), int(d0[3])
        if (d0[0] != 1 or d0[2] != NZ + 1 or NZ <= 1
                or NYNZ % NZ or nnds % NYNZ):
            return None
        if not np.array_equal(
            d0, np.array([1, NZ, NZ + 1, NYNZ, NYNZ + 1, NYNZ + NZ,
                          NYNZ + NZ + 1])
        ):
            return None
        dims = (nnds // NYNZ, NYNZ // NZ, NZ)
    else:
        return None
    if any(d < 2 for d in dims):
        return None
    # full verification over every nonzero block
    counts = np.diff(A.indptr)
    i_node = (np.repeat(np.arange(A.shape[0], dtype=np.int64), counts)
              // pdim)
    j_node = A.indices.astype(np.int64) // pdim
    rem_i, rem_j = i_node, j_node
    for stride_dim in dims[:0:-1]:  # fastest axis outward
        ci, rem_i = rem_i % stride_dim, rem_i // stride_dim
        cj, rem_j = rem_j % stride_dim, rem_j // stride_dim
        if np.abs(cj - ci).max() > 1:
            return None
    if np.abs(rem_j - rem_i).max() > 1:
        return None
    return dims


def build(A, pdim: int, dims: Tuple[int, ...],
          dtype=jnp.float64) -> BlockStencilOperator:
    """Scatter the assembled CSR's (pdim, pdim) node blocks onto the
    (3^dim, pdim, pdim, *dims) offset grid (host-side, once)."""
    nd = len(dims)
    noffs = 3 ** nd
    nnds = int(np.prod(dims))
    Ac = A.tocoo()
    rows = Ac.row.astype(np.int64)
    cols = Ac.col.astype(np.int64)
    i_node, p = rows // pdim, rows % pdim
    j_node, q = cols // pdim, cols % pdim
    # per-axis offsets (fastest axis last) -> flat offset index, base 3
    off = np.zeros(len(rows), dtype=np.int64)
    rem_i, rem_j = i_node, j_node
    axis_offs = []
    for stride_dim in dims[:0:-1]:
        ci, rem_i = rem_i % stride_dim, rem_i // stride_dim
        cj, rem_j = rem_j % stride_dim, rem_j // stride_dim
        axis_offs.append(cj - ci)
    axis_offs.append(rem_j - rem_i)
    for d in axis_offs[::-1]:  # slowest axis first => lex offset index
        off = off * 3 + (d + 1)
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    vals = np.zeros((noffs, pdim, pdim, nnds), dtype=np_dtype)
    vals[off, p, q, i_node] = Ac.data  # CSR sum_duplicates'd: unique coords
    return BlockStencilOperator(
        vals=jnp.asarray(vals.reshape((noffs, pdim, pdim) + tuple(dims))),
        dims=tuple(int(d) for d in dims),
        pdim=int(pdim),
    )


def matvec_g(op: BlockStencilOperator, u_g):
    """A @ u with grid-shaped u (pdim, *dims); returns (pdim, *dims).

    27 (or 9) static shifted slices of the once-padded grid, with the tiny
    pdim x pdim block contraction UNROLLED elementwise (tiny-dim einsums
    tile-pad catastrophically on TPU — see operator.block_force)."""
    nd = len(op.dims)
    pad = ((0, 0),) + ((1, 1),) * nd
    up = jnp.pad(u_g, pad)
    acc = [None] * op.pdim
    idx = 0
    for offs in np.ndindex(*(3,) * nd):
        sl = (slice(None),) + tuple(
            slice(o, o + d) for o, d in zip(offs, op.dims)
        )
        us = up[sl]  # (pdim, *dims)
        w = op.vals[idx]  # (pdim, pdim, *dims)
        for pp in range(op.pdim):
            t = None
            for qq in range(op.pdim):
                term = w[pp, qq] * us[qq]
                t = term if t is None else t + term
            acc[pp] = t if acc[pp] is None else acc[pp] + t
        idx += 1
    return jnp.stack(acc, axis=0)


def matvec_cm(op: BlockStencilOperator, u_cm):
    """A @ u in (pdim, nnds) component-major layout (solver state form).
    The grid reshapes are contiguous (lex node order) — metadata only."""
    g = matvec_g(op, u_cm.reshape((op.pdim,) + op.dims))
    return g.reshape(op.pdim, -1)


def matvec(op: BlockStencilOperator, u):
    """Flat (ndof,) interleaved-dof wrapper (pays two layout transposes —
    prefer matvec_cm / matvec_g in solvers)."""
    u_cm = u.reshape(op.nnds, op.pdim).T
    return matvec_cm(op, u_cm).T.reshape(-1)
