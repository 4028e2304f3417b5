"""Fused matrix-free elastic operator as a JAX pytree (element-batch-last).

Why a pytree: the hot solve functions must receive the element data (spatial
gradients, scales, Lame parameters, dof maps) as *arguments*, not as closed-
over constants — closures bake device arrays into the HLO as literals, which
bloats compile payloads (hundreds of MB at 1M DOF) and defeats donation. With
`FusedOperator` registered as a pytree, `jax.jit(solve)(op, F, ...)` traces
once and streams the arrays as buffers.

Why element-batch-LAST: TPU tiles the trailing two array dimensions to
(8, 128) vregs. Element-batch-first layouts like (ne, nip, pdim, nn) put tiny
dims (3, 8) in the tiled positions — a ~40x padding waste on every
intermediate. Storing (nip, pdim, nn, ne) keeps the huge ne axis in the lane
dimension, so every elementwise op runs at full VPU width. Measured ~5x on
the matvec vs the ne-first layout.

The operator applies K @ u without materializing element stiffness matrices:
gather (nn*pdim, ne) -> fused isotropic stress kernel -> sorted segment-sum
scatter. This replaces the reference's assembled PETSc MatAIJ SpMV
(main.F90:157-171 + MatMult inside KSP) with TPU-idiomatic on-the-fly
compute: ~5k flops vs ~2.3KB of matrix traffic per hex8 element.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.ops import stiffness as stiff_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedBlock:
    """Per-element-type data, batched over elements in the LAST axis."""

    edofs_t: jax.Array  # (nn*pdim, ne) int32, interleaved dof ids
    dNx: jax.Array  # (nip, pdim, nn, ne)
    scale: jax.Array  # (nip, ne) w * detJ
    lam: jax.Array  # (ne,)
    mu: jax.Array  # (ne,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedOperator:
    blocks: Tuple[FusedBlock, ...]
    perm: jax.Array  # (sum nn*pdim*ne,) sorted-scatter permutation
    sorted_ids: jax.Array  # same length, ascending dof ids
    # Node-centric ELL scatter: gather_idx[d, k] indexes the concatenated
    # per-block force vector (one extra trailing ZERO slot for padding);
    # out[d] = sum_k forces[gather_idx[d, k]]. Converts the segment-sum
    # scatter into a dense (ndof, K) gather + axis reduction — measured
    # several times faster on TPU (scatter-adds are the weak spot).
    gather_idx: jax.Array  # (ndof, K) int32
    ndof: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.blocks[0].dNx.dtype if self.blocks else jnp.float64

    def astype(self, dtype):
        """Cast the float leaves (dof maps stay integer)."""
        blocks = tuple(
            FusedBlock(
                b.edofs_t,
                b.dNx.astype(dtype),
                b.scale.astype(dtype),
                b.lam.astype(dtype),
                b.mu.astype(dtype),
            )
            for b in self.blocks
        )
        return FusedOperator(blocks, self.perm, self.sorted_ids,
                             self.gather_idx, self.ndof)


def build(system) -> FusedOperator:
    """Build from a models.system.System (host-side, once per problem)."""
    blocks = []
    flat_dofs = []
    for name, e in system.blocks.items():
        if e["is_coh"]:
            continue
        et = e["et"]
        dNx, detj = stiff_ops.grad_and_detj(et, e["ecoords"])
        w = jnp.asarray(et.weights, dtype=system.dtype)
        scale = (detj * w[None, :]).T  # (nip, ne)
        lam, mu = stiff_ops.lame(e["E"], e["nu"])
        blocks.append(
            FusedBlock(
                edofs_t=jnp.asarray(e["edofs"]).T,
                dNx=jnp.transpose(dNx, (1, 2, 3, 0)),
                scale=scale,
                lam=lam,
                mu=mu,
            )
        )
        flat_dofs.append(np.asarray(e["edofs"]).T.reshape(-1))
    flat = np.concatenate(flat_dofs) if flat_dofs else np.zeros(0, np.int32)
    perm = np.argsort(flat, kind="stable")
    # node-centric ELL scatter table: positions of each dof's entries in
    # the concatenated force vector, padded with a trailing zero slot
    nz = flat.shape[0]
    counts = np.bincount(flat, minlength=system.ndof)
    K = int(counts.max()) if nz else 1
    gather = np.full((system.ndof, K), nz, dtype=np.int64)  # nz = zero slot
    starts = np.zeros(system.ndof + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    col = np.arange(nz) - starts[flat[perm]]
    gather[flat[perm], col] = perm
    return FusedOperator(
        blocks=tuple(blocks),
        perm=jnp.asarray(perm),
        sorted_ids=jnp.asarray(flat[perm]),
        gather_idx=jnp.asarray(gather.astype(np.int32)),
        ndof=system.ndof,
    )


def block_force(b: FusedBlock, u):
    """Fused internal force for one block: returns (nn*pdim, ne).

    f[(a,q)] = sum_ip scale * dNx[ip,p,a] * sigma[ip,p,q], with
    sigma = lam tr(g) I + mu (g + g^T) and g[ip,p,q] = sum_a dNx[ip,p,a] u[a,q].

    The tiny-dim contractions are UNROLLED as elementwise multiply-adds
    (ne in lanes) instead of einsum: XLA lowers einsums over 8/3-sized
    contraction dims to dot_generals with tile-padded intermediates — a
    bf16[8,8,3,8,ne] buffer padded from 487MB to 7.6GB (7.5% utilization)
    OOM'd the 527k-dof AMG solve, and the MXU pass also rounds to bf16.
    """
    nip, pdim, nn, ne = b.dNx.shape
    un = u[b.edofs_t].reshape(nn, pdim, ne)  # (a, q, e)
    # g[i,p,q,e] = sum_a dNx[i,p,a,e] * un[a,q,e]
    g = None
    for a in range(nn):
        term = b.dNx[:, :, a, None, :] * un[a][None, None, :, :]
        g = term if g is None else g + term
    tr = None  # (i, e)
    for p in range(pdim):
        t = g[:, p, p, :]
        tr = t if tr is None else tr + t
    sym = g + jnp.swapaxes(g, 1, 2)
    eye = jnp.eye(pdim, dtype=u.dtype)
    sigma = (
        b.lam[None, None, None, :] * tr[:, None, None, :] * eye[None, :, :, None]
        + b.mu[None, None, None, :] * sym
    )
    sigma = sigma * b.scale[:, None, None, :]
    # f[a,q,e] = sum_{i,p} dNx[i,p,a,e] * sigma[i,p,q,e]
    rows = []
    for a in range(nn):
        fa = jnp.sum(b.dNx[:, :, a, None, :] * sigma, axis=(0, 1))  # (q, e)
        rows.append(fa)
    f = jnp.stack(rows, axis=0)  # (a, q, e)
    return f.reshape(nn * pdim, ne)


def matvec(op: FusedOperator, u):
    """K @ u, matrix-free, deterministic reduction order (node-centric ELL
    gather — see FusedOperator.gather_idx)."""
    parts = [block_force(b, u).reshape(-1) for b in op.blocks]
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    padded = jnp.concatenate([flat, jnp.zeros(1, dtype=flat.dtype)])
    return jnp.sum(padded[op.gather_idx], axis=1)


def matvec_segsum(op: FusedOperator, u):
    """The round-1 sorted segment-sum schedule (kept for comparison)."""
    parts = [block_force(b, u).reshape(-1) for b in op.blocks]
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return jax.ops.segment_sum(
        flat[op.perm], op.sorted_ids, num_segments=op.ndof,
        indices_are_sorted=True,
    )


def diag(op: FusedOperator):
    """Diagonal of K (Jacobi preconditioner) from the fused data:
    diag[(a,p)] = (lam+mu) sum_ip s dNx[p,a]^2 + mu sum_ip,k s dNx[k,a]^2."""
    d = jnp.zeros(op.ndof, dtype=op.dtype)
    for b in op.blocks:
        hd = jnp.einsum("ie,ipae,ipae->pae", b.scale, b.dNx, b.dNx)
        tot = jnp.sum(hd, axis=0)  # (nn, ne)
        dv = (
            (b.lam + b.mu)[None, None, :] * jnp.swapaxes(hd, 0, 1)
            + b.mu[None, None, :] * tot[:, None, :]
        )  # (nn, pdim, ne)
        nnp = dv.shape[0] * dv.shape[1]
        d = d.at[b.edofs_t.reshape(-1)].add(dv.reshape(nnp, -1).reshape(-1))
    return d
