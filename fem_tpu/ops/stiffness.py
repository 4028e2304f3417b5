"""Batched isoparametric element kernels: B-matrix, stiffness, stress.

TPU-native replacement for the reference's per-element hot loops
(FormElKE m_local.F90:21-67, CalcElStress m_local.F90:93-123, BMat
m_local.F90:148-171, FormdNdetJ m_local.F90:175-189). Instead of looping over
heterogeneous element structs, each element *type* is processed as one batched
tensor contraction over all its elements and integration points — the shape
XLA tiles onto the MXU.

All functions take a leading element batch axis:
  ecoords: (ne, nn, pdim)   node coordinates gathered per element
  D:       (ne, cpdim, cpdim) per-element constitutive matrix
  ue:      (ne, nn*pdim)    element displacement vector (interleaved dofs)
"""

from __future__ import annotations

import jax.numpy as jnp

from fem_tpu.ops.elements import ElementType
from fem_tpu.utils import smallmat


def grad_and_detj(et: ElementType, ecoords):
    """Spatial shape-function gradients and |J| at every integration point.

    Mirrors FormdNdetJ (m_local.F90:175-189): J = dN_xi @ X, detJ = |J|,
    dN_x = J^-1 dN_xi — but batched over (ne, nip) with closed-form 2x2/3x3
    inverses (no LAPACK).

    Returns:
      dNx:  (ne, nip, pdim, nn)
      detj: (ne, nip)
    """
    dN = jnp.asarray(et.dN, dtype=ecoords.dtype)  # (nip, pdim, nn)
    jac = jnp.einsum("ipn,end->eipd", dN, ecoords)  # (ne, nip, pdim, pdim)
    detj = smallmat.det(jac)
    invj = smallmat.inv(jac)
    dNx = jnp.einsum("eipq,iqn->eipn", invj, dN)
    return dNx, detj


def bmat(dNx, pdim: int):
    """Strain-displacement matrix B from spatial gradients.

    Mirrors BMat (m_local.F90:148-171). dNx: (..., pdim, nn) ->
    B: (..., cpdim, nn*pdim) with dof ordering (node0_x, node0_y[, node0_z],
    node1_x, ...) to match FormElIndx (m_local.F90:70-78).
    """
    zero = jnp.zeros_like(dNx[..., 0, :])
    if pdim == 2:
        dx, dy = dNx[..., 0, :], dNx[..., 1, :]
        rows = [
            jnp.stack([dx, zero], axis=-1),
            jnp.stack([zero, dy], axis=-1),
            jnp.stack([dy, dx], axis=-1),
        ]
    elif pdim == 3:
        dx, dy, dz = dNx[..., 0, :], dNx[..., 1, :], dNx[..., 2, :]
        rows = [
            jnp.stack([dx, zero, zero], axis=-1),
            jnp.stack([zero, dy, zero], axis=-1),
            jnp.stack([zero, zero, dz], axis=-1),
            jnp.stack([dy, dx, zero], axis=-1),
            jnp.stack([zero, dz, dy], axis=-1),
            jnp.stack([dz, zero, dx], axis=-1),
        ]
    else:
        raise ValueError(f"bmat: pdim must be 2 or 3, got {pdim}")
    b = jnp.stack(rows, axis=-3)  # (..., cpdim, nn, pdim)
    return b.reshape(b.shape[:-2] + (b.shape[-2] * b.shape[-1],))


def element_stiffness(et: ElementType, ecoords, D):
    """Batched element stiffness k_e = sum_ip B^T D B w detJ.

    Mirrors FormElKE (m_local.F90:21-67) as one fused contraction over all
    elements of a type. Returns (ne, ndof, ndof).
    """
    dNx, detj = grad_and_detj(et, ecoords)
    B = bmat(dNx, et.pdim)  # (ne, nip, cpdim, ndof)
    w = jnp.asarray(et.weights, dtype=ecoords.dtype)
    scale = detj * w[None, :]  # (ne, nip)
    return jnp.einsum("eica,ecd,eidb,ei->eab", B, D, B, scale)


def element_stress(et: ElementType, ecoords, ue, D):
    """Batched integration-point stress: eps = B u_e, sigma = D eps.

    Mirrors CalcElStress (m_local.F90:93-123). Returns (ne, nip, cpdim).
    """
    dNx, _ = grad_and_detj(et, ecoords)
    B = bmat(dNx, et.pdim)
    eps = jnp.einsum("eica,ea->eic", B, ue)
    return jnp.einsum("ecd,eid->eic", D, eps)


def nodal_stress(et: ElementType, sigma_ip):
    """Extrapolate integration-point stress to element nodes.

    Mirrors RecoverNodalStress (m_global.F90:488-515): multiply by the
    memoized N2^-1 when nip == nnodes, broadcast when nip == 1.
    sigma_ip: (ne, nip, cpdim) -> (ne, nnodes, cpdim).
    """
    if et.n2inv is not None:
        n2inv = jnp.asarray(et.n2inv, dtype=sigma_ip.dtype)
        return jnp.einsum("ni,eic->enc", n2inv, sigma_ip)
    if et.nip == 1:
        return jnp.broadcast_to(
            sigma_ip, (sigma_ip.shape[0], et.nnodes, sigma_ip.shape[2])
        )
    raise ValueError(
        f"nodal_stress: no extrapolation rule for {et.name} "
        f"(nip={et.nip}, nnodes={et.nnodes})"
    )


def element_dofs(et: ElementType, conn):
    """Interleaved dof indices per element (FormElIndx, m_local.F90:70-78).

    conn: (ne, nn) 0-based node ids -> (ne, nn*pdim) 0-based dof ids, ordered
    (n0_x, n0_y[, n0_z], n1_x, ...).
    """
    pdim = et.pdim
    base = conn[..., None] * pdim  # (ne, nn, 1)
    offs = jnp.arange(pdim, dtype=conn.dtype)
    return (base + offs).reshape(conn.shape[0], et.nnodes * pdim)
