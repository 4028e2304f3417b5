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


def lame(E, nu):
    """Lame parameters from (E, nu)."""
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = E / (2.0 * (1.0 + nu))
    return lam, mu


def element_stiffness_isotropic(et: ElementType, ecoords, E, nu):
    """Fast-path element stiffness for isotropic elasticity (E, nu form).

    Algebraically identical to element_stiffness with D = dmat(E, nu) (3D or
    plane strain); see element_stiffness_lame. Returns (ne, ndof, ndof).
    """
    lam, mu = lame(E, nu)
    return element_stiffness_lame(et, ecoords, lam, mu)


def element_stiffness_lame(et: ElementType, ecoords, lam, mu):
    """Element stiffness from per-element Lame parameters.

    Factorized through the gradient-correlation tensor
      H[p,a,q,b] = sum_ip w detJ dNx[ip,p,a] dNx[ip,q,b]
      ke[(a,p),(b,q)] = lam H[p,a,q,b] + mu H[q,a,p,b]
                        + mu delta_pq sum_k H[k,a,k,b]
    which avoids forming B and D entirely: ~17x fewer flops for hex8 (the
    B^T D B route contracts through the sparse (cpdim x ndof) B matrix whose
    zeros the dense einsum still multiplies). ke is LINEAR in (lam, mu) —
    the basis for the structured-grid operator's two-matmul decomposition.
    Returns (ne, ndof, ndof).
    """
    dNx, detj = grad_and_detj(et, ecoords)  # (ne, nip, pdim, nn)
    w = jnp.asarray(et.weights, dtype=ecoords.dtype)
    s = detj * w[None, :]
    H = jnp.einsum("ei,eipa,eiqb->epaqb", s, dNx, dNx)
    lam = lam[:, None, None, None, None]
    mu_b = mu[:, None, None, None, None]
    term = lam * H + mu_b * jnp.swapaxes(H, 1, 3)  # H[q,a,p,b]
    ke = jnp.transpose(term, (0, 2, 1, 4, 3))  # (ne, a, p, b, q)
    trace = jnp.einsum("ekakb->eab", H)
    eye = jnp.eye(et.pdim, dtype=ecoords.dtype)
    ke = ke + mu[:, None, None, None, None] * (
        trace[:, :, None, :, None] * eye[None, None, :, None, :]
    )
    ne = ecoords.shape[0]
    return ke.reshape(ne, et.ndof, et.ndof)


def _det_inv_batchlast(J):
    """Closed-form det/inverse for J shaped (nip, d, d, ne) — element batch
    in the lane dimension."""
    d = J.shape[1]
    if d == 2:
        det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        inv = jnp.stack(
            [
                jnp.stack([J[:, 1, 1], -J[:, 0, 1]], axis=1),
                jnp.stack([-J[:, 1, 0], J[:, 0, 0]], axis=1),
            ],
            axis=1,
        ) / det[:, None, None]
        return det, inv
    c00 = J[:, 1, 1] * J[:, 2, 2] - J[:, 1, 2] * J[:, 2, 1]
    c01 = J[:, 0, 2] * J[:, 2, 1] - J[:, 0, 1] * J[:, 2, 2]
    c02 = J[:, 0, 1] * J[:, 1, 2] - J[:, 0, 2] * J[:, 1, 1]
    c10 = J[:, 1, 2] * J[:, 2, 0] - J[:, 1, 0] * J[:, 2, 2]
    c11 = J[:, 0, 0] * J[:, 2, 2] - J[:, 0, 2] * J[:, 2, 0]
    c12 = J[:, 0, 2] * J[:, 1, 0] - J[:, 0, 0] * J[:, 1, 2]
    c20 = J[:, 1, 0] * J[:, 2, 1] - J[:, 1, 1] * J[:, 2, 0]
    c21 = J[:, 0, 1] * J[:, 2, 0] - J[:, 0, 0] * J[:, 2, 1]
    c22 = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    det = J[:, 0, 0] * c00 + J[:, 0, 1] * c10 + J[:, 0, 2] * c20
    inv = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=1),
            jnp.stack([c10, c11, c12], axis=1),
            jnp.stack([c20, c21, c22], axis=1),
        ],
        axis=1,
    ) / det[:, None, None]
    return det, inv


def element_stiffness_lame_batchlast(et: ElementType, ecoords_l, lam, mu):
    """element_stiffness_lame with the element batch in the LANE dimension.

    TPU tiles the trailing two array dims to (8,128); the batch-first kernel
    puts tiny (3, 8) dims there and wastes ~40x of every vreg. This variant
    takes ecoords_l: (pdim, nn, ne) and returns (nn, pdim, nn, pdim, ne) —
    measured ~6x faster on v5e at 131k hex8 elements. The H contraction is a
    broadcast-multiply-sum over nip so XLA emits full-lane VPU code instead
    of degenerate dot_generals.
    """
    dN = jnp.asarray(et.dN, dtype=ecoords_l.dtype)  # (nip, pdim, nn)
    w = jnp.asarray(et.weights, dtype=ecoords_l.dtype)
    J = jnp.einsum("ipa,dae->ipde", dN, ecoords_l)  # (nip, pdim, pdim, ne)
    det, inv = _det_inv_batchlast(J)
    dNx = jnp.einsum("ipqe,iqa->ipae", inv, dN)  # (nip, pdim, nn, ne)
    s = det * w[:, None]
    # H[p,a,q,b,e] = sum_ip s dNx[ip,p,a] dNx[ip,q,b]
    H = jnp.sum(
        dNx[:, :, :, None, None, :] * dNx[:, None, None, :, :, :]
        * s[:, None, None, None, None, :],
        axis=0,
    )
    term = lam * H + mu * jnp.transpose(H, (2, 1, 0, 3, 4))  # H[q,a,p,b]
    ke = jnp.transpose(term, (1, 0, 3, 2, 4))  # (a,p,b,q,e)
    tr = jnp.einsum("kakbe->abe", H)
    eye = jnp.eye(et.pdim, dtype=ecoords_l.dtype)
    ke = ke + mu * tr[:, None, :, None, :] * eye[None, :, None, :, None]
    return ke


def element_stiffness_lame_batchlast_v2(et: ElementType, ecoords_l, lam, mu):
    """element_stiffness_lame_batchlast with the remaining tiny-dim
    contractions restructured for the TPU (same math, same (nn, pdim, nn,
    pdim, ne) result):

    - The Jacobian einsum becomes pdim REAL matmuls (nip*pdim, nn) @
      (nn, ne) — the huge element batch rides the MXU's N dimension
      instead of a tiny-dim dot_general (which tile-pads, see
      operator.block_force).
    - The 9-divide batched 3x3 inverse collapses to ONE reciprocal per
      integration point: with G = adj(J)^T dN (adjugate, unrolled over the
      3-term q contraction), the H integrand s*dNx*dNx = (w/detJ)*G*G —
      both detJ factors from dNx = adj^T dN / detJ cancel against
      s = w*detJ except a single w/detJ weight.

    MEASURED (r3, one v5e chip, 131072 hex8 f32): v1 3.6-3.7 ms, v2
    4.1-4.4 ms, and a v1-einsum-J + v2-adjugate hybrid 4.5 ms
    (tools/stiff_ab.py, tools/stiff_v3.py). The "obvious" MXU/division
    fixes LOSE on this backend — the v1 schedule's tiny einsums and
    stacked closed-form inverse fuse better than restructured forms, so
    v1 stays the production kernel and this variant documents the
    measured dead end.

    Mirrors FormElKE (m_local.F90:21-67) exactly like the v1 kernel.
    """
    dN = jnp.asarray(et.dN, dtype=ecoords_l.dtype)  # (nip, pdim, nn)
    w = jnp.asarray(et.weights, dtype=ecoords_l.dtype)
    pdim, nn, ne = ecoords_l.shape
    nip = dN.shape[0]
    dN2 = dN.reshape(nip * pdim, nn)
    # j[p][d]: (nip, ne) Jacobian entries, J[p,d] = sum_a dN[i,p,a] X[a,d]
    jc = [(dN2 @ ecoords_l[d]).reshape(nip, pdim, ne) for d in range(pdim)]
    j = [[jc[d][:, p, :] for d in range(pdim)] for p in range(pdim)]
    if pdim == 2:
        det = j[0][0] * j[1][1] - j[0][1] * j[1][0]
        adj = [[j[1][1], -j[0][1]], [-j[1][0], j[0][0]]]
    elif pdim == 3:
        a00 = j[1][1] * j[2][2] - j[1][2] * j[2][1]
        a10 = j[1][2] * j[2][0] - j[1][0] * j[2][2]
        a20 = j[1][0] * j[2][1] - j[1][1] * j[2][0]
        det = j[0][0] * a00 + j[0][1] * a10 + j[0][2] * a20
        adj = [
            [a00, j[0][2] * j[2][1] - j[0][1] * j[2][2],
             j[0][1] * j[1][2] - j[0][2] * j[1][1]],
            [a10, j[0][0] * j[2][2] - j[0][2] * j[2][0],
             j[0][2] * j[1][0] - j[0][0] * j[1][2]],
            [a20, j[0][1] * j[2][0] - j[0][0] * j[2][1],
             j[0][0] * j[1][1] - j[0][1] * j[1][0]],
        ]
    else:
        raise ValueError(f"pdim must be 2 or 3, got {pdim}")
    # G[i,p,a,e] = sum_q adj[p][q][i,e] * dN[i,q,a] = detJ * dNx[i,p,a,e]
    G = jnp.stack(
        [sum(adj[p][q][:, None, :] * dN[:, q, :, None] for q in range(pdim))
         for p in range(pdim)],
        axis=1,
    )  # (nip, pdim, nn, ne)
    r = w[:, None] / det  # the ONLY division: s/detJ^2 = w/detJ
    Gr = G * r[:, None, None, :]
    # H[p,a,q,b,e] = sum_i (w/detJ) G[i,p,a] G[i,q,b]
    H = jnp.sum(
        Gr[:, :, :, None, None, :] * G[:, None, None, :, :, :], axis=0
    )
    term = lam * H + mu * jnp.transpose(H, (2, 1, 0, 3, 4))  # H[q,a,p,b]
    ke = jnp.transpose(term, (1, 0, 3, 2, 4))  # (a,p,b,q,e)
    tr = jnp.einsum("kakbe->abe", H)
    eye = jnp.eye(pdim, dtype=ecoords_l.dtype)
    ke = ke + mu * tr[:, None, :, None, :] * eye[None, :, None, :, None]
    return ke


def internal_force_isotropic(et, dNx, scale, lam, mu, ue):
    """Fused matrix-free internal force: f_e = sum_ip B^T sigma(B u_e) w detJ
    without forming B, D, or k_e — the hot CG matvec kernel.

    Args:
      et: unused (kept for call-site symmetry; shapes come from dNx)
      dNx:   (ne, nip, pdim, nn) precomputed spatial gradients
      scale: (ne, nip) w * detJ
      lam, mu: (ne,) Lame parameters
      ue:    (ne, nn*pdim) element displacements (interleaved dofs)
    Returns (ne, nn*pdim).
    """
    del et
    ne, _, pdim, nn = dNx.shape
    u_nodes = ue.reshape(ne, nn, pdim)
    # displacement gradient g[p,q] = d u_q / d x_p at each ip
    g = jnp.einsum("eipa,eaq->eipq", dNx, u_nodes)
    trace = jnp.trace(g, axis1=-2, axis2=-1)
    sym = g + jnp.swapaxes(g, -1, -2)
    eye = jnp.eye(pdim, dtype=ue.dtype)
    sigma = (
        lam[:, None, None, None] * trace[..., None, None] * eye
        + mu[:, None, None, None] * sym
    )
    f = jnp.einsum("ei,eipa,eipq->eaq", scale, dNx, sigma)
    return f.reshape(ne, nn * pdim)


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
