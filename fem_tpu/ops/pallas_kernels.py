"""Pallas TPU kernels for the hot element ops.

`hex8_stiffness_pallas` forms batched hex8 element stiffness matrices with
the element batch in the lane dimension — the same math as
stiffness.element_stiffness_lame_batchlast but blocked through VMEM: per
grid step one (24, BLOCK_E) coordinate tile is resident, the 8-integration-
point loop is unrolled with the dN tables baked in as constants, and the
symmetric gradient-correlation tensor H (300 unique rows) is built with
constant one-hot *selection matmuls* — the MXU performs what would otherwise
be an irregular row-gather, and XLA's padded-intermediate lowering is
avoided entirely.

Status: numerically exact in interpret mode (tests); on the real-TPU Mosaic
backend the kernel compiles and runs, but Mosaic rounds matmul INPUTS to
bf16 regardless of precision/preferred_element_type, so the one-hot
selection matmuls cost ~1e-3 relative error, and the chipless AOT compile
helper in this image takes ~5 minutes on the unrolled body. The XLA
batch-last kernel (stiffness.element_stiffness_lame_batchlast) is therefore
the production path; this kernel is the Pallas implementation baseline for
a future exact-gather variant.

Use `interpret=True` for CPU-exact testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu imports fine on CPU; only needed for real-TPU memory spaces
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

from fem_tpu.ops import elements as element_lib

_HIGH = jax.lax.Precision.HIGHEST
_ET = element_lib.get("hex")
# dN as nested PYTHON floats: numpy f64 scalars would promote the f32
# lane vectors to f64 under jax_enable_x64 (weakly-typed python floats
# don't).
_DN = [[[float(v) for v in row] for row in ip] for ip in np.asarray(_ET.dN)]
_W = [float(w) for w in np.asarray(_ET.weights)]

# Unique upper-triangle (r<=c) dof pairs of the symmetric 24x24 element
# matrix; H row i holds sum_ip s * dNx[dof r_i] * dNx[dof c_i], where dof
# r = a*3+p denotes dNx[p, a].
_PAIRS = [(r, c) for r in range(24) for c in range(r, 24)]
_PAIR_INDEX = {rc: i for i, rc in enumerate(_PAIRS)}
_NPAIR = len(_PAIRS)  # 300

# Selection matrices: pick dof rows r_i / c_i out of the 24 dNx rows.
_SEL_R = np.zeros((_NPAIR, 24), dtype=np.float32)
_SEL_C = np.zeros((_NPAIR, 24), dtype=np.float32)
for i, (r, c) in enumerate(_PAIRS):
    _SEL_R[i, r] = 1.0
    _SEL_C[i, c] = 1.0


def _h_index(r, c):
    return _PAIR_INDEX[(r, c) if r <= c else (c, r)]


# Output assembly: ke[r, c] = lam * H(r', c') + mu * H(r'', c'') + mu *
# [p==q] * (H trace terms); expressed as three one-hot (576, 300) matmuls.
_A_LAM = np.zeros((576, _NPAIR), dtype=np.float32)
_A_MU = np.zeros((576, _NPAIR), dtype=np.float32)
_A_TR = np.zeros((576, _NPAIR), dtype=np.float32)
for r in range(24):
    a, p = divmod(r, 3)
    for c in range(24):
        b, q = divmod(c, 3)
        o = r * 24 + c
        _A_LAM[o, _h_index(a * 3 + p, b * 3 + q)] += 1.0
        _A_MU[o, _h_index(a * 3 + q, b * 3 + p)] += 1.0
        if p == q:
            for k in range(3):
                _A_TR[o, _h_index(a * 3 + k, b * 3 + k)] += 1.0


def _kernel(ec_ref, lam_ref, mu_ref, selr_ref, selc_ref,
            alam_ref, amu_ref, atr_ref, out_ref):
    # Mosaic supports only 2D matmuls and elementwise vector ops inside
    # kernels — the tiny per-element contractions (J = dN X over a=8,
    # dNx = J^-1 dN over q=3) are fully unrolled with the dN table baked in
    # as Python floats; the large reshuffles are plain (M, BE) matmuls.
    dtype = ec_ref.dtype
    be = ec_ref.shape[1]

    def X(d, a):
        return ec_ref[d * 8 + a, :]

    h = jnp.zeros((_NPAIR, be), dtype=dtype)
    for ip in range(8):
        dN = _DN[ip]  # (3 p, 8 a) python floats
        J = [[None] * 3 for _ in range(3)]
        for p in range(3):
            for d in range(3):
                acc = dN[p][0] * X(d, 0)
                for a in range(1, 8):
                    acc = acc + dN[p][a] * X(d, a)
                J[p][d] = acc
        c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
        c01 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
        c02 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
        c10 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
        c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
        c12 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
        c20 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
        c21 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
        c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        det = J[0][0] * c00 + J[0][1] * c10 + J[0][2] * c20
        invd = 1.0 / det
        inv = [
            [c00 * invd, c01 * invd, c02 * invd],
            [c10 * invd, c11 * invd, c12 * invd],
            [c20 * invd, c21 * invd, c22 * invd],
        ]
        # dof row r = a*3+p holds dNx[p, a]
        rows = []
        for a in range(8):
            for p in range(3):
                rows.append(
                    inv[p][0] * dN[0][a]
                    + inv[p][1] * dN[1][a]
                    + inv[p][2] * dN[2][a]
                )
        dof_rows = jnp.stack(rows)  # (24, be)
        s = det * _W[ip]
        dr = jnp.dot(selr_ref[:], dof_rows, precision=_HIGH,
                     preferred_element_type=dtype)
        dc = jnp.dot(selc_ref[:], dof_rows, precision=_HIGH,
                     preferred_element_type=dtype)
        h = h + s[None, :] * dr * dc
    lam = lam_ref[0, :]
    mu = mu_ref[0, :]
    out = (
        lam[None, :]
        * jnp.dot(alam_ref[:], h, precision=_HIGH,
                  preferred_element_type=dtype)
        + mu[None, :]
        * (
            jnp.dot(amu_ref[:], h, precision=_HIGH,
                    preferred_element_type=dtype)
            + jnp.dot(atr_ref[:], h, precision=_HIGH,
                      preferred_element_type=dtype)
        )
    )
    out_ref[:] = out


# ---------------------------------------------------------------------------
# Fused stencil matvec (the production hot op of the big solve)
# ---------------------------------------------------------------------------
#
# structured.matvec materializes a (ne, 24) gather (24x the DOF vector) and
# runs 8 scatter-adds; structured.matvec_planes is the fused XLA schedule.
# This kernel is the Pallas version of the planes schedule: one pass over a
# zero-padded component-planes array resident in VMEM x-slabs (manual DMA
# with a one-plane halo each side — BlockSpec blocks cannot overlap), the
# full 64-corner-pair x 3x3-block stencil unrolled as VPU FMAs, and the
# cell-existence masks built from iota comparisons in-register. HBM traffic
# is exactly u + out (the XLA schedule reads the padded array once per
# shift). Scalar isotropic material only (k_ref constant across cells).

_HEX_OFFS = [
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
]


def _stencil_kernel_factory(nx, ny, nz, bx):
    from jax.experimental.pallas import tpu as pltpu

    def kernel(kref_ref, u_hbm, out_ref):
        i = pl.program_id(0)

        def body(slab, sem):
            dma = pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(i * bx, bx + 2)], slab, sem
            )
            dma.start()
            dma.wait()
            dtype = out_ref.dtype

            # per-axis cell-existence masks as f32 via where (no bool casts)
            ix = jax.lax.broadcasted_iota(jnp.int32, (bx, ny, nz), 0)
            gx = ix + i * bx
            iy = jax.lax.broadcasted_iota(jnp.int32, (bx, ny, nz), 1)
            iz = jax.lax.broadcasted_iota(jnp.int32, (bx, ny, nz), 2)
            one = jnp.ones((bx, ny, nz), dtype=dtype)
            zero = jnp.zeros((bx, ny, nz), dtype=dtype)

            def axis_mask(g, off, nax):
                c = g - off
                return jnp.where(
                    jnp.logical_and(c >= 0, c <= nax - 2), one, zero
                )

            masks = []
            for off_a in _HEX_OFFS:
                m = (
                    axis_mask(gx, off_a[0], nx)
                    * axis_mask(iy, off_a[1], ny)
                    * axis_mask(iz, off_a[2], nz)
                )
                masks.append(m)

            for p in range(3):
                tot = None
                for a, off_a in enumerate(_HEX_OFFS):
                    acc = None
                    for b, off_b in enumerate(_HEX_OFFS):
                        dx = off_b[0] - off_a[0]
                        dy = off_b[1] - off_a[1]
                        dz = off_b[2] - off_a[2]
                        for q in range(3):
                            kv = kref_ref[0, (a * 3 + p) * 24 + b * 3 + q]
                            uq = slab[
                                q,
                                1 + dx : 1 + dx + bx,
                                1 + dy : 1 + dy + ny,
                                1 + dz : 1 + dz + nz,
                            ]
                            term = kv * uq
                            acc = term if acc is None else acc + term
                    t = masks[a] * acc
                    tot = t if tot is None else tot + t
                out_ref[p] = tot

        pl.run_scoped(
            body,
            slab=pltpu.VMEM((3, bx + 2, ny + 2, nz + 2), out_ref.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("shape", "block_x", "interpret"))
def stencil_matvec_pallas(k_ref, u, shape, block_x: int = 8,
                          interpret: bool = False):
    """K @ u for the scalar-material box-grid operator as ONE Pallas kernel.

    Args:
      k_ref: (24, 24) combined reference element stiffness
        (lam * k_lam + mu * k_mu of structured.StencilOperator).
      u: (ndof,) = (nx*ny*nz*3,) DOF vector, node-grid interleaved like
        structured.matvec.
      shape: static (nx, ny, nz) node counts.
    Returns (ndof,), identical to structured.matvec up to f32 round-off.
    """
    nx, ny, nz = shape
    bx = block_x
    nb = -(-nx // bx)
    dtype = u.dtype
    grid = u.reshape(nx, ny, nz, 3)
    comps = jnp.moveaxis(grid, -1, 0)  # (3, nx, ny, nz)
    # pad: one halo plane in y/z; x padded to nb*bx + 2 so every slab DMA
    # (bx + 2 planes at offset i*bx) stays in bounds
    U = jnp.pad(comps, ((0, 0), (1, 1 + nb * bx - nx), (1, 1), (1, 1)))

    out = pl.pallas_call(
        _stencil_kernel_factory(nx, ny, nz, bx),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 576), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((3, bx, ny, nz), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, nb * bx, ny, nz), dtype),
        interpret=interpret,
    )(k_ref.reshape(1, 576).astype(dtype), U)
    out = out[:, :nx]
    return jnp.moveaxis(out, 0, -1).reshape(-1)


@functools.partial(jax.jit, static_argnames=("block_e", "interpret"))
def hex8_stiffness_pallas(ecoords_l, lam, mu, block_e: int = 256,
                          interpret: bool = False):
    """Batched hex8 k_e via Pallas.

    Args:
      ecoords_l: (3, 8, ne) element coordinates, batch-last.
      lam, mu: (ne,) Lame parameters.
    Returns (24, 24, ne) with rows/cols in (a*pdim+p) dof order — identical
    to element_stiffness_lame_batchlast's output reshaped.
    """
    ne = ecoords_l.shape[-1]
    if ne % block_e:
        pad = block_e - ne % block_e
        ecoords_l = jnp.pad(ecoords_l, ((0, 0), (0, 0), (0, pad)))
        lam = jnp.pad(lam, (0, pad))
        mu = jnp.pad(mu, (0, pad))
    ne_pad = ecoords_l.shape[-1]
    ec = ecoords_l.reshape(24, ne_pad)
    dtype = ec.dtype

    mem = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}

    # index maps must return uniformly-typed indices: a literal 0 is i64
    # under jax_enable_x64 while the grid index is i32, and Mosaic fails to
    # legalize the mixed (i64, i32) func.return.
    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (i * 0, i * 0), **mem)

    out = pl.pallas_call(
        _kernel,
        grid=(ne_pad // block_e,),
        in_specs=[
            pl.BlockSpec((24, block_e), lambda i: (i * 0, i), **mem),
            pl.BlockSpec((1, block_e), lambda i: (i * 0, i), **mem),
            pl.BlockSpec((1, block_e), lambda i: (i * 0, i), **mem),
            const_spec((_NPAIR, 24)),
            const_spec((_NPAIR, 24)),
            const_spec((576, _NPAIR)),
            const_spec((576, _NPAIR)),
            const_spec((576, _NPAIR)),
        ],
        out_specs=pl.BlockSpec((576, block_e), lambda i: (i * 0, i), **mem),
        out_shape=jax.ShapeDtypeStruct((576, ne_pad), dtype),
        interpret=interpret,
    )(
        ec, lam.reshape(1, ne_pad), mu.reshape(1, ne_pad),
        jnp.asarray(_SEL_R, dtype), jnp.asarray(_SEL_C, dtype),
        jnp.asarray(_A_LAM, dtype), jnp.asarray(_A_MU, dtype),
        jnp.asarray(_A_TR, dtype),
    )
    return out.reshape(24, 24, ne_pad)[:, :, :ne]
