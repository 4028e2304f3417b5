"""Pallas TPU kernels for the hot element ops — with honest measurements.

`hex8_stiffness_pallas` forms batched hex8 element stiffness matrices with
the element batch in the lane dimension — the same math as
stiffness.element_stiffness_lame_batchlast but blocked through VMEM: per
grid step one (24, BLOCK_E) coordinate tile is resident, the 8-integration-
point loop is unrolled with the dN tables baked in as constants, and the
symmetric gradient-correlation tensor H (300 unique rows) is built with
constant one-hot *selection matmuls*.

`stencil_matvec_pallas` is the fused 27-point stencil matvec (the big
solve's hot op) as ONE kernel: manual halo DMA per x-slab, pltpu.roll for
the y/z shifts, iota-based cell-existence masks, all 64 corner-pair 3x3
blocks unrolled on the VPU. It is EXACT on the real chip (0.0 rel diff vs
the CPU reference at 1.59M dofs — notably immune to the XLA-side fused
flat-elementwise miscompile #5, CLAUDE.md).

Production status (measured, one v5e chip, f32):
  - stencil matvec @1.59M dofs: Pallas 29.6 ms vs XLA planes schedule
    (structured.matvec_planes) 6.5 ms. The op is VPU-bound (576 FMAs per
    output point in the masked form); XLA's fusion reads shifted windows
    in-register while Pallas materializes 27 pltpu.roll copies per slab —
    there is no Mosaic primitive for fused unaligned window reads, and the
    MXU reformulation (gather -> 24x24 matmul -> scatter in VMEM) is
    blocked by Mosaic's 2D-matmul-only + tile-aligned memref-slice rules
    and by Mosaic rounding matmul inputs to bf16.
  - hex8 k_e formation: Pallas 1.06e7 elems/s vs XLA batch-last 4.17e7
    (the one-hot selection matmuls do ~50x redundant MXU work, and Mosaic's
    bf16 input rounding costs ~1e-3 accuracy).
  - ELL matvec (`ell_matvec_pallas`, the VMEM-resident-x gather
    experiment): does NOT lower on the real chip — Mosaic raises
    NotImplementedError("Only 2D gather is supported") at the per-lane
    `jnp.take` (run round 4 via tools/profile_amg.py, recorded in
    BENCH_extra `level1_ell_pallas` with the error). Root cause, from
    jax/_src/pallas/mosaic/lowering.py's gather rule: Mosaic's dynamic
    gather is take_along_axis with `indices.shape == operand.shape`
    (per-lane permute across sublanes or per-sublane permute across
    lanes) — it cannot express "fetch block_r arbitrary elements of a
    long VMEM vector", which is the whole kernel. Expressing it would
    need x replicated to the indices' shape (8x the VMEM footprint per
    gather, still shape-mismatched for ELL tiles) or a one-hot matmul
    (the dense operator, which production already uses below 8192 dofs).
    XLA's HBM gather (11.8 ms at n=9504, w=162) stands as the level-1
    ELL path; the hypothesis is closed until Mosaic grows an arbitrary-
    index gather primitive.
So the XLA kernels remain the production paths on this backend; the Pallas
kernels are kept as correct, tested baselines (exactness asserted in
tests/test_pallas.py, interpret mode on CPU + real-chip spot checks) and as
the starting point if Mosaic gains fused window reads / f32 matmuls /
arbitrary-index gathers.

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


def _stencil_kernel_factory(nx, ny, nz, bx, yp, zp):
    from jax.experimental.pallas import tpu as pltpu

    # y/z shifts are pltpu.roll (Mosaic rejects lane-dim DMA slices that are
    # not 128-aligned); wrap-around values are provably ZEROED by the
    # cell-existence masks below — an out-of-range read at node n in axis
    # direction d only occurs for corner pairs whose source cell n - off_a
    # lies outside [0, n_ax - 2], which the mask kills.

    def kernel(kref_ref, u_hbm, out_ref):
        i = pl.program_id(0)

        def body(slab, sem):
            dma = pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(i * bx, bx + 2)], slab, sem
            )
            dma.start()
            dma.wait()
            dtype = out_ref.dtype

            # per-axis cell-existence mask FACTORS as f32 via where (no
            # bool casts), shaped for broadcasting — the full (bx, yp, zp)
            # products are formed transiently at use, not stored (VMEM).
            # They also zero the y/z padding and roll wrap-around.
            gx = jax.lax.broadcasted_iota(jnp.int32, (bx, 1, 1), 0) + i * bx
            iy = jax.lax.broadcasted_iota(jnp.int32, (1, yp, 1), 1)
            iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, zp), 2)

            def axis_mask(g, off, nax):
                c = g - off
                return jnp.where(
                    jnp.logical_and(c >= 0, c <= nax - 2),
                    jnp.ones(g.shape, dtype=dtype),
                    jnp.zeros(g.shape, dtype=dtype),
                )

            masks = []
            for off_a in _HEX_OFFS:
                masks.append((
                    axis_mask(gx, off_a[0], nx),
                    axis_mask(iy, off_a[1], ny),
                    axis_mask(iz, off_a[2], nz),
                ))

            # all 27 rolled views per component, materialized once
            rolls = {}
            for q in range(3):
                base = slab[q]  # (bx + 2, yp, zp)
                for dy in (-1, 0, 1):
                    # pltpu.roll requires a non-negative shift; (-d) % size
                    # is equivalent and the wrapped entries are masked. The
                    # shift is passed as an i32 scalar: a python int lowers
                    # to an i64 constant under jax_enable_x64, which
                    # tpu.dynamic_rotate rejects.
                    ry = (
                        pltpu.roll(base, jnp.int32((-dy) % yp), axis=1)
                        if dy else base
                    )
                    for dz in (-1, 0, 1):
                        rz = (
                            pltpu.roll(ry, jnp.int32((-dz) % zp), axis=2)
                            if dz else ry
                        )
                        rolls[(q, dy, dz)] = rz

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
                            uq = rolls[(q, dy, dz)][1 + dx : 1 + dx + bx]
                            term = kv * uq
                            acc = term if acc is None else acc + term
                    mx, my, mz = masks[a]
                    t = acc * mx * my * mz
                    tot = t if tot is None else tot + t
                out_ref[p] = tot

        pl.run_scoped(
            body,
            slab=pltpu.VMEM((3, bx + 2, yp, zp), out_ref.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("shape", "block_x", "interpret"))
def stencil_matvec_pallas(k_ref, u, shape, block_x: int = 4,
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
    # x padded to nb*bx + 2 (one halo plane each side, tail in bounds for
    # every slab DMA); y/z padded to (sublane 8, lane 128) multiples —
    # Mosaic requires DMA slices tile-aligned in the trailing two dims.
    # The padding (and roll wrap-around) is zeroed by the in-kernel masks.
    yp = -(-ny // 8) * 8
    zp = -(-nz // 128) * 128
    U = jnp.pad(
        comps, ((0, 0), (1, 1 + nb * bx - nx), (0, yp - ny), (0, zp - nz))
    )

    out = pl.pallas_call(
        _stencil_kernel_factory(nx, ny, nz, bx, yp, zp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 576), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
            # u stays in HBM and is DMA'd slab-by-slab — under ANY the
            # compiler put the whole 12MB array in VMEM and OOM'd
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        # i * 0 keeps every index i32 (a literal 0 is i64 under x64 and
        # Mosaic fails to legalize the mixed func.return)
        out_specs=pl.BlockSpec((3, bx, yp, zp),
                               lambda i: (i * 0, i, i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((3, nb * bx, yp, zp), dtype),
        interpret=interpret,
    )(k_ref.reshape(1, 576).astype(dtype), U)
    out = out[:, :nx, :ny, :nz]
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


# ---------------------------------------------------------------------------
# ELL SpMV with the source vector VMEM-RESIDENT (VERDICT r2 weak #4 follow-up:
# the one op where a hand kernel could plausibly beat XLA is the gather-bound
# unstructured/coarse-level ELL matvec). XLA lowers x[cols] to HBM gathers at
# ~3 ns/element; here the whole x vector is pinned in VMEM for the entire
# kernel (527k f32 dofs = 2.1 MB << VMEM) while the (vals, cols) tiles stream
# from HBM at full bandwidth, so the per-element fetch becomes an on-chip
# dynamic gather. Whether Mosaic can lower the per-lane `jnp.take` is exactly
# the experiment — results recorded in the module post-mortem above.
# ---------------------------------------------------------------------------


def _ell_kernel_factory(w):
    def kernel(x_ref, vals_ref, cols_ref, out_ref):
        x = x_ref[0, :]  # (n,) VMEM-resident source vector
        acc = None
        for k in range(w):  # static unroll over the ELL width
            idx = cols_ref[:, k]
            g = jnp.take(x, idx, axis=0)  # per-lane dynamic gather
            term = vals_ref[:, k] * g
            acc = term if acc is None else acc + term
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def ell_matvec_pallas(vals, cols, x, block_r: int = 2048,
                      interpret: bool = False):
    """out[i] = sum_k vals[i, k] * x[cols[i, k]].

    Grid over row tiles; x is mapped whole into VMEM every step (the index
    map is constant, so it stays resident), vals/cols tiles double-buffer
    from HBM. Rows are padded to block_r (cols pad -> 0, vals pad -> 0, so
    padded rows compute 0).
    """
    n, w = vals.shape
    nx = x.shape[0]
    pad = (-n) % block_r
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
    npad = n + pad
    grid = (npad // block_r,)
    out = pl.pallas_call(
        _ell_kernel_factory(w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nx), lambda i: (0, 0)),
            pl.BlockSpec((block_r, w), lambda i: (i, 0)),
            pl.BlockSpec((block_r, w), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_r,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((npad,), vals.dtype),
        interpret=interpret,
    )(x.reshape(1, nx), vals, cols)
    return out[:n]
