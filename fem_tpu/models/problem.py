"""Problem model: struct-of-arrays mesh + loads, host side.

Replaces the reference's array-of-structs `element` type and its global mesh
state (m_elems.F90:6-12, m_global.F90:17-44) with type-batched numpy arrays:
one `Block` per element type holding a dense (ne, nn) connectivity. This is
the layout that vmapped/Pallas kernels and segment-sum assembly consume.

Everything here is host-side numpy; `fem_tpu.models.system.System` moves it to
device with the requested dtype/sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from fem_tpu.io import inp
from fem_tpu.ops import elements as element_lib


@dataclasses.dataclass
class Block:
    """All elements of one type, batched."""

    eltype: str
    conn: np.ndarray  # (ne, nn) int32, 0-based global node ids
    mat: np.ndarray  # (ne,) int32, 0-based elastic material id (-1: none)
    nlmat: np.ndarray  # (ne,) int32, 0-based cohesive material id (-1: none)
    eids: np.ndarray  # (ne,) int32, original deck element index

    @property
    def ne(self) -> int:
        return self.conn.shape[0]

    @property
    def et(self) -> element_lib.ElementType:
        return element_lib.get(self.eltype)


@dataclasses.dataclass
class Problem:
    """A parsed, validated, type-batched FEM problem."""

    stype: str
    pdim: int
    t: float
    dt: float
    coords: np.ndarray  # (nnds, pdim)
    blocks: Dict[str, Block]
    mats: np.ndarray  # (nmts, 5)
    coh_laws: np.ndarray
    coh_props: np.ndarray  # (ncohmats, 6)
    # Dirichlet BCs, deduplicated per dof with last-write-wins (the reference
    # INSERTs per bc record: m_global.F90:296,451).
    bc_dofs: np.ndarray  # (nc,) int32 constrained dof ids
    bc_vals: np.ndarray  # (nc,) prescribed total displacement
    # Point forces
    force_dofs: np.ndarray  # (nfrcs, pdim) dof ids per force record
    force_vec: np.ndarray  # (nfrcs, pdim)
    force_t1: np.ndarray
    force_t2: np.ndarray
    # Tractions, precomputed to nodal-force form (ApplyTraction converts a
    # side traction to equal nodal forces vvec*area/nps, m_global.F90:343-368;
    # geometry is static so area/side-nodes are resolved once here).
    trac_dofs: np.ndarray  # (ntrcs, nps, pdim) dof ids
    trac_nodal_vec: np.ndarray  # (ntrcs, pdim) = vec*area/nps
    trac_t1: np.ndarray  # raw deck values (FormRHS divides by dt: m_global.F90:414)
    trac_t2: np.ndarray
    nodal_bw: int = 0

    @property
    def nnds(self) -> int:
        return self.coords.shape[0]

    @property
    def ndof(self) -> int:
        return self.nnds * self.pdim

    @property
    def nels(self) -> int:
        return sum(b.ne for b in self.blocks.values())

    @property
    def has_cohesive(self) -> bool:
        return self.coh_props.shape[0] > 0 and "coh" in self.blocks

    @property
    def nsteps(self) -> int:
        """Number of load increments: k = 1.. while dt*(k-1) < t
        (main.F90:216-219), replicated with the same float arithmetic."""
        k = 1
        while self.dt * (k - 1) < self.t:
            k += 1
        return k - 1

    @classmethod
    def from_deck(cls, deck: inp.Deck, validate: bool = True) -> "Problem":
        pdim = deck.pdim
        by_type: Dict[str, List[inp.RawElement]] = {}
        ids_by_type: Dict[str, List[int]] = {}
        for i, el in enumerate(deck.elements):
            by_type.setdefault(el.eltype, []).append(el)
            ids_by_type.setdefault(el.eltype, []).append(i)

        blocks: Dict[str, Block] = {}
        for eltype, els in by_type.items():
            et = element_lib.get(eltype)
            if et.pdim != pdim and eltype != "coh":
                raise ValueError(
                    f"{eltype} elements are {et.pdim}D but deck pdim={pdim}"
                )
            blocks[eltype] = Block(
                eltype=eltype,
                conn=np.stack([e.nodes for e in els]).astype(np.int32),
                mat=np.array([e.mat for e in els], dtype=np.int32),
                nlmat=np.array([e.nlmat for e in els], dtype=np.int32),
                eids=np.array(ids_by_type[eltype], dtype=np.int32),
            )

        if validate:
            _validate_mesh(deck, blocks)

        # BC dof table: last write wins per dof (Insert_Values semantics).
        bc_map: Dict[int, float] = {}
        for i in range(deck.bc_node.shape[0]):
            node = int(deck.bc_node[i])
            for j in range(pdim):
                if deck.bc_flags[i, j] == 0:  # BC_PRESENT (m_global.F90:14)
                    bc_map[node * pdim + j] = float(deck.bc_vals[i, j])
        bc_dofs = np.array(sorted(bc_map), dtype=np.int32)
        bc_vals = np.array([bc_map[d] for d in bc_dofs.tolist()])

        # Forces -> dof ids.
        nfrcs = deck.force_node.shape[0]
        force_dofs = (
            deck.force_node[:, None].astype(np.int64) * pdim
            + np.arange(pdim)[None, :]
        ).astype(np.int32)

        # Tractions -> static nodal-force form.
        ntrcs = deck.trac_el.shape[0]
        if ntrcs:
            eid_to_el = {i: e for i, e in enumerate(deck.elements)}
            nps0 = element_lib.get(deck.elements[int(deck.trac_el[0])].eltype).nps
            trac_dofs = np.zeros((ntrcs, nps0, pdim), dtype=np.int32)
            trac_nodal = np.zeros((ntrcs, pdim))
            for i in range(ntrcs):
                el = eid_to_el[int(deck.trac_el[i])]
                et = element_lib.get(el.eltype)
                side = int(deck.trac_side[i]) - 1
                snodes = el.nodes[et.sides[side]]
                pts = deck.coords[snodes]
                area = _side_area(pts)
                trac_nodal[i] = deck.trac_vec[i] * area / et.nps
                trac_dofs[i] = (
                    snodes[:, None].astype(np.int64) * pdim
                    + np.arange(pdim)[None, :]
                )
        else:
            trac_dofs = np.zeros((0, 2, pdim), dtype=np.int32)
            trac_nodal = np.zeros((0, pdim))

        return cls(
            stype=deck.stype,
            pdim=pdim,
            t=deck.t,
            dt=deck.dt,
            coords=deck.coords,
            blocks=blocks,
            mats=deck.mats,
            coh_laws=deck.coh_laws,
            coh_props=deck.coh_props,
            bc_dofs=bc_dofs,
            bc_vals=bc_vals,
            force_dofs=force_dofs,
            force_vec=deck.force_vec,
            force_t1=deck.force_t1,
            force_t2=deck.force_t2,
            trac_dofs=trac_dofs,
            trac_nodal_vec=trac_nodal,
            trac_t1=deck.trac_t1,
            trac_t2=deck.trac_t2,
            nodal_bw=deck.nodal_bw,
        )


def _side_area(pts: np.ndarray) -> float:
    """Side measure: edge length (2D, 2 nodes), tri area (3 nodes), quad area
    (4 nodes) — EdgeAreaNodes* (m_elems.F90:282-293,366-378,469-482,583-599)."""
    n, d = pts.shape
    if n == 2:
        return float(np.linalg.norm(pts[0] - pts[1]))
    p = np.pad(pts, ((0, 0), (0, 3 - d))) if d < 3 else pts
    if n == 3:
        return float(0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0])))
    if n == 4:
        a1 = 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
        a2 = 0.5 * np.linalg.norm(np.cross(p[2] - p[0], p[3] - p[0]))
        return float(a1 + a2)
    raise ValueError(f"unsupported side node count {n}")


def _validate_mesh(deck: inp.Deck, blocks: Dict[str, Block]) -> None:
    """Fail fast on out-of-range ids; warn on inverted/degenerate continuum
    elements (which the reference lets through silently, producing
    negative-definite or NaN stiffness)."""
    import warnings

    nnds = deck.nnds
    for b in blocks.values():
        if b.conn.min() < 0 or b.conn.max() >= nnds:
            raise ValueError(
                f"{b.eltype}: node id out of range [1, {nnds}] in deck"
            )
        if b.eltype == "coh":
            continue
        et = b.et
        ecoords = deck.coords[b.conn]  # (ne, nn, pdim)
        dN = et.dN  # (nip, pdim, nn)
        jac = np.einsum("ipn,end->eipd", dN, ecoords)
        detj = np.linalg.det(jac)
        if (detj <= 0).any():
            bad = int((detj.min(axis=1) <= 0).sum())
            warnings.warn(
                f"{bad} {b.eltype} element(s) have non-positive Jacobian "
                "(inverted or degenerate); stiffness will be wrong",
                stacklevel=2,
            )


def load(path_or_text) -> Problem:
    """Parse a deck and build the Problem in one call."""
    return Problem.from_deck(inp.parse(path_or_text))
