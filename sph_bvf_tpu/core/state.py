"""Particle state, coefficient tables, and the cell-slot layout.

The reference stores particles in flat grow-able SoA arrays plus binned
linked-list neighbor structures (src/atom.cpp, src/nbin_standard.cpp).  On
TPU everything must be static-shape and gather/scatter-light, so the state
here lives directly in a dense *cell-slot* layout, **component-leading and
cell-minor** so the big axes land on the hardware's (sublane, lane) tiles:

    scalar field  [cap, NC]          NC = ncx * ncy * ncz flat cells
    vector field  [3, cap, NC]
    tensor field  [3, 3, cap, NC]
    species field [Ns, cap, NC]

Each cell owns up to ``cap`` particle slots (padded, with a validity mask).
TPU f32 tiles are (8 sublanes, 128 lanes) over the trailing two dims; with
``cap`` on sublanes and ``NC`` on lanes the padding overhead is a few
percent.  (The obvious alternative — particles-major ``[NC, cap, 3]`` — pads
3 -> 128 lanes and costs 40x memory and bandwidth on every op.)

Neighbor candidates for a cell are the particles in its 3^dim stencil cells,
reachable by *static lane shifts* of the flat cell axis — no index gathers
in the hot loop, and the shifts lower to ICI collective-permutes when the
cell axis is sharded across a device mesh.

Rebinning (the analog of LAMMPS ``exchange + borders + neighbor->build``,
comm_brick.cpp:585,709, neighbor.cpp:2008) is a sort-by-cell permutation
executed every ``rebin_every`` steps.  Because pair kernels re-test the true
cutoff against *fresh* positions every step, the binning only needs to
satisfy ``cell_size >= cutoff + 2 * max_drift_between_rebins`` — stricter
than the reference's skin heuristic (neighbor.cpp:88-90), never missing
pairs.

Per-particle state mirrors atom_vec_ssa_tsdpd_atomic.h:60-85 / atom.h:84-109:
positions, transport and momentum velocities, density, energy, continuum
species C and integer species Cd, deviatoric stress, BVF fields, and all the
force-evaluation accumulators that the reference persists across the step
boundary (force_clear, atom_vec_ssa_tsdpd_atomic.cpp:391-424).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Group bit 0 is the "all" group, like LAMMPS group.cpp.
GROUP_ALL = 1


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Static simulation-box and cell-grid geometry (hashable; closed over jit)."""

    dim: int
    lo: Tuple[float, float, float]
    hi: Tuple[float, float, float]
    ncells: Tuple[int, int, int]  # cells per axis; 1 on unused axes
    cell_size: Tuple[float, float, float]
    cap: int
    periodic: Tuple[bool, bool, bool] = (False, False, False)
    # Half the slack between cell size and the kernel cutoff: a particle may
    # drift this far from its assigned cell between rebins before stencil
    # pair coverage can be violated (see rebin's drift check).  0 disables.
    drift_budget: float = 0.0
    # Initial per-cell particle count under lattice-aligned sizing (k^dim);
    # the pair kernel splits its i-slot loop here and skips rows >= base_occ
    # for blocks whose max occupancy never exceeds it.  0 disables.
    base_occ: int = 0
    # Non-uniform x-column widths — the load-balancing lever (the analog of
    # balance.cpp:1354's proportional cut planes; see parallel/balance.py).
    # ``x_edges`` holds the ncells[0]+1 cell edges along x, each an integer
    # multiple of ``x_quantum`` above lo[0]; None means uniform columns of
    # cell_size[0].  Equal cell COUNTS per shard, unequal widths: XLA keeps
    # its equal per-device extents while dense regions get narrow columns.
    # With edges present the Pallas REBIN kernel is ineligible (it floor-bins
    # in-kernel; rebin takes the jnp sort path) but the pair kernels are
    # unaffected — they never bin positions, and stencil adjacency is by
    # column index.  Every width must exceed the cutoff (the stencil-
    # coverage requirement); cell_size[0] then records the MINIMUM width.
    x_edges: Tuple[float, ...] | None = None
    x_quantum: float = 0.0
    # The kernel cutoff the grid was sized for — recorded so in-run
    # rebalancing (parallel/balance.rebalance) can re-cut x_edges while
    # preserving the stencil-coverage requirement (every width > cutoff)
    # without access to the original Scene.  0 = unknown (pre-round-5
    # checkpoints); rebalancing then refuses to run.
    cutoff: float = 0.0

    @property
    def ncells_total(self) -> int:
        return self.ncells[0] * self.ncells[1] * self.ncells[2]

    @property
    def nslots(self) -> int:
        return self.ncells_total * self.cap

    # Flat cell index is x-major, z-minor: c = (cx * ncy + cy) * ncz + cz.
    @property
    def strides(self) -> Tuple[int, int, int]:
        nx, ny, nz = self.ncells
        return (ny * nz, nz, 1)

    def stencil_offsets(self):
        """All 3^dim cell offsets (including self)."""
        rng = lambda ax: ((-1, 0, 1) if self.ncells[ax] > 1 else (0,))
        return [
            (dx, dy, dz)
            for dx in rng(0)
            for dy in rng(1)
            for dz in rng(2)
        ]

    @staticmethod
    def build(dim, lo, hi, cutoff, cap, periodic=(False, False, False), margin=0.0,
              multiple_of=(1, 1, 1), quantum=0.0):
        """Choose the cell grid for a box: cell_size >= cutoff + margin per axis.

        ``multiple_of`` rounds the cell count down to a multiple per axis
        (cells only get larger — always safe) so the grid divides evenly
        across a device mesh.

        ``quantum`` (lattice-aligned sizing): when > 0, non-periodic axes get
        cells of an exact integer multiple of the particle-lattice spacing,
        and the grid is PADDED past ``hi`` to a whole number of cells (the
        extra cells just stay empty; nothing reads ``hi`` on non-periodic
        axes).  With the grid anchored at a lattice-aligned ``lo``, every
        cell then initially holds exactly ``k^dim`` particles, so the slot
        capacity — and with it the pair kernel's padded-candidate work —
        drops by ~2x vs. the unaligned ``ext/n`` sizing.  The cell multiple
        is the nearest one to ``cutoff + margin`` that still covers
        ``cutoff``; the runtime drift check (rebin) still enforces the
        drift-safety contract if the margin this leaves is too thin.
        """
        lo = tuple(float(v) for v in lo)
        hi = tuple(float(v) for v in hi)
        nc, cs, ks = [], [], []
        for ax in range(3):
            if ax >= dim:
                nc.append(1)
                cs.append(max(hi[ax] - lo[ax], 1.0))
                continue
            ext = hi[ax] - lo[ax]
            m = multiple_of[ax]
            if quantum > 0.0 and not periodic[ax]:
                k = max(int(round((cutoff + margin) / quantum)), 1)
                # cell must exceed cutoff STRICTLY: k*quantum == cutoff
                # makes drift_budget 0.0, which rebin reads as "drift check
                # disabled" — coverage would silently break on any drift
                # instead of tripping the runtime guard.  Require a
                # meaningfully positive margin (1e-6 of a lattice spacing
                # also absorbs f32 rounding of cutoff/quantum).
                while k * quantum - cutoff < 1e-6 * quantum:
                    k += 1
                cell = k * quantum
                n = max(int(np.ceil(ext / cell - 1e-9)), 1)
                if m > 1:
                    n = -(-n // m) * m  # round UP: extra cells are empty
                nc.append(n)
                cs.append(cell)
                ks.append(k)
                continue
            n = max(int(ext / (cutoff + margin)), 1)
            if m > 1:
                n = max((n // m) * m, m)
            nc.append(n)
            cs.append(ext / n)
        for ax in range(dim):
            if periodic[ax] and nc[ax] < 3:
                raise ValueError(
                    f"periodic axis {ax} has only {nc[ax]} cells: with fewer "
                    f"than 3, the +1/-1 stencil offsets alias the same "
                    f"neighbor (double-counting pairs) or miss images "
                    f"entirely — enlarge the box or shrink the cutoff"
                )
        budget = min(
            (cs[ax] - cutoff) / 2.0 for ax in range(dim)
        ) if cutoff > 0 else 0.0
        # base occupancy is only known when EVERY in-dim axis is
        # lattice-aligned (k particles per cell per axis)
        base_occ = int(np.prod(ks)) if len(ks) == dim else 0
        return Geometry(
            dim=dim,
            lo=lo,
            hi=hi,
            ncells=tuple(nc),
            cell_size=tuple(cs),
            cap=cap,
            periodic=tuple(periodic),
            drift_budget=max(budget, 0.0),
            base_occ=base_occ,
            cutoff=float(cutoff),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Params:
    """Per-type / per-type-pair coefficient tables.

    Mirrors the ``pair_coeff i j rho0 c0 eta h cutc G0 kappa... kappaSSA...``
    surface (pair_ssa_tsdpd_bvf_transport_velocity.cpp:967-1026), 0-indexed.
    """

    mass: jax.Array  # [T]
    rho0: jax.Array  # [T]
    c0: jax.Array  # [T]
    B: jax.Array  # [T]   Tait B = c0^2 rho0 / 7
    G0: jax.Array  # [T]   shear modulus
    cut: jax.Array  # [T, T]  kernel support h
    cutc: jax.Array  # [T, T]  species-transport cutoff
    visc: jax.Array  # [T, T]  eta
    kappa: jax.Array  # [T, T, Ns]
    kappa_ssa: jax.Array  # [T, T, Nssa]
    boltz: float = dataclasses.field(default=1.3806504e-23, metadata=dict(static=True))
    ftm2v: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    # KE unit conversion used by temp/press diagnostics.  LAMMPS keeps it
    # distinct from ftm2v (update.cpp:192: si/lj/micro have both = 1, but
    # e.g. "real" units differ) — compute_temp.cpp / compute_pressure.cpp
    # scale sum(m v^2) by mvv2e, never ftm2v.
    mvv2e: float = dataclasses.field(default=1.0, metadata=dict(static=True))

    @property
    def ntypes(self) -> int:
        return self.mass.shape[0]

    @property
    def n_sdpd(self) -> int:
        return self.kappa.shape[-1]

    @property
    def n_ssa(self) -> int:
        return self.kappa_ssa.shape[-1]

    @property
    def max_cut(self) -> float:
        return float(jnp.max(self.cut))


def _f(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class State:
    """All per-particle state, component-leading cell-slot layout.

    Trailing two axes are always [cap, NC]; vector/tensor/species components
    lead (see module docstring for why).

    Parity note: the reference's atom style additionally allocates
    ``Pold, Aaux, Baux, APaux, fP[3], rhoAux3, cv`` and the dense SSA
    matrices ``dfsp_D_matrix/dfsp_D_diag/dfsp_a_i``
    (atom_vec_ssa_tsdpd_atomic.h:60-85).  Those are allocated and
    MPI-packed there but never read by any shipped pair style, fix, or
    compute (grep of USER-SSA-TSDPD physics files), so they are omitted
    here on purpose; the SSA diffusion matrix is re-derived on the fly by
    the counter-based hop sampler (core/ssa.py) instead of being stored
    O(N^2).
    """

    # -- identity / tags ---------------------------------------------------
    tag: jax.Array  # i32 [cap, NC] global particle id (>=1); 0 for empty slots
    ptype: jax.Array  # i32 [cap, NC] 0-based particle type
    valid: jax.Array  # bool [cap, NC]
    groupmask: jax.Array  # i32 [cap, NC] group bitmask (bit 0 == "all")
    solid_tag: jax.Array  # i32 [cap, NC]
    fixed_tag: jax.Array  # i32 [cap, NC]
    # -- integrated fields --------------------------------------------------
    x: jax.Array  # f32 [3, cap, NC]
    v: jax.Array  # f32 [3, cap, NC] transport velocity (reference atom->v)
    vest: jax.Array  # f32 [3, cap, NC] momentum velocity (reference atom->vest)
    rho: jax.Array  # f32 [cap, NC]
    rhoI: jax.Array  # f32 [cap, NC] half-step density
    e: jax.Array  # f32 [cap, NC] per-particle energy
    C: jax.Array  # f32 [Ns, cap, NC] continuum species
    Cd: jax.Array  # i32 [Nssa, cap, NC] integer (SSA) species counts
    S: jax.Array  # f32 [3, 3, cap, NC] deviatoric stress tensor
    # -- force-eval outputs (persist across the step boundary) --------------
    f: jax.Array  # f32 [3, cap, NC]
    drho: jax.Array  # f32 [cap, NC]
    de: jax.Array  # f32 [cap, NC]
    Q: jax.Array  # f32 [Ns, cap, NC] species flux
    Qd: jax.Array  # i32 [Nssa, cap, NC] SSA diffusion deltas
    ddv: jax.Array  # f32 [3, cap, NC] background-pressure velocity correction
    ddx: jax.Array  # f32 [3, cap, NC] XSPH position smoothing accumulator
    dS: jax.Array  # f32 [3, 3, cap, NC] deviatoric stress rate
    phi: jax.Array  # f32 [cap, NC] boundary volume fraction
    num_den: jax.Array  # f32 [cap, NC] number density (BVF Eq. 2)
    nw: jax.Array  # f32 [3, cap, NC] wall normal accumulator
    vws: jax.Array  # f32 [3, cap, NC] kernel-weighted solid velocity
    aws: jax.Array  # f32 [3, cap, NC] kernel-weighted solid acceleration
    rhoAux1: jax.Array  # f32 [cap, NC] Shepard filter numerator
    rhoAux2: jax.Array  # f32 [cap, NC] Shepard filter denominator
    Pnew: jax.Array  # f32 [cap, NC] stored pressure (mechanics/fsi variants)
    # -- bookkeeping ---------------------------------------------------------
    step: jax.Array  # i32 scalar
    dt: jax.Array  # f32 scalar (carried: fix dt/adaptive mutates it)
    key: jax.Array  # PRNG key
    overflow: jax.Array  # i32 scalar: particles dropped at rebin (must stay 0)
    # particles found outside their assigned cell by more than the drift
    # budget at rebin time — a nonzero count means the rebin cadence was too
    # slow for the motion and pair coverage may have been violated (the
    # failure mode the reference's skin heuristic shares, neighbor.cpp:88-90)
    drift_violation: jax.Array = None  # i32 scalar

    # ------------------------------------------------------------------
    @property
    def n_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def zeros(geom: Geometry, n_sdpd: int = 0, n_ssa: int = 0, dtype=jnp.float32, seed: int = 0):
        NC, cap = geom.ncells_total, geom.cap
        i32 = jnp.int32
        return State(
            tag=_f((cap, NC), i32),
            ptype=_f((cap, NC), i32),
            valid=jnp.zeros((cap, NC), bool),
            groupmask=_f((cap, NC), i32),
            solid_tag=_f((cap, NC), i32),
            fixed_tag=_f((cap, NC), i32),
            x=_f((3, cap, NC), dtype),
            v=_f((3, cap, NC), dtype),
            vest=_f((3, cap, NC), dtype),
            rho=jnp.ones((cap, NC), dtype),
            rhoI=jnp.ones((cap, NC), dtype),
            e=_f((cap, NC), dtype),
            C=_f((n_sdpd, cap, NC), dtype),
            Cd=_f((n_ssa, cap, NC), i32),
            S=_f((3, 3, cap, NC), dtype),
            f=_f((3, cap, NC), dtype),
            drho=_f((cap, NC), dtype),
            de=_f((cap, NC), dtype),
            Q=_f((n_sdpd, cap, NC), dtype),
            Qd=_f((n_ssa, cap, NC), i32),
            ddv=_f((3, cap, NC), dtype),
            ddx=_f((3, cap, NC), dtype),
            dS=_f((3, 3, cap, NC), dtype),
            phi=_f((cap, NC), dtype),
            num_den=jnp.ones((cap, NC), dtype),
            nw=_f((3, cap, NC), dtype),
            vws=_f((3, cap, NC), dtype),
            aws=_f((3, cap, NC), dtype),
            rhoAux1=_f((cap, NC), dtype),
            rhoAux2=jnp.ones((cap, NC), dtype),
            Pnew=_f((cap, NC), dtype),
            step=jnp.zeros((), i32),
            dt=jnp.zeros((), dtype),
            key=jax.random.PRNGKey(seed),
            overflow=jnp.zeros((), i32),
            drift_violation=jnp.zeros((), i32),
        )


# ---------------------------------------------------------------------------
# Cell indexing & rebinning
# ---------------------------------------------------------------------------

# Bookkeeping leaves that carry no trailing [cap, NC] axes.
_SCALAR_LEAVES = ("step", "dt", "key", "overflow", "drift_violation")

# Per-step accumulators that force_clear (ops/pair.py) fully rewrites before
# anything on the far side of a chunk boundary reads them — rebin can zero
# these instead of moving them through the permutation gather (the move is
# ~40% of rebin cost at 1M particles).  ``de`` is here because no integrator
# reads it: the reference comments out every ``e += dtf*de`` update
# (fix_ssa_tsdpd_bvf.cpp:209,353) — move it to the persistent set if energy
# integration is ever enabled.
_REBIN_DROPPABLE = ("phi", "nw", "vws", "aws", "rhoAux1", "rhoAux2", "Pnew",
                    "de", "Qd")
# num_den/ddx feed the NEXT step's initial_integrate only under XSPH
# (mechanics/fsi, integrate.py:185-186) — droppable iff xsph_factor == 0.
_REBIN_DROPPABLE_NO_XSPH = ("num_den", "ddx")


def rebin_droppable(uses_xsph: bool) -> tuple:
    """Accumulator leaves a rebin at the chunk boundary may zero, not move."""
    return _REBIN_DROPPABLE + (() if uses_xsph else _REBIN_DROPPABLE_NO_XSPH)


def particle_fields(state: State) -> dict:
    """All per-particle leaves (trailing [cap, NC]) as a dict."""
    return {
        f.name: getattr(state, f.name)
        for f in dataclasses.fields(state)
        if f.name not in _SCALAR_LEAVES
    }


def _x_column_table(geom: Geometry) -> np.ndarray:
    """Static fine-bin -> x-column lookup for non-uniform edges.

    Edges are integer multiples of ``x_quantum`` above lo[0], so binning is
    one uniform floor at quantum resolution plus a tiny i32 table gather —
    never a searchsorted (XLA lowers that to a serial while loop)."""
    q = geom.x_quantum
    e = np.asarray(geom.x_edges, np.float64)
    bins = np.round((e - e[0]) / q).astype(np.int64)
    table = np.zeros(int(bins[-1]), np.int32)
    for i in range(len(bins) - 1):
        table[bins[i] : bins[i + 1]] = i
    return table


def _x_column_of(x0, geom: Geometry):
    """Non-uniform x binning: positions -> column index via the fine table."""
    table = jnp.asarray(_x_column_table(geom))
    n_fine = table.shape[0]
    lo = geom.lo[0]
    if geom.periodic[0]:
        ext = geom.x_edges[-1] - geom.x_edges[0]
        x0 = jnp.mod(x0 - lo, ext) + lo
    f = jnp.floor((x0 - lo) * (1.0 / geom.x_quantum)).astype(jnp.int32)
    return table[jnp.clip(f, 0, n_fine - 1)]


def cell_index_of(x, geom: Geometry):
    """Map positions [3, ...] -> flat cell index [...]. Clamps open boundaries."""
    out = None
    for ax in range(3):
        n = geom.ncells[ax]
        if n == 1:
            c = jnp.zeros(x.shape[1:], jnp.int32)
        elif ax == 0 and geom.x_edges is not None:
            c = _x_column_of(x[0], geom)
        else:
            inv = 1.0 / geom.cell_size[ax]
            c = jnp.floor((x[ax] - geom.lo[ax]) * inv).astype(jnp.int32)
            c = jnp.mod(c, n) if geom.periodic[ax] else jnp.clip(c, 0, n - 1)
        out = c if out is None else out * n + c
    return out


def wrap_pbc(x, geom: Geometry):
    """Wrap positions into the box on periodic axes (reference domain->pbc)."""
    comps = []
    for ax in range(3):
        if geom.periodic[ax]:
            lo, hi = geom.lo[ax], geom.hi[ax]
            comps.append(lo + jnp.mod(x[ax] - lo, hi - lo))
        else:
            comps.append(x[ax])
    return jnp.stack(comps, axis=0)


def _coord_of_cells(geom: Geometry, ax: int):
    """Per-cell coordinate along ``ax`` as an i32 [NC] vector."""
    c = np.arange(geom.ncells_total, dtype=np.int32)
    return jnp.asarray((c // geom.strides[ax]) % geom.ncells[ax])


def shift_cells(a, offset, geom: Geometry):
    """Neighbor-cell view: out[..., c] = a[..., c + offset] on the cell grid.

    ``a`` has trailing flat-cell axis NC.  Implemented as lane rolls along
    that axis plus boundary corrections — non-periodic axes produce zeros
    (an all-invalid ghost cell); periodic axes wrap within the axis.  This
    is the entire neighbor-access machinery: on a sharded cell axis the
    rolls become ICI collective-permutes of one-cell-wide slabs.
    """
    for ax, off in enumerate(offset):
        if off == 0:
            continue
        n = geom.ncells[ax]
        stride = geom.strides[ax]
        coord = _coord_of_cells(geom, ax)
        inbounds = (coord + off >= 0) & (coord + off < n)
        main = jnp.roll(a, -off * stride, axis=-1)
        if geom.periodic[ax]:
            wrap_off = off - n if off > 0 else off + n
            alt = jnp.roll(a, -wrap_off * stride, axis=-1)
            a = jnp.where(inbounds, main, alt)
        else:
            a = jnp.where(inbounds, main, jnp.zeros((), a.dtype))
    return a


def _flat_slots(a):
    """[..., cap, NC] -> [..., cap * NC] (slot-major flat particle axis)."""
    return a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))


def rebin(
    state: State, geom: Geometry, drop: tuple = (), use_pallas: bool = True,
    mesh=None, mesh_axis: str = "x", drift_check: bool = True,
) -> State:
    """Re-scatter every particle into the cell slot owned by its position.

    Deterministic: rows are sorted by (cell, current flat slot).  Particles
    beyond a cell's capacity are dropped and counted in ``state.overflow``
    (which the host asserts to be zero — the analog of LAMMPS "lost atoms").

    On TPU with f32 state the move runs as a locality-based Pallas kernel
    (core/rebin_pallas.py) that produces identical slot assignments ~10x
    faster.  The path below is the fallback and the executable spec:
    one stable argsort of the [M] cell keys, a cummax-based segment rank
    (NOT searchsorted — XLA lowers that to a 24ms binary-search while loop
    at N=200), and one i32 scatter to invert it; then ALL per-particle
    leaves move in exactly two gathers, packed as one f32 and one i32
    matrix [F, M] sharing the index vector.  (Moving leaves individually
    with a [cap, NC]-shaped index looks like it should skip the flatten
    relayouts, but measures 4x slower per row at 1M particles — the packed
    gather amortizes index processing across rows.)

    ``drop``: static leaf names (see ``rebin_droppable``) to zero instead of
    move — per-step accumulators that force_clear rewrites before any read.
    """
    NC, cap = geom.ncells_total, geom.cap
    M = NC * cap

    fields = particle_fields(state)
    zeroed = {n: jnp.zeros_like(fields.pop(n)) for n in drop}

    # drift check BEFORE re-wrapping/re-binning: how far outside its assigned
    # cell has each particle strayed since the last rebin?
    # ``drift_check=False``: a cross-geometry re-bin (in-run rebalance) —
    # slots still reflect the OLD geometry's cells, so measuring excess
    # against the new edges would count spurious violations
    drift_violation = state.drift_violation
    if geom.drift_budget > 0 and drift_check:
        cell_ids = jnp.arange(NC, dtype=jnp.int32)
        lo = jnp.asarray(geom.lo)
        cs = jnp.asarray(geom.cell_size)
        strides = jnp.asarray(geom.strides, jnp.int32)
        ncs = jnp.asarray(geom.ncells, jnp.int32)
        coords = (cell_ids[:, None] // strides[None, :]) % ncs[None, :]  # [NC,3]
        x = fields["x"]  # [3, cap, NC]
        excess = jnp.zeros(x.shape[1:], x.dtype)
        for ax in range(geom.dim):
            if ax == 0 and geom.x_edges is not None:
                e = jnp.asarray(np.asarray(geom.x_edges), x.dtype)
                ax_lo = e[:-1][coords[:, 0]]
                ax_hi = e[1:][coords[:, 0]]
            else:
                ax_lo = lo[ax] + coords[:, ax] * cs[ax]
                ax_hi = ax_lo + cs[ax]
            below = ax_lo[None, :] - x[ax]
            above = x[ax] - ax_hi[None, :]
            excess = jnp.maximum(excess, jnp.maximum(below, above))
        bad = fields["valid"] & (excess > geom.drift_budget)
        drift_violation = drift_violation + jnp.sum(bad.astype(jnp.int32))

    fields["x"] = wrap_pbc(fields["x"], geom)

    from sph_bvf_tpu.core.rebin_pallas import (
        move_pallas,
        move_pallas_sharded,
        rebin_kernel_supported,
        rebin_pallas_eligible,
    )
    from sph_bvf_tpu.ops.pair_pallas import on_tpu, sharded_eligible

    n_rows = sum(
        int(np.prod(a.shape[:-2], dtype=np.int64)) or 1
        for a in fields.values()
    )
    n_shards = mesh.shape[mesh_axis] if mesh is not None else 1
    # a cross-geometry re-bin moves particles arbitrarily far — only the
    # global sort path below can place them (the locality kernel's 1-ring
    # crossbar would drop them as overflow)
    use_pallas = use_pallas and drift_check
    use_sharded = (
        use_pallas
        and n_shards > 1
        and rebin_kernel_supported(state.x.dtype, geom, n_rows)
        and sharded_eligible(geom, n_shards)
    )
    if use_sharded or (
        use_pallas and rebin_pallas_eligible(state.x.dtype, geom, n_rows)
    ):
        n_before = jnp.sum(fields["valid"].astype(jnp.int32))
        if use_sharded:
            new_fields = move_pallas_sharded(
                fields, geom, mesh, mesh_axis, interpret=not on_tpu()
            )
        else:
            new_fields = move_pallas(fields, geom)
        # every particle not re-placed (cell over capacity, or a
        # drift-contract violation that left the one-cell ring) is a loss
        lost = n_before - jnp.sum(new_fields["valid"].astype(jnp.int32))
        new_state = dataclasses.replace(
            state,
            overflow=state.overflow + lost,
            drift_violation=drift_violation,
            **new_fields,
            **zeroed,
        )
        return _neutralize_invalid(new_state)

    valid = _flat_slots(fields["valid"])
    cell = jnp.where(valid, _flat_slots(cell_index_of(fields["x"], geom)), NC)
    order = jnp.argsort(cell, stable=True)
    cell_sorted = cell[order]
    # rank within cell: position minus the (cummax-propagated) segment start
    i = jnp.arange(M, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), cell_sorted[1:] != cell_sorted[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_start, i, 0))
    rank = i - seg_start
    keep = (cell_sorted < NC) & (rank < cap)
    # slot-major destination: dest = rank * NC + cell
    dest = jnp.where(keep, rank * NC + cell_sorted, M)  # M -> dropped
    dropped = jnp.sum((cell_sorted < NC) & ~keep).astype(jnp.int32)

    # invert the permutation once: src[dest] = order
    src = jnp.full((M,), M, jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop"
    )
    got = src < M
    src = jnp.minimum(src, M - 1)

    # pack all leaves into two dtype-homogeneous matrices, move, unpack
    f32 = state.x.dtype
    packs = {f32: [], jnp.int32: []}
    meta = []  # (name, dtype-kind, nrows, lead-shape)
    for name, a in fields.items():
        flat = _flat_slots(a).reshape(-1, M)
        kind = f32 if jnp.issubdtype(a.dtype, jnp.floating) else jnp.int32
        packs[kind].append(flat.astype(kind))
        meta.append((name, kind, flat.shape[0], a.shape[:-2], a.dtype))

    moved = {}
    for kind, mats in packs.items():
        if not mats:
            continue
        mat = jnp.concatenate(mats, axis=0)
        moved[kind] = jnp.where(got, mat[:, src], jnp.zeros((), kind))

    new_fields = {}
    rows = {f32: 0, jnp.int32: 0}
    for name, kind, nrows, lead, dtype in meta:
        r = rows[kind]
        rows[kind] = r + nrows
        block = moved[kind][r : r + nrows]
        new_fields[name] = block.astype(dtype).reshape(lead + (cap, NC))

    new_state = dataclasses.replace(
        state,
        overflow=state.overflow + dropped,
        drift_violation=drift_violation,
        **new_fields,
        **zeroed,
    )
    # empty slots must hold neutral denominators
    return _neutralize_invalid(new_state)


def _neutralize_invalid(state: State) -> State:
    """Give padded slots safe values for fields used as denominators."""
    v = state.valid
    return dataclasses.replace(
        state,
        rho=jnp.where(v, state.rho, 1.0),
        rhoI=jnp.where(v, state.rhoI, 1.0),
        num_den=jnp.where(v, state.num_den, 1.0),
        rhoAux2=jnp.where(v, state.rhoAux2, 1.0),
    )


# ---------------------------------------------------------------------------
# Host-side construction from flat particle arrays
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("geom",))
def _initial_bin(state: State, geom: Geometry) -> State:
    """Build-time first binning as a single compiled program (jnp spec path)."""
    return rebin(state, geom, use_pallas=False)

def host_cpu_device():
    """The host CPU device, for eager scene-building work.

    Eager op-by-op dispatch to an accelerator (especially a remote/tunneled
    one) is orders of magnitude slower than host numpy; scene construction
    runs on CPU and the finished state ships to the default device once.
    """
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def to_default_device(tree):
    """Materialize every leaf on the default device (uncommitted)."""
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), tree)


def _to_internal(host: np.ndarray) -> np.ndarray:
    """Host [n, comps...] (component-trailing) -> internal [comps..., n]."""
    if host.ndim == 1:
        return host
    return np.moveaxis(host, 0, -1)


def state_from_particles(
    geom: Geometry,
    x: np.ndarray,
    ptype: np.ndarray,
    n_sdpd: int = 0,
    n_ssa: int = 0,
    dtype=jnp.float32,
    seed: int = 0,
    _on_cpu: bool = False,
) -> State:
    """Build a binned State from flat host arrays (the scene-builder path)."""
    cpu = host_cpu_device()
    if cpu is not None and jax.default_backend() != "cpu" and not _on_cpu:
        with jax.default_device(cpu):
            st = state_from_particles(
                geom, x, ptype, n_sdpd=n_sdpd, n_ssa=n_ssa, dtype=dtype,
                seed=seed, _on_cpu=True,
            )
        return to_default_device(st)
    n = x.shape[0]
    if x.shape[1] == 2:
        x = np.concatenate([x, np.zeros((n, 1))], axis=1)
    st = State.zeros(geom, n_sdpd=n_sdpd, n_ssa=n_ssa, dtype=dtype, seed=seed)
    NC, cap = geom.ncells_total, geom.cap
    M = NC * cap
    if n > M:
        raise ValueError(f"{n} particles exceed slot capacity {M}")

    def put(field, valsrc):
        lead = field.shape[:-2]
        flat = np.zeros(lead + (M,), np.dtype(field.dtype))
        flat[..., :n] = _to_internal(np.asarray(valsrc))
        return jnp.asarray(flat.reshape(field.shape))

    st = dataclasses.replace(
        st,
        x=put(st.x, x),
        tag=put(st.tag, np.arange(1, n + 1, dtype=np.int32)),
        ptype=put(st.ptype, ptype.astype(np.int32)),
        valid=put(st.valid, np.ones(n, bool)),
        groupmask=put(st.groupmask, np.full(n, GROUP_ALL, np.int32)),
    )
    # the pre-binning slot packing is arbitrary (first n flat slots), so the
    # locality-based Pallas move cannot apply — force the global sort path.
    # One jitted program: eager op-by-op dispatch of the sort+gather spec
    # costs ~20s of host time at 1M particles (measured, 3D N=100 build).
    st = _initial_bin(st, geom)
    # the pre-binning slot assignment is arbitrary; only drift AFTER the
    # first real binning is meaningful
    st = dataclasses.replace(st, drift_violation=jnp.zeros((), jnp.int32))
    return st


def scatter_by_tag(state: State, **host_arrays) -> State:
    """Overwrite per-particle fields from tag-ordered host arrays.

    ``host_arrays[name]`` is [n, comps...] indexed by ``tag - 1``; slots are
    filled through the current binning.  The scene builder and tests use
    this to set initial conditions after binning.
    """
    order = np.asarray(state.tag).reshape(-1) - 1
    valid = np.asarray(state.valid).reshape(-1)
    repl = {}
    for name, arr in host_arrays.items():
        field = getattr(state, name)
        arr = np.asarray(arr)
        flat = np.zeros((order.shape[0],) + arr.shape[1:], arr.dtype)
        flat[valid] = arr[order[valid]]
        internal = _to_internal(flat)  # [comps..., M]
        repl[name] = jnp.asarray(
            internal.reshape(field.shape), dtype=field.dtype
        )
    return dataclasses.replace(state, **repl)


def gather_particles(state: State, geom: Geometry, fields=("x", "v", "rho")):
    """Host-side: extract valid particles sorted by tag -> dict of np arrays.

    Returned arrays are component-trailing ([n, 3] vectors etc.), matching
    the reference's per-atom array conventions.
    """
    valid = np.asarray(state.valid).reshape(-1)
    tags = np.asarray(state.tag).reshape(-1)[valid]
    order = np.argsort(tags, kind="stable")
    out = {"tag": tags[order]}
    for name in fields:
        a = np.asarray(getattr(state, name))
        # explicit M: -1 cannot be inferred when a leading dim is 0
        # (size-0 species arrays)
        a = a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))
        a = np.moveaxis(a, -1, 0)[valid]  # [n, comps...]
        out[name] = a[order]
    return out
