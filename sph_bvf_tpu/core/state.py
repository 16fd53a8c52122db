"""Particle state, coefficient tables, and the cell-slot layout.

The reference stores particles in flat grow-able SoA arrays plus binned
linked-list neighbor structures (src/atom.cpp, src/nbin_standard.cpp).  On
TPU everything must be static-shape and gather/scatter-light, so the state
here lives directly in a dense *cell-slot* layout:

    field[ncells_total, cap, ...]     ncells_total = ncx * ncy * ncz

Each cell owns up to ``cap`` particle slots (padded, with a validity mask).
Neighbor candidates for a cell are the particles in its 3^dim stencil cells,
reachable by *static shifts* of the cell grid — no index gathers in the hot
loop, and the shifts lower to ICI collective-permutes when the grid is
sharded across a device mesh.

Rebinning (the analog of LAMMPS ``exchange + borders + neighbor->build``,
comm_brick.cpp:585,709, neighbor.cpp:2008) is a sort-by-cell scatter executed
every ``rebin_every`` steps.  Because pair kernels re-test the true cutoff
against *fresh* positions every step, the binning only needs to satisfy
``cell_size >= cutoff + 2 * max_drift_between_rebins`` — stricter than the
reference's skin heuristic (neighbor.cpp:88-90), never missing pairs.

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

    @property
    def ncells_total(self) -> int:
        return self.ncells[0] * self.ncells[1] * self.ncells[2]

    @property
    def nslots(self) -> int:
        return self.ncells_total * self.cap

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
              multiple_of=(1, 1, 1)):
        """Choose the cell grid for a box: cell_size >= cutoff + margin per axis.

        ``multiple_of`` rounds the cell count down to a multiple per axis
        (cells only get larger — always safe) so the grid divides evenly
        across a device mesh.
        """
        lo = tuple(float(v) for v in lo)
        hi = tuple(float(v) for v in hi)
        nc, cs = [], []
        for ax in range(3):
            if ax >= dim:
                nc.append(1)
                cs.append(max(hi[ax] - lo[ax], 1.0))
                continue
            ext = hi[ax] - lo[ax]
            n = max(int(ext / (cutoff + margin)), 1)
            m = multiple_of[ax]
            if m > 1:
                n = max((n // m) * m, m)
            nc.append(n)
            cs.append(ext / n)
        return Geometry(
            dim=dim,
            lo=lo,
            hi=hi,
            ncells=tuple(nc),
            cell_size=tuple(cs),
            cap=cap,
            periodic=tuple(periodic),
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
    """All per-particle state in cell-slot layout [NC, cap, ...]."""

    # -- identity / tags ---------------------------------------------------
    tag: jax.Array  # i32 [NC, cap] global particle id (>=1); 0 for empty slots
    ptype: jax.Array  # i32 [NC, cap] 0-based particle type
    valid: jax.Array  # bool [NC, cap]
    groupmask: jax.Array  # i32 [NC, cap] group bitmask (bit 0 == "all")
    solid_tag: jax.Array  # i32 [NC, cap]
    fixed_tag: jax.Array  # i32 [NC, cap]
    # -- integrated fields --------------------------------------------------
    x: jax.Array  # f32 [NC, cap, 3]
    v: jax.Array  # f32 [NC, cap, 3] transport velocity (reference atom->v)
    vest: jax.Array  # f32 [NC, cap, 3] momentum velocity (reference atom->vest)
    rho: jax.Array  # f32 [NC, cap]
    rhoI: jax.Array  # f32 [NC, cap] half-step density
    e: jax.Array  # f32 [NC, cap] per-particle energy
    C: jax.Array  # f32 [NC, cap, Ns] continuum species
    Cd: jax.Array  # i32 [NC, cap, Nssa] integer (SSA) species counts
    S: jax.Array  # f32 [NC, cap, 3, 3] deviatoric stress tensor
    # -- force-eval outputs (persist across the step boundary) --------------
    f: jax.Array  # f32 [NC, cap, 3]
    drho: jax.Array  # f32 [NC, cap]
    de: jax.Array  # f32 [NC, cap]
    Q: jax.Array  # f32 [NC, cap, Ns] species flux
    Qd: jax.Array  # i32 [NC, cap, Nssa] SSA diffusion deltas
    ddv: jax.Array  # f32 [NC, cap, 3] background-pressure velocity correction
    ddx: jax.Array  # f32 [NC, cap, 3] XSPH position smoothing accumulator
    dS: jax.Array  # f32 [NC, cap, 3, 3] deviatoric stress rate
    phi: jax.Array  # f32 [NC, cap] boundary volume fraction
    num_den: jax.Array  # f32 [NC, cap] number density (BVF Eq. 2)
    nw: jax.Array  # f32 [NC, cap, 3] wall normal accumulator
    vws: jax.Array  # f32 [NC, cap, 3] kernel-weighted solid velocity
    aws: jax.Array  # f32 [NC, cap, 3] kernel-weighted solid acceleration
    rhoAux1: jax.Array  # f32 [NC, cap] Shepard filter numerator
    rhoAux2: jax.Array  # f32 [NC, cap] Shepard filter denominator
    Pnew: jax.Array  # f32 [NC, cap] stored pressure (mechanics/fsi variants)
    # -- bookkeeping ---------------------------------------------------------
    step: jax.Array  # i32 scalar
    dt: jax.Array  # f32 scalar (carried: fix dt/adaptive mutates it)
    key: jax.Array  # PRNG key
    overflow: jax.Array  # i32 scalar: particles dropped at rebin (must stay 0)

    # ------------------------------------------------------------------
    @property
    def n_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def zeros(geom: Geometry, n_sdpd: int = 0, n_ssa: int = 0, dtype=jnp.float32, seed: int = 0):
        NC, cap = geom.ncells_total, geom.cap
        i32 = jnp.int32
        return State(
            tag=_f((NC, cap), i32),
            ptype=_f((NC, cap), i32),
            valid=jnp.zeros((NC, cap), bool),
            groupmask=_f((NC, cap), i32),
            solid_tag=_f((NC, cap), i32),
            fixed_tag=_f((NC, cap), i32),
            x=_f((NC, cap, 3), dtype),
            v=_f((NC, cap, 3), dtype),
            vest=_f((NC, cap, 3), dtype),
            rho=jnp.ones((NC, cap), dtype),
            rhoI=jnp.ones((NC, cap), dtype),
            e=_f((NC, cap), dtype),
            C=_f((NC, cap, n_sdpd), dtype),
            Cd=_f((NC, cap, n_ssa), i32),
            S=_f((NC, cap, 3, 3), dtype),
            f=_f((NC, cap, 3), dtype),
            drho=_f((NC, cap), dtype),
            de=_f((NC, cap), dtype),
            Q=_f((NC, cap, n_sdpd), dtype),
            Qd=_f((NC, cap, n_ssa), i32),
            ddv=_f((NC, cap, 3), dtype),
            ddx=_f((NC, cap, 3), dtype),
            dS=_f((NC, cap, 3, 3), dtype),
            phi=_f((NC, cap), dtype),
            num_den=jnp.ones((NC, cap), dtype),
            nw=_f((NC, cap, 3), dtype),
            vws=_f((NC, cap, 3), dtype),
            aws=_f((NC, cap, 3), dtype),
            rhoAux1=_f((NC, cap), dtype),
            rhoAux2=jnp.ones((NC, cap), dtype),
            Pnew=_f((NC, cap), dtype),
            step=jnp.zeros((), i32),
            dt=jnp.zeros((), dtype),
            key=jax.random.PRNGKey(seed),
            overflow=jnp.zeros((), i32),
        )


# ---------------------------------------------------------------------------
# Cell indexing & rebinning
# ---------------------------------------------------------------------------

# Bookkeeping leaves that carry no leading [NC, cap] axis.
_SCALAR_LEAVES = ("step", "dt", "key", "overflow")


def particle_fields(state: State) -> dict:
    """All per-particle leaves (leading [NC, cap]) as a dict."""
    return {
        f.name: getattr(state, f.name)
        for f in dataclasses.fields(state)
        if f.name not in _SCALAR_LEAVES
    }


def cell_index_of(x, geom: Geometry):
    """Map positions [..., 3] -> flat cell index [...]. Clamps open boundaries."""
    lo = jnp.asarray(geom.lo, x.dtype)
    inv = 1.0 / jnp.asarray(geom.cell_size, x.dtype)
    c = jnp.floor((x - lo) * inv).astype(jnp.int32)
    nc = jnp.asarray(geom.ncells, jnp.int32)
    per = jnp.asarray(geom.periodic)
    c = jnp.where(per, jnp.mod(c, nc), jnp.clip(c, 0, nc - 1))
    return (c[..., 0] * geom.ncells[1] + c[..., 1]) * geom.ncells[2] + c[..., 2]


def wrap_pbc(x, geom: Geometry):
    """Wrap positions into the box on periodic axes (reference domain->pbc)."""
    lo = jnp.asarray(geom.lo, x.dtype)
    hi = jnp.asarray(geom.hi, x.dtype)
    ext = hi - lo
    per = jnp.asarray(geom.periodic)
    wrapped = lo + jnp.mod(x - lo, ext)
    return jnp.where(per, wrapped, x)


def rebin(state: State, geom: Geometry) -> State:
    """Re-scatter every particle into the cell slot owned by its position.

    Deterministic: rows are sorted by (cell, current flat slot).  Particles
    beyond a cell's capacity are dropped and counted in ``state.overflow``
    (which the host asserts to be zero — the analog of LAMMPS "lost atoms").
    """
    NC, cap = geom.ncells_total, geom.cap
    M = NC * cap

    fields = {
        k: a.reshape((M,) + a.shape[2:]) for k, a in particle_fields(state).items()
    }
    fields["x"] = wrap_pbc(fields["x"], geom)

    cell = jnp.where(fields["valid"], cell_index_of(fields["x"], geom), NC)
    order = jnp.argsort(cell, stable=True)
    cell_sorted = cell[order]
    # rank of each row within its cell
    first = jnp.searchsorted(cell_sorted, cell_sorted, side="left")
    rank = jnp.arange(M, dtype=jnp.int32) - first.astype(jnp.int32)
    keep = (cell_sorted < NC) & (rank < cap)
    dest = jnp.where(keep, cell_sorted * cap + rank, M)  # M -> dropped

    dropped = jnp.sum((cell_sorted < NC) & ~keep).astype(jnp.int32)

    def scatter(a):
        src = a[order]
        out = jnp.zeros((M,) + a.shape[1:], a.dtype)
        return out.at[dest].set(src, mode="drop")

    new_fields = {
        k: scatter(a).reshape((NC, cap) + a.shape[1:]) for k, a in fields.items()
    }
    new_state = dataclasses.replace(
        state, overflow=state.overflow + dropped, **new_fields
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


def grid_view(a, geom: Geometry):
    """[NC, cap, ...] -> [ncx, ncy, ncz, cap, ...]."""
    return a.reshape(geom.ncells + a.shape[1:])


def flat_view(a, geom: Geometry):
    return a.reshape((geom.ncells_total,) + a.shape[3:])


def shift_cells(a, offset, geom: Geometry):
    """Neighbor-cell view: out[c] = a[c + offset] on the cell grid.

    ``a`` is [NC, cap, ...].  Non-periodic axes pad with zeros (an all-invalid
    ghost cell); periodic axes wrap.  This is the entire neighbor-access
    machinery: on a sharded cell grid these static shifts become ICI
    collective-permutes of one cell-wide slabs.
    """
    g = grid_view(a, geom)
    for ax, off in enumerate(offset):
        if off == 0:
            continue
        if geom.periodic[ax]:
            g = jnp.roll(g, -off, axis=ax)
        else:
            n = g.shape[ax]
            pad = [(0, 0)] * g.ndim
            idx = [slice(None)] * g.ndim
            if off > 0:
                pad[ax] = (0, off)
                idx[ax] = slice(off, off + n)
            else:
                pad[ax] = (-off, 0)
                idx[ax] = slice(0, n)
            g = jnp.pad(g, pad)[tuple(idx)]
    return flat_view(g, geom)


# ---------------------------------------------------------------------------
# Host-side construction from flat particle arrays
# ---------------------------------------------------------------------------

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
        flat = np.zeros((M,) + field.shape[2:], np.dtype(field.dtype))
        flat[:n] = valsrc
        return jnp.asarray(flat).reshape(field.shape)

    st = dataclasses.replace(
        st,
        x=put(st.x, x),
        tag=put(st.tag, np.arange(1, n + 1, dtype=np.int32)),
        ptype=put(st.ptype, ptype.astype(np.int32)),
        valid=put(st.valid, np.ones(n, bool)),
        groupmask=put(st.groupmask, np.full(n, GROUP_ALL, np.int32)),
    )
    st = rebin(st, geom)
    return st


def gather_particles(state: State, geom: Geometry, fields=("x", "v", "rho")):
    """Host-side: extract valid particles sorted by tag -> dict of np arrays."""
    valid = np.asarray(state.valid).reshape(-1)
    tags = np.asarray(state.tag).reshape(-1)[valid]
    order = np.argsort(tags, kind="stable")
    out = {"tag": tags[order]}
    for name in fields:
        a = np.asarray(getattr(state, name))
        a = a.reshape((-1,) + a.shape[2:])[valid]
        out[name] = a[order]
    return out
