"""Load-balance diagnostics — the balance.cpp / imbalance_*.cpp analog.

The reference rebalances by moving processor-grid cut planes until each
rank's particle count (or weighted cost, imbalance_{neigh,time,var}.cpp)
equalizes (balance.cpp:1354, fix_balance.cpp:341).  The TPU build shards
equal-width x-slabs of the cell grid (parallel/mesh.py) and cannot move
cut planes without reshaping every array (XLA requires equal per-device
extents), so the equivalent questions are:

1. *How imbalanced are the equal-width slabs?*  This module measures it —
   the same ``max/mean`` imbalance factor LAMMPS reports (balance.cpp).
2. *Does imbalance cost wall-clock?*  Less than in the reference: the pair
   and rebin kernels are occupancy-gated (ops/pair_pallas.py), so a
   lightly-loaded device finishes its lockstep step early and waits — the
   cost is bounded by the imbalance factor, not amplified by it.

Measured on the shipped scenes at 8 slabs (round 3): lid cavity 1.00
(uniform lattice), fsi nx=60 **1.08** (the dense beam spans only ~2 cell
columns), cell polarization nx=100 **1.06**.  All are far under the 2x
threshold where cut-plane balancing pays, so the shipped models run with
uniform columns.  For scenes that DO trip the warning, the lever exists
(round 4): ``Scene.balance(n_shards)`` recomputes the x-cell edges with
``balanced_x_edges`` below — equal cell *counts* per shard (XLA keeps its
static equal per-device extents), unequal *widths* (dense regions get
narrow columns down to the stencil-coverage minimum) — and rebuilds the
geometry with ``Geometry.x_edges`` set.  Tested on an adversarial
dense-blob scene in tests/test_sharding.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("geom", "n_shards"))
def slab_counts(valid: jax.Array, geom, n_shards: int) -> jax.Array:
    """Per-slab particle counts for equal-width x-slabs of the cell grid.

    ``valid``: [cap, NC] occupancy mask.  Requires ncells[0] divisible by
    ``n_shards`` (the sharding layout's own constraint).
    """
    nx = geom.ncells[0]
    if nx % n_shards:
        raise ValueError(f"nx={nx} not divisible by {n_shards} shards")
    per_cell = jnp.sum(valid.astype(jnp.int32), axis=0)  # [NC]
    per_col = per_cell.reshape(nx, -1).sum(axis=1)  # [nx]
    return per_col.reshape(n_shards, nx // n_shards).sum(axis=1)


def imbalance(counts) -> float:
    """LAMMPS's imbalance factor: max over mean (balance.cpp)."""
    counts = jnp.asarray(counts, jnp.float32)
    return float(jnp.max(counts) / jnp.maximum(jnp.mean(counts), 1.0))


def balanced_x_edges(
    x0: np.ndarray,
    lo: float,
    quantum: float,
    n_fine: int,
    nx: int,
    k_min: int,
) -> list:
    """Equal-count x-column edges on the fine-quantum grid — the cut-plane
    proportional split of balance.cpp:1354, expressed the XLA-compatible
    way: cell COUNTS stay equal per shard (static shapes), cell WIDTHS move.

    Greedy sweep: each of the ``nx`` columns takes fine bins until it holds
    its fair share of the remaining particles, subject to every column
    keeping at least ``k_min`` bins (the stencil-coverage minimum,
    ``k_min * quantum > cutoff``) and leaving enough bins for the columns
    after it.  Host-side numpy at Scene.build time; O(n + n_fine).

    Returns ``nx + 1`` edge positions in fine-bin units (ints), starting at
    0 and ending at ``n_fine``.
    """
    if n_fine < nx * k_min:
        raise ValueError(
            f"cannot balance: {n_fine} fine bins < {nx} columns x {k_min}"
        )
    f = np.clip(((x0 - lo) / quantum).astype(np.int64), 0, n_fine - 1)
    cum = np.concatenate(
        [[0], np.cumsum(np.bincount(f, minlength=n_fine))]
    )  # cum[b] = particles strictly below fine-bin b
    edges = [0]
    for c in range(nx):
        cols_left = nx - c - 1
        if cols_left == 0:
            edges.append(n_fine)
            break
        target = cum[edges[-1]] + (cum[-1] - cum[edges[-1]]) / (nx - c)
        end = int(np.searchsorted(cum, target, side="left"))
        end = max(end, edges[-1] + k_min)
        end = min(end, n_fine - cols_left * k_min)
        edges.append(end)
    assert edges[-1] == n_fine
    assert all(b - a >= k_min for a, b in zip(edges, edges[1:]))
    return edges


@dataclasses.dataclass(frozen=True)
class BalanceFix:
    """In-run dynamic load rebalancing — the `fix balance` analog
    (fix_balance.cpp:1-341, shift style).

    Attach via ``ModelSpec(balance=BalanceFix(...))`` (or
    ``Scene.fix_balance``); ``core/stepper.simulate`` then checks the slab
    imbalance every ``every`` steps at a chunk boundary and, past
    ``threshold``, re-cuts ``Geometry.x_edges`` from the CURRENT particle
    positions (``rebalance`` below) and re-bins the state into the new
    geometry via the global-sort path.  Shapes (ncells, cap) never change,
    so state arrays are untouched — but the Geometry is a trace-time
    constant, so each accepted re-cut compiles a fresh step program (XLA's
    static-shape bargain; the reference mutates subbox bounds in place).
    Rebalance cadence should therefore be event-driven and coarse: the
    default ``every`` is 1000 steps and a re-cut only happens when the
    imbalance actually crossed the threshold AND the new edges improve it
    by ``min_gain``.

    ``min_budget``: minimum post-rebalance drift budget.  Equal-count
    columns can be arbitrarily close to the cutoff width, which would
    leave no drift margin; set this to at least
    ``max|v| * dt * rebin_every`` for the run.
    """

    n_shards: int
    every: int = 1000
    threshold: float = 1.5
    min_gain: float = 1.2
    min_budget: float = 0.0
    # Occupancy trigger: also re-cut when the max cell occupancy reaches
    # this fraction of cap — a density bulge drifting into columns cut for
    # a sparser region fills cells (lost atoms) long before the SHARD
    # imbalance crosses threshold.  The moral analog of the reference's
    # neighbor-weighted imbalance (imbalance_neigh.cpp).  0 disables.
    occ_frac: float = 0.85


def rebalance(state, geom, fix: BalanceFix):
    """Propose re-cut x_edges for the current particle distribution.

    Returns ``(new_geom | None, info)``: None when neither trigger fires
    (shard imbalance under ``fix.threshold`` AND max cell occupancy under
    ``occ_frac * cap``), when the geometry cannot be re-cut (unknown
    cutoff, nx not divisible), or when the best new edge set does not
    improve the firing metric by ``fix.min_gain``.  The caller re-bins
    into ``new_geom`` with ``rebin(..., use_pallas=False,
    drift_check=False)`` (cross-geometry move) and must keep the OLD
    geometry if that overflows.
    """
    ns = fix.n_shards
    counts = slab_counts(state.valid, geom, ns)
    f = imbalance(counts)
    occ_now = int(jnp.max(jnp.sum(state.valid.astype(jnp.int32), axis=0)))
    occ_fire = fix.occ_frac > 0 and occ_now >= fix.occ_frac * geom.cap
    info = dict(imbalance=round(f, 3), max_occ=occ_now)
    if f <= fix.threshold and not occ_fire:
        return None, info
    nx = geom.ncells[0]
    if geom.cutoff <= 0.0:
        info["reason"] = "geometry records no cutoff (pre-round-5 build)"
        return None, info
    if nx % ns:
        info["reason"] = f"nx={nx} not divisible by {ns} shards"
        return None, info
    q = geom.x_quantum if geom.x_quantum > 0 else geom.cell_size[0] / 8.0
    cov = (
        geom.x_edges[-1] - geom.lo[0]
        if geom.x_edges is not None
        else nx * geom.cell_size[0]
    )
    n_fine = int(round(cov / q))
    # minimum column width: strictly above cutoff + twice the requested
    # drift budget (same criterion as Scene._maybe_balance, plus margin)
    wmin = geom.cutoff + 2.0 * fix.min_budget
    k_min = max(int(np.ceil(wmin / q)), 1)
    while k_min * q - wmin < 1e-6 * q:
        k_min += 1
    if n_fine < nx * k_min:
        info["reason"] = (
            f"{n_fine} fine bins < {nx} columns x k_min={k_min}"
        )
        return None, info
    v = np.asarray(state.valid)
    xv = np.asarray(state.x)[:, v]
    if geom.periodic[0]:
        ext = cov
        x0 = geom.lo[0] + np.mod(xv[0] - geom.lo[0], ext)
    else:
        x0 = xv[0]
    edges_f = balanced_x_edges(x0, geom.lo[0], q, n_fine, nx, k_min)
    e = np.asarray([geom.lo[0] + b * q for b in edges_f])
    col = np.clip(np.searchsorted(e, x0, side="right") - 1, 0, nx - 1)
    s = np.bincount(col // (nx // ns), minlength=ns)
    fb = float(s.max() / max(s.mean(), 1.0))
    info["new_imbalance"] = round(fb, 3)
    # projected max cell occupancy under the new edges (host bincount
    # over (column, remaining-axis cells)) — the occupancy trigger's
    # accept metric, and a hard feasibility bound either way
    inner = np.zeros_like(col)
    scale = 1
    for ax in range(1, geom.dim):
        c = np.floor(
            (xv[ax] - geom.lo[ax]) / geom.cell_size[ax]
        ).astype(np.int64)
        if geom.periodic[ax]:
            c = np.mod(c, geom.ncells[ax])
        else:
            c = np.clip(c, 0, geom.ncells[ax] - 1)
        inner = inner * geom.ncells[ax] + c
        scale *= geom.ncells[ax]
    occ_new = int(np.bincount(col * scale + inner).max())
    info["new_max_occ"] = occ_new
    if occ_new > geom.cap:
        info["reason"] = f"new binning would overflow cap ({occ_new})"
        return None, info
    improves = fb * fix.min_gain < f or (
        occ_fire and occ_new * fix.min_gain < occ_now
    )
    if not improves:
        info["reason"] = "no improving edge set under the width constraint"
        return None, info
    widths = np.diff(e)
    budget = min(
        [(float(widths.min()) - geom.cutoff) / 2.0]
        + [
            (geom.cell_size[ax] - geom.cutoff) / 2.0
            for ax in range(1, geom.dim)
        ]
    )
    new_geom = dataclasses.replace(
        geom,
        x_edges=tuple(float(b) for b in e),
        x_quantum=q,
        cell_size=(float(widths.min()),) + tuple(geom.cell_size[1:]),
        drift_budget=max(float(budget), 0.0),
        # variable widths break the uniform-lattice-occupancy assumption
        # behind the pair kernel's i-row gate
        base_occ=0,
    )
    return new_geom, info


def report(state, geom, n_shards: int, warn_factor: float = 2.0) -> dict:
    """Imbalance summary for a (prospective) n-shard run; warns past the
    threshold where cut-plane balancing would be worth building."""
    counts = slab_counts(state.valid, geom, n_shards)
    f = imbalance(counts)
    out = dict(
        n_shards=n_shards,
        counts=[int(c) for c in counts],
        imbalance=round(f, 3),
    )
    if f > warn_factor:
        out["warning"] = (
            f"slab imbalance {f:.2f}x exceeds {warn_factor}x — equal-width "
            f"x-slabs will leave devices idle; rebuild the scene with "
            f"Scene.balance(n_shards) to get non-uniform column widths "
            f"(balanced_x_edges below)"
        )
    return out
