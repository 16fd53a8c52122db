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
