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
threshold where cut-plane balancing would pay; a balance.cpp-style
proportional split is therefore deferred by measurement, not omission.
If a future scene trips the warning below, the lever that fits XLA is
re-binning with non-uniform cell *sizes* per slab (equal cell counts,
unequal widths) at Scene.build time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


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
            f"x-slabs will leave devices idle; consider non-uniform cell "
            f"sizing (see parallel/balance.py docstring)"
        )
    return out
