"""System description — the analog of the `info` command (info.cpp).

``describe(state, params, spec)`` prints the configured system: box, grid,
particle counts by type/tag, physics variant and coefficient tables, fixes,
and memory footprint.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def describe(state, params, spec) -> str:
    geom = spec.geom
    valid = np.asarray(state.valid)
    ptype = np.asarray(state.ptype)[valid]
    solid = np.asarray(state.solid_tag)[valid]
    fixed = np.asarray(state.fixed_tag)[valid]
    nbytes = sum(
        np.asarray(getattr(state, f.name)).nbytes
        for f in dataclasses.fields(state)
    )
    lines = [
        "System info (info.cpp analog)",
        f"  box: lo={geom.lo} hi={geom.hi} periodic={geom.periodic} dim={geom.dim}",
        f"  cell grid: {geom.ncells} (cap {geom.cap}, cell {tuple(round(c, 8) for c in geom.cell_size)}, "
        f"drift budget {geom.drift_budget:.3g})",
        f"  particles: {valid.sum()} valid / {geom.nslots} slots "
        f"({100.0 * valid.sum() / geom.nslots:.0f}% occupancy)",
    ]
    for t in range(params.ntypes):
        n = int((ptype == t).sum())
        if n:
            lines.append(f"    type {t + 1}: {n}")
    lines += [
        f"  solids: {int((solid == 1).sum())} "
        f"(fixed {int(((solid == 1) & (fixed == 1)).sum())}), "
        f"species: {params.n_sdpd} continuum + {params.n_ssa} stochastic",
        f"  pair: {spec.pair.variant} (pallas={spec.pair.use_pallas}, "
        f"thermal={spec.pair.thermal}), integrator: {spec.integ.variant}",
        f"  fixes: {[type(f).__name__ for f in spec.fixes] or 'none'}",
        f"  rebin every {spec.rebin_every} steps; state {nbytes / 1e6:.1f} MB",
    ]
    out = "\n".join(lines)
    print(out)
    return out
