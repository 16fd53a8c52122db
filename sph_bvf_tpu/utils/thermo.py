"""Thermo-style diagnostics (the analog of thermo.cpp's step table)."""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


def thermo_row(state, params):
    """Global diagnostics computed on device; returns small dict of floats."""
    valid = state.valid
    n = jnp.sum(valid)
    vsq = jnp.where(valid, jnp.sum(state.v * state.v, axis=0), 0.0)
    m = params.mass[state.ptype]
    ke = 0.5 * jnp.sum(jnp.where(valid, m * vsq, 0.0))
    rho = jnp.where(valid, state.rho, jnp.nan)
    return dict(
        step=int(state.step),
        n=int(n),
        vmax=float(jnp.sqrt(jnp.max(vsq))),
        ke=float(ke),
        rho_min=float(jnp.nanmin(rho)),
        rho_max=float(jnp.nanmax(rho)),
        overflow=int(state.overflow),
    )


class ThermoLogger:
    """Prints a LAMMPS-thermo-like table and tracks steps/sec."""

    def __init__(self, params, every=1000, file=None):
        self.params = params
        self.every = every
        self.file = file
        self._t0 = None
        self._step0 = 0
        self.history = []

    def __call__(self, state):
        row = thermo_row(state, self.params)
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            self._step0 = row["step"]
            rate = 0.0
        else:
            rate = (row["step"] - self._step0) / max(now - self._t0, 1e-9)
        row["steps_per_sec"] = rate
        self.history.append(row)
        msg = (
            f"step {row['step']:>9d}  n {row['n']:>8d}  vmax {row['vmax']:.4e}  "
            f"ke {row['ke']:.6e}  rho [{row['rho_min']:.4f},{row['rho_max']:.4f}]  "
            f"{rate:,.0f} steps/s"
        )
        print(msg, flush=True)
        if self.file:
            with open(self.file, "a") as f:
                f.write(msg + "\n")
        if row["overflow"]:
            raise RuntimeError(f"cell overflow: {row['overflow']} particles lost")
        if not np.isfinite(row["vmax"]):
            raise RuntimeError("simulation blew up (vmax is not finite)")
        return row
