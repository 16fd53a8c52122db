"""Thermo-style diagnostics (the analog of thermo.cpp's step table).

Supports the reference's `thermo_style custom` keyword subset used by the
examples (step dt press temp etotal, thermo.cpp:56 keyword table) plus the
framework's own columns.  `press` is the mean Tait pressure over valid
particles, `temp` the kinetic-energy temperature 2*KE/(dim*N*kB), `etotal`
the total kinetic energy (the reference's per-atom e is carried but no
shipped physics integrates it, so KE is the meaningful total here).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


class StopSimulation(RuntimeError):
    """Raised by a callback (e.g. Halt) to end simulate() early —
    the graceful analog of fix halt (fix_halt.cpp)."""


def thermo_row(state, params, dim: int = 2):
    """Global diagnostics computed on device; returns small dict of floats."""
    from sph_bvf_tpu.ops.eos import tait_pressure

    valid = state.valid
    n = jnp.sum(valid)
    vsq = jnp.where(valid, jnp.sum(state.v * state.v, axis=0), 0.0)
    m = params.mass[state.ptype]
    ke = 0.5 * jnp.sum(jnp.where(valid, m * vsq, 0.0))
    rho = jnp.where(valid, state.rho, jnp.nan)
    P = tait_pressure(state.rho, params.rho0[state.ptype], params.B[state.ptype])
    press = jnp.sum(jnp.where(valid, P, 0.0)) / jnp.maximum(n, 1)
    nf = jnp.maximum(n, 1).astype(ke.dtype)
    temp = 2.0 * ke / (dim * nf * params.boltz)
    return dict(
        step=int(state.step),
        dt=float(state.dt),
        n=int(n),
        vmax=float(jnp.sqrt(jnp.max(vsq))),
        ke=float(ke),
        etotal=float(ke),
        press=float(press),
        temp=float(temp),
        rho_min=float(jnp.nanmin(rho)),
        rho_max=float(jnp.nanmax(rho)),
        overflow=int(state.overflow),
    )


_FORMATS = {
    "step": "{step:>9d}",
    "dt": "{dt:.3e}",
    "n": "{n:>8d}",
    "vmax": "{vmax:.4e}",
    "ke": "{ke:.6e}",
    "etotal": "{etotal:.6e}",
    "press": "{press:.6e}",
    "temp": "{temp:.4e}",
}


class ThermoLogger:
    """Prints a LAMMPS-thermo-like table and tracks steps/sec.

    ``columns`` mirrors `thermo_style custom ...`; unknown keywords raise.
    """

    def __init__(self, params, every=1000, file=None, columns=None, dim=2):
        self.params = params
        self.every = every
        self.file = file
        self.dim = dim
        self.columns = list(columns) if columns else ["step", "n", "vmax", "ke"]
        for c in self.columns:
            if c not in _FORMATS:
                raise ValueError(
                    f"thermo column {c!r}: choose from {sorted(_FORMATS)}"
                )
        self._t0 = None
        self._step0 = 0
        self.history = []

    def __call__(self, state):
        row = thermo_row(state, self.params, dim=self.dim)
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            self._step0 = row["step"]
            rate = 0.0
        else:
            rate = (row["step"] - self._step0) / max(now - self._t0, 1e-9)
        row["steps_per_sec"] = rate
        self.history.append(row)
        cols = "  ".join(
            f"{c} " + _FORMATS[c].format(**row) for c in self.columns
        )
        msg = (
            f"{cols}  rho [{row['rho_min']:.4f},{row['rho_max']:.4f}]  "
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


class Halt:
    """Condition-triggered graceful stop — fix halt (fix_halt.cpp) analog.

    Use as (or inside) a simulate() callback:
        simulate(..., callback=Halt(lambda row: row["vmax"] > 10, params))
    """

    def __init__(self, condition, params, dim=2):
        self.condition = condition
        self.params = params
        self.dim = dim

    def __call__(self, state):
        row = thermo_row(state, self.params, dim=self.dim)
        if self.condition(row):
            raise StopSimulation(f"halt condition met at step {row['step']}")
