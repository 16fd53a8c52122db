"""Thermo-style diagnostics (the analog of thermo.cpp's step table).

Supports the reference's `thermo_style custom` keyword subset used by the
examples (step dt press temp etotal, thermo.cpp:56 keyword table) plus the
framework's own columns.

`temp` follows compute_temp.cpp exactly: T = sum(m v^2) * mvv2e /
(dof * boltz) with dof = dim*N - dim (extra_dof = dim).  `press` follows
compute_pressure.cpp when geometry + pair config are supplied: the virial
pressure P = (sum m v^2 + 0.5 sum_i sum_j r_ij.f_ij) / (dim V), with the
pairwise virial evaluated by ops/pair.compute_pair_virial at thermo cadence
(the reference tallies it every step in ev_tally; tallying only when quoted
is the TPU-friendly equivalence).  Without geometry it falls back to the
mean Tait pressure (labeled `press_tait`).  `etotal` is the total kinetic
energy (the reference's per-atom e is carried but no shipped physics
integrates it).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class StopSimulation(RuntimeError):
    """Raised by a callback (e.g. Halt) to end simulate() early —
    the graceful analog of fix halt (fix_halt.cpp)."""


@partial(jax.jit, static_argnames=("dim", "geom", "pair_cfg"))
def _thermo_device(state, params, dim, geom, pair_cfg):
    """All device-side thermo reductions as ONE compiled program.

    Eager per-op dispatch through a tunneled TPU backend costs ~1s/op, so
    a thermo row must be a single dispatch + one bulk readback — including
    the stencil-loop virial, which would otherwise stall for minutes.
    """
    from sph_bvf_tpu.ops.eos import tait_pressure

    valid = state.valid
    n = jnp.sum(valid)
    vsq = jnp.where(valid, jnp.sum(state.v * state.v, axis=0), 0.0)
    m = params.mass[state.ptype]
    mvsq = jnp.sum(jnp.where(valid, m * vsq, 0.0))
    ke = 0.5 * mvsq
    rho = jnp.where(valid, state.rho, jnp.nan)
    P = tait_pressure(state.rho, params.rho0[state.ptype], params.B[state.ptype])
    press_tait = jnp.sum(jnp.where(valid, P, 0.0)) / jnp.maximum(n, 1)
    if geom is not None and pair_cfg is not None:
        from sph_bvf_tpu.ops.pair import compute_pair_virial

        vir = 0.5 * jnp.sum(compute_pair_virial(state, params, geom, pair_cfg))
        vol = 1.0
        for ax in range(dim):
            vol *= geom.hi[ax] - geom.lo[ax]
        # compute_pressure.cpp scalar: (sum m v^2 * mvv2e + virial)/(dim V)
        press = (mvsq * params.mvv2e + vir) / (dim * vol)
    else:
        press = press_tait
    # compute_temp.cpp: dof = dim*N - extra_dof, extra_dof = dim
    dof = jnp.maximum(dim * n - dim, 1).astype(ke.dtype)
    temp = mvsq * params.mvv2e / (dof * params.boltz)
    return dict(
        step=state.step, dt=state.dt, n=n,
        vmax=jnp.sqrt(jnp.max(vsq)), ke=ke, press=press,
        press_tait=press_tait, temp=temp,
        rho_min=jnp.nanmin(rho), rho_max=jnp.nanmax(rho),
        overflow=state.overflow,
    )


def thermo_row(state, params, dim: int = 2, geom=None, pair_cfg=None):
    """Global diagnostics computed on device; returns small dict of floats.

    With ``geom`` and ``pair_cfg`` supplied, ``press`` is the true virial
    pressure (compute_pressure.cpp); otherwise the mean Tait pressure.
    """
    d = jax.device_get(_thermo_device(state, params, dim, geom, pair_cfg))
    return dict(
        step=int(d["step"]),
        dt=float(d["dt"]),
        n=int(d["n"]),
        vmax=float(d["vmax"]),
        ke=float(d["ke"]),
        etotal=float(d["ke"]),
        press=float(d["press"]),
        press_tait=float(d["press_tait"]),
        temp=float(d["temp"]),
        rho_min=float(d["rho_min"]),
        rho_max=float(d["rho_max"]),
        overflow=int(d["overflow"]),
    )


_FORMATS = {
    "step": "{step:>9d}",
    "dt": "{dt:.3e}",
    "n": "{n:>8d}",
    "vmax": "{vmax:.4e}",
    "ke": "{ke:.6e}",
    "etotal": "{etotal:.6e}",
    "press": "{press:.6e}",
    "press_tait": "{press_tait:.6e}",
    "temp": "{temp:.4e}",
}


class ThermoLogger:
    """Prints a LAMMPS-thermo-like table and tracks steps/sec.

    ``columns`` mirrors `thermo_style custom ...`; unknown keywords raise.
    """

    def __init__(self, params, every=1000, file=None, columns=None, dim=2,
                 geom=None, pair_cfg=None):
        self.params = params
        self.every = every
        self.file = file
        self.dim = dim
        # supply geom + pair_cfg for the true virial `press` (see thermo_row)
        self.geom = geom
        self.pair_cfg = pair_cfg
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
        row = thermo_row(state, self.params, dim=self.dim,
                         geom=self.geom, pair_cfg=self.pair_cfg)
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
