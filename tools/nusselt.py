"""Steady-state natural-convection check: Nusselt number vs conduction.

The paper's convection validation is Nusselt behavior at the heated
cylinder (README.md:12-36 of the reference; examples/ssa-tsdpd/
natural_convection).  The standard definition Nu = convective heat
transfer / conductive heat transfer is computed here directly from the
species-flux accumulator: the Dirichlet forcing clamps C=C0 on the
cylinder every step (fix_ssa_tsdpd_forcing.cpp:133-174), so the heat the
cylinder supplies per unit time is

    Qdot = -sum_{i in cylinder} m_i * Q_i

(`Q` is the tSDPD inter-particle flux, pair...transport_velocity.cpp:
677-731).  Running the SAME scene with buoyancy ~0 gives the conduction
reference, and Nu = Qdot_convection / Qdot_conduction at steady state.
Steady state is declared when the windowed relative drift of Qdot falls
below --tol.

Usage:
  python tools/nusselt.py --N 100 --Ra 1e4 --max-steps 300000
Prints Nu(t) rows and the final Nu; exercise Ra=1e4..1e6 to check the
paper's monotone-increase criterion.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def qdot(state, params, groupbit: int) -> float:
    import jax.numpy as jnp

    sel = state.valid & ((state.groupmask & groupbit) != 0)
    m = params.mass[state.ptype]
    return float(-jnp.sum(jnp.where(sel, m * state.Q[0], 0.0)))


def run_to_steady(N, Ra, buoyancy, max_steps, check_every, tol, window=5):
    from sph_bvf_tpu.core.stepper import run_chunk, setup
    from sph_bvf_tpu.models import natural_convection

    state, params, spec, sc = natural_convection.build(N=N, Ra=Ra)
    if not buoyancy:
        # conduction reference: same scene, buoyancy acceleration ~ 0
        import dataclasses

        fixes = tuple(
            dataclasses.replace(f, acceleration=0.0)
            if type(f).__name__ == "Buoyancy" else f
            for f in spec.fixes
        )
        spec = dataclasses.replace(spec, fixes=fixes)
    gb = sc.groupbit("sphere")
    state = setup(state, params, spec, dt=1e-4)
    hist = []
    t0 = time.time()
    done = 0
    while done < max_steps:
        target = min(done + check_every, max_steps)
        while done < target:
            n = min(spec.rebin_every, target - done)
            state = run_chunk(state, params, spec, n)
            done += n
        q = qdot(state, params, gb)
        hist.append(q)
        rate = done / max(time.time() - t0, 1e-9)
        label = "conv" if buoyancy else "cond"
        print(f"[{label}] step {done} Qdot {q:.6e} ({rate:,.0f} steps/s)",
              flush=True)
        assert int(state.overflow) == 0
        if len(hist) > window:
            w = np.asarray(hist[-window:])
            drift = (w.max() - w.min()) / max(abs(w.mean()), 1e-30)
            if drift < tol:
                print(f"[{label}] steady at step {done} (drift {drift:.2e})")
                return q, done, True
    return hist[-1], done, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=100)
    ap.add_argument("--Ra", type=float, default=1e4)
    ap.add_argument("--max-steps", type=int, default=300_000)
    ap.add_argument("--check-every", type=int, default=2_000)
    ap.add_argument("--tol", type=float, default=2e-3)
    args = ap.parse_args()

    q_cond, s1, ok1 = run_to_steady(
        args.N, args.Ra, False, args.max_steps, args.check_every, args.tol
    )
    q_conv, s2, ok2 = run_to_steady(
        args.N, args.Ra, True, args.max_steps, args.check_every, args.tol
    )
    nu = q_conv / q_cond
    print(f"N={args.N} Ra={args.Ra:g}: Qdot_cond={q_cond:.6e} "
          f"(steady={ok1}) Qdot_conv={q_conv:.6e} (steady={ok2})")
    print(f"Nu = {nu:.4f}")


if __name__ == "__main__":
    main()
