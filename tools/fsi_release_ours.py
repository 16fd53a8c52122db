"""Run our side of the FSI release validation (see fsi_release_compare.py).

Matches the C++ run already in /tmp/fsi_release: fsi channel at nx=30
(3834 atoms), dt=1e-8, solid release gate moved to step 20k
(fix_ssa_tsdpd_bvf_mechanics.cpp:151 gate, overridden on the C++ side via
the SSA_TDAMP_SOLID env patch in /tmp/lmpbuild), run to 120k steps with
x/v/tag snapshots every 10k.  Snapshots are written to the npz after EVERY
interval so a partial run still yields comparable rows.

Usage: python tools/fsi_release_ours.py [--steps 120000] [--every 10000]
       [--out /tmp/fsi_release_ours.npz]
Runs on whatever backend jax initializes (TPU minutes; 1-CPU host ~8h).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120_000)
    ap.add_argument("--every", type=int, default=10_000)
    ap.add_argument("--nx", type=int, default=30)
    ap.add_argument("--tdamp-solid", type=float, default=2e4)
    ap.add_argument("--out", default="/tmp/fsi_release_ours.npz")
    args = ap.parse_args()

    import jax.numpy as jnp

    from sph_bvf_tpu.core.state import gather_particles
    from sph_bvf_tpu.core.stepper import run_chunk, setup
    from sph_bvf_tpu.models import fsi

    state, params, spec, _ = fsi.build(
        nx=args.nx, tdamp_solid=args.tdamp_solid
    )
    state = setup(state, params, spec, dt=1e-8)
    import jax

    print(f"backend={jax.devices()[0].platform} n={int(state.n_valid)} "
          f"steps={args.steps} every={args.every}", flush=True)

    snaps = {}

    def snap(s):
        out = gather_particles(state, spec.geom, fields=("x", "v"))
        snaps[f"{s}_tag"] = out["tag"]
        snaps[f"{s}_x"] = out["x"]
        snaps[f"{s}_v"] = out["v"]
        np.savez(args.out, **snaps)

    snap(0)
    t0 = time.time()
    done = 0
    chunk = spec.rebin_every
    while done < args.steps:
        target = min(done + args.every, args.steps)
        while done < target:
            n = min(chunk, target - done)
            state = run_chunk(state, params, spec, n)
            done += n
        assert int(state.overflow) == 0, f"overflow at step {done}"
        snap(done)
        rate = done / max(time.time() - t0, 1e-9)
        print(f"step {done} ({rate:,.0f} steps/s, "
              f"eta {(args.steps - done) / max(rate, 1e-9):,.0f}s)",
              flush=True)
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
