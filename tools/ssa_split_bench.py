"""A/B the SSA kernel split on the real TPU (round-3 verdict #6).

The shipped cell-polarization model is continuum-species only, so the
SSA-heavy config here is its stochastic analog: the same fully-periodic
box with one integer species (Cd=100 per particle) hopping under
kappaSSA, mechanics via the transport-velocity pair.  Timed with
``ssa_kernel_split`` on (Pallas mechanics + jnp Qd pass) vs off (whole
pair pass on jnp — the round-3 behavior), scanned on-device.

Usage (real TPU): python tools/ssa_split_bench.py [--nx 100] [--chunks 10]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from sph_bvf_tpu.api.scene import Region, Scene  # noqa: E402
from sph_bvf_tpu.core.stepper import run_chunk, setup  # noqa: E402


def build(nx: int):
    L = 1.0
    dx = L / nx
    sc = Scene(dim=2, n_ssa=1, boundary=("p", "p", "p"))
    sc.rebin_every = 10
    sc.create_box(1, Region.block(0, L, 0, L, 0, dx))
    sc.lattice("sq", dx)
    sc.create_atoms(1, Region.block(0, L, 0, L, 0, dx))
    sc.mass(1, 1.0 / (nx * nx))
    sc.set("all", rho=1.0)
    sc.set("all", Cd=(0, 100))
    h = 2.5 * dx
    sc.pair_style("transport_velocity")
    sc.pair_coeff(1, 1, 1.0, 10.0, 1e-2, h, h, 0.0, kappa_ssa=(1e-4,))
    sc.integrator("transport_velocity")
    sc.timestep(1e-6)
    return sc.build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=100)
    ap.add_argument("--chunks", type=int, default=10)
    args = ap.parse_args()

    for split in (True, False):
        state, params, spec = build(args.nx)
        spec = dataclasses.replace(
            spec, pair=dataclasses.replace(spec.pair, ssa_kernel_split=split)
        )
        state = setup(state, params, spec, dt=1e-6)
        n = int(state.n_valid)
        state = run_chunk(state, params, spec, spec.rebin_every)  # warm
        float(jnp.sum(state.rho))
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            state = run_chunk(state, params, spec, spec.rebin_every)
        float(jnp.sum(state.rho))
        dt_wall = time.perf_counter() - t0
        steps = args.chunks * spec.rebin_every
        assert int(state.overflow) == 0
        total = int(jnp.sum(jnp.where(state.valid, state.Cd[0], 0)))
        print(json.dumps({
            "ssa_kernel_split": split, "n": n,
            "particle_steps_per_s": round(n * steps / dt_wall),
            "cd_total": total,
        }), flush=True)


if __name__ == "__main__":
    main()
