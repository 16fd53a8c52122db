"""Benchmark: model throughput on the available accelerator.

Prints ONE JSON line.  Top-level keys keep the flagship metric (lid-driven
cavity Re100 N=200, the reference's own headline config):

  {"metric": ..., "value": N, "unit": "particle-steps/s", "vs_baseline": N,
   "models": {...}}

``models`` adds one entry per paper example — cavity 2D/3D, natural
convection, fsi, cell polarization — so the recorded benchmark reflects
the framework, not its best case.  Each entry carries its own
``vs_baseline`` against the serial reference C++ build measured on this
machine (bench_baseline.json, produced by tools/measure_baseline.sh for
the flagship and tools/measure_baselines.py for the per-model rows; the 3D
cavity has no reference example, so it is ratioed against the 2D flagship
baseline per the round-1 verdict's convention).

Env knobs: BENCH_N (flagship cavity size, default 200), BENCH_CHUNKS
(flagship timed chunks, default 20), BENCH_MODELS=0 to skip the matrix
(flagship only, round-1 behavior).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sph_bvf_tpu.core.stepper import run_chunk, setup  # noqa: E402


def _barrier(state) -> float:
    """Force completion via a device->host readback.

    jax.block_until_ready alone can return before execution finishes on
    tunneled/remote PJRT backends; reading a reduction back is airtight.
    """
    return float(jnp.sum(state.rho))


def _time_model(build, dt, n_chunks, warmup_chunks=1):
    state, params, spec, sc = build()
    n_particles = int(state.n_valid)
    state = setup(state, params, spec, dt=dt or sc._dt)
    for _ in range(warmup_chunks):
        state = run_chunk(state, params, spec, spec.rebin_every)
    _barrier(state)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = run_chunk(state, params, spec, spec.rebin_every)
    _barrier(state)
    dt_wall = time.perf_counter() - t0
    steps = n_chunks * spec.rebin_every
    assert int(state.overflow) == 0, "lost atoms during bench"
    return n_particles, n_particles * steps / dt_wall


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    N = int(os.environ.get("BENCH_N", "200"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "20"))

    baselines = {}
    flagship_base = 1.1e6  # conservative recorded fallback
    bf = os.path.join(here, "bench_baseline.json")
    if os.path.exists(bf):
        with open(bf) as f:
            data = json.load(f)
        flagship_base = data["particle_steps_per_sec"]
        baselines = {
            k: v["particle_steps_per_sec"]
            for k, v in data.get("models", {}).items()
        }

    from sph_bvf_tpu.models import (  # noqa: E402
        cell_polarization,
        fsi,
        lid_cavity,
        lid_cavity3d,
        natural_convection,
    )

    n, ps = _time_model(
        lambda: lid_cavity.build(N=N, Re=100.0, rebin_every=10),
        dt=None, n_chunks=n_chunks,
    )
    out = dict(
        metric=f"lid-cavity Re100 N={N} particle-steps/s ({n} particles)",
        value=round(ps),
        unit="particle-steps/s",
        vs_baseline=round(ps / flagship_base, 2),
    )

    if os.environ.get("BENCH_MODELS", "1") != "0":
        # (name, build thunk, dt, timed chunks, baseline key)
        matrix = [
            ("lid_cavity3d_N100",
             lambda: lid_cavity3d.build(N=100), 1e-4, 3, None),
            ("natural_convection_N200",
             lambda: natural_convection.build(N=200), 1e-4, 10,
             "natural_convection"),
            ("fsi_nx60", lambda: fsi.build(nx=60), 1e-8, 10, "fsi"),
            ("cell_polarization_nx100",
             lambda: cell_polarization.build(nx=100), 1e-10, 10,
             "cell_polarization"),
        ]
        models = {}
        for name, build, dt, chunks, key in matrix:
            try:
                n_m, ps_m = _time_model(build, dt, chunks)
            except Exception as e:  # record, don't kill the flagship line
                models[name] = dict(error=f"{type(e).__name__}: {e}"[:200])
                continue
            base = baselines.get(key, flagship_base)
            models[name] = dict(
                value=round(ps_m), n=n_m,
                vs_baseline=round(ps_m / base, 2),
            )
        models["lid_cavity2d_N200"] = dict(
            value=round(ps), n=n,
            vs_baseline=round(ps / flagship_base, 2),
        )
        out["models"] = models

    print(json.dumps(out))


if __name__ == "__main__":
    main()
