"""Benchmark: lid-driven cavity throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "particle-steps/s", "vs_baseline": N}

The flagship config is the reference's lid-driven cavity (Re100) scaled to
N=200 (examples/ssa-tsdpd/lid_driven_cavity/Re100_N200): ~40k fluid + walls.
``vs_baseline`` compares against the single-process reference C++ build
measured on this machine (bench_baseline.json, produced by
tools/measure_baseline.sh); if absent, a conservative recorded measurement
is used.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sph_bvf_tpu.core.stepper import run_chunk, setup  # noqa: E402
from sph_bvf_tpu.models import lid_cavity  # noqa: E402


def _barrier(state) -> float:
    """Force completion via a device->host readback.

    jax.block_until_ready alone can return before execution finishes on
    tunneled/remote PJRT backends; reading a reduction back is airtight.
    """
    return float(jnp.sum(state.rho))


def main():
    N = int(os.environ.get("BENCH_N", "200"))
    state, params, spec, sc = lid_cavity.build(N=N, Re=100.0, rebin_every=10)
    n_particles = int(state.n_valid)

    state = setup(state, params, spec, dt=sc._dt)
    # warmup (compile)
    state = run_chunk(state, params, spec, spec.rebin_every)
    _barrier(state)

    n_chunks = int(os.environ.get("BENCH_CHUNKS", "20"))
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = run_chunk(state, params, spec, spec.rebin_every)
    _barrier(state)
    dt_wall = time.perf_counter() - t0
    steps = n_chunks * spec.rebin_every
    ps = n_particles * steps / dt_wall

    baseline_file = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            baseline = json.load(f)["particle_steps_per_sec"]
    else:
        baseline = 1.1e6  # measured: reference serial build, this host, N=200

    print(
        json.dumps(
            dict(
                metric=f"lid-cavity Re100 N={N} particle-steps/s ({n_particles} particles)",
                value=round(ps),
                unit="particle-steps/s",
                vs_baseline=round(ps / baseline, 2),
            )
        )
    )


if __name__ == "__main__":
    main()
