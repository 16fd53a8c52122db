"""Per-stage timing — the analog of Timer categories + Finish::end.

The reference wraps each Verlet stage in Timer stamps (PAIR/NEIGH/COMM/
MODIFY/OUTPUT, timer.h:25-28) and prints a breakdown table at the end of the
run (finish.cpp:64).  Under jit the stages fuse into one program, so the
breakdown here is measured by compiling each stage separately and timing it
against a barrier — a profiling mode, not run-loop instrumentation.

Caveat (documented in the project verify skill): on tunneled PJRT backends
jax.block_until_ready can return early, so barriers use a device->host
readback of a reduction.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from sph_bvf_tpu.core import fixes as fixes_mod
from sph_bvf_tpu.core.integrate import final_integrate, initial_integrate
from sph_bvf_tpu.core.state import rebin
from sph_bvf_tpu.ops.pair import compute_forces


def _barrier(tree) -> float:
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def profile_step(state, params, spec, repeats: int = 20) -> dict:
    """Per-stage ms breakdown: PAIR (forces), NEIGH (rebin), MODIFY
    (integrate + fixes).  Returns {stage: ms_per_call}."""
    stages = {
        "PAIR(force kernels)": jax.jit(
            lambda s: compute_forces(s, params, spec.geom, spec.pair)
        ),
        "NEIGH(rebin)": jax.jit(lambda s: rebin(s, spec.geom)),
        "MODIFY(integrate+fixes)": jax.jit(
            lambda s: fixes_mod.apply_stage(
                final_integrate(
                    initial_integrate(s, params, spec.integ), params, spec.integ
                ),
                params,
                spec.fixes,
                fixes_mod.POST_FORCE,
            )
        ),
    }
    # On tunneled backends per-call dispatch (~ms RPC round trips) hides
    # stage compute entirely, so each stage is iterated ON DEVICE with a
    # lax.scan: one dispatch, `repeats` stage executions, one readback.
    def scanned(fn):
        def run(s):
            out, _ = jax.lax.scan(
                lambda c, _: (fn(c), None), s, None, length=repeats
            )
            return out

        return jax.jit(run)

    noop = scanned(lambda s: s)
    s = noop(state)
    _barrier(s)
    t0 = time.perf_counter()
    s = noop(s)
    _barrier(s)
    overhead = (time.perf_counter() - t0) * 1e3  # one dispatch+readback

    out = {}
    for name, fn in stages.items():
        sfn = scanned(fn)
        s = sfn(state)  # compile + warm
        _barrier(s)
        t0 = time.perf_counter()
        s = sfn(state)
        _barrier(s)
        out[name] = max(
            ((time.perf_counter() - t0) * 1e3 - overhead) / repeats, 0.0
        )
    out["_dispatch_overhead"] = overhead
    return out


def print_breakdown(state, params, spec, repeats: int = 20, nsteps_hint=None):
    """Finish::end-style table."""
    ms = profile_step(state, params, spec, repeats)
    neigh_amort = ms["NEIGH(rebin)"] / max(spec.rebin_every, 1)
    total = ms["PAIR(force kernels)"] + ms["MODIFY(integrate+fixes)"] + neigh_amort
    print(f"{'stage':<28s} {'ms/call':>9s} {'%step':>7s}")
    rows = [
        ("PAIR(force kernels)", ms["PAIR(force kernels)"], ms["PAIR(force kernels)"]),
        ("NEIGH(rebin, amortized)", ms["NEIGH(rebin)"], neigh_amort),
        ("MODIFY(integrate+fixes)", ms["MODIFY(integrate+fixes)"],
         ms["MODIFY(integrate+fixes)"]),
    ]
    for name, per_call, per_step in rows:
        print(f"{name:<28s} {per_call:9.3f} {100.0 * per_step / total:6.1f}%")
    n = int(state.n_valid)
    print(f"~{total:.3f} ms/step -> {n / total * 1e3 / 1e6:.2f}M particle-steps/s "
          f"({n} particles; dispatch+readback overhead "
          f"{ms['_dispatch_overhead']:.2f} ms/roundtrip excluded)")
    return ms
