"""Benchmark: model throughput on the available accelerator.

Prints a JSON line after EVERY completed measurement (the driver keeps the
tail, so a later hang can never erase an earlier number).  Top-level keys
keep the flagship metric (lid-driven cavity Re100, the reference's own
headline config):

  {"metric": ..., "value": N, "unit": "particle-steps/s", "vs_baseline": N,
   "backend": "tpu", "parity": "ok", "models": {...}}

``models`` adds one entry per paper example — cavity 2D/3D, natural
convection, fsi, cell polarization — each ratioed against the serial
reference C++ build running the SAME model on this machine
(bench_baseline.json; the 3D entry has its own honest 3D serial baseline).

Wedge-proofing (round-3 verdict item #1 — a zero-value record must be
impossible):
  1. The probe subprocess executes a real DISPATCH + READBACK
     (``float(jnp.sum(...))``), not just device init: the tunneled axon
     backend has been seen passing ``jax.devices()`` and then wedging on
     the first dispatch.  A hung probe re-execs bench.py on the CPU
     backend with an honest ``backend_note`` label.
  2. Stage 1: a compile-cheap flagship entry (cavity N=50) is measured in
     its own timeboxed subprocess BEFORE the parent process ever touches
     the device.  On a cold compilation cache this lands a nonzero value
     within minutes; if the tunnel wedges mid-measurement the subprocess
     is killed and bench.py re-execs on CPU.  (The subprocess shares the
     persistent compilation cache, so a warm run costs seconds.)
  3. The full flagship (N=200) runs next, INLINE, budget permitting.
  4. The compiled Pallas-vs-jnp parity check runs AFTER the flagship
     numbers exist (it is the most compile-heavy stage on a cold cache —
     the exact round-3 failure had it first, burning the whole budget);
     when the budget is gone it is recorded as ``skipped (budget)``.
  5. ``BENCH_BUDGET_S`` (default 900) is a wall-clock budget: remaining
     matrix entries are skipped (recorded as such), never silently lost;
     a hard watchdog re-prints the latest JSON and exits 0 shortly after.

Env knobs: BENCH_N (flagship cavity size, default 200), BENCH_CHUNKS
(flagship timed chunks, default 20), BENCH_MODELS=0 to skip the matrix,
BENCH_BUDGET_S, BENCH_PROBE_S, BENCH_NO_PROBE=1 to skip the probe (also
skips stage 1 — the two-process dance is only safe when the parent has
not initialised the TPU client), BENCH_STAGE1 (internal: child mode).
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T_START = time.time()


def _cpu_reexec(note):
    """Re-exec bench.py on the CPU backend with an honest label.

    The axon sitecustomize overrides JAX_PLATFORMS unless its env var is
    removed, hence the PALLAS_AXON_POOL_IPS pop.
    """
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_NO_PROBE"] = "1"
    env["BENCH_BACKEND_NOTE"] = note
    sys.stdout.flush()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _probe_backend():
    """Probe device init AND a real dispatch in a subprocess.

    Returns the backend label to record.  Must run BEFORE importing jax.
    A wedged tunnel (init hang OR first-dispatch hang) triggers the CPU
    re-exec so the driver gets a labeled cpu number instead of a zero.
    """
    if os.environ.get("BENCH_NO_PROBE"):
        return os.environ.get("BENCH_BACKEND_NOTE", "unprobed")
    t = int(os.environ.get("BENCH_PROBE_S", "240"))
    env = dict(os.environ, BENCH_NO_PROBE="1")
    code = (
        "import jax, jax.numpy as jnp\n"
        "print('PLATFORM=' + jax.devices()[0].platform, flush=True)\n"
        "x = jnp.ones((128, 128))\n"
        "print('DISPATCH=%g' % float(jnp.sum(x)), flush=True)\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=t, capture_output=True, text=True, env=env,
        )
        plat, dispatched = "", False
        for line in (r.stdout or "").splitlines():
            if line.startswith("PLATFORM="):
                plat = line.split("=", 1)[1]
            if line.startswith("DISPATCH=16384"):
                dispatched = True
        ok = r.returncode == 0 and plat and dispatched
    except subprocess.TimeoutExpired:
        ok, plat = False, ""
    if ok:
        return plat
    _cpu_reexec("cpu-fallback-tpu-probe-failed")


_BACKEND = _probe_backend()

import jax  # noqa: E402

# Persistent compilation cache (verified working through the axon tunnel):
# repeat runs at the same tree skip the multi-minute Mosaic/XLA compiles,
# so the driver's budget-capped capture completes the whole matrix.
# /root/.cache survives the /tmp wipes between rounds.  NOTE: the cache is
# keyed to the backend instance — a fresh tunnel incarnation misses on
# every program (CLAUDE.md), which is exactly why stage 1 exists.
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


def _time_model(build, dt, n_chunks, warmup_chunks=1, allow_gating=True):
    state, params, spec, sc = build()
    n_particles = int(state.n_valid)
    state = setup(state, params, spec, dt=dt or sc._dt)
    # filter-cadence phase tracking (mirrors simulate): chunks whose steps
    # all fall between density-filter events elide the rhoAux accumulation.
    # allow_gating=False forces the single ungated program — stage 1 uses
    # it because gating doubles the cold-compile count and the stage-1
    # subprocess must produce its early signal inside the parent's 600s
    # wedge-detection timeout even on a freshly cold cache.
    freq = getattr(spec.integ, "freq_filter", 0)
    gated = (allow_gating and spec.integ.reads_rhoaux()
             and spec.pair.density_filter_accs)
    done = int(state.step)

    def chunk(s):
        phase = (done % freq) if gated else None
        return run_chunk(s, params, spec, spec.rebin_every, phase=phase)

    for _ in range(warmup_chunks):
        state = chunk(state)
        done += spec.rebin_every
    # pre-compile every phase variant the timed loop will hit, so compile
    # time never lands inside the timing window: the phase sequence is
    # periodic, so running whole extra warmup chunks until every phase in
    # one period has executed covers the timed loop too (aligned cadences
    # give <= 2 variants)
    if gated:
        need = {(done + k * spec.rebin_every) % freq for k in range(n_chunks)}
        need -= {(done - spec.rebin_every) % freq}  # warmed already
        while need:
            need.discard(done % freq)
            state = chunk(state)
            done += spec.rebin_every
    _barrier(state)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = chunk(state)
        done += spec.rebin_every
    _barrier(state)
    dt_wall = time.perf_counter() - t0
    steps = n_chunks * spec.rebin_every
    assert int(state.overflow) == 0, "lost atoms during bench"
    return n_particles, n_particles * steps / dt_wall


def _stage1_child():
    """Child mode: measure ONE compile-cheap flagship entry, print one
    JSON line, exit.  The parent parses it; a hang here is killed by the
    parent's timeout and triggers the CPU re-exec."""
    from sph_bvf_tpu.models import lid_cavity

    N = int(os.environ.get("BENCH_STAGE1", "50"))
    n, ps = _time_model(
        lambda: lid_cavity.build(N=N, Re=100.0, rebin_every=10),
        dt=None, n_chunks=2, allow_gating=False,
    )
    print(json.dumps({"stage1": True, "N": N, "n": n, "value": round(ps)}),
          flush=True)


if os.environ.get("BENCH_STAGE1"):
    _stage1_child()
    sys.exit(0)


def _run_stage1(budget_left):
    """Run the stage-1 subprocess; return its parsed record or None.

    Only called before the parent has initialised the TPU client (one
    TPU process at a time — concurrent clients look like hangs)."""
    t = max(120.0, min(600.0, budget_left))
    env = dict(os.environ, BENCH_NO_PROBE="1", BENCH_STAGE1="50")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=t, capture_output=True, text=True, env=env,
        )
    except subprocess.TimeoutExpired:
        _cpu_reexec("cpu-fallback-tpu-wedged-during-stage1")
    for line in reversed((r.stdout or "").splitlines()):
        if line.startswith('{"stage1"'):
            try:
                return json.loads(line)
            except ValueError:
                break
    # nonzero rc / no line: a real error, not a wedge — record and let the
    # parent try inline (the watchdog still bounds a surprise hang)
    tail = ((r.stderr or "") + (r.stdout or ""))[-300:]
    _OUT["stage1_error"] = f"rc={r.returncode}: {tail}"
    return None


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
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    threading.Thread(
        target=_watchdog, args=(budget_s + 420,), daemon=True
    ).start()

    def left():
        return budget_s - (time.time() - T_START)

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

    # Backend determination WITHOUT initialising the client when the probe
    # already told us (stage 1 must run before the parent's client exists)
    if _BACKEND in ("tpu", "axon"):
        on_tpu, platform_label = True, _BACKEND
    else:
        platform_label = jax.devices()[0].platform
        on_tpu = platform_label in ("tpu", "axon")

    N = int(os.environ.get("BENCH_N", "200" if on_tpu else "50"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "20" if on_tpu else "3"))

    _OUT.update(
        metric=f"lid-cavity Re100 N={N} particle-steps/s",
        value=0, unit="particle-steps/s", vs_baseline=0.0,
        backend=platform_label,
        backend_note=_BACKEND,
    )
    # a parsable line exists before any device execution
    emit()

    models = _OUT.setdefault("models", {})

    # ---- stage 1: guaranteed-early nonzero number (TPU, probed path only)
    if on_tpu and not os.environ.get("BENCH_NO_PROBE"):
        s1 = _run_stage1(left())
        if s1:
            # no recorded N=50 serial baseline exists — the ratio against
            # the N=200 flagship baseline is approximate (ADVICE r4); the
            # record says so instead of implying an apples-to-apples speedup
            base = baselines.get("lid_cavity_n50", flagship_base)
            approx = "lid_cavity_n50" not in baselines
            _OUT.update(
                metric=(f"lid-cavity Re100 N={s1['N']} particle-steps/s "
                        f"({s1['n']} particles; stage1 — upgraded to "
                        f"N={N} below if budget allowed)"),
                value=s1["value"],
                vs_baseline=round(s1["value"] / base, 2),
            )
            models["lid_cavity2d_n50_stage1"] = dict(
                value=s1["value"], n=s1["n"],
                vs_baseline=round(s1["value"] / base, 2),
                **({"vs_baseline_note":
                    "approximate: vs the N=200 serial baseline"}
                   if approx else {}),
            )
            emit()

    # ---- full flagship, inline
    if left() > 60 or _OUT["value"] == 0:
        try:
            n, ps = _time_model(
                lambda: lid_cavity_mod.build(N=N, Re=100.0, rebin_every=10),
                dt=None, n_chunks=n_chunks,
            )
            _OUT.update(
                metric=(f"lid-cavity Re100 N={N} particle-steps/s "
                        f"({n} particles)"),
                value=round(ps),
                vs_baseline=round(ps / flagship_base, 2),
            )
            models["lid_cavity2d"] = dict(
                value=round(ps), n=n,
                vs_baseline=round(ps / flagship_base, 2),
            )
        except Exception as e:
            models["lid_cavity2d"] = dict(
                error=f"{type(e).__name__}: {e}"[:200])
        emit()
    else:
        models["lid_cavity2d"] = dict(
            skipped=f"budget ({budget_s:.0f}s) — stage1 value stands")
        emit()

    # ---- parity AFTER the flagship (most compile-heavy stage cold)
    if on_tpu:
        if left() > 90:
            _OUT["parity"] = "RUNNING (wedged here if this is the last line)"
            emit()
            try:
                _OUT["parity"] = _parity_check()
            except Exception as e:
                _OUT["parity"] = f"ERROR: {type(e).__name__}: {e}"[:200]
        else:
            _OUT["parity"] = "skipped (budget)"
        emit()

    # ---- model matrix
    if os.environ.get("BENCH_MODELS", "1") != "0":
        # (name, build thunk, dt, timed chunks, baseline key, gated)
        # gated=False on the 3D leg: its chunk program is by far the most
        # expensive compile in the matrix, and cadence gating doubles the
        # variant count — on a freshly cold cache (every tunnel
        # re-establishment) that pushed the leg past the driver-scale
        # budget.  The gating win is a few percent; fitting the matrix in
        # the budget is worth more.
        if on_tpu:
            # cheap-to-build legs first: on a cold compile cache the 3D
            # N=100 leg's 1.19M-particle host build + compile can eat the
            # whole remaining budget
            matrix = [
                ("fsi_nx60", lambda: fsi.build(nx=60), 1e-8, 10, "fsi",
                 True),
                ("cell_polarization_nx100",
                 lambda: cell_polarization.build(nx=100), 1e-10, 10,
                 "cell_polarization", True),
                ("natural_convection_N200",
                 lambda: natural_convection.build(N=200), 1e-4, 10,
                 "natural_convection", True),
                ("lid_cavity3d_N100",
                 lambda: lid_cavity3d.build(N=100), 1e-4, 3, "lid_cavity3d",
                 False),
            ]
        else:
            matrix = [
                ("lid_cavity3d_N24",
                 lambda: lid_cavity3d.build(N=24), 1e-4, 2, "lid_cavity3d",
                 False),
                ("natural_convection_N50",
                 lambda: natural_convection.build(N=50), 1e-4, 2,
                 "natural_convection", True),
                ("fsi_nx30", lambda: fsi.build(nx=30), 1e-8, 2, "fsi",
                 True),
                ("cell_polarization_nx50",
                 lambda: cell_polarization.build(nx=50), 1e-10, 2,
                 "cell_polarization", True),
            ]
        for name, build, dt, chunks, key, gated in matrix:
            if left() <= 0:
                models[name] = dict(skipped=f"budget ({budget_s:.0f}s)")
                emit()
                continue
            try:
                n_m, ps_m = _time_model(build, dt, chunks,
                                        allow_gating=gated)
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


from sph_bvf_tpu.models import (  # noqa: E402
    cell_polarization,
    fsi,
    lid_cavity as lid_cavity_mod,
    lid_cavity3d,
    natural_convection,
)


if __name__ == "__main__":
    main()
