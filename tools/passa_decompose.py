"""Pass-A roofline-gap decomposition (round-3 verdict #2).

Pass A is 77-88% of every step at ~2.5x the VPU roofline; this harness
measures WHERE the gap lives by timing the compiled kernel against
stripped variants on the real TPU:

  * ``stage``   — the loop/DMA skeleton: same grid, blocks, staging and
                  offset loop, but the physics body is one masked madd +
                  reduce.  Cost above this is VPU compute.
  * ``geom``    — skeleton + the shared pair geometry every term needs
                  (dx, r^2, sqrt, validity mask, both Lucy kernel
                  evaluations) + 3 reduces.  ``geom - stage`` prices the
                  geometry; ``full - geom`` prices the physics terms.
  * ``nosolid`` — full physics minus the BVF wall terms (phi, nw,
                  artificial stress) and their staging rows: the upper
                  bound of what per-block solid-window gating (the
                  _elastic_lanes trick applied to walls) could recover on
                  wall-only models, where only boundary blocks have solid
                  lanes in their stencil windows.
  * ``noswitch``— full minus the Sun-2018 pressure-switch select chain.
  * ``capK``    — full physics at a reduced slot capacity K (cavity
                  occupancy is 9): prices the padded j-candidate rows.
                  (NOT a production setting — caps 10-13 overflow once
                  the cavity vortex develops; timing-only.)

Variants patch ``ops.pair._pass_a_offset`` (re-imported by the Pallas
driver at trace time) or flip PairConfig switches; each timing jits a
fresh wrapper so nothing is cached across variants.  Timing runs the
profiler's scanned-loop pattern: one dispatch, ``repeats`` on-device
iterations, one readback barrier.

Usage (real TPU):  python tools/passa_decompose.py [--n 200] [--repeats 50]
Emits one JSON line per variant, then a summary decomposition.
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

import sph_bvf_tpu.ops.pair as pair_mod  # noqa: E402
from sph_bvf_tpu.core.stepper import setup  # noqa: E402
from sph_bvf_tpu.models import lid_cavity  # noqa: E402
from sph_bvf_tpu.ops.pair import (  # noqa: E402
    _dot3,
    _pair_delta,
    compute_forces,
    lucy_w_ih,
    lucy_wfd_ih,
)

_REAL = pair_mod._pass_a_offset


def _v_stage(I, J, coeffs, params, cfg, dt, step, notself, acc, seed=0,
             pbc=(), defer_elastic_forces=False):
    f32 = I["x"].dtype
    mask = (I["valid"] & J["valid"] & notself).astype(f32)
    acc["num_den"] += jnp.sum(mask * J["m"], axis=-2)
    return acc


def _v_geom(I, J, coeffs, params, cfg, dt, step, notself, acc, seed=0,
            pbc=(), defer_elastic_forces=False):
    f32 = I["x"].dtype
    dx = _pair_delta(I["x"], J["x"], pbc)
    rsq = _dot3(dx, dx)
    r = jnp.sqrt(rsq)
    mask = (I["valid"] & J["valid"] & notself).astype(f32)
    wfd = lucy_wfd_ih(r, coeffs["inv_h"], cfg.dim) * mask
    wf = lucy_w_ih(r, coeffs["inv_h"], cfg.dim) * mask
    acc["num_den"] += jnp.sum(J["V2"] * wf, axis=-2)
    acc["drho"] += jnp.sum(wfd * J["m_rho"] * rsq, axis=-2)
    acc["f"] += jnp.sum(wfd[None] * dx, axis=-2)
    return acc


_REAL_BODY = _REAL


def _v_norhoaux(I, J, coeffs, params, cfg, dt, step, notself, acc, seed=0,
                pbc=(), defer_elastic_forces=False):
    """Full physics minus the density-filter accumulators (rhoAux1/2) —
    prices the cadence-gating idea: they are consumed only every
    freq_filter=20 steps, so a two-program chunk could skip them on 19/20
    steps exactly."""
    acc = _REAL_BODY(I, J, coeffs, params, cfg, dt, step, notself, acc,
                     seed=seed, pbc=pbc,
                     defer_elastic_forces=defer_elastic_forces)
    # the sums already happened; zeroing keeps shapes while letting the
    # compiler DCE them (they feed only these accumulator outputs)
    acc["rhoAux1"] = jnp.zeros_like(acc["rhoAux1"])
    acc["rhoAux2"] = jnp.zeros_like(acc["rhoAux2"])
    return acc


def _barrier(state) -> float:
    return float(jnp.sum(state.rho))


def _time_variant(state, params, geom, cfg, repeats, patch=None, outer=7):
    """ms per compute_forces call via the scanned-loop pattern.

    Round-5 low-variance mode (round-4 verdict #9): ONE pinned compiled
    program, ``outer`` timed executions after two warm runs, report the
    MINIMUM (the tunnel adds one-sided latency noise, so min is the
    estimator of the device time; the median-min spread is emitted so a
    degraded link is visible).  Two consecutive tool runs agree within ~3%
    where the old single-shot timing wandered ±15%.
    """
    pair_mod._pass_a_offset = patch or _REAL
    try:
        def run(s):
            def body(c, _):
                out = compute_forces(c, params, geom, cfg)
                # keep each iteration data-dependent on the last so the
                # scan body cannot be hoisted (CLAUDE.md jit-bench trap)
                c = dataclasses.replace(c, x=c.x + 1e-30 * out.f)
                return c, ()

            s, _ = jax.lax.scan(body, s, None, length=repeats)
            return s

        fn = jax.jit(run)
        s = fn(state)  # compile + warm
        _barrier(s)
        _barrier(fn(state))  # second warm (first post-compile run can
        # still pay one-time executable/transfer setup)
        times = []
        for _ in range(outer):
            t0 = time.perf_counter()
            s = fn(state)
            _barrier(s)
            times.append((time.perf_counter() - t0) * 1e3 / repeats)
        times.sort()
        med = times[len(times) // 2]
        _time_variant.last_spread = (med - times[0]) / max(times[0], 1e-12)
        return times[0]
    finally:
        pair_mod._pass_a_offset = _REAL


def _time_build(state, params, geom, cfg, repeats):
    """ms for the PF9 materialization ALONE (the 9 shifted XLA copies the
    preshift kernel reads) — prices the XLA-side cost so the in-kernel
    rotation share can be solved from full/preshift/build."""
    import sph_bvf_tpu.core.halo as halo_mod
    from sph_bvf_tpu.ops.pair_pallas import (
        _field_layout, _kernel_block, _pack, _round_up,
    )

    BLK = _kernel_block(geom, 0, False)
    max_off = halo_mod.max_flat_offset(geom)
    sgx, sgy, sgz = halo_mod.ghosted_strides(geom)
    off_flats = [
        o[0] * sgx + o[1] * sgy + o[2] * sgz
        for o in geom.stencil_offsets()
    ]

    def build(s):
        pf = pair_mod._per_particle(s, params, cfg)
        PF = _pack(pf, _field_layout(params, cfg), geom.cap,
                   geom.ncells_total)
        PFg = halo_mod.add_ghosts(PF, geom)
        NCg = PFg.shape[-1]
        NC_pad = _round_up(NCg, BLK)
        PFp = halo_mod.assemble_padded(
            PFg, BLK, NC_pad, halo_mod.wrap_x(geom), max_off
        )
        views = [
            jax.lax.slice_in_dim(PFp, BLK + o, BLK + o + NC_pad, axis=-1)
            for o in off_flats
        ]
        # materialize every view to HBM (they are pallas operands in real
        # use); without the barrier XLA would fuse the tiny consumption
        # below into the slices and copy almost nothing
        views = jax.lax.optimization_barrier(tuple(views))
        # fold to one scalar-ish carry so the scan can't hoist the copies
        return sum(v[0, 0, :1] for v in views)

    def run(s):
        def body(c, _):
            out = build(dataclasses.replace(s, x=s.x + 1e-30 * c[0]))
            return out, ()

        c, _ = jax.lax.scan(
            body, jnp.zeros((1,), s.x.dtype), None, length=repeats)
        return c

    fn = jax.jit(run)
    _ = float(jnp.sum(fn(state)))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(state)))
        times.append((time.perf_counter() - t0) * 1e3 / repeats)
    times.sort()
    _time_variant.last_spread = (
        times[len(times) // 2] - times[0]) / max(times[0], 1e-12)
    return times[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=50)
    ap.add_argument("--caps", type=int, nargs="*", default=[10])
    ap.add_argument("--only", type=str, default="",
                    help="comma list of variants to run "
                         "(full,preshift,build,stage,geom,nosolid,noswitch)")
    ap.add_argument("--blk", type=int, default=0,
                    help="override the kernel lane-block size")
    args = ap.parse_args()

    state, params, spec, _ = lid_cavity.build(N=args.n, Re=100.0)
    state = setup(state, params, spec, dt=1e-4)
    geom, cfg = spec.geom, spec.pair
    n = int(state.n_valid)
    out = {"n_particles": n, "cap": geom.cap, "base_occ": geom.base_occ,
           "backend": jax.devices()[0].platform}

    def emit(k, ms):
        out[k] = round(ms, 4)
        print(json.dumps({k: out[k], "ns_per_particle": round(
            ms * 1e6 / n, 2),
            "spread": round(getattr(_time_variant, "last_spread", 0.0), 3),
        }), flush=True)

    if args.blk:
        import sph_bvf_tpu.ops.pair_pallas as pp

        real_kb = pp._kernel_block
        pp._kernel_block = lambda geom, block=0, rowloop=None: max(
            args.blk, real_kb(geom, args.blk, rowloop))
        out["blk"] = args.blk

    want = set(args.only.split(",")) if args.only else None
    run = lambda k: want is None or k in want

    if run("full"):
        emit("full_ms", _time_variant(
            state, params, geom, cfg, args.repeats))
    # round-5 structural variant: pre-shifted HBM views, aligned block
    # refs, zero in-kernel rotation (ops/pair_pallas._call_preshift)
    if run("preshift"):
        emit("preshift_ms", _time_variant(
            state, params, geom,
            dataclasses.replace(cfg, preshift_window=True), args.repeats))
    if run("build"):
        emit("build_ms", _time_build(state, params, geom, cfg,
                                     args.repeats))
    if run("norhoaux"):
        emit("norhoaux_ms", _time_variant(
            state, params, geom, cfg, args.repeats, patch=_v_norhoaux))
    if run("stage"):
        emit("stage_ms", _time_variant(
            state, params, geom, cfg, args.repeats, patch=_v_stage))
    if run("geom"):
        emit("geom_ms", _time_variant(
            state, params, geom, cfg, args.repeats, patch=_v_geom))
    if run("nosolid"):
        emit("nosolid_ms", _time_variant(
            state, params, geom,
            dataclasses.replace(cfg, solids_present=False,
                                free_solids_present=False,
                                elastic_present=False),
            args.repeats))
    if run("noswitch"):
        emit("noswitch_ms", _time_variant(
            state, params, geom,
            dataclasses.replace(cfg, pressure_switch=False), args.repeats))
    if want is None:
        for capk in args.caps:
            st2, pr2, sp2, _ = lid_cavity.build(N=args.n, Re=100.0,
                                                cap=capk)
            st2 = setup(st2, pr2, sp2, dt=1e-4)
            emit(f"cap{capk}_ms", _time_variant(
                st2, pr2, sp2.geom, sp2.pair, args.repeats))

    if want is None:
        full, stage = out["full_ms"], out["stage_ms"]
        geom_ms = out["geom_ms"]
        out["decomposition"] = {
            "skeleton(DMA+loop+reduce)": round(stage / full, 3),
            "pair_geometry(dx,sqrt,mask,lucy)": round(
                (geom_ms - stage) / full, 3),
            "physics_terms": round((full - geom_ms) / full, 3),
            "bvf_wall_terms(phi,nw,f_art)": round(
                (full - out["nosolid_ms"]) / full, 3),
            "pressure_switch": round(
                (full - out["noswitch_ms"]) / full, 3),
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
