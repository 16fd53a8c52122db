"""The time-stepping loop: one jitted Verlet step, scanned in chunks.

The stage sequence mirrors Verlet::run (verlet.cpp:240-353):

    step++                          (update->ntimestep++)
    initial_integrate               (Modify::initial_integrate)
    post_integrate fixes            (forcing / buffer clamps)
    [rebin between chunks]          (exchange/borders/neighbor->build)
    compute_forces                  (force_clear + Pair::compute, sweeps 1-3)
    post_force fixes                (buoyancy, chem_rxn, ssa_rxn, setforce)
    final_integrate                 (BVF bounce-back, kicks, density filter)
    SSA reactions + diffusion       (the Gillespie blocks; see core/ssa.py)
    end_of_step fixes               (dt/adaptive, buffer rho blend)

Because pair kernels re-test the true cutoff against fresh positions every
step, rebinning every ``rebin_every`` steps with a drift margin on the cell
size is *exact* (the reference's skin heuristic can miss pairs; see
core/state.py).  The whole chunk — rebin + ``rebin_every`` steps — is one
jit-compiled function; host callbacks (thermo/dump) run only at chunk
boundaries, the analog of output->write (verlet.cpp:349-352).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sph_bvf_tpu.core import fixes as fixes_mod
from sph_bvf_tpu.core.integrate import (
    IntegratorConfig,
    final_integrate,
    initial_integrate,
    setup_pre_force,
)
from sph_bvf_tpu.core.state import (
    Geometry,
    Params,
    State,
    rebin,
    rebin_droppable,
)
from sph_bvf_tpu.ops.pair import PairConfig, compute_forces


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static description of a simulation (hashable; closed over jit).

    ``mesh``: optional jax.sharding.Mesh for multi-device runs.  When set
    (and the mesh axis has more than one device), pass A and the rebin move
    run as per-device Pallas kernels under shard_map with ppermute halo
    exchange (ops/pair_pallas.pass_a_sharded, rebin_pallas.move_pallas_sharded)
    — the fast-path analog of the reference's brick ghost exchange; the
    remaining stages shard via GSPMD.  A Mesh is hashable, so the spec stays
    a valid static jit argument.
    """

    geom: Geometry
    pair: PairConfig
    integ: IntegratorConfig
    fixes: Tuple[Any, ...] = ()
    ssa: Optional[Any] = None  # SsaConfig (core/ssa.py), if stochastic species
    rebin_every: int = 10
    mesh: Optional[Any] = None  # jax.sharding.Mesh
    mesh_axis: str = "x"
    # In-run dynamic load rebalancing (parallel/balance.BalanceFix — the
    # fix_balance.cpp analog).  simulate() re-cuts Geometry.x_edges at
    # chunk boundaries when the slab imbalance crosses the threshold; each
    # accepted re-cut recompiles the step program (Geometry is static).
    balance: Optional[Any] = None


def step(state: State, params: Params, spec: ModelSpec) -> State:
    """One full Verlet step (verlet.cpp:240-353 stage order)."""
    state = dataclasses.replace(state, step=state.step + 1)
    state = initial_integrate(state, params, spec.integ)
    state = fixes_mod.apply_stage(state, params, spec.fixes, fixes_mod.POST_INTEGRATE)
    state = compute_forces(
        state, params, spec.geom, spec.pair, spec.mesh, spec.mesh_axis
    )
    state = fixes_mod.apply_stage(state, params, spec.fixes, fixes_mod.POST_FORCE)
    state = final_integrate(state, params, spec.integ)
    if spec.ssa is not None:
        from sph_bvf_tpu.core.ssa import ssa_step

        state = ssa_step(state, params, spec.geom, spec.ssa)
    state = fixes_mod.apply_stage(state, params, spec.fixes, fixes_mod.END_OF_STEP)
    return state


def _rebin_drop(spec: ModelSpec) -> tuple:
    return rebin_droppable(bool(getattr(spec.integ, "xsph_factor", 0.0)))


@partial(jax.jit, static_argnames=("spec",))
def _setup_jit(state: State, params: Params, spec: ModelSpec) -> State:
    state = rebin(state, spec.geom, drop=_rebin_drop(spec),
                  mesh=spec.mesh, mesh_axis=spec.mesh_axis)
    state = setup_pre_force(state)
    state = compute_forces(
        state, params, spec.geom, spec.pair, spec.mesh, spec.mesh_axis
    )
    # Modify::setup invokes post_force-style hooks (e.g. buoyancy/setforce
    # seed the step-0 forces, fix_ssa_tsdpd_buoyancy.cpp:97-99).
    state = fixes_mod.apply_stage(state, params, spec.fixes, fixes_mod.POST_FORCE)
    return state


def setup(state: State, params: Params, spec: ModelSpec, dt: float) -> State:
    """Verlet::setup (verlet.cpp:88-153): bin, vest=v, initial force eval."""
    state = dataclasses.replace(state, dt=jnp.asarray(dt, state.x.dtype))
    return _setup_jit(state, params, spec)


@partial(jax.jit, static_argnames=("spec", "n", "phase"))
def run_chunk(state: State, params: Params, spec: ModelSpec, n: int,
              phase: Optional[int] = None) -> State:
    """rebin + n steps, fused into one compiled program.

    ``phase``: the chunk's absolute starting step modulo
    ``integ.freq_filter`` (a STATIC host-side value — simulate and
    bench.py track it).  When given and the integrator consumes the
    Shepard filter, the chunk is segmented so only the steps where
    ``step % freq_filter == 0`` accumulate rhoAux1/rhoAux2; the rest run
    with ``density_filter_accs=False`` — exactly dead work elided
    (measured 7.2% of the flagship pass-A kernel).  Aligned chunking
    (freq a multiple of rebin_every, or vice versa) yields just two
    compiled variants over a run.  ``phase=None`` (the default for
    callers that do not track steps) accumulates every step, exactly as
    before."""
    state = rebin(state, spec.geom, drop=_rebin_drop(spec),
                  mesh=spec.mesh, mesh_axis=spec.mesh_axis)
    return scan_steps(state, params, spec, n, phase)


def scan_steps(state: State, params: Params, spec: ModelSpec, n: int,
               phase: Optional[int]) -> State:
    """n steps, segmented at the density-filter cadence when ``phase`` is
    given (see run_chunk).  Trace-time helper shared by run_chunk and
    run_chunk_ensemble — ``phase`` must be a static Python int or None."""
    freq = getattr(spec.integ, "freq_filter", 0)
    gate = (
        phase is not None
        and spec.pair.density_filter_accs
        and spec.integ.reads_rhoaux()
    )
    if not gate:
        def body(s, _):
            return step(s, params, spec), None

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    spec_ng = dataclasses.replace(
        spec, pair=dataclasses.replace(spec.pair, density_filter_accs=False)
    )

    def body_ng(s, _):
        return step(s, params, spec_ng), None

    i = 1
    while i <= n:
        j = i
        while j <= n and (phase + j) % freq != 0:
            j += 1
        if j > i:  # run of non-filter steps
            state, _ = jax.lax.scan(body_ng, state, None, length=j - i)
        if j <= n:  # step j lands on the filter cadence
            state = step(state, params, spec)
        i = j + 1
    return state


def simulate(
    state: State,
    params: Params,
    spec: ModelSpec,
    nsteps: int,
    callback=None,
    callback_every: Optional[int] = None,
    balance_log: Optional[list] = None,
):
    """Host driver: run nsteps, invoking ``callback(state)`` periodically.

    ``callback_every`` defaults to one chunk.  The callback sees the state at
    chunk granularity (dump/thermo cadence should be a multiple of
    rebin_every for exact-step output).

    With ``spec.balance`` set (parallel/balance.BalanceFix), the slab
    imbalance is checked every ``balance.every`` steps; past the threshold
    the x-column edges are re-cut from the live particle positions and the
    state is re-binned into the new geometry (the fix_balance.cpp analog).
    An accepted re-cut replaces ``spec.geom`` for the rest of the run —
    callbacks that captured the original geometry keep working (state
    shapes never change), but geometry-aware consumers should read the
    entries appended to ``balance_log`` (dicts with ``step``, ``geom``,
    and the before/after imbalance).
    """
    from sph_bvf_tpu.utils.thermo import StopSimulation

    chunk = spec.rebin_every
    cb_every = callback_every or chunk
    if cb_every % chunk:
        raise ValueError("callback_every must be a multiple of rebin_every")

    warned_mu = [False]

    def check(state):
        overflow = int(state.overflow)
        if overflow:
            raise RuntimeError(
                f"{overflow} particles exceeded cell capacity (lost atoms)"
            )
        drift = int(state.drift_violation)
        if drift:
            raise RuntimeError(
                f"{drift} particles drifted past the cell margin between "
                f"rebins — pair coverage may have been violated; lower "
                f"rebin_every or raise Scene.margin_frac"
            )
        # tau-leap regime guard (ops/pair.compute_ssa_mu_max): the SSA
        # diffusion truncates per-pair Poisson draws, valid only for
        # per-pair means << 1
        if params.n_ssa > 0 and not warned_mu[0]:
            from sph_bvf_tpu.ops.pair import compute_ssa_mu_max

            mu = float(compute_ssa_mu_max(state, params, spec.geom, spec.pair))
            if mu > 0.3:
                warned_mu[0] = True
                print(
                    f"[ssa] WARNING: max per-pair hop mean {mu:.3g} > 0.3 — "
                    f"the tau-leap truncation (poisson_terms="
                    f"{spec.pair.ssa_poisson_terms}) clips the hop-count "
                    f"tail; reduce dt or kappaSSA for exact-SSA statistics"
                )

    bal = spec.balance
    next_bal = bal.every if bal is not None else None

    # absolute step offset (nonzero on a checkpoint resume): the filter
    # phase below must follow state.step, not the local step count
    step0 = int(state.step)
    done = 0
    while done < nsteps:
        if bal is not None and done >= next_bal:
            next_bal += bal.every
            from sph_bvf_tpu.parallel.balance import rebalance

            new_geom, info = rebalance(state, spec.geom, bal)
            if new_geom is not None:
                # cross-geometry move: global sort path, no drift check
                # (slots still reflect the old edges)
                trial = rebin(
                    state, new_geom, drop=_rebin_drop(spec),
                    use_pallas=False, mesh=spec.mesh,
                    mesh_axis=spec.mesh_axis, drift_check=False,
                )
                if int(trial.overflow) == int(state.overflow):
                    state = trial
                    spec = dataclasses.replace(spec, geom=new_geom)
                    if balance_log is not None:
                        balance_log.append(
                            dict(step=done, geom=new_geom, **info)
                        )
                else:
                    print(
                        f"[balance] step {done}: re-cut rejected — new "
                        f"binning overflows cap={new_geom.cap} "
                        f"(imbalance {info.get('imbalance')})"
                    )
            elif balance_log is not None and "reason" in info:
                balance_log.append(dict(step=done, geom=None, **info))
        n = min(chunk, nsteps - done)
        freq = getattr(spec.integ, "freq_filter", 0)
        phase = (
            (step0 + done) % freq
            if spec.integ.reads_rhoaux() and spec.pair.density_filter_accs
            else None
        )
        state = run_chunk(state, params, spec, n, phase=phase)
        done += n
        if callback is not None and (done % cb_every == 0 or done >= nsteps):
            try:
                callback(state)
            except StopSimulation as e:
                print(f"[halt] {e}")
                check(state)
                return state
        # the counter readback costs a host roundtrip; amortize over chunks
        # but always check at the end so nothing slips through
        if done % (10 * chunk) == 0 or done >= nsteps:
            check(state)
    return state
