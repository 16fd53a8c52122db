"""Pallas pass-A kernel vs the jnp reference path (interpret mode on CPU).

The kernel is bit-compatible physics with different summation order, so
agreement is to f32 rounding.  This is the CI stand-in for the on-TPU
equivalence check (same comparison, compiled, runs in the bench harness).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sph_bvf_tpu.core.stepper import setup
from sph_bvf_tpu.models import lid_cavity
from sph_bvf_tpu.ops.pair import PairConfig, _per_particle, compute_forces
from sph_bvf_tpu.ops.pair_pallas import _acc_layout, pass_a_pallas


@pytest.fixture(scope="module")
def cavity():
    state, params, spec, _ = lid_cavity.build(N=16, Re=100.0)
    # f32 state (the kernel path is f32-only; tests default to f64 elsewhere)
    state = setup(state, params, spec, dt=1e-4)
    return state, params, spec


def test_kernel_matches_jnp_path(cavity):
    state, params, spec = cavity
    cfg = spec.pair
    ref = compute_forces(
        state, params, spec.geom, dataclasses.replace(cfg, use_pallas=False)
    )
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(pf, params, spec.geom, cfg, block=128, interpret=True)

    for name, _ in _acc_layout(params, cfg):
        got = jnp.asarray(acc[name])
        want = getattr(ref, name)
        if name in ("num_den", "rhoAux2"):
            # the driver post-masks these to 1 on invalid slots
            got = jnp.where(state.valid, got, 1.0)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
        assert err <= 5e-6 * scale, (name, err, scale)


def test_kernel_handles_species(cavity):
    """Species transport (C/Q) through the kernel, mechanics variant."""
    state, params, spec, _ = lid_cavity.build(N=12, Re=100.0)
    # give the model one species with nonzero kappa
    T = params.ntypes
    params = dataclasses.replace(
        params,
        kappa=jnp.full((T, T, 1), 0.05, jnp.float32),
    )
    NC, cap = spec.geom.ncells_total, spec.geom.cap
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.uniform(0, 1, size=(1, cap, NC)), jnp.float32)
    state = dataclasses.replace(
        state, C=C, Q=jnp.zeros((1, cap, NC), jnp.float32)
    )
    state = setup(
        state, params,
        dataclasses.replace(spec, pair=dataclasses.replace(spec.pair, use_pallas=False)),
        dt=1e-4,
    )
    cfg = PairConfig.mechanics(
        dim=2, solids_present=True, elastic_present=False, weighted_solid=False
    )
    ref = compute_forces(
        state, params, spec.geom, dataclasses.replace(cfg, use_pallas=False)
    )
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(pf, params, spec.geom, cfg, block=128, interpret=True)
    for name in ("Q", "ddx", "f"):
        err = float(jnp.max(jnp.abs(jnp.asarray(acc[name]) - getattr(ref, name))))
        scale = max(float(jnp.max(jnp.abs(getattr(ref, name)))), 1e-12)
        assert err <= 5e-6 * scale, (name, err, scale)


def test_kernel_3d_rowloop_matches_jnp_path():
    """3D uses the fori_loop-over-i-rows kernel shape (27 offsets); the
    trip count comes from per-block max occupancy, so empty high slots are
    skipped — results must still match the jnp path exactly."""
    from sph_bvf_tpu.models import lid_cavity3d

    state, params, spec, _ = lid_cavity3d.build(N=6)
    state = setup(state, params, spec, dt=1e-4)
    cfg = spec.pair
    ref = compute_forces(
        state, params, spec.geom, dataclasses.replace(cfg, use_pallas=False)
    )
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(pf, params, spec.geom, cfg, block=128, interpret=True)
    for name, _ in _acc_layout(params, cfg):
        got = jnp.asarray(acc[name])
        want = getattr(ref, name)
        if name in ("num_den", "rhoAux2"):
            got = jnp.where(state.valid, got, 1.0)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
        assert err <= 5e-6 * scale, (name, err, scale)
