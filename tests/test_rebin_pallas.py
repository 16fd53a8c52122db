"""Pallas rebin-move kernel vs the jnp sort-based rebin (interpret mode).

The kernel compacts candidates in the same (cell, old flat slot) order the
jnp path sorts by, so slot assignments — hence every state leaf — must be
IDENTICAL, not merely equivalent, whenever the drift contract holds.
"""

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np
import pytest

import sph_bvf_tpu.core.rebin_pallas as rp
from sph_bvf_tpu.core import state as S
from sph_bvf_tpu.core.stepper import _rebin_drop, setup
from sph_bvf_tpu.models import lid_cavity


def _force_interpret(monkeypatch):
    """Route rebin through the kernel (interpret mode) on this CPU host.

    Applied only AFTER scene build + setup: patching earlier would make
    setup()'s jitted rebin compile the interpreted kernel graph, which
    takes minutes on CPU.
    """
    monkeypatch.setattr(rp, "rebin_pallas_eligible", lambda *a, **k: True)
    monkeypatch.setattr(
        rp, "move_pallas", functools.partial(rp.move_pallas, interpret=True)
    )


def _drifted_cavity(seed=0, drift_scale=0.9):
    state, params, spec, _ = lid_cavity.build(N=16, Re=100.0)
    state = setup(state, params, spec, dt=1e-4)
    geom = spec.geom
    rng = np.random.default_rng(seed)
    dx = rng.uniform(-1.0, 1.0, size=state.x.shape).astype(np.float32)
    dx[2] = 0.0
    budget = drift_scale * geom.drift_budget
    state = dataclasses.replace(
        state,
        x=state.x + jnp.where(state.valid, jnp.asarray(dx) * budget, 0.0),
        # give every persistent leaf a recognizable value so a mis-moved
        # row shows up (v pattern also perturbs the bounce physics; fine)
        v=state.v
        + jnp.asarray(rng.normal(0, 1e-3, state.v.shape), np.float32),
    )
    return state, spec, geom


def _assert_states_equal(a, b):
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if f.name == "key":
            continue
        assert np.array_equal(np.asarray(va), np.asarray(vb)), f.name


def test_kernel_matches_jnp_rebin(monkeypatch):
    state, spec, geom = _drifted_cavity()
    _force_interpret(monkeypatch)
    assert state.x.dtype == jnp.float32
    ref = S.rebin(state, geom, use_pallas=False)
    got = S.rebin(state, geom, use_pallas=True)
    assert int(ref.overflow) == 0
    _assert_states_equal(ref, got)


def test_kernel_matches_with_drop(monkeypatch):
    state, spec, geom = _drifted_cavity(seed=1)
    _force_interpret(monkeypatch)
    drop = _rebin_drop(spec)
    ref = S.rebin(state, geom, drop=drop, use_pallas=False)
    got = S.rebin(state, geom, drop=drop, use_pallas=True)
    _assert_states_equal(ref, got)


@pytest.mark.slow
def test_kernel_matches_jnp_rebin_3d(monkeypatch):
    """The tiled-plane 3D move (rebin_pallas._move_call_tiled3d): same
    candidate order as 2D — slot-major then flat-offset ascending — so on a
    non-periodic grid the slot assignment must be IDENTICAL to the jnp
    sort, in all three axes of drift."""
    from sph_bvf_tpu.models import lid_cavity3d

    state, params, spec, _ = lid_cavity3d.build(N=8)
    state = setup(state, params, spec, dt=1e-4)
    geom = spec.geom
    assert geom.dim == 3
    rng = np.random.default_rng(5)
    dx = rng.uniform(-1.0, 1.0, size=state.x.shape).astype(np.float32)
    budget = 0.9 * geom.drift_budget
    assert budget > 0
    state = dataclasses.replace(
        state,
        x=state.x + jnp.where(state.valid, jnp.asarray(dx) * budget, 0.0),
        v=state.v
        + jnp.asarray(rng.normal(0, 1e-3, state.v.shape), np.float32),
    )
    _force_interpret(monkeypatch)
    ref = S.rebin(state, geom, use_pallas=False)
    got = S.rebin(state, geom, use_pallas=True)
    assert int(ref.overflow) == 0
    _assert_states_equal(ref, got)


def test_kernel_counts_capacity_overflow(monkeypatch):
    """Crowd neighbor columns into one cell (a one-ring move) past cap."""
    state, spec, geom = _drifted_cavity(seed=2, drift_scale=0.2)
    _force_interpret(monkeypatch)
    # shift every particle one cell in -x: columns pile up at the low edge
    # ... except we want capacity overflow, so shift HALF a cell region:
    # move all particles whose cell-x coordinate is odd one cell left, so
    # even columns end up with ~2x occupancy > cap.
    cs = geom.cell_size[0]
    cx = jnp.floor((state.x[0] - geom.lo[0]) / cs).astype(jnp.int32)
    odd = (cx % 2 == 1) & state.valid
    xshift = jnp.where(odd, -cs, 0.0)
    state = dataclasses.replace(
        state, x=state.x.at[0].add(jnp.where(state.valid, xshift, 0.0))
    )
    ref = S.rebin(state, geom, use_pallas=False)
    got = S.rebin(state, geom, use_pallas=True)
    assert int(ref.overflow) > 0  # the crowding actually overflowed
    assert int(ref.overflow) == int(got.overflow)
    _assert_states_equal(ref, got)
