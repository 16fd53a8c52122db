"""SDPD thermal-fluctuation force (pair...transport_velocity.cpp:406-431).

No brute-force reference exists for the noise term (the reference's is
wall-clock-seeded and serial), so validation is by its physical invariants:
pair-symmetric counter-based draws make the random force momentum-conserving
by construction, e=0 switches it off exactly, and it scales like
sqrt(kB e / dt).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sph_bvf_tpu.core.stepper import setup
from sph_bvf_tpu.models import lid_cavity
from sph_bvf_tpu.ops.pair import compute_forces


def _fluid_state(e=1.0):
    state, params, spec, _ = lid_cavity.build(N=14, Re=100.0)
    state = setup(state, params, spec, dt=1e-4)
    # all-fluid (remove the solid tagging so every pair takes the fluid branch)
    state = dataclasses.replace(
        state,
        solid_tag=jnp.zeros_like(state.solid_tag),
        fixed_tag=jnp.zeros_like(state.fixed_tag),
        e=jnp.where(state.valid, e, 0.0),
    )
    # a physically large kB makes the noise visible at float precision
    params = dataclasses.replace(params, boltz=1e-4)
    cfg = dataclasses.replace(
        spec.pair, thermal=True, use_pallas=False,
        solids_present=False, elastic_present=False,
    )
    return state, params, spec, cfg


def test_thermal_force_momentum_conserving():
    state, params, spec, cfg = _fluid_state(e=1.0)
    out = compute_forces(state, params, spec.geom, cfg)
    f = np.asarray(jnp.where(out.valid[None], out.f, 0.0))
    ftot = np.abs(f.sum(axis=(1, 2)))
    fscale = np.abs(f).max()
    assert fscale > 0
    assert ftot.max() < 1e-6 * max(fscale, 1e-12) * f[0].size ** 0.5, (
        ftot, fscale)


def test_thermal_force_zero_at_zero_energy():
    state, params, spec, cfg = _fluid_state(e=0.0)
    cold = compute_forces(state, params, spec.geom, cfg)
    cfg_off = dataclasses.replace(cfg, thermal=False)
    off = compute_forces(state, params, spec.geom, cfg_off)
    np.testing.assert_allclose(
        np.asarray(cold.f), np.asarray(off.f), atol=1e-12
    )


def test_thermal_force_changes_with_step():
    state, params, spec, cfg = _fluid_state(e=1.0)
    a = compute_forces(state, params, spec.geom, cfg)
    b = compute_forces(
        dataclasses.replace(state, step=state.step + 1), params, spec.geom, cfg
    )
    assert not np.allclose(np.asarray(a.f), np.asarray(b.f))


@pytest.mark.slow
def test_thermal_kernel_matches_jnp_path():
    """The Pallas kernel evaluates the SAME counter-based noise stream:
    dt/step/seed ride a scalar-prefetch meta operand (exact bitcast round
    trip) and tags ride f32 rows (exact below 2^24), so the kernel must
    reproduce the jnp path's random force to f32 rounding — not just in
    distribution."""
    from sph_bvf_tpu.ops.pair import _per_particle
    from sph_bvf_tpu.ops.pair_pallas import (
        _acc_layout,
        kernel_supported,
        pass_a_pallas,
    )

    state, params, spec, cfg = _fluid_state(e=1.0)
    # make dt/step/seed nontrivial so the meta round trip is exercised
    state = dataclasses.replace(
        state,
        step=jnp.asarray(12345, state.step.dtype),
        key=jnp.asarray([0xDEADBEEF, 0x12345], jnp.uint32).reshape(
            state.key.shape
        ),
    )
    assert kernel_supported(state, params, spec.geom, cfg)
    ref = compute_forces(state, params, spec.geom, cfg)
    pf = _per_particle(state, params, cfg)
    seed = state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1]
    acc = pass_a_pallas(
        pf, params, spec.geom, cfg, block=128, interpret=True,
        dt=state.dt, step=state.step, seed=seed,
    )
    for name, _ in _acc_layout(params, cfg):
        got = jnp.asarray(acc[name])
        want = getattr(ref, name)
        if name in ("num_den", "rhoAux2"):
            got = jnp.where(state.valid, got, 1.0)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
        assert err <= 5e-6 * scale, (name, err, scale)
    # and the noise is actually present (e>0 => nonzero random force)
    assert float(jnp.max(jnp.abs(ref.f))) > 0
