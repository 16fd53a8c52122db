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
