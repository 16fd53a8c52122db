"""Smoke tests: every paper-example model builds and steps stably.

The reference's verification strategy is "run the examples and look at the
fields" (SURVEY.md §4); these are the automated minimum — short runs that
must stay finite, conserve particle count, and show the expected qualitative
behavior (heat leaving the cylinder, flow developing, species clamps
holding).
"""

import numpy as np

from sph_bvf_tpu.core.state import gather_particles
from sph_bvf_tpu.core.stepper import run_chunk, setup
from sph_bvf_tpu.models import (
    cell_polarization,
    fsi,
    lid_cavity3d,
    natural_convection,
)


def _run(state, params, spec, dt, nsteps):
    state = setup(state, params, spec, dt=dt)
    done = 0
    while done < nsteps:
        state = run_chunk(state, params, spec, spec.rebin_every)
        done += spec.rebin_every
    return state


def test_natural_convection_runs():
    state, params, spec, sc = natural_convection.build(N=40, Ra=1e4, rebin_every=5)
    n0 = int(state.n_valid)
    state = _run(state, params, spec, dt=1e-4, nsteps=30)
    assert int(state.overflow) == 0
    assert int(state.n_valid) == n0
    out = gather_particles(state, spec.geom, fields=("v", "rho", "C", "solid_tag"))
    assert np.isfinite(out["v"]).all() and np.isfinite(out["C"]).all()
    # Dirichlet forcing holds: C = C0 on the cylinder, 0 on walls
    cyl = (out["solid_tag"] == 1) & (np.abs(out["C"][:, 0] - 1.0) < 1e-6)
    assert cyl.sum() > 0
    # heat diffused into the fluid
    fl = out["solid_tag"] == 0
    assert out["C"][fl, 0].max() > 1e-4
    # Boussinesq buoyancy started a flow
    assert np.abs(out["v"][fl]).max() > 1e-6


def test_fsi_runs():
    state, params, spec, sc = fsi.build(nx=24, rebin_every=5, tdamp_solid=5)
    n0 = int(state.n_valid)
    state = _run(state, params, spec, dt=1e-8, nsteps=30)
    assert int(state.overflow) == 0
    assert int(state.n_valid) == n0
    out = gather_particles(state, spec.geom, fields=("v", "rho", "S"))
    assert np.isfinite(out["v"]).all() and np.isfinite(out["rho"]).all()
    assert np.isfinite(out["S"]).all()
    # inlet sponge is pushing fluid: some positive vx appeared
    assert out["v"][:, 0].max() > 0.0


def test_cell_polarization_runs():
    state, params, spec, sc = cell_polarization.build(nx=40, rebin_every=5)
    n0 = int(state.n_valid)
    state = _run(state, params, spec, dt=1e-10, nsteps=30)
    assert int(state.overflow) == 0
    assert int(state.n_valid) == n0
    out = gather_particles(state, spec.geom, fields=("v", "C", "ptype"))
    assert np.isfinite(out["v"]).all()
    # Dirichlet C=1 clamp on the lower wall (type 4 == 0-based 3)
    lower = out["ptype"] == 3
    assert lower.sum() > 0
    # the clamp runs POST_INTEGRATE; final_integrate then adds Q*dtf (same
    # ordering as the reference), so C sits just below the clamp value
    assert np.allclose(out["C"][lower, 0], 1.0, atol=1e-2)
    # chemo-mechanical coupling: species diffused into the neighbors
    assert out["C"][~lower, 0].max() > 0.0


def test_lid_cavity_3d_runs():
    """3D extrusion of the flagship cavity: 27-offset stencils, sc lattice."""
    state, params, spec, sc = lid_cavity3d.build(N=10, rebin_every=5)
    assert spec.geom.dim == 3
    n0 = int(state.n_valid)
    state = _run(state, params, spec, dt=1e-4, nsteps=30)
    assert int(state.overflow) == 0
    assert int(state.n_valid) == n0
    out = gather_particles(state, spec.geom, fields=("v", "rho", "solid_tag"))
    assert np.isfinite(out["v"]).all() and np.isfinite(out["rho"]).all()
    fluid = out["solid_tag"] == 0
    # lid drag has set the top fluid layer moving in +x
    assert out["v"][fluid, 0].max() > 1e-3
    # weak compressibility holds in 3D
    assert abs(out["rho"][fluid].mean() - 1.0) < 0.05
