"""End-to-end stepping tests on a miniature lid-driven cavity."""

import jax.numpy as jnp
import numpy as np

from sph_bvf_tpu.core.stepper import run_chunk, setup, simulate
from sph_bvf_tpu.core.state import gather_particles
from sph_bvf_tpu.models import lid_cavity


def small_cavity(N=10):
    return lid_cavity.build(N=N, Re=100.0, dt=1e-4, rebin_every=5)


def test_cavity_scene_counts():
    state, params, spec, sc = small_cavity(N=10)
    # 10x10 fluid + 3-layer walls around a 10-cell cavity: (10+6)^2 - 10^2 = 156
    n_fluid = int(sc.in_group("fluid").sum())
    n_total = int(state.n_valid)
    assert n_fluid == 100
    assert n_total == 256  # 16x16 lattice sites fill the walled domain
    # all walls solid+fixed
    solid = np.asarray(state.solid_tag)[np.asarray(state.valid)]
    assert (solid == 1).sum() == 156


def test_cavity_runs_stable():
    state, params, spec, sc = small_cavity(N=10)
    state = setup(state, params, spec, dt=1e-4)
    state = simulate(state, params, spec, nsteps=50)
    assert int(state.overflow) == 0
    out = gather_particles(state, spec.geom, fields=("v", "rho", "x", "phi"))
    assert np.all(np.isfinite(out["v"]))
    assert np.all(np.isfinite(out["rho"]))
    # density stays near rho0
    assert abs(out["rho"].mean() - 1.0) < 0.05
    # fluid started moving (momentum diffused from the lid)
    assert np.abs(out["v"]).max() > 1e-6
    # walls never move
    solid = gather_particles(state, spec.geom, fields=("v",))
    st0, _, _, _ = small_cavity(N=10)
    x0 = gather_particles(st0, spec.geom, fields=("x", "solid_tag"))
    xs = gather_particles(state, spec.geom, fields=("x", "solid_tag"))
    w = x0["solid_tag"] == 1
    np.testing.assert_allclose(xs["x"][w], x0["x"][w], atol=1e-7)


def test_fluid_stays_inside_walls():
    state, params, spec, sc = small_cavity(N=10)
    state = setup(state, params, spec, dt=1e-4)
    state = simulate(state, params, spec, nsteps=100)
    out = gather_particles(state, spec.geom, fields=("x", "solid_tag"))
    fl = out["solid_tag"] == 0
    x = out["x"][fl]
    # BVF bounce-back must keep fluid out of the deep wall region
    assert x[:, 0].min() > -0.05 and x[:, 0].max() < 1.05
    assert x[:, 1].min() > -0.05 and x[:, 1].max() < 1.05
