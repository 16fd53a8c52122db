"""Tests for the cell-slot state layout, rebinning, and stencil shifts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sph_bvf_tpu.core.state import (
    Geometry,
    State,
    cell_index_of,
    gather_particles,
    rebin,
    shift_cells,
    state_from_particles,
)


def make_geom():
    return Geometry.build(
        dim=2, lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 0.1), cutoff=0.25, cap=8
    )


def test_geometry_build():
    g = make_geom()
    assert g.ncells == (4, 4, 1)
    assert g.ncells_total == 16
    assert len(g.stencil_offsets()) == 9
    assert all(o[2] == 0 for o in g.stencil_offsets())


def test_state_from_particles_roundtrip():
    g = make_geom()
    rng = np.random.default_rng(0)
    n = 60
    x = rng.uniform(0.02, 0.98, size=(n, 2))
    t = rng.integers(0, 2, size=n)
    st = state_from_particles(g, x, t)
    assert int(st.n_valid) == n
    assert int(st.overflow) == 0
    out = gather_particles(st, g, fields=("x", "ptype"))
    assert out["tag"].tolist() == list(range(1, n + 1))
    np.testing.assert_allclose(out["x"][:, :2], x, atol=1e-6)
    np.testing.assert_array_equal(out["ptype"], t)


def test_particles_land_in_their_cell():
    g = make_geom()
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(100, 2))
    st = state_from_particles(g, x, np.zeros(100, int))
    NC, cap = g.ncells_total, g.cap
    cell_of_slot = jnp.broadcast_to(jnp.arange(NC), (cap, NC))
    computed = cell_index_of(st.x, g)
    ok = jnp.where(st.valid, computed == cell_of_slot, True)
    assert bool(jnp.all(ok))


def test_rebin_moves_particles():
    g = make_geom()
    x = np.array([[0.1, 0.1], [0.9, 0.9]])
    st = state_from_particles(g, x, np.zeros(2, int))
    # teleport particle 1 across the box, then rebin
    newx = st.x + jnp.where(st.tag[None] == 1, 0.8, 0.0)
    st2 = rebin(dataclasses.replace(st, x=newx), g)
    assert int(st2.n_valid) == 2
    out = gather_particles(st2, g, fields=("x",))
    np.testing.assert_allclose(out["x"][0, :2], [0.9, 0.9], atol=1e-6)
    cell_of_slot = jnp.broadcast_to(
        jnp.arange(g.ncells_total), (g.cap, g.ncells_total)
    )
    ok = jnp.where(st2.valid, cell_index_of(st2.x, g) == cell_of_slot, True)
    assert bool(jnp.all(ok))


def test_rebin_overflow_detected():
    g = Geometry.build(dim=2, lo=(0, 0, 0), hi=(1, 1, 0.1), cutoff=0.5, cap=2)
    x = np.full((5, 2), 0.1)  # 5 particles in one cell, cap 2
    st = state_from_particles(g, x, np.zeros(5, int))
    assert int(st.overflow) == 3


def test_shift_cells_nonperiodic():
    g = make_geom()
    NC, cap = g.ncells_total, g.cap
    a = jnp.arange(cap * NC, dtype=jnp.float32).reshape(cap, NC)
    s = shift_cells(a, (1, 0, 0), g)
    # cell (cx, cy) must now hold data of cell (cx+1, cy)
    grid = np.asarray(a).reshape(cap, 4, 4)
    sgrid = np.asarray(s).reshape(cap, 4, 4)
    np.testing.assert_array_equal(sgrid[:, :3], grid[:, 1:])
    np.testing.assert_array_equal(sgrid[:, 3], 0.0)  # ghost ring


def test_shift_cells_periodic():
    g = Geometry.build(
        dim=2,
        lo=(0, 0, 0),
        hi=(1, 1, 0.1),
        cutoff=0.25,
        cap=4,
        periodic=(True, False, False),
    )
    NC, cap = g.ncells_total, g.cap
    a = jnp.arange(cap * NC, dtype=jnp.float32).reshape(cap, NC)
    s = shift_cells(a, (-1, 0, 0), g)
    grid = np.asarray(a).reshape(cap, 4, 4)
    sgrid = np.asarray(s).reshape(cap, 4, 4)
    np.testing.assert_array_equal(sgrid[:, 1:], grid[:, :3])
    np.testing.assert_array_equal(sgrid[:, 0], grid[:, 3])  # wrapped


def test_rebin_jits():
    g = make_geom()
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, size=(50, 2))
    st = state_from_particles(g, x, np.zeros(50, int))
    jitted = jax.jit(lambda s: rebin(s, g))
    st2 = jitted(st)
    assert int(st2.n_valid) == 50


def test_drift_violation_detected():
    """A particle teleported far outside its cell must trip the drift guard
    at the next rebin (the silent-missed-pairs failure mode)."""
    g = Geometry.build(
        dim=2, lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 0.1), cutoff=0.2,
        cap=8, margin=0.05,
    )
    assert g.drift_budget > 0
    x = np.array([[0.1, 0.1], [0.6, 0.6]])
    st = state_from_particles(g, x, np.zeros(2, int))
    assert int(st.drift_violation) == 0
    # small drift within budget: no violation
    st_small = dataclasses.replace(
        st, x=st.x + jnp.where(st.tag[None] == 1, 0.9 * g.drift_budget, 0.0)
    )
    assert int(rebin(st_small, g).drift_violation) == 0
    # large drift: flagged
    st_big = dataclasses.replace(
        st, x=st.x + jnp.where(st.tag[None] == 1, 0.3, 0.0)
    )
    assert int(rebin(st_big, g).drift_violation) == 1


def test_lattice_aligned_binning_matches_unaligned():
    """align_cells changes only the cell grid (binning), never the physics:
    f64 fields after 20 steps match the unaligned grid to rounding."""
    import jax.numpy as jnp
    import numpy as np

    from sph_bvf_tpu.core.stepper import run_chunk, setup
    from sph_bvf_tpu.core.state import gather_particles
    from sph_bvf_tpu.models import lid_cavity

    outs = []
    for align in (True, False):
        import sph_bvf_tpu.api.scene as scene_mod

        # build() constructs its own Scene; toggle via a build argument is
        # not exposed, so patch the default
        state, params, spec, sc = lid_cavity.build(N=16, dt=1e-4)
        if not align:
            sc.align_cells = False
            state, params, spec = sc.build()
        state = jax.tree.map(
            lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a,
            state,
        )
        state = setup(state, params, spec, dt=1e-4)
        state = run_chunk(state, params, spec, 20)
        out = gather_particles(state, spec.geom, fields=("x", "v", "rho"))
        order = np.argsort(out["tag"])
        outs.append({k: np.asarray(v)[order] for k, v in out.items()})
    a, b = outs
    assert a["x"].shape == b["x"].shape
    np.testing.assert_allclose(a["x"], b["x"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(a["v"], b["v"], rtol=0, atol=1e-10)
    np.testing.assert_allclose(a["rho"], b["rho"], rtol=1e-12)
