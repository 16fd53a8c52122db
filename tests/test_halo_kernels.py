"""Periodic and sharded Pallas kernel paths vs the jnp reference path.

Round-1 gap: the fast kernels rejected periodic axes outright, so the fsi
channel (periodic x, fsi.lmp:31 "boundary p f p") and cell polarization
(fully periodic, cell_polarization.lmp:28) could never use them, and a
sharded run silently fell back to the ~6x-slower jnp path.  These tests
drive the halo/ghost machinery (core/halo.py) in interpret mode on the
virtual CPU mesh:

* periodic x      -> wrapped-copy halos (fsi geometry)
* fully periodic  -> ghost columns on y + wrapped x (cell polarization)
* sharded         -> shard_map + ppermute edge-slab exchange, both walls
                     and periodic, including cross-shard rebin migration

The jnp path stays the executable spec.  Pair accumulators must agree to
f32 rounding; rebin must place the same particles in the same cells (slot
order within a cell may differ on periodic grids — comparison is by tag
via gather_particles, which is slot-order insensitive).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sph_bvf_tpu.core.rebin_pallas as rp
import sph_bvf_tpu.core.state as S
from sph_bvf_tpu.core.state import gather_particles
from sph_bvf_tpu.core.stepper import setup
from sph_bvf_tpu.models import cell_polarization, fsi, lid_cavity
from sph_bvf_tpu.ops.pair import _per_particle, compute_forces
from sph_bvf_tpu.ops.pair_pallas import (
    _acc_layout,
    pass_a_pallas,
    pass_a_sharded,
)


def _seed_S(state, scale=0.01, seed=7):
    """Nonzero symmetric deviatoric stress on solid slots, so the
    elastic-gated kernel passes (dS + the deferred f_art/f_dev force pass)
    have real work at the wrap/sharded seams instead of comparing exact
    zeros (a fresh setup() state has S = 0 everywhere)."""
    rng = np.random.default_rng(seed)
    S9 = rng.standard_normal((3, 3) + state.rho.shape).astype("float32")
    S9 = (S9 + np.swapaxes(S9, 0, 1)) * scale
    S9[2, :] = 0.0
    S9[:, 2] = 0.0
    mask = np.asarray(state.valid & (state.solid_tag == 1))
    return dataclasses.replace(state, S=jnp.asarray(S9 * mask))


@pytest.fixture(scope="module")
def fsi_state():
    """Periodic-x channel (boundary p f p) — wrapped-halo path."""
    state, params, spec, _ = fsi.build(nx=12, rebin_every=5,
                                       ncx_multiple_of=8)
    state = setup(state, params, spec, dt=1e-8)
    return _seed_S(state), params, spec


@pytest.fixture(scope="module")
def polar_state():
    """Fully periodic box (boundary p p p) — ghost-column + wrap path."""
    state, params, spec, _ = cell_polarization.build(nx=24, rebin_every=5,
                                                     ncx_multiple_of=8)
    state = setup(state, params, spec, dt=1e-10)
    return _seed_S(state), params, spec


def _assert_accs_match(state, params, geom, cfg, acc, tol=5e-6):
    ref = compute_forces(
        state, params, geom, dataclasses.replace(cfg, use_pallas=False)
    )
    for name, _ in _acc_layout(params, cfg):
        got = jnp.asarray(acc[name])
        want = getattr(ref, name)
        if name in ("num_den", "rhoAux2"):
            # the driver post-masks these to 1 on invalid slots
            got = jnp.where(state.valid, got, 1.0)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
        assert err <= tol * scale, (name, err, scale)


@pytest.mark.slow
def test_pass_a_periodic_x(fsi_state):
    state, params, spec = fsi_state
    geom, cfg = spec.geom, spec.pair
    assert geom.periodic[0] and geom.ncells[0] > 1
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(pf, params, geom, cfg, block=128, interpret=True)
    _assert_accs_match(state, params, geom, cfg, acc)


@pytest.mark.slow
def test_pass_a_fully_periodic(polar_state):
    state, params, spec = polar_state
    geom, cfg = spec.geom, spec.pair
    assert geom.periodic[1] and geom.ncells[1] > 1  # ghost-column path
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(pf, params, geom, cfg, block=128, interpret=True)
    _assert_accs_match(state, params, geom, cfg, acc)


@pytest.fixture(scope="module")
def fsi_state24():
    """Larger periodic-x channel: local shard slabs must exceed the stencil
    reach, which the nx=12 grid (5 lanes/shard) cannot."""
    state, params, spec, _ = fsi.build(nx=24, rebin_every=5,
                                       ncx_multiple_of=8)
    state = setup(state, params, spec, dt=1e-8)
    return _seed_S(state), params, spec


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("case", ["walls", "periodic"])
@pytest.mark.slow
def test_pass_a_sharded_matches(case, fsi_state24):
    from sph_bvf_tpu.parallel.mesh import make_mesh

    if case == "walls":
        state, params, spec, _ = lid_cavity.build(
            N=48, Re=100.0, dt=1e-4, ncx_multiple_of=8
        )
        state = setup(state, params, spec, dt=1e-4)
    else:
        state, params, spec = fsi_state24
    geom, cfg = spec.geom, spec.pair
    mesh = make_mesh(8)
    pf = _per_particle(state, params, cfg)
    acc = pass_a_sharded(
        pf, params, geom, cfg, mesh, block=128, interpret=True
    )
    _assert_accs_match(state, params, geom, cfg, acc)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_pass_a_sharded_thermal_matches():
    """SDPD thermal noise through the shard_map kernel path (round-5: the
    `not cfg.thermal` guard is gone — dt/step/seed ride a replicated
    scalar-prefetch operand, and the pair-tag-keyed counter noise is
    shard-invariant, mirroring the reference's random force under MPI,
    pair...transport_velocity.cpp:406-431)."""
    from sph_bvf_tpu.parallel.mesh import make_mesh

    state, params, spec, _ = lid_cavity.build(
        N=48, Re=100.0, dt=1e-4, ncx_multiple_of=8
    )
    state = setup(state, params, spec, dt=1e-4)
    state = dataclasses.replace(
        state, e=jnp.where(state.valid, 1.0, 0.0)
    )
    # a physically large kB makes the noise visible at f32 precision
    params = dataclasses.replace(params, boltz=1e-4)
    cfg = dataclasses.replace(spec.pair, thermal=True)
    geom = spec.geom
    pf = _per_particle(state, params, cfg)
    acc = pass_a_sharded(
        pf, params, geom, cfg, make_mesh(8), block=128, interpret=True,
        dt=state.dt, step=state.step,
        seed=state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1],
    )
    # the noise must be present (nonzero vs the thermal-off forces) ...
    off = compute_forces(
        state, params, geom,
        dataclasses.replace(cfg, thermal=False, use_pallas=False),
    )
    assert float(jnp.max(jnp.abs(jnp.asarray(acc["f"]) - off.f))) > 0
    # ... and bit-compatible with the single-device jnp path
    _assert_accs_match(state, params, geom, cfg, acc)


# ---------------------------------------------------------------------------
# rebin under periodic boundaries / sharding
# ---------------------------------------------------------------------------


_REBIN_FIELDS = ("x", "v", "vest", "rho", "rhoI", "S", "C", "ptype",
                 "solid_tag", "fixed_tag")


def _drift(state, geom, seed=0):
    """Shift every particle by ~0.9 of the drift budget so the edge columns
    cross the periodic faces (the drift contract still holds: excess from
    the old cell bounds stays below the budget)."""
    rng = np.random.default_rng(seed)
    d = 0.9 * geom.drift_budget
    assert d > 0
    shift = [d, 0.0, 0.0]
    if geom.periodic[1] and geom.ncells[1] > 1:
        shift[1] = -d
    jitter = jnp.asarray(
        rng.uniform(-0.05 * d, 0.05 * d, size=state.x.shape), state.x.dtype
    )
    x = state.x + jnp.asarray(shift, state.x.dtype)[:, None, None] + jitter
    return dataclasses.replace(state, x=jnp.where(state.valid, x, state.x))


def _canon(state, geom):
    return gather_particles(state, geom, fields=_REBIN_FIELDS)


def _compare_rebin(state, geom, monkeypatch, sharded_mesh=None):
    ref = S.rebin(state, geom, use_pallas=False)
    assert int(ref.overflow) == 0

    monkeypatch.setattr(rp, "rebin_pallas_eligible", lambda *a, **k: True)
    if sharded_mesh is not None:
        monkeypatch.setattr(
            rp, "move_pallas",
            lambda fields, geom, **kw: rp.move_pallas_sharded(
                fields, geom, sharded_mesh, interpret=True
            ),
        )
    else:
        monkeypatch.setattr(
            rp, "move_pallas",
            functools.partial(rp.move_pallas, interpret=True),
        )
    got = S.rebin(state, geom, use_pallas=True)
    assert int(got.overflow) == 0

    a, b = _canon(ref, geom), _canon(got, geom)
    np.testing.assert_array_equal(a["tag"], b["tag"])
    for name in _REBIN_FIELDS:
        np.testing.assert_array_equal(a[name], b[name], err_msg=name)
    # and the slot assignment is cell-consistent: every particle sits in the
    # cell its (wrapped) position maps to
    cell = np.asarray(S.cell_index_of(S.wrap_pbc(got.x, geom), geom))
    owner = np.broadcast_to(
        np.arange(geom.ncells_total), (geom.cap, geom.ncells_total)
    )
    valid = np.asarray(got.valid)
    np.testing.assert_array_equal(cell[valid], owner[valid])


def _with_synthetic_edges(state, geom, pattern=(7, 9)):
    """Swap a uniform geometry's x columns for alternating widths on the
    cell/8 fine quantum (mean must stay 8 so coverage is preserved), then
    re-bin into it via the global sort (cross-geometry move).  Exercises
    the round-5 x_edges kernel support with a cap-preserving, overflow-free
    perturbation (width ratio 9/7 < the 1.3x cap headroom)."""
    nx = geom.ncells[0]
    q = geom.cell_size[0] / 8.0
    widths = [pattern[i % len(pattern)] for i in range(nx)]
    if nx % len(pattern):  # keep total coverage exact
        widths[-1] = 8 * nx - sum(widths[:-1])
    bins = np.concatenate([[0], np.cumsum(widths)])
    e = tuple(float(geom.lo[0] + b * q) for b in bins)
    new_geom = dataclasses.replace(
        geom, x_edges=e, x_quantum=float(q), base_occ=0,
        cell_size=(float(min(widths) * q),) + tuple(geom.cell_size[1:]),
    )
    st = S.rebin(state, new_geom, use_pallas=False, drift_check=False)
    assert int(st.overflow) == 0
    return st, new_geom


@pytest.mark.slow
def test_rebin_x_edges_2d(monkeypatch):
    """Non-uniform x columns through the 2D rebin kernel (round-4 verdict
    #3): the per-lane fine-bin bounds operand must reproduce the jnp
    table binning bit-exactly — static crossbar (cap<=16), walls."""
    state, params, spec, _ = lid_cavity.build(N=30, Re=100.0)
    state = setup(state, params, spec, dt=1e-4)
    state, geom = _with_synthetic_edges(state, spec.geom)
    state = _drift(state, geom)
    _compare_rebin(state, geom, monkeypatch)


@pytest.mark.slow
def test_rebin_x_edges_gated_periodic(monkeypatch, fsi_state):
    """x_edges + periodic x + the occupancy-gated large-cap crossbar."""
    state, params, spec = fsi_state
    assert spec.geom.cap > 16  # gated path
    state, geom = _with_synthetic_edges(state, spec.geom)
    state = _drift(state, geom)
    _compare_rebin(state, geom, monkeypatch)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_rebin_x_edges_sharded(monkeypatch):
    """x_edges under shard_map: the bounds operand shards with the lanes;
    cross-shard migration still falls out of the global-cell-id match."""
    from sph_bvf_tpu.parallel.mesh import make_mesh

    state, params, spec, _ = lid_cavity.build(
        N=48, Re=100.0, dt=1e-4, ncx_multiple_of=8
    )
    state = setup(state, params, spec, dt=1e-4)
    state, geom = _with_synthetic_edges(state, spec.geom)
    state = _drift(state, geom)
    _compare_rebin(state, geom, monkeypatch, sharded_mesh=make_mesh(8))


@pytest.mark.slow
def test_rebin_x_edges_3d(monkeypatch):
    """x_edges through the tiled 3D kernel: planes are columns, so the
    bounds ride a scalar-prefetch row indexed by the global plane."""
    from sph_bvf_tpu.models import lid_cavity3d

    state, params, spec, _ = lid_cavity3d.build(N=10)
    state = setup(state, params, spec, dt=1e-4)
    state, geom = _with_synthetic_edges(state, spec.geom)
    state = _drift(state, geom)
    _compare_rebin(state, geom, monkeypatch)


@pytest.mark.slow
def test_rebin_periodic_x(fsi_state, monkeypatch):
    state, params, spec = fsi_state
    state = _drift(state, spec.geom)
    _compare_rebin(state, spec.geom, monkeypatch)


@pytest.mark.slow
def test_rebin_fully_periodic(polar_state, monkeypatch):
    state, params, spec = polar_state
    state = _drift(state, spec.geom)
    _compare_rebin(state, spec.geom, monkeypatch)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("case", ["walls", "periodic"])
@pytest.mark.slow
def test_rebin_sharded_migration(case, monkeypatch, fsi_state24):
    """Cross-shard particle migration: the drift pushes edge-column
    particles over shard boundaries (and periodic faces), where only the
    ppermute'd halo can place them."""
    from sph_bvf_tpu.parallel.mesh import make_mesh

    if case == "walls":
        state, params, spec, _ = lid_cavity.build(
            N=48, Re=100.0, dt=1e-4, ncx_multiple_of=8
        )
        state = setup(state, params, spec, dt=1e-4)
    else:
        state, params, spec = fsi_state24
    state = _drift(state, spec.geom)
    _compare_rebin(state, spec.geom, monkeypatch,
                   sharded_mesh=make_mesh(8))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_run_chunk_sharded_kernel_path(fsi_state24):
    """Integrated: run_chunk with spec.mesh routes pass A through the
    shard_map kernels (solids + elastic + periodic x) and must match the
    unsharded jnp run to f32 rounding."""
    import dataclasses as dc

    from sph_bvf_tpu.core.stepper import run_chunk
    from sph_bvf_tpu.parallel.mesh import make_mesh, replicate, shard_state

    state, params, spec = fsi_state24
    ref = run_chunk(state, params, spec, 2)

    mesh = make_mesh(8)
    spec_sh = dc.replace(spec, mesh=mesh)
    sh = shard_state(state, mesh)
    pr = replicate(params, mesh)
    use_mesh = getattr(jax.sharding, "use_mesh", None) or jax.sharding.set_mesh
    with use_mesh(mesh):
        out = run_chunk(sh, pr, spec_sh, 2)

    assert int(out.overflow) == 0
    a = gather_particles(ref, spec.geom, fields=("x", "v", "rho", "S"))
    b = gather_particles(out, spec.geom, fields=("x", "v", "rho", "S"))
    np.testing.assert_array_equal(a["tag"], b["tag"])
    for name in ("x", "v", "rho", "S"):
        np.testing.assert_allclose(
            a[name], b[name], rtol=2e-5, atol=1e-8, err_msg=name
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_pass_a_sharded_species_fully_periodic():
    """Sharded kernels with SDPD species + G0 chemo-coupling + ghost
    columns + wrapped x — the fully loaded configuration.  Needs a grid
    whose per-shard slab exceeds the stencil reach, hence nx=64."""
    from sph_bvf_tpu.parallel.mesh import make_mesh

    state, params, spec, _ = cell_polarization.build(
        nx=64, rebin_every=5, ncx_multiple_of=8
    )
    state = setup(state, params, spec, dt=1e-10)
    geom, cfg = spec.geom, spec.pair
    assert params.n_sdpd == 1 and geom.periodic[1]
    mesh = make_mesh(8)
    pf = _per_particle(state, params, cfg)
    acc = pass_a_sharded(
        pf, params, geom, cfg, mesh, block=128, interpret=True
    )
    _assert_accs_match(state, params, geom, cfg, acc)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
@pytest.mark.slow
def test_rebin_sharded_3d_plane_migration(monkeypatch):
    """The tiled-3D rebin move under shard_map: drift pushes edge-plane
    particles across the shard boundary, where only the exchanged halo
    plane can place them (migration via the global-cell-id match)."""
    from sph_bvf_tpu.models import lid_cavity3d
    from sph_bvf_tpu.parallel.mesh import make_mesh

    state, params, spec, _ = lid_cavity3d.build(N=6)
    state = setup(state, params, spec, dt=1e-4)
    assert spec.geom.ncells[0] % 2 == 0, spec.geom.ncells
    state = _drift(state, spec.geom)
    _compare_rebin(state, spec.geom, monkeypatch,
                   sharded_mesh=make_mesh(2))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
@pytest.mark.slow
def test_pass_a_sharded_3d_plane_exchange():
    """The tiled 3D kernel under shard_map: one x-plane exchanged per side
    (the 3D brick ghost exchange; y/z are local by construction)."""
    from sph_bvf_tpu.models import lid_cavity3d
    from sph_bvf_tpu.parallel.mesh import make_mesh

    state, params, spec, _ = lid_cavity3d.build(N=6)
    state = setup(state, params, spec, dt=1e-4)
    geom, cfg = spec.geom, spec.pair
    assert geom.ncells[0] % 2 == 0, geom.ncells
    mesh = make_mesh(2)
    pf = _per_particle(state, params, cfg)
    acc = pass_a_sharded(pf, params, geom, cfg, mesh, interpret=True)
    _assert_accs_match(state, params, geom, cfg, acc)
