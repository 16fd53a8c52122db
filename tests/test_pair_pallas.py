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


def test_preshift_matches_window_kernel(cavity):
    """Round-5 PF9 experiment: the pre-shifted-views kernel
    (`_call_preshift`, cfg.preshift_window) must be BIT-identical to the
    [H|BLK|H] window kernel — same physics body, same masks, only the J
    staging differs (aligned block refs over XLA-materialized shifted
    views instead of in-kernel lane rotations)."""
    state, params, spec = cavity
    cfg = spec.pair
    pf = _per_particle(state, params, cfg)
    a0 = pass_a_pallas(
        pf, params, spec.geom, cfg, block=128, interpret=True,
        rowloop=False,
    )
    a1 = pass_a_pallas(
        pf, params, spec.geom,
        dataclasses.replace(cfg, preshift_window=True),
        block=128, interpret=True, rowloop=False,
    )
    for name, _ in _acc_layout(params, cfg):
        np.testing.assert_array_equal(
            np.asarray(a0[name]), np.asarray(a1[name]), err_msg=name
        )


def test_preshift_periodic_wrap_matches():
    """PF9 over a periodic-x grid: the shifted views inherit the wrap
    content from the same assemble_padded buffer, so the wrap seam must be
    bit-identical to the window kernel's."""
    from sph_bvf_tpu.models import fsi

    state, params, spec, _ = fsi.build(nx=12, rebin_every=5)
    state = setup(state, params, spec, dt=1e-8)
    geom, cfg = spec.geom, spec.pair
    assert geom.periodic[0]
    pf = _per_particle(state, params, cfg)
    a0 = pass_a_pallas(
        pf, params, geom, cfg, block=128, interpret=True, rowloop=False
    )
    a1 = pass_a_pallas(
        pf, params, geom, dataclasses.replace(cfg, preshift_window=True),
        block=128, interpret=True, rowloop=False,
    )
    for name, _ in _acc_layout(params, cfg):
        np.testing.assert_array_equal(
            np.asarray(a0[name]), np.asarray(a1[name]), err_msg=name
        )


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


def test_rowloop_wrap_seam_occupancy():
    """Regression: periodic-x rowloop j-gating at the wrap seam.

    Block 0's left halo holds the last ``max_off`` REAL lanes of the flat
    cell axis (halo.assemble_padded wrap).  When ``NCg % BLK < max_off``
    those source lanes straddle past block grid-1 into block grid-2, whose
    occupancy the block-rolled occ3 bound never folds into occ3[0] — the
    j-tile loop then terminates early and silently drops pair interactions
    across the periodic seam.  Crowd exactly one straddling cell well past
    one j-tile (occ 14 > TI=8) while every other cell holds one particle,
    and require the kernel to match the jnp path.
    """
    import sph_bvf_tpu.core.halo as halo_mod
    import sph_bvf_tpu.core.state as S
    from sph_bvf_tpu.ops.eos import tait_b
    from sph_bvf_tpu.ops.pair_pallas import _default_rowloop, _kernel_block

    geom = S.Geometry.build(
        dim=2, lo=(0.0, 0.0, 0.0), hi=(45.0, 20.0, 1.0), cutoff=1.0,
        cap=16, periodic=(True, False, False),
    )
    assert geom.ncells == (45, 20, 1)
    NCg = 45 * 20  # y is not periodic: no ghost columns
    BLK = _kernel_block(geom, 128)
    max_off = halo_mod.max_flat_offset(geom)
    assert 0 < NCg % BLK < max_off, (NCg, BLK, max_off)
    assert _default_rowloop(geom)  # base_occ == 0 -> rowloop shape

    # one particle per cell center...
    grid_x, grid_y = np.meshgrid(np.arange(45) + 0.5, np.arange(20) + 0.5)
    x = np.stack([grid_x.ravel(), grid_y.ravel()], axis=1)
    # ...plus 13 extra crammed into cell (44, 3): flat lane 883 lies in
    # block grid-2 AND in the wrap-source window [NCg - max_off, NCg)
    lane = 44 * 20 + 3
    assert NCg - max_off <= lane < (NCg // BLK - 1) * BLK + BLK
    assert lane < ((NCg + BLK - 1) // BLK - 1) * BLK  # strictly before last block
    rng = np.random.default_rng(7)
    extra = np.stack(
        [44.05 + 0.9 * rng.random(13), 3.05 + 0.9 * rng.random(13)], axis=1
    )
    x = np.concatenate([x, extra])

    state = S.state_from_particles(
        geom, x, np.zeros(len(x), np.int64), dtype=jnp.float32
    )
    n = len(x)
    v = rng.standard_normal((n, 3)).astype(np.float32) * 0.01
    v[:, 2] = 0.0
    state = S.scatter_by_tag(
        state,
        v=v,
        vest=v,
        rho=np.full(n, 1.0, np.float32),
        rhoI=np.full(n, 1.0, np.float32),
    )
    state = dataclasses.replace(
        state,
        rho=jnp.where(state.valid, state.rho, 1.0),
        rhoI=jnp.where(state.valid, state.rhoI, 1.0),
        dt=jnp.asarray(1e-4, jnp.float32),
    )
    from sph_bvf_tpu.core.state import Params

    one = jnp.ones((1,), jnp.float32)
    params = Params(
        mass=one, rho0=one, c0=10.0 * one,
        B=jnp.asarray(tait_b(10.0 * np.ones(1), np.ones(1)), jnp.float32),
        G0=0.0 * one,
        cut=jnp.ones((1, 1), jnp.float32),
        cutc=jnp.ones((1, 1), jnp.float32),
        visc=0.1 * jnp.ones((1, 1), jnp.float32),
        kappa=jnp.zeros((1, 1, 0), jnp.float32),
        kappa_ssa=jnp.zeros((1, 1, 0), jnp.float32),
    )
    cfg = PairConfig.transport_velocity(
        dim=2, solids_present=False, elastic_present=False,
        free_solids_present=False, weighted_solid=False,
    )
    ref = compute_forces(
        state, params, geom, dataclasses.replace(cfg, use_pallas=False)
    )
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(pf, params, geom, cfg, block=128, interpret=True)
    for name, _ in _acc_layout(params, cfg):
        got = jnp.asarray(acc[name])
        want = getattr(ref, name)
        if name in ("num_den", "rhoAux2"):
            got = jnp.where(state.valid, got, 1.0)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
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


def test_gated_ds_rowloop_matches_jnp_path():
    """The elastic-gated dS second pass in the rowloop kernel.

    With ``cfg.elastic_present`` on a rowloop config, the Jaumann dS
    block runs in a separate pass entered only for lane blocks whose
    cells hold an i with nonzero elastic response (``_elastic_lanes``);
    every other block must still write exact zeros (the kernel's output
    buffer is uninitialized until written).  Build a two-block grid with
    elastic solids confined to block 0: block 1 exercises the skip
    branch, block 0 the gated evaluation, and the whole accumulator set
    must match the jnp spec.
    """
    import sph_bvf_tpu.core.halo as halo_mod
    import sph_bvf_tpu.core.state as S
    from sph_bvf_tpu.core.state import Params
    from sph_bvf_tpu.ops.eos import tait_b
    from sph_bvf_tpu.ops.pair_pallas import (
        _elastic_lanes, _field_layout, _kernel_block, _pack, _round_up)

    geom = S.Geometry.build(
        dim=2, lo=(0.0, 0.0, 0.0), hi=(32.0, 8.0, 1.0), cutoff=1.0, cap=8,
    )
    NC = geom.ncells_total
    BLK = _kernel_block(geom, 128)
    assert NC % BLK == 0 and NC // BLK >= 2  # at least one all-fluid block

    # one fluid per cell center, plus a solid cluster well inside block 0
    rng = np.random.default_rng(3)
    gx, gy = np.meshgrid(np.arange(32) + 0.5, np.arange(8) + 0.5)
    xf = np.stack([gx.ravel(), gy.ravel()], axis=1)
    xs = np.stack(
        [2.0 + 3.0 * rng.random(24), 2.0 + 3.0 * rng.random(24)], axis=1
    )
    x = np.concatenate([xf, xs])
    n, nsld = len(x), len(xs)
    solid = np.zeros(n, bool)
    solid[-nsld:] = True
    ptype = solid.astype(np.int64)  # type 1 = elastic solid (G0 > 0)
    # the solid cluster must stay inside block 0's lane range so block 1
    # really is elastic-free (lanes are flat x-major cell indices)
    assert (xs[:, 0].astype(int) * 8 + xs[:, 1].astype(int)).max() < BLK

    state = S.state_from_particles(geom, x, ptype, dtype=jnp.float32)
    v = rng.standard_normal((n, 3)).astype(np.float32) * 0.01
    v[:, 2] = 0.0
    Ssym = rng.standard_normal((n, 3, 3)).astype(np.float32) * 0.01
    Ssym = Ssym + np.swapaxes(Ssym, 1, 2)
    Ssym[:, 2, :] = Ssym[:, :, 2] = 0.0
    Ssym[~solid] = 0.0
    state = S.scatter_by_tag(
        state,
        v=v, vest=v,
        rho=np.full(n, 1.0, np.float32),
        rhoI=np.full(n, 1.0, np.float32),
        S=Ssym,
        solid_tag=solid.astype(np.int32),
    )
    state = dataclasses.replace(
        state,
        rho=jnp.where(state.valid, state.rho, 1.0),
        rhoI=jnp.where(state.valid, state.rhoI, 1.0),
        dt=jnp.asarray(1e-4, jnp.float32),
    )
    two = jnp.ones((2,), jnp.float32)
    params = Params(
        mass=0.01 * two, rho0=two, c0=10.0 * two,
        B=jnp.asarray(tait_b(10.0 * np.ones(2), np.ones(2)), jnp.float32),
        G0=jnp.asarray([0.0, 0.3], jnp.float32),
        cut=jnp.ones((2, 2), jnp.float32),
        cutc=0.8 * jnp.ones((2, 2), jnp.float32),
        visc=0.1 * jnp.ones((2, 2), jnp.float32),
        kappa=jnp.zeros((2, 2, 0), jnp.float32),
        kappa_ssa=jnp.zeros((2, 2, 0), jnp.float32),
    )
    cfg = PairConfig.mechanics(dim=2)

    # structural: the gate really is off for block 1 and on for block 0
    fl = _field_layout(params, cfg)
    PF = _pack(_per_particle(state, params, cfg), fl, geom.cap, NC)
    PF = jnp.pad(PF, ((0, 0), (0, _round_up(geom.cap, 8) - geom.cap), (0, 0)))
    PFg = halo_mod.add_ghosts(PF, geom)
    ef = np.asarray(_elastic_lanes(PFg, params, cfg, fl))
    ef = np.pad(ef, (0, _round_up(len(ef), BLK) - len(ef)))
    blk_gate = ef.reshape(-1, BLK).max(axis=1)
    assert blk_gate[0] == 1 and not blk_gate[1:].any(), blk_gate

    ref = compute_forces(
        state, params, geom, dataclasses.replace(cfg, use_pallas=False)
    )
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(
        pf, params, geom, cfg, block=128, interpret=True, rowloop=True
    )
    assert float(jnp.max(jnp.abs(ref.dS))) > 0  # the pass has real work
    for name, _ in _acc_layout(params, cfg):
        got = jnp.asarray(acc[name])
        want = getattr(ref, name)
        if name in ("num_den", "rhoAux2"):
            got = jnp.where(state.valid, got, 1.0)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
        assert err <= 5e-6 * scale, (name, err, scale)


def test_grouped_crowded_cell():
    """Crowded-cell coverage for the grouped 2D kernel's occupancy gates.

    Build a lattice-aligned grid (base_occ > 0, cap <= 24 -> grouped
    shape) with one cell crowded well past the base occupancy: blocks
    near it must evaluate the occupancy-gated i-slot groups, far blocks
    must skip them, and every accumulator must match the jnp spec either
    way.  (A j-slot phase split gated the same way was tried and
    reverted — measured 26-34% SLOWER on the grouped models because
    developed flow crowds some cell in nearly every 768-lane block, so
    the gate always fired and only the doubled j-staging + accumulator
    read-modify-write remained.)
    """
    import sph_bvf_tpu.core.state as S
    from sph_bvf_tpu.core.state import Params
    from sph_bvf_tpu.ops.eos import tait_b
    from sph_bvf_tpu.ops.pair_pallas import _default_rowloop, _kernel_block

    geom = S.Geometry.build(
        dim=2, lo=(0.0, 0.0, 0.0), hi=(64.0, 32.0, 1.0), cutoff=1.0,
        cap=12, quantum=1.0,
    )
    assert geom.base_occ == 4 and geom.ncells == (32, 16, 1)
    assert not _default_rowloop(geom)  # grouped shape
    NC = geom.ncells_total
    BLK = _kernel_block(geom, 128)
    assert BLK == 128 and NC // BLK >= 4  # blocks far from the crowd exist

    # one particle per unit-lattice site (4 per cell = base occupancy)...
    gx, gy = np.meshgrid(np.arange(64) + 0.5, np.arange(32) + 0.5)
    x = np.stack([gx.ravel(), gy.ravel()], axis=1)
    # ...plus 7 extras crammed into cell (1, 1) — occupancy 11 > base 4,
    # deep inside lane block 0 (flat cell 1*16+1 = 17)
    rng = np.random.default_rng(11)
    extra = np.stack(
        [2.05 + 1.9 * rng.random(7), 2.05 + 1.9 * rng.random(7)], axis=1
    )
    x = np.concatenate([x, extra])

    state = S.state_from_particles(
        geom, x, np.zeros(len(x), np.int64), dtype=jnp.float32
    )
    n = len(x)
    v = rng.standard_normal((n, 3)).astype(np.float32) * 0.01
    v[:, 2] = 0.0
    state = S.scatter_by_tag(
        state,
        v=v,
        vest=v,
        rho=np.full(n, 1.0, np.float32),
        rhoI=np.full(n, 1.0, np.float32),
    )
    state = dataclasses.replace(
        state,
        rho=jnp.where(state.valid, state.rho, 1.0),
        rhoI=jnp.where(state.valid, state.rhoI, 1.0),
        dt=jnp.asarray(1e-4, jnp.float32),
    )
    one = jnp.ones((1,), jnp.float32)
    params = Params(
        mass=one, rho0=one, c0=10.0 * one,
        B=jnp.asarray(tait_b(10.0 * np.ones(1), np.ones(1)), jnp.float32),
        G0=0.0 * one,
        cut=jnp.ones((1, 1), jnp.float32),
        cutc=jnp.ones((1, 1), jnp.float32),
        visc=0.1 * jnp.ones((1, 1), jnp.float32),
        kappa=jnp.zeros((1, 1, 0), jnp.float32),
        kappa_ssa=jnp.zeros((1, 1, 0), jnp.float32),
    )
    cfg = PairConfig.transport_velocity(
        dim=2, solids_present=False, elastic_present=False,
        free_solids_present=False, weighted_solid=False,
    )
    ref = compute_forces(
        state, params, geom, dataclasses.replace(cfg, use_pallas=False)
    )
    pf = _per_particle(state, params, cfg)
    acc = pass_a_pallas(pf, params, geom, cfg, block=128, interpret=True)
    for name, _ in _acc_layout(params, cfg):
        got = jnp.asarray(acc[name])
        want = getattr(ref, name)
        if name in ("num_den", "rhoAux2"):
            got = jnp.where(state.valid, got, 1.0)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
        assert err <= 5e-6 * scale, (name, err, scale)


def test_ssa_split_matches_jnp_path():
    """SSA kernel split (round 4): with n_ssa > 0 the kernel computes the
    mechanics (no Qd accumulator, no Cd/tag staging) and `_pass_a_qd`
    draws the hops separately — the mechanics must match the jnp path to
    f32 rounding and Qd must be BIT-IDENTICAL (same counter streams)."""
    from sph_bvf_tpu.ops.pair import _bc, _pass_a_qd
    from tests.test_ssa import _ssa_cavity

    state, params, spec = _ssa_cavity()
    state = setup(state, params, spec, dt=1e-4)
    cfg = spec.pair
    assert params.n_ssa == 1

    ref = compute_forces(
        state, params, spec.geom, dataclasses.replace(cfg, use_pallas=False)
    )

    # mechanics through the kernel (interpret mode)
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

    # hop draws through the split pass: bit-identical to the fallback's
    geom = spec.geom
    not_diag = ~(
        jnp.arange(geom.cap)[:, None] == jnp.arange(geom.cap)[None, :]
    )[:, :, None]
    pbc = tuple(
        (ax, geom.hi[ax] - geom.lo[ax])
        for ax in range(3)
        if geom.periodic[ax] and geom.ncells[ax] > 1
    )
    I = {k: _bc(v, "i") for k, v in pf.items()}
    seed = state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1]
    qd = _pass_a_qd(
        pf, I, not_diag, params, geom, cfg, state.dt, state.step, seed, pbc
    )
    np.testing.assert_array_equal(np.asarray(qd), np.asarray(ref.Qd))
    assert int(jnp.sum(jnp.abs(qd))) > 0  # hops actually drawn


def test_gated_layout_matches_jnp_path(cavity):
    """density_filter_accs=False shrinks both kernel layouts — the rhoI
    window row (consumed only by rhoAux1) and the two rhoAux accumulator
    rows are dropped from the packed matrices.  The remaining physics
    accumulators must match the jnp path (which runs the same gated
    _pass_a_offset), on both the rowloop and grouped kernels."""
    state, params, spec = cavity
    cfg = dataclasses.replace(spec.pair, density_filter_accs=False)
    names = [n for n, _ in _acc_layout(params, cfg)]
    assert "rhoAux1" not in names and "rhoAux2" not in names
    from sph_bvf_tpu.ops.pair_pallas import _field_layout
    assert "rhoI" not in [n for n, _ in _field_layout(params, cfg)]

    ref = compute_forces(
        state, params, spec.geom, dataclasses.replace(cfg, use_pallas=False)
    )
    assert float(jnp.max(jnp.abs(ref.rhoAux1))) == 0.0  # jnp path elided too
    pf = _per_particle(state, params, cfg)
    for rowloop in (True, False):
        acc = pass_a_pallas(pf, params, spec.geom, cfg, block=128,
                            interpret=True, rowloop=rowloop)
        for name in names:
            got = jnp.asarray(acc[name])
            want = getattr(ref, name)
            if name == "num_den":
                got = jnp.where(state.valid, got, 1.0)
            err = float(jnp.max(jnp.abs(got - want)))
            scale = max(float(jnp.max(jnp.abs(want))), 1e-12)
            assert err <= 5e-6 * scale, (rowloop, name, err, scale)
