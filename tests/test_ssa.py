"""Stochastic (SSA) layer: samplers, propensities, reaction statistics,
and diffusion conservation.

The reference's SSA is a serial, wall-clock-seeded Gillespie loop
(pair...transport_velocity.cpp:739-809, fix...transport_velocity.cpp:414-458)
that refuses to run on >1 rank; the TPU re-derivation is counter-based and
must be validated *statistically* (VALIDATION.md).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from sph_bvf_tpu.core.ssa import (
    SsaConfig,
    SsaReaction,
    _propensities,
    poisson_hash,
    ssa_reactions,
)
from sph_bvf_tpu.core.state import GROUP_ALL
from sph_bvf_tpu.core.stepper import run_chunk, setup
from sph_bvf_tpu.api.scene import Region, Scene

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_truncated_poisson_moments():
    mu = 0.35
    n = 200_000
    words = jnp.arange(n, dtype=jnp.uint32)
    draws = poisson_hash(jnp.full((n,), mu), 8, jnp.uint32(7), words)
    m = float(jnp.mean(draws.astype(jnp.float64)))
    v = float(jnp.var(draws.astype(jnp.float64)))
    # Poisson: mean == var == mu; truncation error at 8 terms is ~mu^8/8!
    assert abs(m - mu) < 0.01, m
    assert abs(v - mu) < 0.02, v


def test_propensity_formulas():
    """Mass-action propensities (fix_ssa_tsdpd_ssa_rxn_mass_action.cpp:101-144)."""
    Cd = jnp.asarray([[[5]], [[3]]], jnp.int32)  # [S=2, cap=1, NC=1]
    volume = jnp.full((1, 1), 2.0)
    gm = jnp.full((1, 1), GROUP_ALL, jnp.int32)
    cfg = SsaConfig(
        reactions=(
            SsaReaction(k_rate=1.5),  # source: a = k V
            SsaReaction(k_rate=2.0, reactants=(0,)),  # a = k c0
            SsaReaction(k_rate=3.0, reactants=(0, 1)),  # a = k/V c0 c1
            SsaReaction(k_rate=4.0, reactants=(0, 0)),  # a = k/V/2 c0 (c0-1)
        )
    )
    a = np.asarray(_propensities(Cd, volume, gm, cfg, jnp.float64))[:, 0, 0]
    np.testing.assert_allclose(
        a, [1.5 * 2.0, 2.0 * 5, 3.0 / 2.0 * 5 * 3, 4.0 / 2.0 / 2.0 * 5 * 4]
    )


def _decay_state(n_particles=4096, c0=40, k=3.0, dt=0.1, seed=1):
    """Homogeneous pure-death system A -> 0 packed into a dummy state."""
    from sph_bvf_tpu.core.state import Geometry, Params, State

    geom = Geometry.build(dim=2, lo=(0, 0, 0), hi=(1, 1, 1), cutoff=0.3, cap=1)
    geom = dataclasses.replace(
        geom, cap=n_particles // geom.ncells_total + 1
    )
    st = State.zeros(geom, n_sdpd=0, n_ssa=1, seed=seed)
    cap, NC = st.rho.shape
    valid = np.zeros((cap, NC), bool)
    valid.reshape(-1)[:n_particles] = True
    tags = np.zeros((cap, NC), np.int32)
    tags.reshape(-1)[:n_particles] = np.arange(1, n_particles + 1)
    st = dataclasses.replace(
        st,
        valid=jnp.asarray(valid),
        tag=jnp.asarray(tags),
        groupmask=jnp.where(jnp.asarray(valid), GROUP_ALL, 0),
        Cd=jnp.where(jnp.asarray(valid), c0, 0)[None].astype(jnp.int32),
        dt=jnp.asarray(dt, jnp.float64),
    )
    params = Params(
        mass=jnp.ones(1), rho0=jnp.ones(1), c0=jnp.ones(1), B=jnp.ones(1),
        G0=jnp.zeros(1), cut=jnp.ones((1, 1)), cutc=jnp.ones((1, 1)),
        visc=jnp.zeros((1, 1)), kappa=jnp.zeros((1, 1, 0)),
        kappa_ssa=jnp.ones((1, 1, 1)),
    )
    return st, params, k


def test_reaction_decay_statistics():
    """A -> 0 at rate k: E[Cd(dt)] = c0 exp(-k dt), Gillespie-exact."""
    st, params, k = _decay_state(c0=40, k=3.0, dt=0.1)
    cfg = SsaConfig(
        reactions=(SsaReaction(k_rate=k, reactants=(0,)),),
        max_reaction_events=64,
    )
    out = ssa_reactions(st, params, cfg)
    cd = np.asarray(out.Cd[0])[np.asarray(st.valid)]
    expect = 40 * np.exp(-k * 0.1)  # 29.63
    sem = np.sqrt(40 * np.exp(-k * 0.1) * (1 - np.exp(-k * 0.1)) / cd.size)
    assert abs(cd.mean() - expect) < 5 * sem + 0.05, (cd.mean(), expect)
    # no particle can go negative
    assert cd.min() >= 0


def test_reaction_stream_decorrelates_with_key():
    st, params, k = _decay_state()
    cfg = SsaConfig(reactions=(SsaReaction(k_rate=k, reactants=(0,)),))
    a = np.asarray(ssa_reactions(st, params, cfg).Cd)
    st2 = dataclasses.replace(st, key=jax.random.PRNGKey(99))
    b = np.asarray(ssa_reactions(st2, params, cfg).Cd)
    assert not np.array_equal(a, b)
    # same key -> bitwise reproducible
    c = np.asarray(ssa_reactions(st, params, cfg).Cd)
    np.testing.assert_array_equal(a, c)


def _ssa_cavity():
    """Small closed box with one integer species in the fluid."""
    sc = Scene(dim=2, n_ssa=1, boundary=("f", "f", "p"))
    sc.rebin_every = 5
    L, N = 1.0, 12
    dx = L / N
    sc.create_box(1, Region.block(0, L, 0, L, 0, dx))
    sc.lattice("sq", dx)
    sc.create_atoms(1, Region.block(0, L, 0, L, 0, dx))
    sc.mass(1, 1.0 / (N * N))
    sc.set("all", rho=1.0)
    sc.set("all", Cd=(0, 100))
    sc.pair_style("transport_velocity")
    # kappa_ssa sized so per-pair hop means are ~0.05/step: enough hops to
    # observe, small enough that the truncated Poisson is effectively exact
    sc.pair_coeff(1, 1, 1.0, 10.0, 1e-2, 2.5 * dx, 2.5 * dx, 0.0,
                  kappa_ssa=(0.1,))
    sc.integrator("transport_velocity")
    sc.timestep(1e-4)
    return sc.build()


def test_diffusion_conserves_molecules():
    """Counter-based pair hops: both endpoints draw the same count, so the
    total is conserved exactly (no clamping in this regime)."""
    state, params, spec = _ssa_cavity()
    total0 = int(jnp.sum(jnp.where(state.valid, state.Cd[0], 0)))
    state = setup(state, params, spec, dt=1e-4)
    for _ in range(4):
        state = run_chunk(state, params, spec, 5)
    total = int(jnp.sum(jnp.where(state.valid, state.Cd[0], 0)))
    assert total == total0, (total, total0)
    # and hops actually happened
    assert int(jnp.max(jnp.abs(state.Qd))) >= 0
    cd = np.asarray(state.Cd[0])[np.asarray(state.valid)]
    assert cd.std() > 0  # counts redistributed stochastically


def test_ssa_scenario_via_lmp_front_end():
    """The SSA golden scenario (tools/ssa_golden.py) end-to-end through the
    .lmp front end: one SSA species on a fixed-solid crystal under the tv
    integrator, diffusing left->right.  Validates the script path
    (atom_style ssa counts, set ssa_tsdpd/Cd, pair_coeff kappaSSA) plus
    conservation and the tau-leap regime diagnostic."""
    import sys

    sys.path.insert(0, ROOT)
    from tools.ssa_golden import CD0, NXP, scenario_lmp

    from sph_bvf_tpu.api.lmp import parse_script
    from sph_bvf_tpu.ops.pair import compute_ssa_mu_max

    text = "\n".join(
        l for l in scenario_lmp(20, "/tmp", 20).splitlines()
        if not l.startswith("dump")
    )
    model = parse_script(text)
    state, params, spec = model.build()
    assert params.n_ssa == 1
    total0 = int(jnp.sum(jnp.where(state.valid, state.Cd[0], 0)))
    assert total0 == CD0 * (NXP // 2) * NXP

    state = setup(state, params, spec, dt=model.dt)
    mu = float(compute_ssa_mu_max(state, params, spec.geom, spec.pair))
    assert 0.0 < mu < 0.3, mu  # scenario sits inside the tau-leap regime

    for _ in range(2):
        state = run_chunk(state, params, spec, spec.rebin_every)
    total = int(jnp.sum(jnp.where(state.valid, state.Cd[0], 0)))
    assert abs(total - total0) <= 2, (total, total0)
    # kinematics frozen: every particle is a fixed solid
    assert float(jnp.max(jnp.abs(state.v))) == 0.0
    # molecules crossed the step: some right-half particle has counts
    x = state.x[0]
    right = state.valid & (x > 0.5e-3)
    assert int(jnp.max(jnp.where(right, state.Cd[0], 0))) > 0
