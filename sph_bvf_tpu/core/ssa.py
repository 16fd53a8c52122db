"""Stochastic (SSA) reaction-diffusion of integer species counts.

TPU-native re-derivation of the reference's stochastic layer:

* **Diffusion** — the reference runs one *global, sequential* Gillespie loop
  over all hop events (pair_ssa_tsdpd_bvf_transport_velocity.cpp:739-809),
  with per-pair base propensity kappaSSA * (-dQc_base) and linear searches
  for the source/destination voxel.  That loop is inherently serial (and the
  reference refuses to run it on >1 rank, atom_vec_ssa_tsdpd_atomic.cpp:97).
  Here each *directed pair* (i -> j) draws the number of hops in dt from a
  truncated-Poisson with mean kappaSSA * (-dQc_base) * Cd_i * dt, using a
  counter-based hash of (tag_i, tag_j, step, species) so both endpoints of a
  pair reconstruct the same draw — molecule-conserving without any scatter
  or communication.  For dt small (per-pair mean << 1) this tau-leap is
  statistically equivalent to the exact SSA; the truncation order is
  configurable.  Like the reference, Cd is clamped at 0 after applying Qd
  (fix...transport_velocity.cpp:415-418).

* **Reactions** — the reference fires an exact per-particle Gillespie loop
  (fix...transport_velocity.cpp:420-458) with mass-action propensities set
  by fix ssa_tsdpd/ssa_rxn_mass_action (fix_ssa_tsdpd_ssa_rxn_mass_action
  .cpp:101-144: k*V for sources, k*Cd first-order, k/V*Cd0*Cd1 bimolecular,
  k/V/2*Cd*(Cd-1) dimerization, with voxel volume V = m/rho).  Reactions
  are independent across particles, so the same exact algorithm vectorizes
  directly: a bounded event loop with counter-based uniforms per
  (particle, step, event).  Propensities are recomputed from Cd each event
  — equivalent to, and simpler than, the reference's incremental updates.
  (The reference also carries a bug: its channel-selection accumulator
  `a_sum` is never reset between events within a step, biasing selection
  toward low channel indices when more than one event fires in a dt.  We
  implement the correct selection; with the intended tiny dt, multi-event
  steps are rare and the distributions agree.)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from sph_bvf_tpu.core.state import GROUP_ALL, Geometry, Params, State
from sph_bvf_tpu.ops import rand


@dataclasses.dataclass(frozen=True)
class SsaReaction:
    """One mass-action channel (fix ssa_tsdpd/ssa_rxn_mass_action)."""

    k_rate: float
    reactants: Tuple[int, ...] = ()  # at most 2
    products: Tuple[int, ...] = ()  # at most 4
    groupbit: int = GROUP_ALL

    def __post_init__(self):
        assert len(self.reactants) <= 2 and len(self.products) <= 4


@dataclasses.dataclass(frozen=True)
class SsaConfig:
    reactions: Tuple[SsaReaction, ...] = ()
    max_reaction_events: int = 16  # exact while events/step below this bound
    poisson_terms: int = 6  # diffusion hop-count truncation order
    rng_seed: int = 0


def poisson_hash(mu, terms: int, *words):
    """Truncated-Poisson sample via CDF inversion from one hashed uniform.

    Exact for outcomes < terms; P(N >= terms) is the neglected tail.
    """
    u = rand.uniform_01(*words)
    mu = jnp.asarray(mu)
    term = jnp.exp(-mu)  # P(N=0)
    cdf = term
    n = jnp.zeros(mu.shape, jnp.int32)
    for m in range(1, terms):
        n = n + (u > cdf).astype(jnp.int32)
        term = term * mu / m
        cdf = cdf + term
    return n


def pair_hop_counts(mu, seed, step, tag_src, tag_dst, species, terms):
    """Hops src->dst in dt; both endpoints reconstruct the same value."""
    return poisson_hash(
        mu,
        terms,
        jnp.uint32(seed),
        jnp.asarray(step, jnp.uint32),
        jnp.asarray(tag_src, jnp.uint32),
        jnp.asarray(tag_dst, jnp.uint32),
        jnp.asarray(species, jnp.uint32) + jnp.uint32(0xD1F),
    )


# ---------------------------------------------------------------------------
# Reactions (per-particle exact SSA, bounded event loop)
# ---------------------------------------------------------------------------


def _propensities(Cd, volume, groupmask, cfg: SsaConfig, dtype):
    """[R, cap, NC] mass-action propensities (reference :101-144)."""
    props = []
    for rx in cfg.reactions:
        if len(rx.reactants) == 0:
            a = rx.k_rate * volume
        elif len(rx.reactants) == 1:
            a = rx.k_rate * Cd[rx.reactants[0]].astype(dtype)
        else:
            r0, r1 = rx.reactants
            c0 = Cd[r0].astype(dtype)
            if r0 == r1:
                a = rx.k_rate / volume / 2.0 * c0 * (c0 - 1.0)
            else:
                a = rx.k_rate / volume * c0 * Cd[r1].astype(dtype)
        a = jnp.where((groupmask & rx.groupbit) != 0, a, 0.0)
        props.append(jnp.maximum(a, 0.0))
    return jnp.stack(props, axis=0)


def _stoich_table(cfg: SsaConfig, n_species: int):
    import numpy as np

    R = len(cfg.reactions)
    st = np.zeros((R, n_species), np.int32)
    for r, rx in enumerate(cfg.reactions):
        if len(rx.reactants) == 2 and rx.reactants[0] == rx.reactants[1]:
            st[r, rx.reactants[0]] -= 2
        else:
            for s in rx.reactants:
                st[r, s] -= 1
        for s in rx.products:
            st[r, s] += 1
    return jnp.asarray(st)


def ssa_reactions(state: State, params: Params, cfg: SsaConfig) -> State:
    """Exact per-particle Gillespie within one dt (reference :420-458)."""
    if not cfg.reactions or state.Cd.shape[0] == 0:
        return state
    dtype = state.x.dtype
    R = len(cfg.reactions)
    S = state.Cd.shape[0]
    stoichT = _stoich_table(cfg, S).T  # [S, R]
    volume = params.mass[state.ptype] / state.rho
    dt = state.dt

    kw = state.key.reshape(-1)
    seed_w = (
        jnp.uint32(cfg.rng_seed)
        ^ jnp.asarray(kw[0], jnp.uint32)
        ^ jnp.asarray(kw[-1], jnp.uint32)
    )

    def uniforms(event, salt):
        return rand.uniform_01(
            seed_w,
            jnp.asarray(state.step, jnp.uint32),
            jnp.asarray(state.tag, jnp.uint32),
            jnp.uint32(event),
            jnp.uint32(salt),
        ).astype(dtype)

    def body(e, carry):
        Cd, tt, alive = carry
        a = _propensities(Cd, volume, state.groupmask, cfg, dtype)  # [R,..]
        a0 = jnp.sum(a, axis=0)
        has = a0 > 0.0
        u1 = uniforms(e, 1)
        u2 = uniforms(e, 2)
        tt_next = tt - jnp.log(1.0 - u1) / jnp.maximum(a0, 1e-300)
        fire = alive & has & (tt_next < dt)
        # channel selection: first r with cumsum(a) > u2 * a0
        csum = jnp.cumsum(a, axis=0)
        idx = jnp.sum((csum <= (u2 * a0)[None]).astype(jnp.int32), axis=0)
        idx = jnp.minimum(idx, R - 1)
        delta = stoichT[:, idx]  # [S, ..]
        Cd = jnp.where(fire[None], Cd + delta, Cd)
        tt = jnp.where(alive & has, tt_next, tt)
        alive = fire
        return Cd, tt, alive

    Cd0 = state.Cd
    tt0 = jnp.zeros(Cd0.shape[1:], dtype)
    alive0 = state.valid
    Cd, _, _ = jax.lax.fori_loop(
        0, cfg.max_reaction_events, body, (Cd0, tt0, alive0)
    )
    Cd = jnp.maximum(Cd, 0)
    return dataclasses.replace(state, Cd=Cd)


def ssa_step(state: State, params: Params, geom: Geometry, cfg: SsaConfig) -> State:
    """Reactions after final_integrate (diffusion Qd is drawn in the pair
    pass, mirroring the reference's placement in Pair::compute)."""
    return ssa_reactions(state, params, cfg)
