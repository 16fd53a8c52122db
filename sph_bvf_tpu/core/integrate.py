"""Integrator fixes: the SPH-BVF velocity-Verlet family.

Mask-based re-expression of the reference integrator fixes
(`fix_ssa_tsdpd_bvf*.cpp`, `fix_ssa_tsdpd_stationary.cpp`): every
fluid/solid x free/fixed branch becomes a `jnp.where` over the whole state.
The branch tables below are transcribed 1:1 from the reference (citations on
each line); known reference quirks — e.g. solids drifting with `x += dtf*v`
(half a timestep, fix...transport_velocity.cpp:183-185), and the
variant-dependent dtf-vs-dtv density updates — are replicated, not repaired.

Layout: scalar masks/fields are [cap, NC]; vectors are [3, cap, NC] and
broadcast against scalars via a leading None (see core/state.py).

Variants:
  * transport_velocity — fix ssa_tsdpd/bvf/transportVelocity
        (fix_ssa_tsdpd_bvf_transport_velocity.cpp)
  * mechanics — + XSPH smoothing, fluid-force ramp, solid release gate
        (fix_ssa_tsdpd_bvf_mechanics.cpp:143-152)
  * fsi — mechanics scheme with tdampSolid=1 and the density filter disabled
        (fix_ssa_tsdpd_bvf_fsi.cpp:150,304)
  * bvf — plain velocity-Verlet with raw-phi bounce-back and moving-wall
        reflection (fix_ssa_tsdpd_bvf.cpp)
  * stationary — integrates only rho and C (fix_ssa_tsdpd_stationary.cpp)

SSA reactions (the per-particle Gillespie loop at the end of final_integrate,
fix...transport_velocity.cpp:414-458) live in core/ssa.py and are invoked by
the stepper immediately after final_integrate — equivalent placement, since
they touch only Cd.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from sph_bvf_tpu.core.state import Params, State

TRANSPORT_VELOCITY = "transport_velocity"
MECHANICS = "mechanics"
FSI = "fsi"
BVF = "bvf"
ARTIFICIAL_STRESS = "artificial_stress"
ZHANG = "zhang"
STATIONARY = "stationary"


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    variant: str = TRANSPORT_VELOCITY
    # XSPH velocity smoothing factor (mechanics/fsi: 0.001, fix...mechanics.cpp:143)
    xsph_factor: float = 0.0
    # fluid force ramp: damp = min(step/tdamp, 1) (mechanics/fsi: tdamp=1)
    tdamp: float = 0.0
    # solid release gate: dampSolid = 0 until step >= tdamp_solid
    # (mechanics: 1e6, fix...mechanics.cpp:151; fsi: 1, fix...fsi.cpp:150)
    tdamp_solid: float = 0.0
    # Shepard density-filter cadence (fix...transport_velocity.cpp:287; fsi
    # disables it with 1e16, fix...fsi.cpp:304)
    freq_filter: int = 20
    # mechanics/fsi use dtv (not dtf) in the unfiltered free-fluid density
    # update (fix...mechanics.cpp:395 vs fix...transport_velocity.cpp:373)
    density_dtv: bool = False

    def reads_rhoaux(self) -> bool:
        """Does final_integrate ever consume the Shepard-filter
        accumulators (rhoAux1/rhoAux2)?  Only the transport-velocity
        family and zhang apply the filter, and only when the cadence is a
        real one (fsi's 1e16 sentinel means never).  When False, the pair
        pass skips accumulating them entirely — exactly dead work
        (PairConfig.density_filter_accs); when True, the stepper can
        still skip them on the 19-of-20 steps between filter events
        (run_chunk's ``phase`` segmentation)."""
        return (
            self.variant in (TRANSPORT_VELOCITY, MECHANICS, FSI, ZHANG)
            and 0 < self.freq_filter <= 2**31 - 1
        )

    @staticmethod
    def transport_velocity(**kw):
        return IntegratorConfig(variant=TRANSPORT_VELOCITY, **kw)

    @staticmethod
    def mechanics(**kw):
        kw.setdefault("xsph_factor", 0.001)
        kw.setdefault("tdamp", 1.0)
        kw.setdefault("tdamp_solid", 1e6)
        kw.setdefault("density_dtv", True)
        return IntegratorConfig(variant=MECHANICS, **kw)

    @staticmethod
    def fsi(**kw):
        kw.setdefault("xsph_factor", 0.001)
        kw.setdefault("tdamp", 1.0)
        kw.setdefault("tdamp_solid", 1.0)
        kw.setdefault("freq_filter", int(1e16))
        kw.setdefault("density_dtv", True)
        return IntegratorConfig(variant=FSI, **kw)

    @staticmethod
    def bvf(**kw):
        return IntegratorConfig(variant=BVF, **kw)

    @staticmethod
    def artificial_stress(**kw):
        """fix ssa_tsdpd/bvf/artificialStress — the plain bvf Verlet scheme
        but with phi/nw/v_weighted_solid/a_weighted_solid NORMALIZED by
        number_density before the phi>0.5 gate and the wall reflections
        (fix_ssa_tsdpd_bvf_artificial_stress.cpp:276-287 normalize,
        :296-344 reflections).  NOT an alias of bvf: plain bvf uses the raw
        accumulators (fix_ssa_tsdpd_bvf.cpp:272-293), which shifts the gate
        and scales the moving-wall velocity terms.  The reference also
        normalizes in initial_integrate (:146-157), but those values are
        zeroed by force_clear before the pair sweep refills them and
        nothing reads them in between (verlet.cpp:240-353 stage order), so
        only the final-half normalization is observable and implemented."""
        return IntegratorConfig(variant=ARTIFICIAL_STRESS, **kw)

    @staticmethod
    def zhang(**kw):
        """fix ssa_tsdpd/bvf/zhang — the Zhang-2017 density-scheme
        experiment (fix_ssa_tsdpd_bvf_zhang.cpp).  NOT an alias: free
        solids use the fluid transport-velocity scheme with a full-dtv
        deviatoric step (:181-190), the bounce-back is the moving-wall
        reflection with vws/aws NORMALIZED by number_density (:159-166,
        :341-343), and the filtered density update is the (sic) inverted
        ``rhoAux2 / min(rhoAux1, 1)`` form (:358-359), replicated as-is."""
        return IntegratorConfig(variant=ZHANG, **kw)

    @staticmethod
    def stationary(**kw):
        return IntegratorConfig(variant=STATIONARY, **kw)


def _masks(state: State):
    solid = state.solid_tag == 1
    fixed = state.fixed_tag == 1
    return (~fixed & ~solid), (~fixed & solid), (fixed & ~solid), (fixed & solid)


def _damps(state: State, cfg: IntegratorConfig, dtype):
    """Fluid ramp + solid release gate (mechanics/fsi; fix...mechanics.cpp:146-152)."""
    tnow = state.step.astype(dtype)
    if cfg.tdamp > 0:
        damp = jnp.minimum(tnow / cfg.tdamp, 1.0)
    else:
        damp = jnp.ones((), dtype)
    if cfg.variant == MECHANICS:
        # mechanics: `tnow < tdampSolid` (fix...mechanics.cpp:152)
        damp_solid = jnp.where(tnow < cfg.tdamp_solid, 0.0, 1.0)
    elif cfg.variant == FSI:
        # fsi: `tnow <= tdampSolid` (fix...fsi.cpp:151)
        damp_solid = jnp.where(tnow <= cfg.tdamp_solid, 0.0, 1.0)
    else:
        damp_solid = jnp.ones((), dtype)
    return damp, damp_solid


def setup_pre_force(state: State) -> State:
    """vest = v; rhoI = rho (fix...transport_velocity.cpp:76-95)."""
    return dataclasses.replace(state, vest=state.v, rhoI=state.rho)


def _clamped_species_halfstep(state: State, dtf):
    """C += Q dtf, clamped >= 0 (fix...transport_velocity.cpp:233-237)."""
    if state.C.shape[0] == 0:
        return state.C
    return jnp.maximum(state.C + state.Q * dtf, 0.0)


def initial_integrate(state: State, params: Params, cfg: IntegratorConfig) -> State:
    dtype = state.x.dtype
    dtv = state.dt
    dtf = 0.5 * state.dt * params.ftm2v
    m = params.mass[state.ptype]
    dtfm = (dtf / m)[None]  # [1, cap, NC] against vectors

    if cfg.variant == STATIONARY:
        # fix_ssa_tsdpd_stationary.cpp:74-133: only rho (and C) advance.
        return dataclasses.replace(
            state,
            rho=state.rho + dtf * state.drho,
            C=_clamped_species_halfstep(state, dtf),
        )

    free_fluid, free_solid, fixed_fluid, fixed_solid = _masks(state)
    ff = free_fluid[None]
    fs = free_solid[None]

    if cfg.variant in (BVF, ARTIFICIAL_STRESS):
        # fix_ssa_tsdpd_bvf.cpp:145-199: one scheme for all free particles,
        # and fixed FLUID particles still integrate (reference behavior).
        # artificialStress shares this half verbatim (its :146-157
        # normalization is dead — see the factory docstring).
        moving = (free_fluid | free_solid | fixed_fluid)[None]
        vest = jnp.where(moving, state.v + 2.0 * dtfm * state.f, state.vest)
        v = jnp.where(moving, state.v + dtfm * state.f, state.v)
        x = state.x + jnp.where(moving, dtf * v, 0.0)
        S_dot = (free_solid | fixed_solid)[None, None]
        S = state.S + jnp.where(S_dot, dtf * state.dS, 0.0)
        # :211 — all particles: rho += dtf*drho (no rhoI bookkeeping)
        rho = state.rho + dtf * state.drho
        return dataclasses.replace(
            state,
            vest=vest,
            v=v,
            x=x,
            S=S,
            rho=rho,
            C=_clamped_species_halfstep(state, dtf),
        )

    if cfg.variant == ZHANG:
        # fix_ssa_tsdpd_bvf_zhang.cpp:166-232: every free particle (fluid
        # AND solid) takes the fluid transport-velocity scheme, and fixed
        # fluids too; free solids additionally advance the deviatoric
        # tensor by a FULL dtv (:181-187).  Fixed solids only set rhoI.
        moving = (free_fluid | free_solid | fixed_fluid)[None]
        vest = jnp.where(moving, state.v + dtfm * state.f, state.vest)
        v = jnp.where(moving, vest - dtfm * state.ddv, state.v)
        x = state.x + jnp.where(moving, dtv * v, 0.0)
        S = state.S + jnp.where(free_solid[None, None], dtv * state.dS, 0.0)
        adv = free_fluid | free_solid | fixed_fluid
        rho = state.rho + jnp.where(adv, dtf * state.drho, 0.0)
        return dataclasses.replace(
            state,
            vest=vest,
            v=v,
            x=x,
            S=S,
            rhoI=jnp.where(state.valid, state.rho, state.rhoI),
            rho=rho,
            C=_clamped_species_halfstep(state, dtf),
        )

    # --- transport_velocity / mechanics / fsi family -----------------------
    damp, damp_solid = _damps(state, cfg, dtype)
    nden = state.num_den[None]
    xsph = cfg.xsph_factor * state.ddx / nden if cfg.xsph_factor else 0.0

    # free fluid (fix...transport_velocity.cpp:151-167)
    vest_fluid = state.v + dtfm * state.f * damp + xsph
    v_fluid = vest_fluid - dtfm * state.ddv

    # free solid (:170-192)
    vest_solid = (state.v + 2.0 * dtfm * state.f + xsph) * damp_solid
    v_solid = (state.v + dtfm * state.f) * damp_solid

    vest = jnp.where(ff, vest_fluid, jnp.where(fs, vest_solid, state.vest))
    v = jnp.where(ff, v_fluid, jnp.where(fs, v_solid, state.v))
    # positions: fluid moves dtv*v, solid dtf*v (reference :164-185)
    x = state.x + jnp.where(ff, dtv * v, jnp.where(fs, dtf * v, 0.0))

    # deviatoric half-step: free solid 0.5*dtv (== dtf), fixed solid dtf (:188-222)
    S_mask = (free_solid | fixed_solid)[None, None]
    S = state.S + jnp.where(S_mask, dtf * state.dS, 0.0)

    # density: all free + fixed fluid advance; fixed solid only rhoI (:198-227)
    adv = (free_fluid | free_solid | fixed_fluid)
    rho = state.rho + jnp.where(adv, dtf * state.drho, 0.0)

    return dataclasses.replace(
        state,
        vest=vest,
        v=v,
        x=x,
        S=S,
        rhoI=jnp.where(state.valid, state.rho, state.rhoI),
        rho=rho,
        C=_clamped_species_halfstep(state, dtf),
    )


def _bounce_back(state: State, v, nw, dtv, phi_gate):
    """BVF wall reflection (fix...transport_velocity.cpp:309-342).

    Rewind x, reflect v about the wall normal with no-penetration correction,
    re-advance x.  Applied where phi_gate holds.
    """
    norm = jnp.sqrt(jnp.sum(nw * nw, axis=0, keepdims=True))
    en = -nw / jnp.maximum(norm, 1e-30)
    v_dot_en = jnp.sum(v * en, axis=0, keepdims=True)
    v_ref = -v + 2.0 * jnp.maximum(0.0, v_dot_en) * en
    g = phi_gate[None]
    new_v = jnp.where(g, v_ref, v)
    # x_new = x - dtv*v + dtv*new_v  where gated
    new_x = state.x + jnp.where(g, dtv * (new_v - v), 0.0)
    return new_v, new_x


def final_integrate(state: State, params: Params, cfg: IntegratorConfig) -> State:
    dtype = state.x.dtype
    dtv = state.dt
    dtf = 0.5 * state.dt * params.ftm2v
    m = params.mass[state.ptype]
    dtfm = (dtf / m)[None]

    if cfg.variant == STATIONARY:
        return dataclasses.replace(
            state,
            rho=state.rho + dtf * state.drho,
            C=_clamped_species_halfstep(state, dtf),
            Cd=_clamped_ssa(state),
        )

    free_fluid, free_solid, fixed_fluid, fixed_solid = _masks(state)

    if cfg.variant in (BVF, ARTIFICIAL_STRESS):
        return _final_integrate_bvf(
            state, params, cfg, dtv, dtf, dtfm,
            free_fluid, free_solid, fixed_fluid, fixed_solid,
            normalize=(cfg.variant == ARTIFICIAL_STRESS),
        )

    if cfg.variant == ZHANG:
        return _final_integrate_zhang(
            state, params, cfg, dtv, dtf, dtfm,
            free_fluid, free_solid, fixed_fluid, fixed_solid,
        )

    # --- transport_velocity / mechanics / fsi family -----------------------
    damp, damp_solid = _damps(state, cfg, dtype)
    nden = jnp.maximum(state.num_den, 1e-30)

    # normalize phi/nw in place (:297-301); these persist for computes/dumps.
    phi = state.phi / nden
    nw = state.nw / nden[None]
    xsph = cfg.xsph_factor * state.ddx / nden[None] if cfg.xsph_factor else 0.0

    # BVF bounce-back for free fluid with phi > 0.5 (:309-342)
    gate = free_fluid & (phi > 0.5)
    v_bb, x_bb = _bounce_back(state, state.v, nw, dtv, gate)

    # final velocities (:345-357)
    v_fluid = state.vest + dtfm * state.f * damp + xsph
    v_solid = (v_bb + dtfm * state.f + xsph) * damp_solid
    v = jnp.where(
        free_fluid[None],
        v_fluid,
        jnp.where(free_solid[None], v_solid, v_bb),
    )

    # final deviatoric half-step (:360-364, :392-394)
    S_mask = (free_solid | fixed_solid)[None, None]
    S = state.S + jnp.where(S_mask, dtf * state.dS, 0.0)

    # density update table (:370-402 tv; fix...mechanics.cpp:391-448).
    # fsi disables the Shepard filter with a huge cadence (fix...fsi.cpp:304)
    # that would overflow i32 inside jit — treat it as "never".
    if 0 < cfg.freq_filter <= 2**31 - 1:
        on_filter = (state.step % cfg.freq_filter) == 0
    else:
        on_filter = jnp.zeros((), bool)
    aux = state.rhoAux1 / jnp.maximum(state.rhoAux2, 1e-30)
    if cfg.variant == TRANSPORT_VELOCITY:
        rho_free_f = jnp.where(on_filter, aux + dtf * state.drho,
                               state.rhoI + dtf * state.drho)
        rho_free_s = rho_free_f
    else:  # mechanics / fsi
        rho_free_f = jnp.where(on_filter, aux + dtf * state.drho,
                               state.rhoI + dtv * state.drho)
        rho_free_s = state.rhoI + dtv * state.drho
    rho_fixed_f = jnp.where(on_filter, aux + dtv * state.drho,
                            state.rhoI + dtv * state.drho)
    rho_fixed_s = jnp.where(on_filter, aux, state.rhoI)
    rho = jnp.where(
        free_fluid, rho_free_f,
        jnp.where(free_solid, rho_free_s,
                  jnp.where(fixed_fluid, rho_fixed_f, rho_fixed_s)),
    )
    rho = jnp.where(state.valid, rho, 1.0)

    return dataclasses.replace(
        state,
        x=x_bb,
        v=v,
        S=S,
        rho=rho,
        phi=phi,
        nw=nw,
        C=_clamped_species_halfstep(state, dtf),
        Cd=_clamped_ssa(state),
    )


def _final_integrate_bvf(
    state, params, cfg, dtv, dtf, dtfm,
    free_fluid, free_solid, fixed_fluid, fixed_solid,
    normalize=False,
):
    """fix_ssa_tsdpd_bvf.cpp:218-358 — plain Verlet + moving-wall reflection.

    Differences from the tv family: phi/nw are NOT normalized; the weighted
    solid velocity/acceleration enter the reflection unnormalized (:276-292);
    fixed fluids keep integrating v and x (:307-317, reference behavior); and
    there is no position rewind in the bounce-back.

    With ``normalize`` (the artificialStress variant,
    fix_ssa_tsdpd_bvf_artificial_stress.cpp:276-287), phi/nw/vws/aws are
    divided by number_density first — shifting the phi>0.5 gate and the
    moving-wall velocity/acceleration terms — and the normalized values
    persist for computes/dumps, as the reference mutates them in place.
    """
    if normalize:
        nden = jnp.maximum(state.num_den, 1e-30)
        phi = state.phi / nden
        nw = state.nw / nden[None]
        vws = state.vws / nden[None]
        aws = state.aws / nden[None]
    else:
        phi, nw, vws, aws = state.phi, state.nw, state.vws, state.aws

    # free particles: v += dtfm f (:264-267); fixed fluid too (:309-317)
    moving = free_fluid | free_solid | fixed_fluid
    v = state.v + jnp.where(moving[None], dtfm * state.f, 0.0)
    # fixed fluid also drifts x += dtf v (:315-317)
    x = state.x + jnp.where(fixed_fluid[None], dtf * v, 0.0)

    # reflection for free fluid (moving-wall terms, :276-292)
    gate_free = free_fluid & (phi > 0.5)
    norm = jnp.sqrt(jnp.sum(nw * nw, axis=0, keepdims=True))
    en = -nw / jnp.maximum(norm, 1e-30)
    v_dot_en = jnp.sum(v * en, axis=0, keepdims=True)
    v_ref_free = (
        2.0 * vws + aws * dtv - v
        + 2.0 * jnp.maximum(0.0, v_dot_en) * en
    )
    # reflection for fixed fluid (stationary-wall form, :330-336)
    gate_fixed = fixed_fluid & (phi > 0.5)
    v_ref_fixed = -v + 2.0 * jnp.maximum(0.0, v_dot_en) * en

    v = jnp.where(gate_free[None], v_ref_free, v)
    v = jnp.where(gate_fixed[None], v_ref_fixed, v)

    S_mask = (free_solid | fixed_solid)[None, None]
    S = state.S + jnp.where(S_mask, dtf * state.dS, 0.0)
    rho = state.rho + dtf * state.drho  # :358
    persist = dict(phi=phi, nw=nw, vws=vws, aws=aws) if normalize else {}
    return dataclasses.replace(
        state,
        v=v,
        x=x,
        S=S,
        rho=jnp.where(state.valid, rho, 1.0),
        C=_clamped_species_halfstep(state, dtf),
        Cd=_clamped_ssa(state),
        **persist,
    )


def _final_integrate_zhang(
    state, params, cfg, dtv, dtf, dtfm,
    free_fluid, free_solid, fixed_fluid, fixed_solid,
):
    """fix_ssa_tsdpd_bvf_zhang.cpp:246-443 — transport-velocity final kicks
    with a moving-wall reflection and the Zhang density experiment.

    Differences from the tv family: vws/aws are NORMALIZED by
    number_density before entering the reflection (:305-311); the free-fluid
    bounce-back uses the moving-wall form 2U + a dtv - v + 2max(0,v.en)en
    with NO position rewind (:341-343); free solids get no deviatoric
    update in final_integrate (commented out, :348-355) while fixed solids
    advance it by dtf (:399-403); and the filtered free density update is
    the (sic) ``rhoAux2 / min(rhoAux1, 1) + dtf drho`` form (:358-359) with
    ``rho = rhoI + dtv drho`` off-filter.
    """
    nden = jnp.maximum(state.num_den, 1e-30)
    phi = state.phi / nden
    nw = state.nw / nden[None]
    vws = state.vws / nden[None]
    aws = state.aws / nden[None]

    # final velocity for everything that moves (:318-321, :368-371)
    moving = free_fluid | free_solid | fixed_fluid
    v = jnp.where(moving[None], state.vest + dtfm * state.f, state.v)

    norm = jnp.sqrt(jnp.sum(nw * nw, axis=0, keepdims=True))
    en = -nw / jnp.maximum(norm, 1e-30)
    v_dot_en = jnp.sum(v * en, axis=0, keepdims=True)
    refl = 2.0 * jnp.maximum(0.0, v_dot_en) * en
    gate_free = free_fluid & (phi > 0.5)
    gate_fixed = fixed_fluid & (phi > 0.5)
    v = jnp.where(gate_free[None], 2.0 * vws + aws * dtv - v + refl, v)
    v = jnp.where(gate_fixed[None], -v + refl, v)

    S = state.S + jnp.where(fixed_solid[None, None], dtf * state.dS, 0.0)

    # density (:357-361 free; :394-396 fixed fluid; :404-407 fixed solid)
    if 0 < cfg.freq_filter <= 2**31 - 1:
        on_filter = (state.step % cfg.freq_filter) == 0
    else:
        on_filter = jnp.zeros((), bool)
    aux = state.rhoAux2 / jnp.minimum(state.rhoAux1, 1.0)
    rho_free = jnp.where(on_filter, aux + dtf * state.drho,
                         state.rhoI + dtv * state.drho)
    rho = jnp.where(
        free_fluid | free_solid, rho_free,
        jnp.where(fixed_fluid, state.rhoI + dtv * state.drho, state.rhoI),
    )
    return dataclasses.replace(
        state,
        v=v,
        S=S,
        rho=jnp.where(state.valid, rho, 1.0),
        phi=phi,
        nw=nw,
        vws=vws,
        aws=aws,
        C=_clamped_species_halfstep(state, dtf),
        Cd=_clamped_ssa(state),
    )


def _clamped_ssa(state: State):
    """Cd += Qd, clamped >= 0 (fix...transport_velocity.cpp:415-418)."""
    if state.Cd.shape[0] == 0:
        return state.Cd
    return jnp.maximum(state.Cd + state.Qd, 0)
