"""End-to-end integrator-variant validation against per-particle transcriptions.

Closes the round-1 gap: the plain-bvf, zhang, stationary, and dt/adaptive
variants were implemented but had no test exercising their unique branches.

Each test drives the SAME force evaluation (ops/pair.compute_forces, itself
f64-validated against the brute-force spec in tests/ref_pair.py) through two
steppers: the framework's masked integrator (core/integrate.py) and a scalar
per-particle numpy transcription of the corresponding reference fix
(citations inline) — so any divergence isolates an integrator-branch bug.
The random system mixes free/fixed x fluid/solid particles and seeds solid
clusters dense enough that some fluid crosses the phi > 0.5 bounce-back
gate, with MOVING free solids so the weighted-solid reflection terms
(vws/aws) are nonzero.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from sph_bvf_tpu.core.integrate import (
    IntegratorConfig,
    final_integrate,
    initial_integrate,
    setup_pre_force,
)
from sph_bvf_tpu.core.state import gather_particles, scatter_by_tag
from sph_bvf_tpu.ops.pair import PairConfig, compute_forces

from test_pair import build_state_params, random_system


ACC_FIELDS = (
    "f", "drho", "Q", "ddv", "ddx", "phi", "nw", "num_den",
    "vws", "aws", "dS", "rhoAux1", "rhoAux2",
)
DYN_FIELDS = ("x", "v", "vest", "rho", "rhoI", "C", "S")


def clustered_system(seed=11, n=140):
    """random_system + a dense free-solid cluster and penetrating fluid.

    Guarantees (asserted by the tests): at least one fluid particle with
    normalized phi > 0.5 (bounce-back branch taken) and nonzero vws/aws
    (moving-wall terms matter).
    """
    sys = random_system(seed=seed, n=n)
    rng = np.random.default_rng(seed + 1000)
    # a 5x5 lattice of FREE solids around (0.3, 0.3), all moving together
    k = 0
    for i in range(n):
        if k >= 25:
            break
        gx, gy = divmod(k, 5)
        sys["x"][i] = (0.25 + 0.025 * gx, 0.25 + 0.025 * gy)
        sys["solid"][i] = True
        sys["fixed"][i] = False
        sys["v"][i] = (0.05, -0.03, 0.0)
        sys["vest"][i] = sys["v"][i]
        sys["S"][i] = 0.01 * np.eye(3)
        k += 1
    # two fluid particles INSIDE the cluster => phi ~ 1 immediately
    for j, pos in ((k, (0.3, 0.3)), (k + 1, (0.31, 0.29))):
        sys["x"][j] = pos
        sys["solid"][j] = False
        sys["fixed"][j] = False
        sys["v"][j] = rng.normal(0, 0.05, 3)
        sys["v"][j][2] = 0.0
        sys["vest"][j] = sys["v"][j]
    return sys


def _np_state(sys, ns=1):
    n = sys["x"].shape[0]
    x3 = np.concatenate([sys["x"], np.zeros((n, 1))], axis=1)
    return dict(
        x=x3.astype(np.float64),
        v=sys["v"].astype(np.float64).copy(),
        vest=sys["vest"].astype(np.float64).copy(),
        rho=sys["rho"].astype(np.float64).copy(),
        rhoI=sys["rhoI"].astype(np.float64).copy(),
        C=sys["C"].astype(np.float64).copy(),
        S=sys["S"].astype(np.float64).copy(),
        solid=sys["solid"].copy(),
        fixed=sys["fixed"].copy(),
        m=sys["mass"][sys["ptype"]].astype(np.float64),
    )


def _forces_np(s, st_template, params, geom, cfg):
    """Evaluate the framework force pass on the transcription's state."""
    st = scatter_by_tag(
        st_template,
        x=s["x"], v=s["v"], vest=s["vest"], rho=s["rho"], rhoI=s["rhoI"],
        C=s["C"], S=s["S"],
    )
    st = dataclasses.replace(
        st,
        rho=jnp.where(st.valid, st.rho, 1.0),
        rhoI=jnp.where(st.valid, st.rhoI, 1.0),
    )
    out = compute_forces(st, params, geom, cfg)
    return gather_particles(out, geom, fields=ACC_FIELDS)


def _run_framework(st, params, geom, pair_cfg, integ, nsteps):
    st = setup_pre_force(st)
    st = compute_forces(st, params, geom, pair_cfg)
    for _ in range(nsteps):
        st = dataclasses.replace(st, step=st.step + 1)
        st = initial_integrate(st, params, integ)
        st = compute_forces(st, params, geom, pair_cfg)
        st = final_integrate(st, params, integ)
    return st


# ---------------------------------------------------------------------------
# per-particle reference transcriptions
# ---------------------------------------------------------------------------


def _zhang_initial(s, acc, dt):
    """fix_ssa_tsdpd_bvf_zhang.cpp:104-243 (scalar transcription)."""
    dtf = 0.5 * dt
    n = s["x"].shape[0]
    for i in range(n):
        dtfm = dtf / s["m"][i]
        if not s["fixed"][i]:  # :166
            s["vest"][i] = s["v"][i] + dtfm * acc["f"][i]
            s["v"][i] = s["vest"][i] - dtfm * acc["ddv"][i]
            s["x"][i] = s["x"][i] + dt * s["v"][i]
            if s["solid"][i]:  # :181-187 full-dtv deviatoric step
                s["S"][i] = s["S"][i] + dt * acc["dS"][i]
            s["rhoI"][i] = s["rho"][i]
            s["rho"][i] = s["rho"][i] + dtf * acc["drho"][i]
        else:
            if not s["solid"][i]:  # :198-222 fixed fluid
                s["vest"][i] = s["v"][i] + dtfm * acc["f"][i]
                s["v"][i] = s["vest"][i] - dtfm * acc["ddv"][i]
                s["x"][i] = s["x"][i] + dt * s["v"][i]
                s["rhoI"][i] = s["rho"][i]
                s["rho"][i] = s["rho"][i] + dtf * acc["drho"][i]
            else:  # :224-232 fixed solid: rhoI only
                s["rhoI"][i] = s["rho"][i]
        s["C"][i] = np.maximum(s["C"][i] + acc["Q"][i] * dtf, 0.0)  # :236-240


def _zhang_final(s, acc, dt, step, freq_filter):
    """fix_ssa_tsdpd_bvf_zhang.cpp:246-443 (scalar transcription)."""
    dtf = 0.5 * dt
    n = s["x"].shape[0]
    phi_out = np.zeros(n)
    for i in range(n):
        dtfm = dtf / s["m"][i]
        nden = max(acc["num_den"][i], 1e-30)
        phi = acc["phi"][i] / nden  # :300-303
        nw = acc["nw"][i] / nden
        vws = acc["vws"][i] / nden  # :305-311 zhang normalizes vws/aws
        aws = acc["aws"][i] / nden
        phi_out[i] = phi
        if not s["fixed"][i]:
            s["v"][i] = s["vest"][i] + dtfm * acc["f"][i]  # :318-321
            if not s["solid"][i] and phi > 0.5:  # :324-345 moving-wall
                norm = np.sqrt(np.sum(nw * nw))
                en = -nw / max(norm, 1e-30)
                vdot = float(np.dot(s["v"][i], en))
                s["v"][i] = (
                    2.0 * vws + aws * dt - s["v"][i]
                    + 2.0 * max(0.0, vdot) * en
                )
            # :357-361 Zhang density experiment (sic inverted aux ratio).
            # 0/0 -> nan here replicates the reference exactly; silence the
            # EXPECTED warning so a *new* divide warning elsewhere is signal.
            if step % freq_filter == 0:
                with np.errstate(invalid="ignore", divide="ignore"):
                    s["rho"][i] = (
                        acc["rhoAux2"][i] / min(acc["rhoAux1"][i], 1.0)
                        + dtf * acc["drho"][i]
                    )
            else:
                s["rho"][i] = s["rhoI"][i] + dt * acc["drho"][i]
        else:
            if not s["solid"][i]:  # fixed fluid :366-396
                s["v"][i] = s["vest"][i] + dtfm * acc["f"][i]
                if phi > 0.5:
                    norm = np.sqrt(np.sum(nw * nw))
                    en = -nw / max(norm, 1e-30)
                    vdot = float(np.dot(s["v"][i], en))
                    s["v"][i] = -s["v"][i] + 2.0 * max(0.0, vdot) * en
                s["rho"][i] = s["rhoI"][i] + dt * acc["drho"][i]
            else:  # fixed solid :398-407
                s["S"][i] = s["S"][i] + dtf * acc["dS"][i]
                s["rho"][i] = s["rhoI"][i]
        s["C"][i] = np.maximum(s["C"][i] + acc["Q"][i] * dtf, 0.0)
    return phi_out


def _bvf_initial(s, acc, dt):
    """fix_ssa_tsdpd_bvf.cpp:145-213 (scalar transcription)."""
    dtf = 0.5 * dt
    n = s["x"].shape[0]
    for i in range(n):
        dtfm = dtf / s["m"][i]
        if not s["fixed"][i]:  # :145-170
            s["vest"][i] = s["v"][i] + 2.0 * dtfm * acc["f"][i]
            s["v"][i] = s["v"][i] + dtfm * acc["f"][i]
            s["x"][i] = s["x"][i] + dtf * s["v"][i]
            if s["solid"][i]:
                s["S"][i] = s["S"][i] + 0.5 * dt * acc["dS"][i]
        else:
            if not s["solid"][i]:  # fixed fluid still integrates :174-191
                s["vest"][i] = s["v"][i] + 2.0 * dtfm * acc["f"][i]
                s["v"][i] = s["v"][i] + dtfm * acc["f"][i]
                s["x"][i] = s["x"][i] + dtf * s["v"][i]
            else:  # fixed solid :193-199
                s["S"][i] = s["S"][i] + dtf * acc["dS"][i]
        s["C"][i] = np.maximum(s["C"][i] + acc["Q"][i] * dtf, 0.0)  # :204-207
        s["rho"][i] = s["rho"][i] + dtf * acc["drho"][i]  # :213


def _bvf_final(s, acc, dt):
    """fix_ssa_tsdpd_bvf.cpp:255-358 (scalar transcription).

    NOTE: phi/nw/vws/aws enter UNNORMALIZED (no number_density division
    anywhere in this fix), unlike the tv family and zhang.
    """
    dtf = 0.5 * dt
    n = s["x"].shape[0]
    for i in range(n):
        dtfm = dtf / s["m"][i]
        phi = acc["phi"][i]
        nw = acc["nw"][i]
        if not s["fixed"][i]:
            s["v"][i] = s["v"][i] + dtfm * acc["f"][i]  # :266-269
            if not s["solid"][i]:
                if phi > 0.5:  # :273-293 moving-wall, unnormalized vws/aws
                    norm = np.sqrt(np.sum(nw * nw))
                    en = -nw / max(norm, 1e-30)
                    vdot = float(np.dot(s["v"][i], en))
                    s["v"][i] = (
                        2.0 * acc["vws"][i] + acc["aws"][i] * dt - s["v"][i]
                        + 2.0 * max(0.0, vdot) * en
                    )
            else:  # :296-302
                s["S"][i] = s["S"][i] + dtf * acc["dS"][i]
        else:
            if not s["solid"][i]:  # fixed fluid :309-336
                s["v"][i] = s["v"][i] + dtfm * acc["f"][i]
                s["x"][i] = s["x"][i] + dtf * s["v"][i]
                if phi > 0.5:
                    norm = np.sqrt(np.sum(nw * nw))
                    en = -nw / max(norm, 1e-30)
                    vdot = float(np.dot(s["v"][i], en))
                    s["v"][i] = -s["v"][i] + 2.0 * max(0.0, vdot) * en
            else:  # :339-345
                s["S"][i] = s["S"][i] + dtf * acc["dS"][i]
        s["C"][i] = np.maximum(s["C"][i] + acc["Q"][i] * dtf, 0.0)
        s["rho"][i] = s["rho"][i] + dtf * acc["drho"][i]  # :358


def _artificial_stress_final(s, acc, dt):
    """fix_ssa_tsdpd_bvf_artificial_stress.cpp:269-380 (scalar transcription).

    Identical to the plain-bvf final half EXCEPT phi/nw/vws/aws are divided
    by number_density before the gate and reflections (:276-287) — the diff
    vs fix_ssa_tsdpd_bvf.cpp is exactly that block (plus dtf-vs-0.5*dtv
    spelling of the deviatoric step, equal at ftm2v=1).
    """
    dtf = 0.5 * dt
    n = s["x"].shape[0]
    for i in range(n):
        dtfm = dtf / s["m"][i]
        nden = max(acc["num_den"][i], 1e-30)
        phi = acc["phi"][i] / nden  # :278
        nw = acc["nw"][i] / nden  # :279-281
        vws = acc["vws"][i] / nden  # :282-284
        aws = acc["aws"][i] / nden  # :285-287
        if not s["fixed"][i]:
            s["v"][i] = s["v"][i] + dtfm * acc["f"][i]  # :292-295
            if not s["solid"][i]:
                if phi > 0.5:  # :297-317 moving-wall, NORMALIZED vws/aws
                    norm = np.sqrt(np.sum(nw * nw))
                    en = -nw / max(norm, 1e-30)
                    vdot = float(np.dot(s["v"][i], en))
                    s["v"][i] = (
                        2.0 * vws + aws * dt - s["v"][i]
                        + 2.0 * max(0.0, vdot) * en
                    )
            else:  # :320-326
                s["S"][i] = s["S"][i] + dtf * acc["dS"][i]
        else:
            if not s["solid"][i]:  # fixed fluid :331-358
                s["v"][i] = s["v"][i] + dtfm * acc["f"][i]
                s["x"][i] = s["x"][i] + dtf * s["v"][i]
                if phi > 0.5:
                    norm = np.sqrt(np.sum(nw * nw))
                    en = -nw / max(norm, 1e-30)
                    vdot = float(np.dot(s["v"][i], en))
                    s["v"][i] = -s["v"][i] + 2.0 * max(0.0, vdot) * en
            else:  # :361-366
                s["S"][i] = s["S"][i] + dtf * acc["dS"][i]
        s["C"][i] = np.maximum(s["C"][i] + acc["Q"][i] * dtf, 0.0)  # :370-373
        s["rho"][i] = s["rho"][i] + dtf * acc["drho"][i]  # :379


def _stationary_step(s, acc, dt):
    """fix_ssa_tsdpd_stationary.cpp:74-133: both halves advance rho and C
    only; x, v, vest, S never move."""
    dtf = 0.5 * dt
    for _half in range(2):
        s["rho"] = s["rho"] + dtf * acc["drho"]
        s["C"] = np.maximum(s["C"] + acc["Q"][..., None] * 0, s["C"] * 0) \
            if False else np.maximum(s["C"] + acc["Q"] * dtf, 0.0)


# ---------------------------------------------------------------------------
# the comparison driver
# ---------------------------------------------------------------------------


def _compare_variant(variant, initial_np, final_np, nsteps=4, dt=1e-3,
                     freq_filter=2, check_gate=True):
    sys = clustered_system()
    geom, st0, params = build_state_params(sys)
    st0 = dataclasses.replace(st0, dt=jnp.asarray(dt, jnp.float64))
    pair_cfg = PairConfig.transport_velocity(dim=2, weighted_solid=True)
    integ = getattr(IntegratorConfig, variant)(
        **({"freq_filter": freq_filter} if variant == "zhang" else {})
    )
    assert integ.variant == variant

    # framework path
    st = _run_framework(st0, params, geom, pair_cfg, integ, nsteps)
    got = gather_particles(st, geom, fields=DYN_FIELDS + ("phi",))

    # transcription path (shares the framework's force pass)
    s = _np_state(sys)
    s["vest"] = s["v"].copy()  # setup_pre_force
    s["rhoI"] = s["rho"].copy()
    acc = _forces_np(s, st0, params, geom, pair_cfg)
    gate_seen = False
    phi_np = None
    for k in range(1, nsteps + 1):
        initial_np(s, acc, dt)
        acc = _forces_np(s, st0, params, geom, pair_cfg)
        nden = np.maximum(acc["num_den"], 1e-30)
        gate_seen |= bool(
            np.any((acc["phi"] / nden > 0.5) & ~s["solid"] & ~s["fixed"])
        )
        phi_np = final_np(s, acc, dt, k, freq_filter) if variant == "zhang" \
            else final_np(s, acc, dt)

    if check_gate:
        assert gate_seen, "no fluid particle crossed phi > 0.5 — gate untested"
        assert np.abs(s["v"][s["solid"] & ~s["fixed"]]).max() > 0, \
            "free solids stopped moving — vws/aws terms untested"

    for name in DYN_FIELDS:
        a, b = got[name], s[name]
        if name in ("x", "v", "vest"):
            b = b if b.shape == a.shape else b
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(
            a, b, rtol=1e-9, atol=1e-11 * scale, err_msg=f"{variant}:{name}"
        )
    if variant == "zhang" and phi_np is not None:
        np.testing.assert_allclose(got["phi"], phi_np, rtol=1e-9,
                                   atol=1e-12, err_msg="zhang:phi")


def test_zhang_matches_reference_transcription():
    _compare_variant("zhang", _zhang_initial, _zhang_final)


def test_bvf_matches_reference_transcription():
    _compare_variant("bvf", _bvf_initial, _bvf_final)


def test_artificial_stress_matches_reference_transcription():
    _compare_variant(
        "artificial_stress", _bvf_initial, _artificial_stress_final
    )


def test_artificial_stress_differs_from_bvf():
    """The round-2 alias bug: artificialStress must NOT equal plain bvf —
    the normalized phi gate and normalized vws/aws reflection terms change
    the dynamics wherever walls are felt."""
    sys = clustered_system()
    geom, st0, params = build_state_params(sys)
    st0 = dataclasses.replace(st0, dt=jnp.asarray(1e-3, jnp.float64))
    pair_cfg = PairConfig.transport_velocity(dim=2, weighted_solid=True)
    a = _run_framework(st0, params, geom, pair_cfg,
                       IntegratorConfig.artificial_stress(), 3)
    b = _run_framework(st0, params, geom, pair_cfg,
                       IntegratorConfig.bvf(), 3)
    assert a is not None and b is not None
    ga = gather_particles(a, geom, fields=("v",))["v"]
    gb = gather_particles(b, geom, fields=("v",))["v"]
    assert np.abs(ga - gb).max() > 1e-8


def test_zhang_differs_from_transport_velocity():
    """The round-1 alias bug: zhang must NOT equal the tv integrator."""
    sys = clustered_system()
    geom, st0, params = build_state_params(sys)
    st0 = dataclasses.replace(st0, dt=jnp.asarray(1e-3, jnp.float64))
    pair_cfg = PairConfig.transport_velocity(dim=2, weighted_solid=True)
    a = _run_framework(st0, params, geom, pair_cfg,
                       IntegratorConfig.zhang(), 3)
    b = _run_framework(st0, params, geom, pair_cfg,
                       IntegratorConfig.transport_velocity(), 3)
    ga = gather_particles(a, geom, fields=("v",))["v"]
    gb = gather_particles(b, geom, fields=("v",))["v"]
    assert np.abs(ga - gb).max() > 1e-8


def test_stationary_freezes_kinematics():
    sys = clustered_system()
    geom, st0, params = build_state_params(sys)
    dt = 1e-3
    st0 = dataclasses.replace(st0, dt=jnp.asarray(dt, jnp.float64))
    pair_cfg = PairConfig.transport_velocity(dim=2, weighted_solid=True)
    # snapshot AFTER setup_pre_force (vest=v, rhoI=rho is the framework-wide
    # setup, not a stationary-integrator effect)
    before = gather_particles(setup_pre_force(st0), geom, fields=DYN_FIELDS)
    st = _run_framework(st0, params, geom, pair_cfg,
                        IntegratorConfig.stationary(), 3)
    got = gather_particles(st, geom, fields=DYN_FIELDS)
    for frozen in ("x", "v", "vest", "S"):
        np.testing.assert_array_equal(got[frozen], before[frozen],
                                      err_msg=frozen)

    # rho/C advance exactly per the transcription (two dtf halves per step)
    s = _np_state(sys)
    s["vest"] = s["v"].copy()
    s["rhoI"] = s["rho"].copy()
    acc = _forces_np(s, st0, params, geom, pair_cfg)
    for _ in range(3):
        dtf = 0.5 * dt
        # initial_integrate (:74-100)
        s["rho"] = s["rho"] + dtf * acc["drho"]
        s["C"] = np.maximum(s["C"] + acc["Q"] * dtf, 0.0)
        acc = _forces_np(s, st0, params, geom, pair_cfg)
        # final_integrate (:105-133)
        s["rho"] = s["rho"] + dtf * acc["drho"]
        s["C"] = np.maximum(s["C"] + acc["Q"] * dtf, 0.0)
    np.testing.assert_allclose(got["rho"], s["rho"], rtol=1e-9)
    np.testing.assert_allclose(got["C"], s["C"], rtol=1e-9, atol=1e-14)


def test_dt_adaptive_changes_dt_inside_chunk():
    """fix dt/adaptive: dt = clamp(CFL dx/max|v|, tmin, tmax) recomputed
    every step (fix_dt_adaptive.cpp:118-163) and carried in the state so it
    changes INSIDE a jitted chunk."""
    from sph_bvf_tpu.core.fixes import DtAdaptive
    from sph_bvf_tpu.core.state import GROUP_ALL
    from sph_bvf_tpu.core.stepper import ModelSpec, run_chunk, setup

    sys = clustered_system()
    geom, st0, params = build_state_params(sys)
    fix = DtAdaptive(groupbit=GROUP_ALL, cfl=0.1, dx_ave=0.02,
                     tmin=1e-6, tmax=1e-2)
    spec = ModelSpec(
        geom=geom,
        pair=PairConfig.transport_velocity(dim=2, weighted_solid=True),
        integ=IntegratorConfig.transport_velocity(),
        fixes=(fix,),
        rebin_every=4,
    )
    dt0 = 1e-3
    st = setup(st0, params, spec, dt=dt0)
    st = run_chunk(st, params, spec, 4)
    dt_after = float(st.dt)
    assert dt_after != dt0, "dt never adapted"

    # the carried dt must equal the CFL formula applied to the final v
    out = gather_particles(st, geom, fields=("v",))
    vmax = np.sqrt((out["v"] ** 2).sum(axis=1)).max()
    expect = np.clip(fix.cfl * fix.dx_ave / max(vmax, 1e-30),
                     fix.tmin, fix.tmax)
    np.testing.assert_allclose(dt_after, expect, rtol=1e-6)

    # and the adapting run must actually diverge from a fixed-dt run
    spec_fixed = dataclasses.replace(spec, fixes=())
    st_fixed = setup(st0, params, spec_fixed, dt=dt0)
    st_fixed = run_chunk(st_fixed, params, spec_fixed, 4)
    xa = gather_particles(st, geom, fields=("x",))["x"]
    xb = gather_particles(st_fixed, geom, fields=("x",))["x"]
    assert np.abs(xa - xb).max() > 0


def test_reads_rhoaux_classification():
    """IntegratorConfig.reads_rhoaux drives the density-filter elision:
    only integrators that actually run the Shepard filter (a real
    freq_filter cadence on a filtering variant) may consume rhoAux1/2.
    fsi's 1e16 sentinel (fix...fsi.cpp:304) means never."""
    assert IntegratorConfig.transport_velocity().reads_rhoaux()
    assert IntegratorConfig.mechanics().reads_rhoaux()
    assert IntegratorConfig.zhang().reads_rhoaux()
    assert not IntegratorConfig.fsi().reads_rhoaux()
    assert not IntegratorConfig.bvf().reads_rhoaux()
    assert not IntegratorConfig.artificial_stress().reads_rhoaux()
    assert not IntegratorConfig.transport_velocity(
        freq_filter=0).reads_rhoaux()
    # a user overriding fsi's sentinel with a real cadence re-enables it
    assert IntegratorConfig.fsi(freq_filter=20).reads_rhoaux()


def test_scene_build_elides_filter_accs_for_never_filter_integrators():
    """Scene.build sets PairConfig.density_filter_accs from
    IntegratorConfig.reads_rhoaux — permanently eliding the dead rhoAux
    accumulation for integrators that never filter."""
    from sph_bvf_tpu.api.scene import Region, Scene

    def mini(variant):
        sc = Scene(dim=2, boundary=("f", "f", "p"))
        sc.create_box(1, Region.block(0, 1, 0, 1, 0, 0.05))
        sc.lattice("sq", 0.05)
        sc.create_atoms(1, Region.block(0, 1, 0, 1, -1, 1))
        sc.mass(1, 4e-4)
        sc.set("all", rho=1.0, e=0.0)
        sc.pair_style("transport_velocity")
        sc.pair_coeff(1, 1, 1.0, 10.0, 1e-2, 0.05, 0.05, 0.0)
        sc.integrator(variant)
        sc.timestep(1e-5)
        return sc.build()

    spec_tv = mini("transport_velocity")[2]
    assert spec_tv.pair.density_filter_accs
    spec_fsi = mini("fsi")[2]
    assert not spec_fsi.pair.density_filter_accs


def test_density_filter_cadence_gating_exact():
    """run_chunk's phase segmentation (density_filter_accs flipped off for
    the steps between Shepard-filter events) is exact: rhoAux1/2 are
    rebuilt from scratch every step and consumed only when
    step % freq_filter == 0, so eliding them elsewhere cannot change any
    physics field.  Also proves the filter is LIVE in this window (a
    never-filter run diverges) and that the elision actually happened
    (rhoAux is zero at a non-filter chunk boundary)."""
    from sph_bvf_tpu.core.stepper import ModelSpec, run_chunk, setup

    sys = clustered_system()
    geom, st0, params = build_state_params(sys)
    pair = PairConfig.transport_velocity(dim=2, weighted_solid=True)
    spec = ModelSpec(
        geom=geom, pair=pair,
        integ=IntegratorConfig.transport_velocity(freq_filter=5),
        rebin_every=4,
    )
    dt = 1e-4
    # ungated reference: every step accumulates rhoAux (phase=None)
    a = setup(st0, params, spec, dt=dt)
    b = a
    # gated: absolute-phase tracking exactly as simulate()/bench do;
    # 12 steps with freq 5 puts filter events at steps 5 and 10 (mid-chunk)
    for i, done in enumerate((0, 4, 8)):
        a = run_chunk(a, params, spec, 4)
        b = run_chunk(b, params, spec, 4, phase=done % 5)
        if i == 0:
            # chunk 1 holds no filter event: the gated scan elides ONLY
            # dead accumulation, so every physics field is bitwise equal
            for f in DYN_FIELDS:
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                    err_msg=f"pure-elision chunk changed field {f}",
                )
    # across filter events the gated chunk inlines the filter step instead
    # of scanning it; XLA fuses the SAME math slightly differently there,
    # so allow 1-2 ulp of f64 program-reassociation noise (measured max
    # 4.4e-16 over 12 steps) — far below any semantic divergence
    for f in DYN_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            rtol=1e-12, atol=1e-13,
            err_msg=f"cadence gating changed physics field {f}",
        )
    # elision really happened: step 12 is not a filter step, so the gated
    # run's final pair pass skipped the accumulators
    assert float(jnp.abs(a.rhoAux1).max()) > 0
    assert float(jnp.abs(b.rhoAux1).max()) == 0
    # and the filter is live in this window: disabling it diverges
    spec_nf = dataclasses.replace(
        spec, integ=IntegratorConfig.transport_velocity(freq_filter=0)
    )
    c = setup(st0, params, spec_nf, dt=dt)
    for _ in range(3):
        c = run_chunk(c, params, spec_nf, 4)
    assert float(jnp.abs(a.rho - c.rho).max()) > 0
