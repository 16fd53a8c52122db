"""Pair-physics validation against the brute-force O(N^2) reference spec."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_bvf_tpu.core.state import (
    Geometry, Params, scatter_by_tag, state_from_particles, gather_particles)
from sph_bvf_tpu.ops.pair import PairConfig, compute_forces
from sph_bvf_tpu.ops.eos import tait_b

from ref_pair import compute_reference


def random_system(seed=0, n=40, ns=1, with_solids=True):
    rng = np.random.default_rng(seed)
    L = 1.0
    x = rng.uniform(0.05, 0.95, size=(n, 2))
    ptype = rng.integers(0, 2, size=n)
    solid = (
        rng.random(n) < 0.4 if with_solids else np.zeros(n, bool)
    )
    fixed = solid & (rng.random(n) < 0.5)
    v = rng.normal(0, 0.1, size=(n, 3))
    vest = v + rng.normal(0, 0.02, size=(n, 3))
    v[:, 2] = vest[:, 2] = 0.0
    rho = rng.uniform(1.0, 1.1, size=n)
    rhoI = rho + rng.normal(0, 0.005, size=n)
    C = rng.uniform(0, 1, size=(n, ns))
    S = rng.normal(0, 0.01, size=(n, 3, 3))
    S = S + np.swapaxes(S, 1, 2)  # symmetric, like an integrated deviator
    S[~solid] = 0.0

    h = 0.22
    mass = np.array([0.01, 0.012])
    rho0 = np.array([1.0, 1.0])
    c0 = np.array([10.0, 10.0])
    G0 = np.array([0.0, 0.3])
    cut = np.full((2, 2), h)
    cutc = np.full((2, 2), 0.8 * h)
    visc = np.array([[0.1, 0.12], [0.12, 0.15]])
    kappa = np.full((2, 2, ns), 0.05)
    return dict(
        x=x, v=v, vest=vest, rho=rho, rhoI=rhoI, C=C, S=S,
        ptype=ptype, solid=solid, fixed=fixed,
        mass=mass, rho0=rho0, c0=c0, G0=G0,
        cut=cut, cutc=cutc, visc=visc, kappa=kappa, h=h,
    )


def build_state_params(sys, ns=1):
    geom = Geometry.build(
        dim=2, lo=(0, 0, 0), hi=(1, 1, 0.1), cutoff=sys["h"], cap=32
    )
    st = state_from_particles(geom, sys["x"], sys["ptype"], n_sdpd=ns, dtype=jnp.float64)
    # assign per-particle fields in the binned order via tag lookup
    st = scatter_by_tag(
        st,
        v=sys["v"].astype(np.float64),
        vest=sys["vest"].astype(np.float64),
        rho=sys["rho"].astype(np.float64),
        rhoI=sys["rhoI"].astype(np.float64),
        C=sys["C"].astype(np.float64),
        S=sys["S"].astype(np.float64),
        solid_tag=sys["solid"].astype(np.int32),
        fixed_tag=sys["fixed"].astype(np.int32),
    )
    st = dataclasses.replace(
        st,
        rho=jnp.where(st.valid, st.rho, 1.0),
        rhoI=jnp.where(st.valid, st.rhoI, 1.0),
        dt=jnp.asarray(1e-4, jnp.float64),
    )
    params = Params(
        mass=jnp.asarray(sys["mass"], jnp.float64),
        rho0=jnp.asarray(sys["rho0"], jnp.float64),
        c0=jnp.asarray(sys["c0"], jnp.float64),
        B=jnp.asarray(tait_b(sys["c0"], sys["rho0"]), jnp.float64),
        G0=jnp.asarray(sys["G0"], jnp.float64),
        cut=jnp.asarray(sys["cut"], jnp.float64),
        cutc=jnp.asarray(sys["cutc"], jnp.float64),
        visc=jnp.asarray(sys["visc"], jnp.float64),
        kappa=jnp.asarray(sys["kappa"], jnp.float64),
        kappa_ssa=jnp.zeros((2, 2, 0), jnp.float64),
    )
    return geom, st, params


FIELDS = [
    "num_den", "rhoAux1", "rhoAux2", "ddv", "ddx", "f", "drho", "de",
    "phi", "nw", "Q", "dS", "vws", "aws",
]
STATE_NAME = dict(num_den="num_den", vws="vws", aws="aws")


@pytest.mark.parametrize("variant", ["transport_velocity", "mechanics", "fsi"])
def test_matches_bruteforce(variant):
    sys = random_system(seed=3)
    geom, st, params = build_state_params(sys)
    cfg = getattr(PairConfig, variant)(dim=2)
    out = compute_forces(st, params, geom, cfg)

    n = sys["x"].shape[0]
    x3 = np.concatenate([sys["x"], np.zeros((n, 1))], axis=1)
    ref = compute_reference(
        x3,
        sys["v"],
        sys["vest"],
        sys["rho"], sys["rhoI"], sys["C"], sys["S"],
        sys["ptype"], sys["solid"], sys["fixed"],
        sys["mass"],
        np.asarray(tait_b(sys["c0"], sys["rho0"])),
        sys["rho0"], sys["c0"], sys["G0"],
        sys["cut"], sys["cutc"], sys["visc"], sys["kappa"],
        dim=2, variant=variant,
    )

    got = gather_particles(
        out, geom,
        fields=["num_den", "rhoAux1", "rhoAux2", "ddv", "ddx", "f", "drho",
                "de", "phi", "nw", "Q", "dS", "vws", "aws"],
    )
    # f64 build vs f64 reference: must agree to rounding
    for name in FIELDS:
        if name == "ddx" and variant == "transport_velocity":
            continue  # tv has no xsph accumulator
        ref_v = ref[name]
        got_v = got[name]
        scale = np.maximum(np.abs(ref_v).max(), 1e-10)
        np.testing.assert_allclose(
            got_v, ref_v, atol=1e-11 * scale, rtol=1e-9,
            err_msg=f"{variant}:{name}",
        )


def test_momentum_conservation_compressed_fluid():
    """All-fluid compressed system (P>0 everywhere) => total force ~ 0."""
    rng = np.random.default_rng(7)
    n = 60
    sys = random_system(seed=7, n=n, with_solids=False)
    sys["rho"] = rng.uniform(1.05, 1.1, size=n)  # compression => pij > 0
    geom, st, params = build_state_params(sys)
    cfg = PairConfig.transport_velocity(dim=2, solids_present=False,
                                        elastic_present=False)
    out = compute_forces(st, params, geom, cfg)
    f = np.asarray(jnp.where(out.valid[None], out.f, 0.0))
    ftot = np.abs(f.sum(axis=(1, 2)))
    fscale = np.abs(f).max()
    assert ftot.max() < 5e-4 * max(fscale, 1e-10), (ftot, fscale)


def test_pair_virial_matches_brute_force():
    """compute_pair_virial (feeds the thermo `press` keyword) against the
    f64 O(N^2) reference transcription's r_ij . f_ij tally."""
    from sph_bvf_tpu.ops.pair import compute_pair_virial

    sys = random_system(seed=3)
    geom, st, params = build_state_params(sys)
    cfg = PairConfig.transport_velocity(
        dim=2, solids_present=True, free_solids_present=True
    )
    got = compute_pair_virial(st, params, geom, cfg)
    out = gather_particles(
        dataclasses.replace(st, f=jnp.zeros_like(st.f)), geom, fields=()
    )
    order = np.argsort(out["tag"], kind="stable")

    ref = compute_reference(
        x=np.concatenate([sys["x"], np.zeros((len(sys["x"]), 1))], axis=1),
        v=sys["v"], vest=sys["vest"], rho=sys["rho"], rhoI=sys["rhoI"],
        C=sys["C"], S=sys["S"], ptype=sys["ptype"], solid=sys["solid"],
        fixed=sys["fixed"], mass=sys["mass"],
        B=np.asarray(tait_b(sys["c0"], sys["rho0"])), rho0=sys["rho0"],
        c0=sys["c0"], G0=sys["G0"], cut=sys["cut"], cutc=sys["cutc"],
        visc=sys["visc"], kappa=sys["kappa"], dim=2,
        variant="transport_velocity",
    )
    valid = np.asarray(st.valid).reshape(-1)
    tags = np.asarray(st.tag).reshape(-1)[valid]
    vir = np.asarray(got).reshape(-1)[valid]
    vir = vir[np.argsort(tags, kind="stable")]
    np.testing.assert_allclose(vir, ref["vir"], rtol=1e-9, atol=1e-12)
