"""3D pair physics against the brute-force O(N^2) f64 reference.

The 2D suite (test_pair.py) pins the physics; this pins the 3D kernel
normalizations (Lucy 3D constants, pair...transport_velocity.cpp:204-211)
and the 27-cell stencil machinery.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from sph_bvf_tpu.core.state import (
    Geometry, Params, gather_particles, scatter_by_tag, state_from_particles)
from sph_bvf_tpu.ops.eos import tait_b
from sph_bvf_tpu.ops.pair import PairConfig, compute_forces

from ref_pair import compute_reference


def test_matches_bruteforce_3d():
    rng = np.random.default_rng(11)
    n = 50
    x = rng.uniform(0.05, 0.95, size=(n, 3))
    ptype = rng.integers(0, 2, size=n)
    solid = rng.random(n) < 0.3
    fixed = solid & (rng.random(n) < 0.5)
    v = rng.normal(0, 0.1, size=(n, 3))
    vest = v + rng.normal(0, 0.02, size=(n, 3))
    rho = rng.uniform(1.0, 1.1, size=n)
    rhoI = rho + rng.normal(0, 0.005, size=n)
    C = rng.uniform(0, 1, size=(n, 1))
    S = rng.normal(0, 0.01, size=(n, 3, 3))
    S = S + np.swapaxes(S, 1, 2)
    S[~solid] = 0.0

    h = 0.3
    mass = np.array([0.01, 0.012])
    rho0 = np.array([1.0, 1.0])
    c0 = np.array([10.0, 10.0])
    G0 = np.array([0.0, 0.3])
    cut = np.full((2, 2), h)
    cutc = np.full((2, 2), 0.8 * h)
    visc = np.array([[0.1, 0.12], [0.12, 0.15]])
    kappa = np.full((2, 2, 1), 0.05)

    geom = Geometry.build(dim=3, lo=(0, 0, 0), hi=(1, 1, 1), cutoff=h, cap=48)
    assert geom.ncells[2] > 1 and len(geom.stencil_offsets()) == 27
    st = state_from_particles(geom, x, ptype, n_sdpd=1, dtype=jnp.float64)
    st = scatter_by_tag(
        st,
        v=v, vest=vest, rho=rho, rhoI=rhoI, C=C, S=S,
        solid_tag=solid.astype(np.int32), fixed_tag=fixed.astype(np.int32),
    )
    st = dataclasses.replace(
        st,
        rho=jnp.where(st.valid, st.rho, 1.0),
        rhoI=jnp.where(st.valid, st.rhoI, 1.0),
        dt=jnp.asarray(1e-4, jnp.float64),
    )
    params = Params(
        mass=jnp.asarray(mass, jnp.float64),
        rho0=jnp.asarray(rho0, jnp.float64),
        c0=jnp.asarray(c0, jnp.float64),
        B=jnp.asarray(tait_b(c0, rho0), jnp.float64),
        G0=jnp.asarray(G0, jnp.float64),
        cut=jnp.asarray(cut, jnp.float64),
        cutc=jnp.asarray(cutc, jnp.float64),
        visc=jnp.asarray(visc, jnp.float64),
        kappa=jnp.asarray(kappa, jnp.float64),
        kappa_ssa=jnp.zeros((2, 2, 0), jnp.float64),
    )
    cfg = PairConfig.transport_velocity(dim=3)
    out = compute_forces(st, params, geom, cfg)

    ref = compute_reference(
        x, v, vest, rho, rhoI, C, S, ptype, solid, fixed,
        mass, np.asarray(tait_b(c0, rho0)), rho0, c0, G0,
        cut, cutc, visc, kappa, dim=3, variant="transport_velocity",
    )
    got = gather_particles(
        out, geom,
        fields=["num_den", "ddv", "f", "drho", "phi", "nw", "Q", "dS",
                "vws", "aws"],
    )
    for name in ("num_den", "ddv", "f", "drho", "phi", "nw", "Q", "dS",
                 "vws", "aws"):
        ref_v = ref[name]
        scale = np.maximum(np.abs(ref_v).max(), 1e-10)
        np.testing.assert_allclose(
            got[name], ref_v, atol=1e-11 * scale, rtol=1e-9, err_msg=name
        )
