"""Single-device vs sharded-mesh equivalence — the distributed correctness
test the reference never had (its answer was "same script, -np 1 vs -np N,
agree by eye"; SURVEY.md §4).  On the virtual 8-device CPU mesh the sharded
run must match the unsharded run to rounding exactly: the physics is
order-identical, only collective-permuted."""

import dataclasses

import jax
import numpy as np
import pytest

from sph_bvf_tpu.core.stepper import run_chunk, setup
from sph_bvf_tpu.models import lid_cavity
from sph_bvf_tpu.parallel.mesh import make_mesh, replicate, shard_state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_unsharded():
    state, params, spec, _ = lid_cavity.build(
        N=16, Re=100.0, dt=1e-4, rebin_every=5, ncx_multiple_of=8
    )
    state = setup(state, params, spec, dt=1e-4)

    ref = state
    for _ in range(3):
        ref = run_chunk(ref, params, spec, 5)

    mesh = make_mesh(8)
    sh = shard_state(state, mesh)
    pr = replicate(params, mesh)
    use_mesh = getattr(jax.sharding, "use_mesh", None) or jax.sharding.set_mesh
    with use_mesh(mesh):
        out = sh
        for _ in range(3):
            out = run_chunk(out, pr, spec, 5)

    assert int(out.overflow) == 0
    for name in ("x", "v", "rho", "phi"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9, err_msg=name)


def test_balance_report():
    """parallel/balance: the balance.cpp imbalance-factor analog — uniform
    lattice ~1.0, synthetic crowding trips the warning."""
    from sph_bvf_tpu.parallel.balance import imbalance, report, slab_counts

    state, params, spec, _ = lid_cavity.build(N=16, Re=100.0,
                                              ncx_multiple_of=8)
    state = setup(state, params, spec, dt=1e-4)
    out = report(state, spec.geom, 8)
    assert sum(out["counts"]) == int(state.n_valid)
    assert out["imbalance"] < 1.3 and "warning" not in out

    # crowd everything into the first slab's columns: factor ~= n_shards
    import dataclasses

    import jax.numpy as jnp

    g = spec.geom
    nx = g.ncells[0]
    valid = state.valid
    cols = jnp.arange(g.ncells_total).reshape(nx, -1) // (nx // 8)
    keep = (cols.reshape(-1) == 0)[None, :]
    crowded = dataclasses.replace(state, valid=valid & keep)
    out2 = report(crowded, g, 8)
    assert out2["imbalance"] > 2.0 and "warning" in out2
    f = imbalance(slab_counts(crowded.valid, g, 8))
    assert abs(f - out2["imbalance"]) < 1e-3
