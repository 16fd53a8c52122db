"""Vmapped ensemble (replica) simulation.

The reference's multi-replica mechanism is the `-partition` flag + universe
(lammps.cpp:112, unused by the shipped examples): R separate MPI worlds each
running one replica.  On TPU, replicas of the same scene are a batch axis:
``vmap`` the step over stacked states and XLA executes all replicas in one
program — free parallelism for stochastic (SSA) ensembles, where per-replica
divergence is only in the RNG stream.

Use: build one scene, then ``stack_replicas(state, R, seed0)`` and step with
``run_chunk_ensemble``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sph_bvf_tpu.core.state import State
from sph_bvf_tpu.core.stepper import ModelSpec, step


def stack_replicas(state: State, n_replicas: int, seed0: int = 0) -> State:
    """Stack R copies of a state along a new leading axis, with distinct
    PRNG keys per replica."""
    stacked = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_replicas,) + a.shape), state
    )
    keys = jax.vmap(jax.random.PRNGKey)(seed0 + jnp.arange(n_replicas))
    return dataclasses.replace(stacked, key=keys)


@partial(jax.jit, static_argnames=("spec", "n", "phase"))
def run_chunk_ensemble(state: State, params, spec: ModelSpec, n: int,
                       phase=None) -> State:
    """rebin + n steps for every replica, one compiled program.

    ``phase`` as in run_chunk: the chunk's absolute starting step modulo
    freq_filter, enabling the density-filter cadence elision (replicas
    share the step counter, so one static phase serves the whole batch)."""
    from sph_bvf_tpu.core.state import rebin
    from sph_bvf_tpu.core.stepper import _rebin_drop, scan_steps

    def chunk(s):
        s = rebin(s, spec.geom, drop=_rebin_drop(spec))
        return scan_steps(s, params, spec, n, phase)

    return jax.vmap(chunk)(state)
