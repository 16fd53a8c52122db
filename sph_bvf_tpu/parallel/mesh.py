"""Device-mesh spatial decomposition.

The reference distributes space via an MPI brick grid with explicit 6-way
ghost exchange (comm_brick.cpp:161,460-880).  Here the cell-slot state is
sharded along the leading cell axis of a 1D/2D `jax.sharding.Mesh`; the
stencil shifts in `shift_cells` are static slab movements, so XLA/GSPMD
lowers them to ICI collective-permutes of one-cell-wide halos — the forward
ghost exchange falls out of the compiler.  There is no reverse exchange at
all: pair sums are full-neighbor (newton-off), which eliminates the
reference's reverse_comm (comm_brick.cpp:527) by construction.

Particle migration (exchange, comm_brick.cpp:585) is the rebin scatter — a
cross-shard scatter only at chunk boundaries.

The Pallas kernels are single-device programs GSPMD cannot partition, so
sharded runs route them through `shard_map` wrappers with `max_off`-wide
edge-slab halo exchange via `lax.ppermute`
(ops/pair_pallas.pass_a_sharded, core/rebin_pallas.move_pallas_sharded;
selected by core/stepper when ModelSpec.mesh is set).  Stages without a
kernel shard via GSPMD over the same mesh; the jnp fallback path remains
the executable spec either way.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sph_bvf_tpu.core.state import _SCALAR_LEAVES, State, particle_fields


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_state(state: State, mesh: Mesh, axis: str = "x") -> State:
    """Place per-particle leaves sharded over the trailing flat-cell axis.

    Requires geometry with ncells[0] divisible by the mesh size (use
    Scene.ncx_multiple_of): the flat cell index is x-major, so a contiguous
    block of the cell axis is exactly a slab of x-columns — the analog of
    the reference's brick decomposition along x (comm_brick.cpp:161).
    """
    rep = NamedSharding(mesh, P())

    def put(a):
        spec = P(*([None] * (a.ndim - 1) + [axis]))
        return jax.device_put(a, NamedSharding(mesh, spec))

    new = {k: put(v) for k, v in particle_fields(state).items()}
    out = dataclasses.replace(state, **new)
    for name in _SCALAR_LEAVES:
        object.__setattr__(out, name, jax.device_put(getattr(state, name), rep))
    return out


def replicate(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, rep), tree)
