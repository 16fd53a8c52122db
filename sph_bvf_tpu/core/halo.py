"""Halo-window assembly shared by the Pallas pair and rebin kernels.

Both kernels walk the flat cell axis in lane blocks and read each block's
stencil neighborhood from a 3-consecutive-block VMEM window of a padded
buffer (ops/pair_pallas.py, core/rebin_pallas.py).  This module owns the
construction of that padded buffer, which is where every boundary condition
lives — the kernels themselves never test the x coordinate:

* **Wall (non-periodic x)** — the halo lanes are zeros; zero ``valid`` rows
  make them inert.  This replaces the kernels' former in-kernel
  ``cx + off`` bounds masks: out-of-domain x neighbors are exactly the
  zero-padded lanes at the ends of the flat axis (the flat index is
  x-major, so an x step of +-1 stays inside the same (y, z) column
  everywhere except the array ends).
* **Periodic x** — the halo lanes are wrapped copies of the far edge of the
  same array: lane ``-t`` holds cell ``NC - t`` and lane ``NC + t`` holds
  cell ``t``.  The pair physics then applies the minimum-image shift to the
  copied coordinates (ops/pair._pair_delta), the analog of LAMMPS ghost
  coordinate shifting (comm_brick.cpp borders).
* **Sharded x (multi-chip)** — inside ``shard_map`` each device holds an
  x-slab of cells; the halo lanes come from the neighbor devices via
  ``lax.ppermute`` of ``max_off``-wide edge slabs (the TPU equivalent of
  the reference's 6-way brick ghost exchange, comm_brick.cpp:460-880).
  Devices at a non-periodic domain edge receive zeros (ppermute zero-fills
  missing sources), which degenerates to the wall case.

Periodic *inner* axes (y, z — strides smaller than the x stride) cannot be
handled by the flat-axis halo: a y wrap connects cells ``(cx, 0)`` and
``(cx, ny-1)``, a flat distance of ``(ny-1)*sy`` that varies per row.  They
are handled by **ghost columns** instead: the cell grid is widened by one
wrapped copy on each side (``ny -> ny+2``), so an inner-axis step of +-1
always lands on correct content.  Ghost cells appear as i-cells too; their
outputs are garbage and are trimmed by ``trim_ghosts``.  The widening is a
single concatenation of the packed field matrix per step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ghost_axes(geom) -> Tuple[int, ...]:
    """Inner axes (y=1, z=2) that need ghost columns: periodic, multi-cell."""
    return tuple(
        ax for ax in (1, 2) if geom.periodic[ax] and geom.ncells[ax] > 1
    )


def ghosted_ncells(geom) -> Tuple[int, int, int]:
    ga = ghost_axes(geom)
    nx, ny, nz = geom.ncells
    return (nx, ny + 2 * (1 in ga), nz + 2 * (2 in ga))


def ghosted_strides(geom) -> Tuple[int, int, int]:
    nx, ny, nz = ghosted_ncells(geom)
    return (ny * nz, nz, 1)


def wrap_x(geom) -> bool:
    """Leading-axis wrap needed: periodic x with more than one cell."""
    return bool(geom.periodic[0]) and geom.ncells[0] > 1


def max_flat_offset(geom) -> int:
    """Largest |flat offset| of any stencil step, on the ghosted grid."""
    st = ghosted_strides(geom)
    return sum(s for s, n in zip(st, geom.ncells) if n > 1)


def halo_width(geom, blk: int) -> int:
    """Side-halo lane width for the flat-lane window kernels (round 4).

    The stencil windows only reach ``max_flat_offset`` lanes past the mid
    block, so the left/right block refs need just that reach rounded up to
    a lane tile — NOT a full ``blk``.  Falls back to ``blk`` (the old
    equal-block window) when the reach is too large or doesn't divide
    ``blk`` (blocked index maps quantize by block shape).  Shared by the
    pass-A and rebin kernels; the buffer built by ``assemble_padded`` keeps
    its ``blk``-wide pads either way — narrow side refs simply read the
    innermost ``H`` lanes of them."""
    h = round_up(max_flat_offset(geom) + 1, 128)
    if h >= blk or blk % h:
        return blk
    return h


def add_ghosts(M: jax.Array, geom) -> jax.Array:
    """[..., NC] -> [..., NC_g]: insert wrapped ghost columns on inner axes."""
    ga = ghost_axes(geom)
    if not ga:
        return M
    nx, ny, nz = geom.ncells
    lead = M.shape[:-1]
    G = M.reshape(lead + (nx, ny, nz))
    if 1 in ga:
        G = jnp.concatenate([G[..., -1:, :], G, G[..., :1, :]], axis=-2)
    if 2 in ga:
        G = jnp.concatenate([G[..., -1:], G, G[..., :1]], axis=-1)
    return G.reshape(lead + (-1,))


def trim_ghosts(M: jax.Array, geom) -> jax.Array:
    """[..., NC_g] -> [..., NC]: drop the ghost columns again."""
    ga = ghost_axes(geom)
    if not ga:
        return M
    ngx, ngy, ngz = ghosted_ncells(geom)
    lead = M.shape[:-1]
    G = M.reshape(lead + (ngx, ngy, ngz))
    if 1 in ga:
        G = G[..., 1:-1, :]
    if 2 in ga:
        G = G[..., 1:-1]
    return G.reshape(lead + (-1,))


def assemble_padded(
    M: jax.Array,
    BLK: int,
    NC_pad: int,
    wrap: bool,
    max_off: int = 0,
    halo_left: jax.Array | None = None,
    halo_right: jax.Array | None = None,
) -> jax.Array:
    """Build the [..., NC_pad + 2*BLK] buffer the 3-block-window kernels read.

    ``M`` is the (ghosted) packed field matrix [..., NC].  Exactly one of
    three halo modes applies:

    * ``halo_left``/``halo_right`` given (shard_map path): ``max_off``-wide
      neighbor slabs placed flush against the local lanes, zeros elsewhere.
    * ``wrap`` (single-device periodic x): wrapped copies of ``M`` itself.
    * neither: zeros (walls).
    """
    NC = M.shape[-1]
    lead = M.shape[:-1]

    def zeros(w):
        return jnp.zeros(lead + (w,), M.dtype)

    if halo_left is not None:
        assert halo_left.shape[-1] == max_off and halo_right.shape[-1] == max_off
        return jnp.concatenate(
            [zeros(BLK - max_off), halo_left, M, halo_right,
             zeros(BLK + NC_pad - NC - max_off)],
            axis=-1,
        )
    if wrap:
        if NC >= BLK:
            left = M[..., NC - BLK:]
        else:
            reps = -(-BLK // NC)
            left = jnp.concatenate([M] * reps, axis=-1)[..., -BLK:]
        if NC >= max_off:
            right = M[..., :max_off]
        else:
            reps = -(-max_off // NC)
            right = jnp.concatenate([M] * reps, axis=-1)[..., :max_off]
        return jnp.concatenate(
            [left, M, right, zeros(BLK + NC_pad - NC - max_off)], axis=-1
        )
    return jnp.pad(
        M, [(0, 0)] * (M.ndim - 1) + [(BLK, BLK + NC_pad - NC)]
    )


def assemble_tiled(
    M: jax.Array,
    geom,
    BLK: int,
    NYZ_pad: int,
    wrap: bool,
    plane_left: jax.Array | None = None,
    plane_right: jax.Array | None = None,
    n_planes: int = 0,
) -> jax.Array:
    """Build the 4D buffer the tiled 3D kernel reads.

    ``M`` is the (ghosted) packed matrix [..., NC].  Output is
    [..., ngx + 2, NYZ_pad + 2*BLK]: the flat cell axis split into x-planes
    with one halo plane on each side (zeros for walls, wrapped copies for
    periodic x, ppermute'd neighbor planes under shard_map) and the
    per-plane yz lane axis padded by one lane block on each side (always
    zeros — y/z boundary conditions are ghost columns / masks, never lane
    wrap).  This keeps every per-block VMEM footprint independent of the
    grid size, unlike the flat-lane halo whose block must exceed the
    x-stride (~n^2 in 3D).
    """
    NC = M.shape[-1]
    lead = M.shape[:-1]
    ngx = n_planes if n_planes else geom.ncells[0]
    NYZ = NC // ngx
    G = M.reshape(lead + (ngx, NYZ))
    if plane_left is not None:
        L, R = plane_left, plane_right
    elif wrap:
        L, R = G[..., -1:, :], G[..., :1, :]
    else:
        L = jnp.zeros(lead + (1, NYZ), M.dtype)
        R = L
    G = jnp.concatenate([L, G, R], axis=-2)
    pad = [(0, 0)] * (G.ndim - 1) + [(BLK, BLK + NYZ_pad - NYZ)]
    return jnp.pad(G, pad)


def exchange_slabs(
    M: jax.Array, width: int, axis_name: str, n_shards: int, periodic: bool
) -> Tuple[jax.Array, jax.Array]:
    """Inside shard_map: fetch the neighboring shards' edge slabs.

    Returns ``(halo_left, halo_right)`` of lane width ``width``:
    ``halo_left`` = left neighbor's LAST ``width`` lanes, ``halo_right`` =
    right neighbor's FIRST ``width`` lanes.  With ``periodic`` the ring
    wraps; otherwise the edge shards receive zeros (ppermute zero-fills
    devices with no source).  One-device meshes degenerate correctly: the
    periodic ring is a self-permute (halo == own far edge, i.e. the wrap
    case) and the non-periodic chain exchanges nothing.
    """
    # send right: device i -> i+1 carries my last lanes = receiver's left halo
    perm_r = [(i, i + 1) for i in range(n_shards - 1)]
    perm_l = [(i + 1, i) for i in range(n_shards - 1)]
    if periodic:
        perm_r.append((n_shards - 1, 0))
        perm_l.append((0, n_shards - 1))
    halo_left = jax.lax.ppermute(M[..., -width:], axis_name, perm_r)
    halo_right = jax.lax.ppermute(M[..., :width], axis_name, perm_l)
    return halo_left, halo_right
