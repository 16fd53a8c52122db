"""Pallas TPU kernel for the rebin particle move (locality-based compaction).

The jnp rebin (core/state.py) is a global sort-by-cell permutation: argsort
over all M = cap*NC slot keys, a scatter to invert it, and one big packed
gather.  On TPU that costs ~100 ms at 1M particles — not because of the
sort (6 ms) but because every [cap, NC] <-> [M] reshape is a
sublane-crossing relayout and the lane gather runs far from bandwidth.

This kernel exploits the drift-safety contract instead (Geometry.build:
``cell_size >= cutoff + 2 * drift_budget`` and rebin's runtime drift
check): between rebins a particle moves at most one cell in any axis, so
the particles that belong in cell c after a rebin are exactly the matching
candidates among the 3^dim stencil cells' slots — the same locality the
pair kernel (ops/pair_pallas.py) uses, with the same 3-consecutive-block
halo trick.  Per target cell the kernel walks the 3^dim*cap candidates in
old-flat-slot order (slot-major, then flat cell offset ascending — exactly
the jnp path's stable (cell, old flat index) sort order, so both paths
produce IDENTICAL slot assignments on non-periodic grids) and compacts
matches into output slots with a running per-lane counter and a select
crossbar.  No sort, no scatter, no [M] relayouts; traffic is ~4x the state
size (3x halo read + 1x write).

Boundary handling mirrors the pair kernel (core/halo.py): periodic x is a
wrapped halo (or a ring ppermute under shard_map), periodic inner axes are
ghost columns, walls are zero halos.  A particle crossing a periodic face
has already been position-wrapped (wrap_pbc), so its computed target cell
is on the far side — which is exactly where its halo/ghost copy sits
within one stencil step of the target.  On periodic grids the wrapped
candidates enter the crossbar at halo/ghost offsets, so slot ORDER within
a cell can differ from the jnp sort (cell contents are identical; physics
is slot-order independent).  Under shard_map the match key is the GLOBAL
cell id, so a particle leaving a shard is dropped there and picked up by
the neighbor from its halo — particle migration (comm_brick.cpp:585) falls
out of the same exchange.

A particle that moves MORE than one cell ring between rebins (drift
contract already violated, counted by ``state.drift_violation``) is lost
by this kernel rather than moved; the caller accounts every loss into
``state.overflow`` via an n_valid_before - n_valid_after reduction, so the
"lost atoms" invariant (host asserts overflow == 0) still holds.

Eligibility mirrors the pair kernel: f32 state, VMEM-bounded halo blocks,
TPU backend; periodic axes additionally need >= 3 cells (with 2 cells the
same source cell appears twice in a target's stencil window — once real,
once wrapped — and the crossbar would place the particle twice).  The jnp
path remains the fallback and the executable spec.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sph_bvf_tpu.core import halo as halo_mod


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _halo_block(geom, block_2d: int = 768, block_3d: int = 128) -> int:
    """The lane-block size the halo kernels would use for this grid."""
    return max(block_2d if geom.dim < 3 else block_3d,
               _round_up(halo_mod.max_flat_offset(geom) + 1, 128))


def rebin_kernel_supported(dtype, geom, n_rows: int = 64) -> bool:
    """Platform-independent eligibility (shared by the single-device and
    shard_map paths).  ``n_rows``: total packed f32+i32 rows the move would
    stage (the caller counts them from the live field dict; the default is
    the speciesless state's row count)."""
    if dtype != jnp.float32:
        return False
    # non-uniform x columns (Geometry.x_edges) are kernel-supported since
    # round 5: the candidate's fine-bin index (same floor arithmetic as
    # state._x_column_of) is compared against per-lane integer fine-bin
    # column bounds threaded as an aligned operand (2D) / scalar-prefetch
    # row (3D planes) — no in-kernel gather needed, bit-identical binning
    # below ~3k cells the jnp sort pipeline is already cheap and the
    # kernel's fixed per-candidate crossbar cost loses (measured crossover
    # between NC=1.3k and 4.8k on v5e; 3.7x ahead by NC=113k)
    if geom.ncells_total < 3000:
        return False
    # a periodic axis with 2 cells puts the same source cell in a target's
    # window twice (real + wrapped) -> the crossbar would duplicate
    if any(p and 1 < n < 3 for p, n in zip(geom.periodic, geom.ncells)):
        return False
    if geom.dim >= 3:
        # tiled-plane kernel (see _move_call_tiled3d): 18 plane/yz-block
        # refs double-buffered + the 3x3-window staging, with the
        # per-plane yz lane block (constant in grid size)
        capk = _round_up(geom.cap, 8)
        ngz = halo_mod.ghosted_ncells(geom)[2]
        blk = max(256, _round_up(ngz + 2, 128))
        vmem = (2 * 18 * n_rows + 3 * 3 * n_rows) * capk * blk * 4
        return vmem <= 90 * 1024 * 1024
    # the staged window (BLK mid + two H-wide side refs, f32 + i32 packs)
    # plus two outputs are double-buffered in VMEM; BLK scales with the
    # x-stride (ny*nz), so tall/deep grids can exceed the 100MB vmem
    # budget — route those to the jnp sort path instead of failing at
    # compile (2 buffers x 4 bytes)
    blk = _halo_block(geom)
    h = halo_mod.halo_width(geom, blk)
    vmem = 2 * n_rows * (2 * blk + 2 * h) * geom.cap * 4
    if vmem > 90 * 1024 * 1024:
        return False
    return True


def rebin_pallas_eligible(dtype, geom, n_rows: int = 64) -> bool:
    from sph_bvf_tpu.ops.pair_pallas import on_tpu

    return rebin_kernel_supported(dtype, geom, n_rows) and on_tpu()


def _pack_fields(fields: Dict[str, jax.Array], cap: int, NC: int):
    """Split the field dict into one f32 and one i32 matrix (+ metadata)."""
    fmeta, imeta = [], []  # (name, nrows, lead_shape, dtype)
    fmats, imats = [], []
    imats.append(fields["valid"].astype(jnp.int32).reshape(1, cap, NC))
    for name, a in fields.items():
        if name == "valid" or a.size == 0:
            continue
        r = a.reshape(-1, cap, NC)
        if jnp.issubdtype(a.dtype, jnp.floating):
            fmeta.append((name, r.shape[0], a.shape[:-2], a.dtype))
            fmats.append(r)
        else:
            imeta.append((name, r.shape[0], a.shape[:-2], a.dtype))
            imats.append(r.astype(jnp.int32))
    return jnp.concatenate(fmats, axis=0), jnp.concatenate(imats, axis=0), fmeta, imeta


def _unpack_fields(outf, outi, fmeta, imeta, fields, cap, NC):
    new_fields = {"valid": outi[0] != 0}
    r = 0
    for name, nrows, lead, dtype in fmeta:
        new_fields[name] = outf[r : r + nrows].reshape(lead + (cap, NC))
        r += nrows
    r = 1
    for name, nrows, lead, dtype in imeta:
        new_fields[name] = (
            outi[r : r + nrows].astype(dtype).reshape(lead + (cap, NC))
        )
        r += nrows
    for name, a in fields.items():
        if name not in new_fields:  # size-0 species arrays pass through
            new_fields[name] = a
    return new_fields


def _rebin_gated(cap: int) -> bool:
    """Route large caps through occupancy-gated slot tiles.

    The static walk fully unrolls ``cap x 9`` crossbar row-bodies; at
    cap 47 (fsi-like scenes) that program stalls Mosaic compilation
    (>580s with no output, measured at BLK 128 and 768 on v5e), so any
    eligible scene (NC >= 3000) with a crowded cap would hit a compile
    cliff.  The gated path walks source slots in 8-row sublane tiles
    inside a ``fori_loop`` with a dynamic trip count from the window
    occupancy: it compiles in normal time (~2.9 ms/move at fsi60
    geometry) and skips rows above the real occupancy (~9-16 at the
    cap-35/47 models, a 2-3x candidate cut).  At cap <= 16 the tile
    quantization (ceil(occ/8) tiles of 8 rows) can only match or exceed
    the static walk (e.g. cavity cap 14 / occ 9 -> 16 gated rows vs 14
    static), so small caps keep the fully-unrolled loop."""
    return cap > 16


def _col_fine_bounds(geom) -> "np.ndarray":
    """[2, nx] i32: each x-column's [first, one-past-last) fine-bin range —
    the exact integer ranges state._x_column_table assigns, so an in-kernel
    membership test (fine bin within the lane's own column range) is
    bit-identical to the table gather."""
    import numpy as np

    q = geom.x_quantum
    e = np.asarray(geom.x_edges, np.float64)
    bins = np.round((e - e[0]) / q).astype(np.int32)
    return np.stack([bins[:-1], bins[1:]], axis=0)


def _lane_fine_bounds(geom, NCg: int) -> jax.Array:
    """[2, NCg] i32: the fine-bin column bounds of every (ghosted) lane's
    own x-column.  x is never ghosted (halo.ghost_axes covers y/z only),
    so cx = lane // ghosted x-stride indexes the geometry's columns
    directly."""
    import numpy as np

    bounds = _col_fine_bounds(geom)  # [2, nx]
    sgx = halo_mod.ghosted_strides(geom)[0]
    cx = np.arange(NCg, dtype=np.int64) // sgx
    return jnp.asarray(bounds[:, cx])


def _move_call(
    PFp: jax.Array,
    PIp: jax.Array,
    geom,
    xr: int,
    NC_lanes: int,
    BLK: int,
    g_base,
    interpret: bool,
    XBp: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """The raw kernel over pre-assembled padded buffers.

    ``g_base``: i32 [1] array added to the local lane index to form the
    global (ghosted) cell id the candidates' positions are matched against
    — 0 on a single device, ``axis_index * NC_loc`` under shard_map.  It is
    threaded as a scalar-prefetch operand because it is a traced value the
    kernel cannot close over.  Sharded callers must split on x-aligned
    slabs (``NC_loc`` a multiple of the x stride) so the in-kernel cy/cz
    decomposition of the global id stays exact.

    Large caps (`_rebin_gated`) walk source-slot rows in 8-row sublane
    tiles inside a ``fori_loop`` whose trip count comes from a per-block
    window occupancy bound (scalar-prefetch row, computed from the
    assembled buffer itself so halo/wrap content is included exactly):
    slots are packed (the crossbar compacts at every rebin and validity
    never changes between rebins), so every valid candidate in the window
    sits below the bound and the gating is exact — same candidate order,
    identical slot assignment.
    """
    import numpy as np

    cap = geom.cap
    gated = _rebin_gated(cap)
    capk = _round_up(cap, 8) if gated else cap
    if gated and capk != PFp.shape[1]:
        raise ValueError("gated rebin needs sublane-padded buffers")
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    sgx, sgy, sgz = halo_mod.ghosted_strides(geom)
    ga = halo_mod.ghost_axes(geom)
    NC_pad = _round_up(NC_lanes, BLK)
    grid = NC_pad // BLK
    Ff, Fi = PFp.shape[0], PIp.shape[0]
    # narrow side halos (core/halo.halo_width, shared with pass A): the
    # left/right refs stage only the stencil reach H <= BLK; the staged
    # window is [H | BLK | H] and offset slices are H-based
    H = halo_mod.halo_width(geom, BLK)
    R = BLK // H

    # candidate order: flat cell offset ascending (with slot-major outer
    # loop this reproduces the jnp path's stable (cell, old flat) sort on
    # non-periodic grids)
    offs = sorted(
        (off[0] * sgx + off[1] * sgy + off[2] * sgz, off)
        for off in geom.stencil_offsets()
    )

    lo = tuple(float(v) for v in geom.lo)
    # pre-round to f32 so the in-kernel multiply matches cell_index_of,
    # where the f64 python constant is rounded at trace time
    inv = tuple(float(np.float32(1.0 / cs)) for cs in geom.cell_size)
    edges = geom.x_edges is not None
    if edges:
        # the f64 python constant is cast to f32 at trace time in
        # _x_column_of — replicate that rounding exactly
        inv_q = float(np.float32(1.0 / geom.x_quantum))
        from sph_bvf_tpu.core.state import _x_column_table

        n_fine = int(_x_column_table(geom).shape[0])

    def kernel(*refs):
        if gated:
            gb_ref, occw_ref = refs[0], refs[1]
            rest = refs[2:]
        else:
            gb_ref = refs[0]
            rest = refs[1:]
        if edges:
            xb_ref, rest = rest[0], rest[1:]
        fl, fm, fr, il, im, ir, outf_ref, outi_ref = rest
        b = pl.program_id(0)

        g = gb_ref[0] + b * BLK + jax.lax.broadcasted_iota(
            jnp.int32, (1, BLK), 1
        )
        cz = g % ngz
        cy = (g // sgy) % ngy

        accF = jnp.zeros((Ff, capk, BLK), jnp.float32)
        accI = jnp.zeros((Fi, capk, BLK), jnp.int32)
        cnt = jnp.zeros((1, BLK), jnp.int32)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (capk, 1), 0)

        def row_body(bf, bi, r, accF, accI, cnt):
            """All stencil candidates of one source slot row ``r`` of the
            staged window ``bf``/``bi`` ([F, rows, 3*BLK])."""
            for off_flat, off in offs:
                sl = slice(H + off_flat, H + BLK + off_flat)
                vj = bi[0:1, r, sl] != 0  # [1, BLK]
                # inner-axis bounds only; x is governed by halo content
                for o, c, n in ((off[1], cy, ngy), (off[2], cz, ngz)):
                    if o != 0:
                        vj = vj & (c + o >= 0) & (c + o < n)
                # candidate's new GLOBAL ghosted flat cell from its wrapped
                # position (periodic axes use mod like cell_index_of; ghost
                # axes shift by +1 into ghost numbering).  Non-uniform x
                # columns: the candidate's fine-bin index (same clipped
                # floor as _x_column_of) must fall in THIS lane's column
                # range — columns partition the fine grid, so membership
                # is exactly x-coordinate equality, with no gather.
                ncell = jnp.zeros((1, BLK), jnp.int32)
                for ax, (s, n) in enumerate(
                    ((sgx, geom.ncells[0]), (sgy, geom.ncells[1]),
                     (sgz, geom.ncells[2]))
                ):
                    if n == 1 or (ax == 0 and edges):
                        continue
                    xa = bf[xr + ax : xr + ax + 1, r, sl]
                    ci = jnp.floor((xa - lo[ax]) * inv[ax]).astype(jnp.int32)
                    if geom.periodic[ax]:
                        ci = jnp.remainder(ci, n)
                    else:
                        ci = jnp.clip(ci, 0, n - 1)
                    if ax in ga:
                        ci = ci + 1
                    ncell = ncell + ci * s
                if edges:
                    xa = bf[xr : xr + 1, r, sl]
                    fj = jnp.floor((xa - lo[0]) * inv_q).astype(jnp.int32)
                    fj = jnp.clip(fj, 0, n_fine - 1)
                    matchx = (fj >= xb_ref[0:1, :]) & (fj < xb_ref[1:2, :])
                    match = vj & matchx & (ncell == g % sgx)  # [1, BLK]
                else:
                    match = vj & (ncell == g)  # [1, BLK]
                sel = match & (cnt == iota_s)  # [capk, BLK]
                accF = jnp.where(
                    sel[None], bf[:, r, sl][:, None, :], accF
                )
                accI = jnp.where(
                    sel[None], bi[:, r, sl][:, None, :], accI
                )
                cnt = cnt + match.astype(jnp.int32)
            return accF, accI, cnt

        if gated:
            TI = 8

            def tile_body(t, carry):
                accF, accI, cnt = carry
                s0 = pl.multiple_of(t * TI, TI)
                bf = jnp.concatenate(
                    [fl[:, pl.dslice(s0, TI), :],
                     fm[:, pl.dslice(s0, TI), :],
                     fr[:, pl.dslice(s0, TI), :]], axis=-1
                )
                bi = jnp.concatenate(
                    [il[:, pl.dslice(s0, TI), :],
                     im[:, pl.dslice(s0, TI), :],
                     ir[:, pl.dslice(s0, TI), :]], axis=-1
                )
                for r in range(TI):
                    accF, accI, cnt = row_body(bf, bi, r, accF, accI, cnt)
                return accF, accI, cnt

            trips = (occw_ref[b] + TI - 1) // TI
            accF, accI, cnt = jax.lax.fori_loop(
                0, trips, tile_body, (accF, accI, cnt)
            )
        else:
            buf_f = jnp.concatenate([fl[:], fm[:], fr[:]], axis=-1)
            buf_i = jnp.concatenate([il[:], im[:], ir[:]], axis=-1)
            for s_old in range(cap):
                accF, accI, cnt = row_body(
                    buf_f, buf_i, s_old, accF, accI, cnt
                )

        outf_ref[...] = accF
        outi_ref[...] = accI

    # mid blocks are BLK-wide at (b+1)*BLK (the buffer's left pad is BLK);
    # side refs are H-wide, index maps counting in H-sized blocks
    spec = lambda F, shift: pl.BlockSpec(
        (F, capk, BLK), lambda b, *_: (0, 0, b + shift),
        memory_space=pltpu.VMEM,
    )
    hspec_l = lambda F: pl.BlockSpec(
        (F, capk, H), lambda b, *_: (0, 0, (b + 1) * R - 1),
        memory_space=pltpu.VMEM,
    )
    hspec_r = lambda F: pl.BlockSpec(
        (F, capk, H), lambda b, *_: (0, 0, (b + 1) * R + R),
        memory_space=pltpu.VMEM,
    )
    gb = jnp.asarray(g_base, jnp.int32).reshape(1)
    scalars = [gb]
    if gated:
        # exact per-block source-slot bound: max cell occupancy over every
        # lane a block's 3-block window can read, computed from the
        # assembled buffer (halo/wrap/ghost content included by
        # construction — no edge special cases)
        occp = jnp.sum((PIp[0] != 0).astype(jnp.int32), axis=0)
        occb = jnp.max(occp.reshape(grid + 2, BLK), axis=1)
        occw = jnp.maximum(occb[:-2], jnp.maximum(occb[1:-1], occb[2:]))
        scalars.append(occw.astype(jnp.int32))
    xb_specs, xb_args = [], []
    if edges:
        assert XBp is not None and XBp.shape == (2, NC_pad + 2 * BLK)
        # only mid lanes are read (the bounds describe the TARGET lane)
        xb_specs = [pl.BlockSpec((2, BLK), lambda b, *_: (0, b + 1),
                                 memory_space=pltpu.VMEM)]
        xb_args = [XBp]
    outf, outi = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(grid,),
            in_specs=xb_specs + [hspec_l(Ff), spec(Ff, 1), hspec_r(Ff),
                                 hspec_l(Fi), spec(Fi, 1), hspec_r(Fi)],
            out_specs=[
                pl.BlockSpec((Ff, capk, BLK), lambda b, *_: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Fi, capk, BLK), lambda b, *_: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Ff, capk, NC_pad), jnp.float32),
            jax.ShapeDtypeStruct((Fi, capk, NC_pad), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*scalars, *xb_args, PFp, PFp, PFp, PIp, PIp, PIp)
    if capk != cap:
        outf, outi = outf[:, :cap], outi[:, :cap]
    return outf, outi


def _move_call_tiled3d(
    PF4p: jax.Array,
    PI4p: jax.Array,
    occ9: jax.Array,
    geom,
    xr: int,
    n_planes: int,
    BLK: int,
    x_base,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array]:
    """The 3D rebin move on the tiled (x-plane, yz-block) grid.

    Mirrors ops/pair_pallas._call_tiled3d: the flat-lane halo would need
    BLK >= the x-stride (~n^2 in 3D), so the x stencil direction becomes a
    3x3 set of plane/yz-block refs and y/z remain lane offsets.  The
    candidate walk is slot-row-major then flat-offset ascending (the 2D
    kernel's order), occupancy-gated in sublane tiles of 8 rows: the slot
    fori_loop trips ceil(occ9/8) times, and each tile stages its 27 offset
    windows once, then runs the 8 rows' crossbars against them.

    ``PF4p``/``PI4p``: [F, n_planes + 2, capk, NYZ_pad + 2*BLK] from
    halo.assemble_tiled, plane axis transposed out of the trailing dims.
    ``occ9``: i32 [n_planes * n_yb] — max occupancy over each block's 3x3
    plane/yz-block neighborhood (any cell a window can read).
    ``x_base``: i32 [1] global plane offset of this shard (0 single-device)
    for the global-cell-id match under shard_map.
    """
    import numpy as np

    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    NYZ = ngy * ngz
    NYZ_pad = PF4p.shape[-1] - 2 * BLK
    n_yb = NYZ_pad // BLK
    capk = PF4p.shape[2]
    Ff, Fi = PF4p.shape[0], PI4p.shape[0]
    ga = halo_mod.ghost_axes(geom)
    TI = min(8, capk)

    offs = sorted(
        (off[0] * NYZ + off[1] * ngz + off[2], off)
        for off in geom.stencil_offsets()
    )

    lo = tuple(float(v) for v in geom.lo)
    inv = tuple(float(np.float32(1.0 / cs)) for cs in geom.cell_size)
    edges = geom.x_edges is not None
    if edges:
        inv_q = float(np.float32(1.0 / geom.x_quantum))
        from sph_bvf_tpu.core.state import _x_column_table

        n_fine = int(_x_column_table(geom).shape[0])

    def kernel(*refs):
        if edges:
            (occ_ref, xb_ref, xe_ref), rest = refs[:3], refs[3:]
        else:
            (occ_ref, xb_ref), rest = refs[:2], refs[2:]
        f_refs = rest[0:9]
        i_refs = rest[9:18]
        outf_ref, outi_ref = rest[18], rest[19]
        bx = pl.program_id(0)
        by = pl.program_id(1)

        l = by * BLK + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        cz = l % ngz
        cy = l // ngz  # within-plane y (>= ngy on yz pad lanes)
        gx = xb_ref[0] + bx
        # global ghosted flat cell id of this lane; the NYZ_pad tail lanes
        # (l >= NYZ) would alias the next plane's leading cells, so they
        # are masked out of the match below
        g = gx * NYZ + l
        lane_ok = l < NYZ

        accF = jnp.zeros((Ff, capk, BLK), jnp.float32)
        accI = jnp.zeros((Fi, capk, BLK), jnp.int32)
        cnt = jnp.zeros((1, BLK), jnp.int32)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (capk, 1), 0)

        def tile_body(t, carry):
            accF, accI, cnt = carry
            # dynamic indices only on ref loads (Mosaic has no
            # dynamic_slice on values): stage this sublane tile's 3-yz-block
            # window per x-plane from the refs, then slice lanes statically
            s0 = pl.multiple_of(t * TI, TI)
            jw_f = [
                jnp.concatenate(
                    [
                        f_refs[dx * 3 + dy][:, 0, pl.dslice(s0, TI), :]
                        for dy in range(3)
                    ],
                    axis=-1,
                )
                for dx in range(3)
            ]
            jw_i = [
                jnp.concatenate(
                    [
                        i_refs[dx * 3 + dy][:, 0, pl.dslice(s0, TI), :]
                        for dy in range(3)
                    ],
                    axis=-1,
                )
                for dx in range(3)
            ]
            tiles_f = [
                jax.lax.slice_in_dim(
                    jw_f[off[0] + 1],
                    BLK + off_flat - off[0] * NYZ,
                    BLK + off_flat - off[0] * NYZ + BLK,
                    axis=2,
                )
                for off_flat, off in offs
            ]
            tiles_i = [
                jax.lax.slice_in_dim(
                    jw_i[off[0] + 1],
                    BLK + off_flat - off[0] * NYZ,
                    BLK + off_flat - off[0] * NYZ + BLK,
                    axis=2,
                )
                for off_flat, off in offs
            ]
            for r in range(TI):
                for k, (off_flat, off) in enumerate(offs):
                    cf = tiles_f[k][:, r : r + 1, :]  # [Ff, 1, BLK]
                    ci_ = tiles_i[k][:, r : r + 1, :]
                    vj = ci_[0] != 0  # [1, BLK]
                    vj = vj & lane_ok
                    for o, c, n in ((off[1], cy, ngy), (off[2], cz, ngz)):
                        if o != 0:
                            vj = vj & (c + o >= 0) & (c + o < n)
                    # candidate's new GLOBAL ghosted flat cell id from its
                    # wrapped position (same arithmetic as the 2D kernel).
                    # Non-uniform x: the plane IS the column, so the
                    # column bounds are per-plane SCALARS (prefetch row)
                    ncell = jnp.zeros((1, BLK), jnp.int32)
                    for ax, (s, n) in enumerate(
                        ((NYZ, geom.ncells[0]), (ngz, geom.ncells[1]),
                         (1, geom.ncells[2]))
                    ):
                        if n == 1 or (ax == 0 and edges):
                            continue
                        xa = cf[xr + ax]
                        c2 = jnp.floor(
                            (xa - lo[ax]) * inv[ax]
                        ).astype(jnp.int32)
                        if geom.periodic[ax]:
                            c2 = jnp.remainder(c2, n)
                        else:
                            c2 = jnp.clip(c2, 0, n - 1)
                        if ax in ga:
                            c2 = c2 + 1
                        ncell = ncell + c2 * s
                    if edges:
                        xa = cf[xr]
                        fj = jnp.floor(
                            (xa - lo[0]) * inv_q
                        ).astype(jnp.int32)
                        fj = jnp.clip(fj, 0, n_fine - 1)
                        matchx = (fj >= xe_ref[0, gx]) & (
                            fj < xe_ref[1, gx]
                        )
                        match = vj & matchx & (ncell == l)
                    else:
                        match = vj & (ncell == g)
                    sel = match & (cnt == iota_s)  # [capk, BLK]
                    accF = jnp.where(sel[None], cf, accF)
                    accI = jnp.where(sel[None], ci_, accI)
                    cnt = cnt + match.astype(jnp.int32)
            return accF, accI, cnt

        trips = (occ_ref[bx * n_yb + by] + TI - 1) // TI
        accF, accI, _ = jax.lax.fori_loop(
            0, trips, tile_body, (accF, accI, cnt)
        )
        outf_ref[...] = accF.reshape(Ff, 1, capk, BLK)
        outi_ref[...] = accI.reshape(Fi, 1, capk, BLK)

    def plane_specs(F):
        return [
            pl.BlockSpec(
                (F, 1, capk, BLK),
                (lambda dx, dy: lambda bx, by, *_: (0, bx + dx, 0, by + dy))(
                    dx, dy
                ),
                memory_space=pltpu.VMEM,
            )
            for dx in range(3)
            for dy in range(3)
        ]

    out_specs = [
        pl.BlockSpec((Ff, 1, capk, BLK), lambda bx, by, *_: (0, bx, 0, by),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Fi, 1, capk, BLK), lambda bx, by, *_: (0, bx, 0, by),
                     memory_space=pltpu.VMEM),
    ]
    xb = jnp.asarray(x_base, jnp.int32).reshape(1)
    scalars = [occ9, xb]
    if edges:
        # per-GLOBAL-plane fine-bin column bounds, indexed at gx (scalar)
        scalars.append(jnp.asarray(_col_fine_bounds(geom)))
    outf, outi = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(n_planes, n_yb),
            in_specs=plane_specs(Ff) + plane_specs(Fi),
            out_specs=out_specs,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Ff, n_planes, capk, NYZ_pad), jnp.float32),
            jax.ShapeDtypeStruct((Fi, n_planes, capk, NYZ_pad), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*scalars, *([PF4p] * 9), *([PI4p] * 9))
    return outf, outi


def _move_tiled3d(
    PF, PI, geom, xr: int, interpret: bool
) -> Tuple[jax.Array, jax.Array]:
    """Single-device driver: assemble tiled buffers, run, reassemble.

    ``PF``/``PI`` are the packed (un-ghosted) [F, cap, NC] matrices;
    returns trimmed [F, cap, NC] outputs.
    """
    cap = geom.cap
    ngz2 = halo_mod.ghosted_ncells(geom)[2]
    BLK = max(256, _round_up(ngz2 + 2, 128))
    capk = _round_up(cap, 8)

    PFg = halo_mod.add_ghosts(jnp.pad(PF, ((0, 0), (0, capk - cap), (0, 0))), geom)
    PIg = halo_mod.add_ghosts(jnp.pad(PI, ((0, 0), (0, capk - cap), (0, 0))), geom)
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    NYZ = ngy * ngz
    NYZ_pad = _round_up(NYZ, BLK)
    n_yb = NYZ_pad // BLK
    wrap = halo_mod.wrap_x(geom)

    PF4p = jnp.transpose(
        halo_mod.assemble_tiled(PFg, geom, BLK, NYZ_pad, wrap), (0, 2, 1, 3)
    )
    PI4p = jnp.transpose(
        halo_mod.assemble_tiled(PIg, geom, BLK, NYZ_pad, wrap), (0, 2, 1, 3)
    )
    from sph_bvf_tpu.ops.pair_pallas import _neighborhood_max

    occ = jnp.sum((PIg[0] != 0).astype(jnp.int32), axis=0).reshape(ngx, NYZ)
    occ = jnp.pad(occ, ((0, 0), (0, NYZ_pad - NYZ)))
    occmax = jnp.max(occ.reshape(ngx, n_yb, BLK), axis=2)
    occ9 = _neighborhood_max(occmax, wrap).reshape(-1)

    outf, outi = _move_call_tiled3d(
        PF4p, PI4p, occ9, geom, xr, ngx, BLK, 0, interpret
    )
    outf = jnp.transpose(outf, (0, 2, 1, 3))[:, :cap]
    outi = jnp.transpose(outi, (0, 2, 1, 3))[:, :cap]
    outf = outf[..., :NYZ].reshape(outf.shape[0], cap, ngx * NYZ)
    outi = outi[..., :NYZ].reshape(outi.shape[0], cap, ngx * NYZ)
    return halo_mod.trim_ghosts(outf, geom), halo_mod.trim_ghosts(outi, geom)


def _move_tiled3d_sharded(
    PF, PI, geom, xr: int, mesh, axis: str, interpret: bool
) -> Tuple[jax.Array, jax.Array]:
    """Sharded tiled-3D move: x-plane slabs per device, one plane of halo
    exchanged per side via lax.ppermute (mirrors pair_pallas.
    _pass_a_tiled3d_sharded).  The global-cell-id match key makes
    cross-shard migration fall out of the exchange, as in 2D.
    """
    cap = geom.cap
    n_shards = mesh.shape[axis]
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    if ngx % n_shards:
        raise ValueError(
            f"nx={ngx} does not split into plane slabs over {n_shards} shards"
        )
    nx_loc = ngx // n_shards
    if nx_loc < 2:
        raise ValueError("need at least 2 x-planes per shard")
    ngz2 = ngz
    BLK = max(256, _round_up(ngz2 + 2, 128))
    capk = _round_up(cap, 8)
    NYZ = ngy * ngz
    NYZ_pad = _round_up(NYZ, BLK)
    n_yb = NYZ_pad // BLK
    wrap = halo_mod.wrap_x(geom)

    PFg = halo_mod.add_ghosts(
        jnp.pad(PF, ((0, 0), (0, capk - cap), (0, 0))), geom
    )
    PIg = halo_mod.add_ghosts(
        jnp.pad(PI, ((0, 0), (0, capk - cap), (0, 0))), geom
    )

    from sph_bvf_tpu.ops.pair_pallas import _neighborhood_max

    def local(PFl, PIl):
        idx = jax.lax.axis_index(axis)
        fhl, fhr = halo_mod.exchange_slabs(PFl, NYZ, axis, n_shards, wrap)
        ihl, ihr = halo_mod.exchange_slabs(PIl, NYZ, axis, n_shards, wrap)
        lead_f, lead_i = PFl.shape[:-1], PIl.shape[:-1]
        PF4p = jnp.transpose(
            halo_mod.assemble_tiled(
                PFl, geom, BLK, NYZ_pad, wrap=False,
                plane_left=fhl.reshape(lead_f + (1, NYZ)),
                plane_right=fhr.reshape(lead_f + (1, NYZ)),
                n_planes=nx_loc,
            ),
            (0, 2, 1, 3),
        )
        PI4p = jnp.transpose(
            halo_mod.assemble_tiled(
                PIl, geom, BLK, NYZ_pad, wrap=False,
                plane_left=ihl.reshape(lead_i + (1, NYZ)),
                plane_right=ihr.reshape(lead_i + (1, NYZ)),
                n_planes=nx_loc,
            ),
            (0, 2, 1, 3),
        )
        occ = jnp.sum((PIl[0] != 0).astype(jnp.int32), axis=0).reshape(
            nx_loc, NYZ
        )
        occ = jnp.pad(occ, ((0, 0), (0, NYZ_pad - NYZ)))
        occmax = jnp.max(occ.reshape(nx_loc, n_yb, BLK), axis=2)
        occ9 = _neighborhood_max(occmax, False)
        # neighbor-shard planes: occupancy unknown locally — assume full
        occ9 = occ9.at[0].set(cap).at[-1].set(cap)
        outf, outi = _move_call_tiled3d(
            PF4p, PI4p, occ9.reshape(-1), geom, xr, nx_loc, BLK,
            idx * nx_loc, interpret,
        )
        outf = jnp.transpose(outf, (0, 2, 1, 3))[:, :cap]
        outi = jnp.transpose(outi, (0, 2, 1, 3))[:, :cap]
        outf = outf[..., :NYZ].reshape(outf.shape[0], cap, nx_loc * NYZ)
        outi = outi[..., :NYZ].reshape(outi.shape[0], cap, nx_loc * NYZ)
        return outf, outi

    outf, outi = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis)),
        out_specs=(P(None, None, axis), P(None, None, axis)),
        check_vma=False,
    )(PFg, PIg)
    return halo_mod.trim_ghosts(outf, geom), halo_mod.trim_ghosts(outi, geom)


def _x_row(fmeta) -> int:
    xr = 0
    for name, nrows, _, _ in fmeta:
        if name == "x":
            return xr
        xr += nrows
    raise KeyError("x")


def move_pallas(
    fields: Dict[str, jax.Array], geom, block: int = 0, interpret: bool = False
) -> Dict[str, jax.Array]:
    """Move every particle leaf to its new cell slot; returns the new dict.

    ``fields`` must already be position-wrapped (wrap_pbc) and must contain
    ``x`` and ``valid``.  Particles landing in a full cell (rank >= cap) or
    outside the one-cell drift ring are zeroed (valid=False) — the caller
    counts them by differencing n_valid.
    """
    NC, cap = geom.ncells_total, geom.cap
    PF, PI, fmeta, imeta = _pack_fields(fields, cap, NC)

    if geom.dim >= 3:
        outf, outi = _move_tiled3d(PF, PI, geom, _x_row(fmeta), interpret)
        return _unpack_fields(outf, outi, fmeta, imeta, fields, cap, NC)

    if block <= 0:
        block = 768  # measured best in 2D at 1M particles
    max_off = halo_mod.max_flat_offset(geom)
    BLK = max(block, _round_up(max_off + 1, 128))

    if _rebin_gated(cap):
        capk = _round_up(cap, 8)
        PF = jnp.pad(PF, ((0, 0), (0, capk - cap), (0, 0)))
        PI = jnp.pad(PI, ((0, 0), (0, capk - cap), (0, 0)))
    PFg = halo_mod.add_ghosts(PF, geom)
    PIg = halo_mod.add_ghosts(PI, geom)
    NCg = PFg.shape[-1]
    NC_pad = _round_up(NCg, BLK)
    wrap = halo_mod.wrap_x(geom)
    PFp = halo_mod.assemble_padded(PFg, BLK, NC_pad, wrap, max_off)
    PIp = halo_mod.assemble_padded(PIg, BLK, NC_pad, wrap, max_off)

    XBp = None
    if geom.x_edges is not None:
        XB = _lane_fine_bounds(geom, NCg)
        XBp = jnp.pad(XB, ((0, 0), (BLK, NC_pad - NCg + BLK)))
    outf, outi = _move_call(
        PFp, PIp, geom, _x_row(fmeta), NCg, BLK, 0, interpret, XBp=XBp
    )
    outf = halo_mod.trim_ghosts(outf[:, :, :NCg], geom)
    outi = halo_mod.trim_ghosts(outi[:, :, :NCg], geom)
    return _unpack_fields(outf, outi, fmeta, imeta, fields, cap, NC)


def move_pallas_sharded(
    fields: Dict[str, jax.Array],
    geom,
    mesh,
    axis: str = "x",
    block: int = 0,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """The rebin move with per-device kernels under shard_map.

    Same halo exchange as ops/pair_pallas.pass_a_sharded; because the match
    key is the global cell id, a particle whose new cell lies in the
    neighboring shard is written there (from the neighbor's halo copy) and
    dropped locally — the migration step of the reference's exchange
    (comm_brick.cpp:585) with no extra communication.
    """
    NC, cap = geom.ncells_total, geom.cap
    n_shards = mesh.shape[axis]
    if geom.ncells[0] % n_shards:
        raise ValueError(
            f"nx={geom.ncells[0]} does not split into x-aligned slabs over "
            f"{n_shards} shards (use Scene.ncx_multiple_of)"
        )
    PF, PI, fmeta, imeta = _pack_fields(fields, cap, NC)

    if geom.dim >= 3:
        outf, outi = _move_tiled3d_sharded(
            PF, PI, geom, _x_row(fmeta), mesh, axis, interpret
        )
        return _unpack_fields(outf, outi, fmeta, imeta, fields, cap, NC)

    if block <= 0:
        block = 768
    max_off = halo_mod.max_flat_offset(geom)
    BLK = max(block, _round_up(max_off + 1, 128))
    if _rebin_gated(cap):
        capk = _round_up(cap, 8)
        PF = jnp.pad(PF, ((0, 0), (0, capk - cap), (0, 0)))
        PI = jnp.pad(PI, ((0, 0), (0, capk - cap), (0, 0)))
    PFg = halo_mod.add_ghosts(PF, geom)
    PIg = halo_mod.add_ghosts(PI, geom)
    NCg = PFg.shape[-1]
    NC_loc = NCg // n_shards
    if NC_loc <= max_off:
        raise ValueError(
            f"local slab of {NC_loc} lanes is narrower than the stencil "
            f"reach {max_off} — the nearest-neighbor halo exchange cannot "
            f"cover it; use fewer shards or a larger grid"
        )
    NC_pad = _round_up(NC_loc, BLK)
    xr = _x_row(fmeta)
    wrap = halo_mod.wrap_x(geom)

    XBg = (
        _lane_fine_bounds(geom, NCg) if geom.x_edges is not None else None
    )

    def local(PFl, PIl, *xb):
        idx = jax.lax.axis_index(axis)
        fhl, fhr = halo_mod.exchange_slabs(PFl, max_off, axis, n_shards, wrap)
        ihl, ihr = halo_mod.exchange_slabs(PIl, max_off, axis, n_shards, wrap)
        PFp = halo_mod.assemble_padded(
            PFl, BLK, NC_pad, wrap=False, max_off=max_off,
            halo_left=fhl, halo_right=fhr,
        )
        PIp = halo_mod.assemble_padded(
            PIl, BLK, NC_pad, wrap=False, max_off=max_off,
            halo_left=ihl, halo_right=ihr,
        )
        XBp = (
            jnp.pad(xb[0], ((0, 0), (BLK, NC_pad - NC_loc + BLK)))
            if xb
            else None
        )
        outf, outi = _move_call(
            PFp, PIp, geom, xr, NC_loc, BLK, idx * NC_loc, interpret,
            XBp=XBp,
        )
        return outf[:, :, :NC_loc], outi[:, :, :NC_loc]

    xb_args = () if XBg is None else (XBg,)
    outf, outi = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis))
        + (P(None, axis),) * len(xb_args),
        out_specs=(P(None, None, axis), P(None, None, axis)),
        # the kernel's ShapeDtypeStruct outputs carry no vma annotation
        check_vma=False,
    )(PFg, PIg, *xb_args)
    outf = halo_mod.trim_ghosts(outf, geom)
    outi = halo_mod.trim_ghosts(outi, geom)
    return _unpack_fields(outf, outi, fmeta, imeta, fields, cap, NC)
