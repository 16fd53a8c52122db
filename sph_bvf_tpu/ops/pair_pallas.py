"""Pallas TPU kernel for pair pass A (fused sweeps 1+2 + species transport).

Why: under plain XLA the pair physics compiles to ~150 small fusions, each
materializing [ci, cj, NC] temporaries to HBM (~9 ms/step at 42k particles).
This kernel walks the flat cell axis in lane blocks, stages each block plus
its stencil halo in VMEM once, and evaluates *all* stencil offsets and all
physics terms against on-chip data — the temporaries never touch HBM.

Design:
  * All per-particle inputs are packed into one f32 matrix PF [F, cap, NC]
    (components as rows).  PF is lane-padded by one block on each side and
    the same padded array is passed THREE times with block index maps: a
    BLK-wide mid block plus two H-wide side-halo blocks, H = the stencil
    reach rounded to a lane tile (_halo_width).  The [H | BLK | H] VMEM
    window covers every stencil offset because the maximum flat-cell
    offset (strides summed) is < H.  This expresses an overlapping halo
    with ordinary BlockSpecs — no manual DMA — re-reading (BLK + 2H)/BLK
    of PF (1.67x at 768/256; was 3x with full-BLK side blocks, measured
    as part of the round-4 skeleton decomposition).
  * Boundary conditions live ENTIRELY in the halo/ghost content built by
    core/halo.py: zero halos for walls, wrapped copies for periodic x,
    ppermute'd neighbor slabs for a sharded x axis, and ghost columns for
    periodic inner axes.  The kernel never tests the x coordinate — an
    out-of-domain x neighbor is simply an invalid (zero) lane.  Wrapped /
    ghost copies keep their unwrapped coordinates; the physics applies the
    minimum-image shift (ops/pair._pair_delta), exactly like the jnp path.
  * The reference physics itself is the SAME code as the jnp path
    (`_pass_a_offset` in ops/pair.py) — inside a Mosaic kernel jnp ops
    lower to VPU vector ops directly.  Only the per-type-pair coefficient
    lookups differ: Mosaic has no dynamic gather, so the [T, T] tables are
    read with an unrolled select chain over the (tiny) type-pair space.
  * Stencil neighbor access is a static lane slice of the staged block —
    the in-kernel equivalent of `shift_cells`, with the per-axis bounds
    masks applied to the J validity row (inner axes only; see above).
  * Accumulators live in registers/VMEM for the whole block and are written
    once to the packed output matrix [A, cap, NC].

Multi-chip: `pass_a_sharded` runs the same kernel per device under
`shard_map`, with the halo lanes exchanged via `lax.ppermute` — the TPU
analog of the reference's brick ghost exchange (comm_brick.cpp:460-880).
Shards must be x-aligned slabs (nx divisible by the mesh size): the
in-kernel cy/cz decomposition of the lane index assumes every shard starts
on an x-column boundary.

Eligibility (falls back to the jnp path otherwise): f32 state,
VMEM-bounded halo blocks, and a TPU backend.  SDPD thermal noise IS
kernel-supported (pair-symmetric counter noise, round 2).  SSA configs
default to the fused jnp path — measured faster (8.0M vs 4.65M ps/s at
10k particles) than the round-4 split (kernel mechanics + separate jnp
Qd pass, `PairConfig.ssa_kernel_split=True`), because the counter-RNG
hop draws dominate and the standalone Qd pass costs as much as the whole
fused pass; see MIGRATING.md "SSA performance note".
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sph_bvf_tpu.core import halo as halo_mod
from sph_bvf_tpu.core.state import Geometry, Params, State


_SCALAR_ACCS = frozenset(
    ("num_den", "rhoAux1", "rhoAux2", "drho", "de", "phi")
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _default_rowloop(geom) -> bool:
    """Pick the i-slot strategy (see _call_padded): the grouped kernel fully
    unrolls (groups x offsets x physics), which Mosaic only compiles in
    reasonable time for small caps with a known lattice occupancy; 3D (27
    offsets), mixed-lattice models (base_occ == 0, e.g. the fsi beam's
    0.6x-finer lattice pushing cap to ~47), and large caps take the
    fori_loop-over-rows shape whose compiled size is occupancy-independent."""
    return geom.dim >= 3 or geom.base_occ == 0 or geom.cap > 24


def _kernel_block(geom, block: int = 0, rowloop: bool | None = None) -> int:
    """Lane-block size: user block or the shape-aware default, raised to
    cover the ghosted stencil reach.

    Small 2D grids split by kernel shape (A/B on real TPU, round 3, same
    methodology both sides): the grouped kernel wants 256 (cavity N=200
    58.5M at 256 vs 52.8M at 128; convection 54.2M vs 47.8M) while the
    rowloop kernel wants 128 (fsi nx=60 9.44M at 128 vs 7.37M at 256 —
    its per-i-tile VMEM staging scales with BLK, so smaller blocks keep
    the gated j/elastic passes cheap; polar is flat).  Large grids keep
    768 (2% faster at 1M particles, amortized pipelining)."""
    if block <= 0:
        if geom.dim >= 3:
            block = 128
        elif geom.ncells_total >= 50_000:
            block = 768
        else:
            if rowloop is None:
                rowloop = _default_rowloop(geom)
            block = 128 if rowloop else 256
    return max(block, _round_up(halo_mod.max_flat_offset(geom) + 1, 128))


def _halo_width(geom, blk: int) -> int:
    """Side-halo lane width (core/halo.halo_width — shared with the rebin
    kernel): the stencil reach rounded to a lane tile, so the left/right
    block refs DMA BLK + 2*H lanes of PF instead of 3*BLK."""
    return halo_mod.halo_width(geom, blk)


def kernel_supported(state: State, params: Params, geom: Geometry, cfg) -> bool:
    """Platform-independent kernel eligibility (shared by the single-device
    and shard_map paths; the latter runs in interpret mode off-TPU)."""
    if state.x.dtype != jnp.float32:
        return False
    if params.n_ssa > 0 and not getattr(cfg, "ssa_kernel_split", False):
        # whole-pass jnp fallback for SSA (the pre-split behavior); with
        # the split the kernel handles the mechanics and compute_forces
        # draws Qd in the separate jnp pass (ops/pair._pass_a_qd)
        return False
    # the 3 staged [F, cap, BLK] halo blocks + [A, cap, BLK] output are
    # double-buffered in VMEM; BLK scales with the x-stride (ny*nz), so
    # tall/deep grids must fall back to the jnp path instead of failing at
    # the 100MB vmem limit (see rebin_pallas_eligible for the same bound)
    F = sum(n for _, n in _field_layout(params, cfg))
    A = sum(n for _, n in _acc_layout(params, cfg))
    if geom.dim >= 3:
        # tiled kernel: 9 plane/yz-block refs + output, double-buffered,
        # plus the 27-offset body's live temporaries (~the same order)
        blk = _tile_block(geom)
        return 4 * (9 * F + A) * geom.cap * blk * 4 <= 90 * 1024 * 1024
    blk = _kernel_block(geom)
    h = _halo_width(geom, blk)
    if 2 * (F * (blk + 2 * h) + A * blk) * geom.cap * 4 > 90 * 1024 * 1024:
        return False
    return True


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def pallas_eligible(state: State, params: Params, geom: Geometry, cfg) -> bool:
    return kernel_supported(state, params, geom, cfg) and on_tpu()


def _field_layout(params: Params, cfg) -> List[Tuple[str, int]]:
    """(name, nrows) for every per-particle field staged in the PF matrix."""
    rows = [
        ("valid", 1), ("ptype", 1), ("solid", 1),
        ("x", 3), ("v", 3), ("vest", 3),
        ("rho", 1),
        ("m", 1), ("B", 1), ("c0", 1),
        ("P_rho2", 1), ("inv_rho", 1), ("m_rho", 1), ("V2", 1),
    ]
    if getattr(cfg, "density_filter_accs", True):
        # rhoI is consumed ONLY by the Shepard-filter rhoAux1 accumulation
        # (ops/pair.py), so the cadence-gated programs drop its window row
        # entirely — one less row of DMA, concat, and per-offset rotation
        rows.insert(7, ("rhoI", 1))
    if cfg.solids_present:
        rows.append(("AS", 9) if cfg.elastic_present else ("ASd", 1))
    if cfg.elastic_present:
        rows.append(("S", 9))
        if cfg.g0_chem_coupling:
            rows.append(("G0", 1))
    if params.n_sdpd > 0:
        rows.append(("C", params.n_sdpd))
    if cfg.thermal:
        # the SDPD random force hashes pair tags and reads e_i; tags stay
        # exact as f32 below 2^24 particles (ops/rand.py hash converts back
        # to u32 in-kernel)
        rows += [("e", 1), ("tag", 1)]
    return rows


def _acc_layout(params: Params, cfg) -> List[Tuple[str, int]]:
    rows = [
        ("num_den", 1),
        ("ddv", 3), ("f", 3), ("drho", 1), ("de", 1),
    ]
    if getattr(cfg, "density_filter_accs", True):
        # dropped from the cadence-gated programs: the loop carries two
        # fewer accumulator rows and the output writes two fewer planes
        # (compute_forces pre-fills rhoAux with zeros, so absent keys in
        # the kernel's returned dict degrade exactly)
        rows[1:1] = [("rhoAux1", 1), ("rhoAux2", 1)]
    if cfg.xsph:
        rows.append(("ddx", 3))
    if cfg.solids_present:
        rows += [("phi", 1), ("nw", 3)]
    if cfg.elastic_present:
        rows.append(("dS", 9))
    if params.n_sdpd > 0:
        rows.append(("Q", params.n_sdpd))
    return rows


def _pack(pf: Dict[str, jax.Array], layout, cap: int, NC: int) -> jax.Array:
    mats = []
    for name, nrows in layout:
        a = pf[name]
        a = a.reshape(-1, cap, NC).astype(jnp.float32)
        assert a.shape[0] == nrows, (name, a.shape, nrows)
        mats.append(a)
    return jnp.concatenate(mats, axis=0)


def _row_ranges(layout) -> Dict[str, Tuple[int, int]]:
    out, r = {}, 0
    for name, nrows in layout:
        out[name] = (r, r + nrows)
        r += nrows
    return out


def _select_table(ti, tj, table_ref, T: int):
    """table[ti, tj] without gathers, factored over the broadcast structure:
    the inner sum over tj runs at j shape ([1, cap, BLK] — cheap), so only T
    pair-shaped selects+adds remain instead of the 2*T^2 a flat unrolled
    (ti*T+tj)-select chain costs."""
    out = None
    for a in range(T):
        row = jnp.zeros_like(tj)
        for b in range(T):
            row = jnp.where(tj == float(b), table_ref[a, b], row)
        term = jnp.where(ti == float(a), row, 0.0)  # broadcasts to pair shape
        out = term if out is None else out + term
    return out


def _coeff_builder(tab_names, cfg, tab_ref, T: int):
    """Per-offset coefficient-dict builder for the kernels.

    Uniform tables (cfg.uniform_tables, computed by Scene.build from the
    concrete pair_coeff values) collapse to ONE scalar load, hoisted out of
    the offset/tile loops — bit-exact, since every entry equals
    table[0, 0].  Only genuinely type-dependent tables pay the factored
    select chain.  For the shipped scenes this removes most of the ~5
    pair-shaped ops x n_tables x n_offsets select tax from the hot loop
    (e.g. the 3D cavity's tables are ALL uniform)."""
    base = {
        k: tab_ref[i, 0, 0]
        for i, k in enumerate(tab_names)
        if k in cfg.uniform_tables
    }

    def build(ti, tj):
        out = dict(base)
        for i, k in enumerate(tab_names):
            if k not in cfg.uniform_tables:
                out[k] = _select_table(ti, tj, tab_ref[i], T)
        return out

    return build


def _select_table_rows(ti, tj, table_ref, T: int, nsp: int):
    """table[ti, tj, :] -> [nsp, pair shape] via the same factored select."""
    comps = []
    for s in range(nsp):
        out = None
        for a in range(T):
            row = jnp.zeros_like(tj)
            for b in range(T):
                row = jnp.where(tj == float(b), table_ref[a * T + b, s], row)
            term = jnp.where(ti == float(a), row, 0.0)
            out = term if out is None else out + term
        comps.append(out)
    return jnp.stack(comps, axis=0)


def _thermal_meta(dt, step, seed) -> jax.Array:
    """Pack the traced thermal-noise scalars into an i32[3] scalar-prefetch
    operand: [bitcast(dt), step, seed].  Exact round trip — the kernel
    bitcasts dt back to f32 and wrap-converts step/seed to u32, so the
    counter-based noise stream (ops/rand.py) is identical to the jnp
    path's."""
    dt_bits = jax.lax.bitcast_convert_type(
        jnp.asarray(dt, jnp.float32), jnp.int32
    )
    return jnp.stack([
        dt_bits,
        jnp.asarray(step, jnp.int32),
        jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
    ])


def _unpack_meta(meta_ref):
    """Kernel-side inverse of _thermal_meta; zeros when absent."""
    if meta_ref is None:
        return 0.0, 0, 0
    dt_k = jax.lax.bitcast_convert_type(meta_ref[0], jnp.float32)
    return dt_k, meta_ref[1], meta_ref[2].astype(jnp.uint32)


def _call_padded(
    PFp: jax.Array,
    occ: jax.Array | None,
    params: Params,
    geom: Geometry,
    cfg,
    NC_lanes: int,
    BLK: int,
    interpret: bool,
    rowloop: bool,
    occ_edge: str = "walls",
    meta: jax.Array | None = None,
    eflag: jax.Array | None = None,
) -> jax.Array:
    """Run the kernel over a pre-assembled padded buffer.

    ``PFp``: [F, cap_rows, NC_pad + 2*BLK] with halo/ghost content already
    in place (core/halo.py); for the rowloop shape the caller pads cap_rows
    to a sublane multiple (padded rows invalid).  ``occ``: per-lane
    occupancy [NC_lanes] (valid counts) for the slot gating, or None to
    disable gating.  ``occ_edge`` says what the halo blocks' occupancy
    bound is for the rowloop's j gating: "walls" (zeros), "wrap" (the far
    end of this same array), or "cap" (unknown remote content — a sharded
    neighbor's slab; assume full).  ``meta``: i32[3] scalar-prefetch
    [bitcast(dt), step, seed] for the thermal random force (see
    _thermal_meta), or None for the thermal-free configs.  ``eflag``:
    [NC_lanes] i32 marking lanes whose cells hold a valid solid i with
    nonzero elastic response (``_elastic_lanes``); when given on an
    elastic rowloop config, the Jaumann dS block runs in a separate pass
    gated per block on it.  Returns the raw packed accumulators
    [A, cap_rows, NC_pad]; the caller trims.
    """
    cap = PFp.shape[1]
    T = params.ntypes
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    sgx, sgy, sgz = halo_mod.ghosted_strides(geom)
    offsets = geom.stencil_offsets()
    NC_pad = _round_up(NC_lanes, BLK)
    grid = NC_pad // BLK
    assert PFp.shape[-1] == NC_pad + 2 * BLK, (PFp.shape, NC_pad, BLK)
    # narrow side halos (see _halo_width): the left/right refs stage only
    # the stencil reach H <= BLK; the staged window is [H | BLK | H]
    H = _halo_width(geom, BLK)

    fl = _field_layout(params, cfg)
    al = _acc_layout(params, cfg)
    frow = _row_ranges(fl)
    arow = _row_ranges(al)
    F = sum(n for _, n in fl)
    A = sum(n for _, n in al)

    # minimum-image shifts for periodic axes (static); the halo/ghost copies
    # keep unwrapped coordinates, exactly like the jnp path's rolled views
    pbc = tuple(
        (ax, geom.hi[ax] - geom.lo[ax])
        for ax in range(3)
        if geom.periodic[ax] and geom.ncells[ax] > 1
    )

    from sph_bvf_tpu.ops.pair import (
        _bc, _pass_a_dS_offset, _pass_a_elastic_f_offset, _pass_a_offset,
        coeff_tables, used_table_names,
    )

    tab_dict = coeff_tables(params, cfg)
    used = used_table_names(params, cfg, ssa=False)
    tab_names = [k for k in sorted(tab_dict) if k in used]
    tables = jnp.stack(
        [tab_dict[k] for k in tab_names], axis=0
    ).astype(jnp.float32)  # [n_tab, T, T]
    kap = (
        params.kappa.reshape(T * T, params.n_sdpd).astype(jnp.float32)
        if params.n_sdpd > 0
        else jnp.zeros((T * T, 1), jnp.float32)
    )

    def unpack(buf, lo, hi):
        """Rows of the staged block -> field dict of [*, cap, W] arrays."""
        out = {}
        for name, nrows in fl:
            r0, r1 = frow[name]
            a = buf[r0:r1, :, lo:hi]
            if name in ("AS", "S"):
                out[name] = a.reshape((3, 3) + a.shape[1:])
            elif nrows == 1:
                out[name] = a[0]
            else:
                out[name] = a
        return out

    # i-slot strategy.  Rebin rank-compacts slots, so slot rows >= the
    # lattice base occupancy are populated only where the flow has crowded
    # cells.  Two kernel shapes:
    #   * 2D (grouped): rows [0, split) vectorized; rows in [split, cap) in
    #     at most 4 statically-unrolled groups, each under a per-block
    #     max-occupancy gate.  Fully unrolled — fastest, but every
    #     (group, offset) pair inlines the physics once, which is only
    #     affordable with 2D's 9 offsets.
    #   * 3D (row loop): one lax.fori_loop over i-rows with the block's max
    #     occupancy as the trip count — work scales with actual occupancy
    #     and Mosaic compiles 27 offsets x [1, cap, BLK] in minutes where
    #     the unrolled form took >40.
    split = geom.base_occ if 0 < geom.base_occ < cap else cap
    n_gated = cap - split
    gsize = -(-n_gated // 4) if n_gated else 1
    gated_groups = (
        []
        if rowloop
        else [(s, min(s + gsize, cap)) for s in range(split, cap, gsize)]
    )
    need_occmax = (rowloop or bool(gated_groups)) and occ is not None
    if rowloop and occ is None:
        raise ValueError("rowloop kernel needs the occupancy vector")
    gate_ds = rowloop and cfg.elastic_present and eflag is not None
    # the deferred elastic-force pass additionally needs f_art to exist
    gate_fel = gate_ds and cfg.solids_present

    def kernel(*refs):
        i = 0
        meta_ref = None
        if meta is not None:
            meta_ref = refs[i]
            i += 1
        if need_occmax:
            occmax_ref = refs[i]
            i += 1
        tab_ref, kap_ref, left_ref, mid_ref, right_ref, out_ref = refs[i:]
        dt_k, step_k, seed_k = _unpack_meta(meta_ref)
        coeff_for = _coeff_builder(tab_names, cfg, tab_ref, T)
        b = pl.program_id(0)
        # stage the 3-block halo window in VMEM (rowloop stages TI-row
        # windows per j-tile instead — see jbody)
        buf = (
            None
            if rowloop
            else jnp.concatenate(
                [left_ref[:], mid_ref[:], right_ref[:]], axis=-1
            )
        )

        g = b * BLK + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        cz = g % ngz
        cy = (g // sgy) % ngy

        def acc_for_ibuf(ibuf, not_diag):
            """Accumulators for the staged i-rows over all offsets.

            ``ibuf`` is a fresh ref load [F, ci, BLK]: slicing the staged
            halo value at a sublane offset (e.g. row 9 of 14) gives Mosaic
            a nonzero-offset layout its reductions reject; a ref load
            starts a fresh zero-offset layout.
            """
            ci = ibuf.shape[1]
            ctr = unpack(ibuf, 0, BLK)
            Ifields = dict(ctr)
            Ifields["valid"] = ctr["valid"] != 0.0
            Ifields["solid"] = ctr["solid"] != 0.0
            Ifields["fluid"] = ~Ifields["solid"]
            I = {k: _bc(v, "i") for k, v in Ifields.items()}
            acc = {}
            for name, nrows in al:
                if name in _SCALAR_ACCS:
                    shape = (ci, BLK)
                elif name == "dS":
                    shape = (3, 3, ci, BLK)
                else:
                    shape = (nrows, ci, BLK)
                acc[name] = jnp.zeros(shape, jnp.float32)

            for off in offsets:
                off_flat = off[0] * sgx + off[1] * sgy + off[2] * sgz
                lo = H + off_flat
                Jf = unpack(buf, lo, lo + BLK)
                # inner-axis bounds: a y/z step of +-1 from a row edge lands
                # on the adjacent column's far edge in flat order — mask it.
                # Ghost columns widen ngy/ngz, so periodic wraps stay
                # in-bounds and read correct (ghost) content.  The x axis
                # needs no mask: its out-of-range lanes are the halo, whose
                # content (zeros / wrap / neighbor shard) IS the boundary
                # condition.
                # inb is [1, BLK] so the combined J validity stays [cj, BLK]
                # — a leading broadcast dim here would silently grow the
                # accumulators (acc[x] += [.., 1, ci, W] duplicates instead
                # of adding; caught by the elastic dS reshape)
                inb = jnp.ones((1, BLK), bool)
                for o, c, n in ((off[1], cy, ngy), (off[2], cz, ngz)):
                    if o != 0:
                        inb = inb & (c + o >= 0) & (c + o < n)
                Jf["valid"] = (Jf["valid"] != 0.0) & inb
                Jf["solid"] = Jf["solid"] != 0.0
                J = {k: _bc(v, "j") for k, v in Jf.items()}

                ti, tj = I["ptype"], J["ptype"]
                coeffs = coeff_for(ti, tj)
                if params.n_sdpd > 0:
                    coeffs["kap"] = _select_table_rows(
                        ti, tj, kap_ref, T, params.n_sdpd
                    )

                notself = not_diag if off == (0, 0, 0) else True
                acc = _pass_a_offset(
                    I, J, coeffs, params, cfg, dt_k, step_k, notself, acc,
                    seed=seed_k, pbc=pbc,
                )
            return acc

        def write_rows(acc, s0, ci, entries=al):
            for name, nrows in entries:
                r0, r1 = arow[name]
                out_ref[r0:r1, pl.dslice(s0, ci), :] = acc[name].reshape(
                    nrows, ci, BLK
                )

        def static_not_diag(s0, ci):
            return ~(
                (s0 + jax.lax.broadcasted_iota(jnp.int32, (ci, cap, 1), 0))
                == jax.lax.broadcasted_iota(jnp.int32, (ci, cap, 1), 1)
            )

        if rowloop:
            out_ref[...] = jnp.zeros((A, cap, BLK), jnp.float32)

            # both particle axes in sublane-sized occupancy-gated tiles
            # (see _call_tiled3d for the full rationale): i-rows run
            # ceil(occmax/TI) tiles, and per offset the j axis runs
            # ceil(occ3/TI) tiles, where occ3 bounds the occupancy of any
            # cell this block's windows can read
            occmax = occmax_ref[0, b]
            occ3 = occmax_ref[1, b]
            TI = min(8, cap)
            # elastic configs: the Jaumann dS block (~24% of the fsi pass A
            # op budget, measured round 3) moves out of the main loop into
            # the gated second pass below, entered only for blocks holding
            # an i with nonzero elastic response — exact, see _pass_a_dS.
            # The artificial-stress and deviatoric forces (~25% more) move
            # into a third pass gated on the window-folded flag (they read
            # elastic content from j lanes too) — exact, see
            # _pass_a_elastic_f_offset.
            al_main = [e for e in al if not (gate_ds and e[0] == "dS")]

            def stage_I(r0):
                ibuf = mid_ref[:, pl.dslice(r0, TI), :]
                ctr = unpack(ibuf, 0, BLK)
                Ifields = dict(ctr)
                Ifields["valid"] = ctr["valid"] != 0.0
                Ifields["solid"] = ctr["solid"] != 0.0
                Ifields["fluid"] = ~Ifields["solid"]
                return {k: _bc(v, "i") for k, v in Ifields.items()}

            def stage_jwin(j0):
                # dynamic indices are only legal on ref loads (Mosaic has
                # no dynamic_slice on values): stage the j-tile's 3-block
                # window from the refs at a sublane-aligned offset, then
                # slice lanes statically per stencil offset
                return jnp.concatenate(
                    [
                        left_ref[:, pl.dslice(j0, TI), :],
                        mid_ref[:, pl.dslice(j0, TI), :],
                        right_ref[:, pl.dslice(j0, TI), :],
                    ],
                    axis=-1,
                )

            def jfields(jwin, off):
                off_flat = off[0] * sgx + off[1] * sgy + off[2] * sgz
                lo = H + off_flat
                Jf = unpack(jwin, lo, lo + BLK)
                inb = jnp.ones((1, BLK), bool)
                for o, c, n in ((off[1], cy, ngy), (off[2], cz, ngz)):
                    if o != 0:
                        inb = inb & (c + o >= 0) & (c + o < n)
                Jf["valid"] = (Jf["valid"] != 0.0) & inb
                Jf["solid"] = Jf["solid"] != 0.0
                return {k: _bc(v, "j") for k, v in Jf.items()}

            def notself_for(off, r0, j0):
                if off != (0, 0, 0):
                    return True
                return (
                    r0 + jax.lax.broadcasted_iota(jnp.int32, (TI, TI, 1), 0)
                ) != (
                    j0 + jax.lax.broadcasted_iota(jnp.int32, (TI, TI, 1), 1)
                )

            def acc_for_itile(r0):
                I = stage_I(r0)
                acc = {}
                for name, nrows in al_main:
                    if name in _SCALAR_ACCS:
                        shape = (TI, BLK)
                    elif name == "dS":
                        shape = (3, 3, TI, BLK)
                    else:
                        shape = (nrows, TI, BLK)
                    acc[name] = jnp.zeros(shape, jnp.float32)

                def jbody(jt, acc):
                    j0 = pl.multiple_of(jt * TI, TI)
                    jwin = stage_jwin(j0)
                    for off in offsets:
                        J = jfields(jwin, off)
                        ti, tj = I["ptype"], J["ptype"]
                        coeffs = coeff_for(ti, tj)
                        if params.n_sdpd > 0:
                            coeffs["kap"] = _select_table_rows(
                                ti, tj, kap_ref, T, params.n_sdpd
                            )
                        acc = _pass_a_offset(
                            I, J, coeffs, params, cfg, dt_k, step_k,
                            notself_for(off, r0, j0), acc, seed=seed_k,
                            pbc=pbc, defer_elastic_forces=gate_fel,
                        )
                    return acc

                return jax.lax.fori_loop(
                    0, (occ3 + TI - 1) // TI, jbody, acc
                )

            def body(t, carry):
                r0 = pl.multiple_of(t * TI, TI)
                write_rows(acc_for_itile(r0), r0, TI, al_main)
                return carry

            jax.lax.fori_loop(0, (occmax + TI - 1) // TI, body, 0)

            if gate_ds:
                rd0, rd1 = arow["dS"]

                @pl.when(occmax_ref[2, b] != 0)
                def _():
                    def body_ds(t, carry):
                        r0 = pl.multiple_of(t * TI, TI)
                        I = stage_I(r0)

                        def jbody_ds(jt, accd):
                            j0 = pl.multiple_of(jt * TI, TI)
                            jwin = stage_jwin(j0)
                            for off in offsets:
                                J = jfields(jwin, off)
                                coeffs = coeff_for(I["ptype"], J["ptype"])
                                accd = accd + _pass_a_dS_offset(
                                    I, J, coeffs, cfg,
                                    notself_for(off, r0, j0), pbc=pbc,
                                )
                            return accd

                        accd = jax.lax.fori_loop(
                            0, (occ3 + TI - 1) // TI, jbody_ds,
                            jnp.zeros((3, 3, TI, BLK), jnp.float32),
                        )
                        out_ref[rd0:rd1, pl.dslice(r0, TI), :] = (
                            accd.reshape(9, TI, BLK)
                        )
                        return carry

                    jax.lax.fori_loop(0, (occmax + TI - 1) // TI, body_ds, 0)

                if not gate_fel:
                    return
                # deferred elastic forces (f_art + selected f_dev), dropped
                # from the main loop by defer_elastic_forces: exactly zero
                # unless an elastic lane is in this block's stencil window
                # (scalar row 3), so non-window blocks skip ~25% of the
                # main-loop op budget for free
                rf0, rf1 = arow["f"]

                @pl.when(occmax_ref[3, b] != 0)
                def _():
                    def body_f(t, carry):
                        r0 = pl.multiple_of(t * TI, TI)
                        I = stage_I(r0)

                        def jbody_f(jt, accf):
                            j0 = pl.multiple_of(jt * TI, TI)
                            jwin = stage_jwin(j0)
                            for off in offsets:
                                J = jfields(jwin, off)
                                coeffs = coeff_for(I["ptype"], J["ptype"])
                                accf = accf + _pass_a_elastic_f_offset(
                                    I, J, coeffs, cfg,
                                    notself_for(off, r0, j0), pbc=pbc,
                                )
                            return accf

                        accf = jax.lax.fori_loop(
                            0, (occ3 + TI - 1) // TI, jbody_f,
                            jnp.zeros((3, TI, BLK), jnp.float32),
                        )
                        out_ref[rf0:rf1, pl.dslice(r0, TI), :] = (
                            out_ref[rf0:rf1, pl.dslice(r0, TI), :] + accf
                        )
                        return carry

                    jax.lax.fori_loop(0, (occmax + TI - 1) // TI, body_f, 0)
            return

        acc0 = acc_for_ibuf(
            mid_ref[:, 0:split, :], static_not_diag(0, split)
        )
        write_rows(acc0, 0, split)
        for s0, s1 in gated_groups:
            out_ref[:, s0:s1, :] = jnp.zeros((A, s1 - s0, BLK), jnp.float32)

            if need_occmax:
                @pl.when(occmax_ref[0, b] > s0)
                def _(s0=s0, s1=s1):
                    acc = acc_for_ibuf(
                        mid_ref[:, s0:s1, :], static_not_diag(s0, s1 - s0)
                    )
                    write_rows(acc, s0, s1 - s0)
            else:
                acc = acc_for_ibuf(
                    mid_ref[:, s0:s1, :], static_not_diag(s0, s1 - s0)
                )
                write_rows(acc, s0, s1 - s0)

    # left/right halo refs stage only H lanes; their index maps count in
    # H-sized blocks (PFp's left pad is BLK, so mid block b starts at lane
    # (b+1)*BLK = ((b+1)*R) H-blocks)
    R = BLK // H
    in_specs = [
        pl.BlockSpec(
            (len(tab_names), T, T), lambda b, *_: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (T * T, kap.shape[1]), lambda b, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (F, cap, H), lambda b, *_: (0, 0, (b + 1) * R - 1),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (F, cap, BLK), lambda b, *_: (0, 0, b + 1),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (F, cap, H), lambda b, *_: (0, 0, (b + 1) * R + R),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_spec = pl.BlockSpec(
        (A, cap, BLK), lambda b, *_: (0, 0, b), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((A, cap, NC_pad), jnp.float32)
    kwargs = dict(
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    if need_occmax:
        # per-block max occupancy (slots are rank-compacted at rebin), plus
        # the 1D-neighborhood max used by the rowloop's j gating
        occp = jnp.pad(occ, (0, NC_pad - NC_lanes))
        occmax = jnp.max(occp.reshape(grid, BLK), axis=1)
        if occ_edge == "wrap":
            occ3 = jnp.maximum(
                occmax,
                jnp.maximum(jnp.roll(occmax, 1), jnp.roll(occmax, -1)),
            )
            # Block 0's left halo holds the last max_off REAL lanes
            # (assemble_padded wrap places M[NC-BLK:] there); when
            # NC_lanes % BLK < max_off those source lanes straddle past
            # block grid-1 into grid-2, which the block-roll alone never
            # folds into occ3[0] — bound it from the actual source lanes
            # so the j-tile loop cannot under-run the wrap seam.
            mo = min(halo_mod.max_flat_offset(geom), NC_lanes)
            occ3 = occ3.at[0].max(jnp.max(occ[NC_lanes - mo:]))
        else:
            z = jnp.zeros((1,), occmax.dtype)
            occ3 = jnp.maximum(
                occmax,
                jnp.maximum(
                    jnp.concatenate([z, occmax[:-1]]),
                    jnp.concatenate([occmax[1:], z]),
                ),
            )
            if occ_edge == "cap":
                # a sharded neighbor's halo slab: occupancy unknown here
                occ3 = occ3.at[0].set(cap).at[-1].set(cap)
        rows = [occmax, occ3]
        if gate_ds:
            # row 2 — per-block elastic-i presence (the dS pass gate):
            # i-tiles come from this block's own (mid) lanes only, so no
            # neighbor folding is needed
            efp = jnp.pad(eflag, (0, NC_pad - NC_lanes))
            eb = jnp.max(efp.reshape(grid, BLK), axis=1)
            rows.append(eb)
            # row 3 — window-folded elastic presence (the deferred
            # elastic-force pass gate): f_art/f_dev read j lanes from the
            # 3-block window, so fold neighbors with the same edge
            # semantics as occ3 above
            if occ_edge == "wrap":
                ew = jnp.maximum(
                    eb, jnp.maximum(jnp.roll(eb, 1), jnp.roll(eb, -1))
                )
                mo = min(halo_mod.max_flat_offset(geom), NC_lanes)
                ew = ew.at[0].max(jnp.max(eflag[NC_lanes - mo:]))
            else:
                z = jnp.zeros((1,), eb.dtype)
                ew = jnp.maximum(
                    eb,
                    jnp.maximum(
                        jnp.concatenate([z, eb[:-1]]),
                        jnp.concatenate([eb[1:], z]),
                    ),
                )
                if occ_edge == "cap":
                    # a sharded neighbor's halo slab: elastic content
                    # unknown here — assume present
                    ew = ew.at[0].set(1).at[-1].set(1)
            rows.append(ew)
        occ2 = jnp.stack(rows, axis=0)
    scalars = ([meta] if meta is not None else []) + (
        [occ2] if need_occmax else []
    )
    if scalars:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=len(scalars),
                grid=(grid,),
                in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=out_shape,
            **kwargs,
        )(*scalars, tables, kap, PFp, PFp, PFp)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        **kwargs,
    )(tables, kap, PFp, PFp, PFp)


def _call_preshift(
    PFp: jax.Array,
    occ: jax.Array | None,
    params: Params,
    geom: Geometry,
    cfg,
    NC_lanes: int,
    BLK: int,
    interpret: bool,
    meta: jax.Array | None = None,
) -> jax.Array:
    """The grouped 2D kernel over PRE-SHIFTED field views (round-5
    structural counter-experiment on the pass-A skeleton).

    ``_call_padded`` stages a [H | BLK | H] VMEM window and slices it at a
    lane-misaligned offset per stencil offset — 9 vector-unit rotations per
    block, measured as the bulk of the 64% skeleton share (VALIDATION
    round-4 decomposition).  Here XLA materializes the 9 shifted views of
    PFp in HBM once per call (one fused multi-output copy), and the kernel
    reads each offset as its own lane-ALIGNED block ref: zero in-kernel
    rotation, zero window concat.  The misaligned copy work moves to XLA's
    bulk copy emitter and the extra HBM reads ride the BlockSpec pipeline's
    overlap.  Physics, masks, occupancy gating, and output layout are
    identical to ``_call_padded``'s grouped branch; only J staging differs.

    ``PFp``: same pre-assembled padded buffer ([F, cap, NC_pad + 2*BLK],
    halo/wrap content in place), so wrap/shard boundary semantics are
    inherited unchanged.  Returns [A, cap, NC_pad].
    """
    cap = PFp.shape[1]
    T = params.ntypes
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    sgx, sgy, sgz = halo_mod.ghosted_strides(geom)
    offsets = geom.stencil_offsets()
    NC_pad = _round_up(NC_lanes, BLK)
    grid = NC_pad // BLK
    assert PFp.shape[-1] == NC_pad + 2 * BLK, (PFp.shape, NC_pad, BLK)

    fl = _field_layout(params, cfg)
    al = _acc_layout(params, cfg)
    frow = _row_ranges(fl)
    arow = _row_ranges(al)
    F = sum(n for _, n in fl)
    A = sum(n for _, n in al)

    pbc = tuple(
        (ax, geom.hi[ax] - geom.lo[ax])
        for ax in range(3)
        if geom.periodic[ax] and geom.ncells[ax] > 1
    )

    from sph_bvf_tpu.ops.pair import (
        _bc, _pass_a_offset, coeff_tables, used_table_names,
    )

    tab_dict = coeff_tables(params, cfg)
    used = used_table_names(params, cfg, ssa=False)
    tab_names = [k for k in sorted(tab_dict) if k in used]
    tables = jnp.stack(
        [tab_dict[k] for k in tab_names], axis=0
    ).astype(jnp.float32)
    kap = (
        params.kappa.reshape(T * T, params.n_sdpd).astype(jnp.float32)
        if params.n_sdpd > 0
        else jnp.zeros((T * T, 1), jnp.float32)
    )

    # the shifted views: PF9[o][..., l] == PFp[..., BLK + l + off_flat[o]].
    # One fused XLA copy (9 static slices of the same array); |off_flat| <=
    # max_flat_offset < BLK keeps every slice in range of the BLK-wide pads.
    off_flats = [
        off[0] * sgx + off[1] * sgy + off[2] * sgz for off in offsets
    ]
    views = [
        jax.lax.slice_in_dim(PFp, BLK + off, BLK + off + NC_pad, axis=-1)
        for off in off_flats
    ]
    center = offsets.index((0, 0, 0))

    def unpack(buf):
        out = {}
        for name, nrows in fl:
            r0, r1 = frow[name]
            a = buf[r0:r1]
            if name in ("AS", "S"):
                out[name] = a.reshape((3, 3) + a.shape[1:])
            elif nrows == 1:
                out[name] = a[0]
            else:
                out[name] = a
        return out

    split = geom.base_occ if 0 < geom.base_occ < cap else cap
    n_gated = cap - split
    gsize = -(-n_gated // 4) if n_gated else 1
    gated_groups = [
        (s, min(s + gsize, cap)) for s in range(split, cap, gsize)
    ]
    need_occmax = bool(gated_groups) and occ is not None

    def kernel(*refs):
        i = 0
        meta_ref = None
        if meta is not None:
            meta_ref = refs[i]
            i += 1
        if need_occmax:
            occmax_ref = refs[i]
            i += 1
        tab_ref, kap_ref = refs[i], refs[i + 1]
        pf_refs = refs[i + 2 : i + 2 + len(offsets)]
        out_ref = refs[i + 2 + len(offsets)]
        dt_k, step_k, seed_k = _unpack_meta(meta_ref)
        coeff_for = _coeff_builder(tab_names, cfg, tab_ref, T)
        b = pl.program_id(0)

        g = b * BLK + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        cz = g % ngz
        cy = (g // sgy) % ngy

        def acc_for_ibuf(ibuf, not_diag):
            ci = ibuf.shape[1]
            ctr = unpack(ibuf)
            Ifields = dict(ctr)
            Ifields["valid"] = ctr["valid"] != 0.0
            Ifields["solid"] = ctr["solid"] != 0.0
            Ifields["fluid"] = ~Ifields["solid"]
            I = {k: _bc(v, "i") for k, v in Ifields.items()}
            acc = {}
            for name, nrows in al:
                if name in _SCALAR_ACCS:
                    shape = (ci, BLK)
                elif name == "dS":
                    shape = (3, 3, ci, BLK)
                else:
                    shape = (nrows, ci, BLK)
                acc[name] = jnp.zeros(shape, jnp.float32)

            for oi, off in enumerate(offsets):
                # the aligned ref load IS the shifted window — no rotation
                Jf = unpack(pf_refs[oi][:])
                inb = jnp.ones((1, BLK), bool)
                for o, c, n in ((off[1], cy, ngy), (off[2], cz, ngz)):
                    if o != 0:
                        inb = inb & (c + o >= 0) & (c + o < n)
                Jf["valid"] = (Jf["valid"] != 0.0) & inb
                Jf["solid"] = Jf["solid"] != 0.0
                J = {k: _bc(v, "j") for k, v in Jf.items()}

                ti, tj = I["ptype"], J["ptype"]
                coeffs = coeff_for(ti, tj)
                if params.n_sdpd > 0:
                    coeffs["kap"] = _select_table_rows(
                        ti, tj, kap_ref, T, params.n_sdpd
                    )

                notself = not_diag if off == (0, 0, 0) else True
                acc = _pass_a_offset(
                    I, J, coeffs, params, cfg, dt_k, step_k, notself, acc,
                    seed=seed_k, pbc=pbc,
                )
            return acc

        def write_rows(acc, s0, ci):
            for name, nrows in al:
                r0, r1 = arow[name]
                out_ref[r0:r1, pl.dslice(s0, ci), :] = acc[name].reshape(
                    nrows, ci, BLK
                )

        def static_not_diag(s0, ci):
            return ~(
                (s0 + jax.lax.broadcasted_iota(jnp.int32, (ci, cap, 1), 0))
                == jax.lax.broadcasted_iota(jnp.int32, (ci, cap, 1), 1)
            )

        acc0 = acc_for_ibuf(
            pf_refs[center][:, 0:split, :], static_not_diag(0, split)
        )
        write_rows(acc0, 0, split)
        for s0, s1 in gated_groups:
            out_ref[:, s0:s1, :] = jnp.zeros((A, s1 - s0, BLK), jnp.float32)

            if need_occmax:
                @pl.when(occmax_ref[0, b] > s0)
                def _(s0=s0, s1=s1):
                    acc = acc_for_ibuf(
                        pf_refs[center][:, s0:s1, :],
                        static_not_diag(s0, s1 - s0),
                    )
                    write_rows(acc, s0, s1 - s0)
            else:
                acc = acc_for_ibuf(
                    pf_refs[center][:, s0:s1, :],
                    static_not_diag(s0, s1 - s0),
                )
                write_rows(acc, s0, s1 - s0)

    in_specs = [
        pl.BlockSpec(
            (len(tab_names), T, T), lambda b, *_: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (T * T, kap.shape[1]), lambda b, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ] + [
        pl.BlockSpec(
            (F, cap, BLK), lambda b, *_: (0, 0, b), memory_space=pltpu.VMEM
        )
        for _ in offsets
    ]
    out_spec = pl.BlockSpec(
        (A, cap, BLK), lambda b, *_: (0, 0, b), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((A, cap, NC_pad), jnp.float32)
    kwargs = dict(
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    if need_occmax:
        occp = jnp.pad(occ, (0, NC_pad - NC_lanes))
        occmax = jnp.max(occp.reshape(grid, BLK), axis=1)[None]
        scalars = ([meta] if meta is not None else []) + [occmax]
    else:
        scalars = [meta] if meta is not None else []
    if scalars:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=len(scalars),
                grid=(grid,),
                in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=out_shape,
            **kwargs,
        )(*scalars, tables, kap, *views)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        **kwargs,
    )(tables, kap, *views)


def _tile_block(geom) -> int:
    """yz lane-block for the tiled 3D kernel: must cover one y-step
    (+-ngz lanes) inside the 3-block window."""
    ngz = halo_mod.ghosted_ncells(geom)[2]
    return max(256, _round_up(ngz + 2, 128))


def _call_tiled3d(
    PF4p: jax.Array,
    occ: jax.Array,
    params: Params,
    geom: Geometry,
    cfg,
    n_planes: int,
    BLK: int,
    interpret: bool,
    meta: jax.Array | None = None,
) -> jax.Array:
    """The 3D pass-A kernel on a 2D (x-plane, yz-block) grid.

    The flat-lane halo (``_call_padded``) needs BLK >= the x-stride, which
    in 3D grows as ~n^2 and overflows VMEM past ~19^3 cells.  Here the flat
    cell axis is split into x-planes: the x stencil direction becomes a 3x3
    set of BLOCK REFS over [..., ngx + 2, NYZ_pad + 2*BLK] (one halo plane
    each side), and y/z remain lane offsets (+-ngz, +-1) inside the
    3-consecutive-yz-block window.  Per-block VMEM is constant in the grid
    size.  ``PF4p`` comes from core/halo.assemble_tiled transposed to
    [F, n_planes + 2, capk, NYZ_pad + 2*BLK] (the plane axis must sit
    outside the last two dims: Mosaic requires those to be (8,128)-aligned
    or full; capk is cap padded to a sublane multiple so both particle-axis
    fori loops run whole aligned tiles with no tail path); ``occ`` is
    [2, n_planes * n_yb] i32: row 0 the block's own max occupancy (the
    i-row bound), row 1 the 3x3-neighborhood max (the j-row bound).
    Returns [A, n_planes, capk, NYZ_pad].
    """
    cap = geom.cap
    T = params.ntypes
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    offsets = geom.stencil_offsets()
    NYZ_pad = PF4p.shape[-1] - 2 * BLK
    n_yb = NYZ_pad // BLK

    fl = _field_layout(params, cfg)
    al = _acc_layout(params, cfg)
    frow = _row_ranges(fl)
    arow = _row_ranges(al)
    F = sum(n for _, n in fl)
    A = sum(n for _, n in al)

    pbc = tuple(
        (ax, geom.hi[ax] - geom.lo[ax])
        for ax in range(3)
        if geom.periodic[ax] and geom.ncells[ax] > 1
    )

    from sph_bvf_tpu.ops.pair import (
        _bc, _pass_a_offset, coeff_tables, used_table_names,
    )

    tab_dict = coeff_tables(params, cfg)
    used = used_table_names(params, cfg, ssa=False)
    tab_names = [k for k in sorted(tab_dict) if k in used]
    tables = jnp.stack(
        [tab_dict[k] for k in tab_names], axis=0
    ).astype(jnp.float32)
    kap = (
        params.kappa.reshape(T * T, params.n_sdpd).astype(jnp.float32)
        if params.n_sdpd > 0
        else jnp.zeros((T * T, 1), jnp.float32)
    )

    def unpack(buf, lo, hi):
        out = {}
        for name, nrows in fl:
            r0, r1 = frow[name]
            a = buf[r0:r1, :, lo:hi]
            if name in ("AS", "S"):
                out[name] = a.reshape((3, 3) + a.shape[1:])
            elif nrows == 1:
                out[name] = a[0]
            else:
                out[name] = a
        return out

    capk = PF4p.shape[2]  # cap padded to a sublane multiple by the caller
    TI = min(8, capk)

    def kernel(*refs):
        if meta is not None:
            meta_ref, refs = refs[0], refs[1:]
        else:
            meta_ref = None
        occ2_ref, tab_ref, kap_ref = refs[0], refs[1], refs[2]
        pf_refs = refs[3:12]  # [dx*3 + dy] for dx, dy in {0,1,2}^2
        out_ref = refs[12]
        dt_k, step_k, seed_k = _unpack_meta(meta_ref)
        coeff_for = _coeff_builder(tab_names, cfg, tab_ref, T)
        bx = pl.program_id(0)
        by = pl.program_id(1)
        # occ2[0] = this block's max occupancy (i-row bound); occ2[1] = max
        # over the 3x3 neighborhood (j-row bound — any cell a stencil
        # window can read)
        occmax = occ2_ref[0, bx * n_yb + by]
        occ9 = occ2_ref[1, bx * n_yb + by]

        l = by * BLK + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        cz = l % ngz
        cy = l // ngz  # within-plane y coordinate (>= ngy on pad lanes)

        def acc_for_ibuf(ibuf, r0):
            """Accumulators for i-rows [r0, r0+TI), j-tiled by occupancy.

            Both particle axes are occupancy-gated: the i loop (caller)
            runs ceil(occmax/TI) tiles, and the j axis here runs
            ceil(occ9/TI) tiles of TI rows per stencil offset — work scales
            with actual occupancy on both sides instead of cap^2.
            ``ibuf`` is a fresh ref load (zero-offset layout, see
            _call_padded).
            """
            ctr = unpack(ibuf, 0, BLK)
            Ifields = dict(ctr)
            Ifields["valid"] = ctr["valid"] != 0.0
            Ifields["solid"] = ctr["solid"] != 0.0
            Ifields["fluid"] = ~Ifields["solid"]
            I = {k: _bc(v, "i") for k, v in Ifields.items()}
            acc = {}
            for name, nrows in al:
                if name in _SCALAR_ACCS:
                    shape = (TI, BLK)
                elif name == "dS":
                    shape = (3, 3, TI, BLK)
                else:
                    shape = (nrows, TI, BLK)
                acc[name] = jnp.zeros(shape, jnp.float32)

            def jbody(jt, acc):
                # dynamic indices only on ref loads (no dynamic_slice on
                # values in Mosaic): stage this j-tile's 3-yz-block window
                # per x-plane at a sublane-aligned offset, then slice lanes
                # statically per stencil offset
                j0 = pl.multiple_of(jt * TI, TI)
                jwins = [
                    jnp.concatenate(
                        [
                            pf_refs[dx * 3 + dy][:, 0, pl.dslice(j0, TI), :]
                            for dy in range(3)
                        ],
                        axis=-1,
                    )
                    for dx in range(3)
                ]
                for off in offsets:
                    lo = BLK + off[1] * ngz + off[2]
                    Jf = unpack(jwins[off[0] + 1], lo, lo + BLK)
                    # y/z masks: a +-1 step from a row/column edge lands on
                    # the adjacent column's far lane — mask it (ghost
                    # columns keep periodic wraps in-bounds with correct
                    # content).  The x direction selects a whole plane ref;
                    # its boundary condition is the halo plane's content.
                    inb = jnp.ones((1, BLK), bool)
                    if off[1] != 0:
                        inb = inb & (cy + off[1] >= 0) & (cy + off[1] < ngy)
                    if off[2] != 0:
                        inb = inb & (cz + off[2] >= 0) & (cz + off[2] < ngz)
                    Jf["valid"] = (Jf["valid"] != 0.0) & inb
                    Jf["solid"] = Jf["solid"] != 0.0
                    J = {k: _bc(v, "j") for k, v in Jf.items()}

                    ti, tj = I["ptype"], J["ptype"]
                    coeffs = coeff_for(ti, tj)
                    if params.n_sdpd > 0:
                        coeffs["kap"] = _select_table_rows(
                            ti, tj, kap_ref, T, params.n_sdpd
                        )
                    if off == (0, 0, 0):
                        notself = (
                            r0 + jax.lax.broadcasted_iota(
                                jnp.int32, (TI, TI, 1), 0)
                        ) != (
                            j0 + jax.lax.broadcasted_iota(
                                jnp.int32, (TI, TI, 1), 1)
                        )
                    else:
                        notself = True
                    acc = _pass_a_offset(
                        I, J, coeffs, params, cfg, dt_k, step_k, notself,
                        acc, seed=seed_k, pbc=pbc,
                    )
                return acc

            jtrips = (occ9 + TI - 1) // TI
            return jax.lax.fori_loop(0, jtrips, jbody, acc)

        def write_rows(acc, s0):
            for name, nrows in al:
                r0, r1 = arow[name]
                out_ref[r0:r1, 0, pl.dslice(s0, TI), :] = acc[name].reshape(
                    nrows, TI, BLK
                )

        out_ref[...] = jnp.zeros((A, 1, capk, BLK), jnp.float32)

        def body(t, carry):
            r0 = pl.multiple_of(t * TI, TI)
            acc = acc_for_ibuf(pf_refs[4][:, 0, pl.dslice(r0, TI), :], r0)
            write_rows(acc, r0)
            return carry

        jax.lax.fori_loop(0, (occmax + TI - 1) // TI, body, 0)

    pf_specs = [
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
    in_specs = [
        pl.BlockSpec(
            (len(tab_names), T, T), lambda bx, by, *_: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (T * T, kap.shape[1]), lambda bx, by, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ] + pf_specs
    out_spec = pl.BlockSpec(
        (A, 1, capk, BLK), lambda bx, by, *_: (0, bx, 0, by),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (A, n_planes, capk, NYZ_pad), jnp.float32
    )
    scalars = ([meta] if meta is not None else []) + [occ]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(n_planes, n_yb),
            in_specs=in_specs,
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*scalars, tables, kap, *([PF4p] * 9))


def _pass_a_tiled3d(
    pf: Dict[str, jax.Array],
    params: Params,
    geom: Geometry,
    cfg,
    block: int = 0,
    interpret: bool = False,
    meta: jax.Array | None = None,
) -> Dict[str, jax.Array]:
    """Single-device driver for the tiled 3D kernel."""
    NC, cap = geom.ncells_total, geom.cap
    BLK = block if block >= _tile_block(geom) else _tile_block(geom)
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    NYZ = ngy * ngz
    NYZ_pad = _round_up(NYZ, BLK)
    n_yb = NYZ_pad // BLK
    capk = _round_up(cap, 8)

    PF = _pack(pf, _field_layout(params, cfg), cap, NC)
    # pad the slot axis to a sublane multiple: the padded rows are invalid
    # (zero valid) and never run — both fori loops are occupancy-gated
    PF = jnp.pad(PF, ((0, 0), (0, capk - cap), (0, 0)))
    PFg = halo_mod.add_ghosts(PF, geom)
    PF4p = halo_mod.assemble_tiled(
        PFg, geom, BLK, NYZ_pad, halo_mod.wrap_x(geom)
    )
    # plane axis out of the last two dims (Mosaic block alignment)
    PF4p = jnp.transpose(PF4p, (0, 2, 1, 3))
    occ = _occ_from_packed(PFg).reshape(ngx, NYZ)
    occ = jnp.pad(occ, ((0, 0), (0, NYZ_pad - NYZ)))
    occmax = jnp.max(occ.reshape(ngx, n_yb, BLK), axis=2)  # [ngx, n_yb]
    occ9 = _neighborhood_max(occmax, halo_mod.wrap_x(geom))
    occ2 = jnp.stack([occmax.reshape(-1), occ9.reshape(-1)], axis=0)

    out = _call_tiled3d(
        PF4p, occ2, params, geom, cfg, ngx, BLK, interpret, meta=meta
    )
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :cap]  # [A, cap, planes, lanes]
    out = out[..., :NYZ].reshape(out.shape[0], cap, ngx * NYZ)
    out = halo_mod.trim_ghosts(out, geom)
    return _unpack_accs(out, params, cfg, cap, NC)


def _neighborhood_max(occmax: jax.Array, wrap: bool) -> jax.Array:
    """[n_planes, n_yb] -> elementwise max over the 3x3 block neighborhood.

    Bounds the occupancy of any cell a block's stencil windows can read:
    x neighbors are adjacent planes (wrapped when x is periodic, else
    zero), yz neighbors are adjacent lane blocks (lane padding is zeros).
    """

    def shift(a, d, axis, wrap_axis):
        if wrap_axis:
            return jnp.roll(a, d, axis=axis)
        z = jnp.zeros_like(a)
        sl = [slice(None)] * a.ndim
        dst = [slice(None)] * a.ndim
        if d > 0:
            sl[axis] = slice(0, -d)
            dst[axis] = slice(d, None)
        else:
            sl[axis] = slice(-d, None)
            dst[axis] = slice(0, d)
        return z.at[tuple(dst)].set(a[tuple(sl)])

    out = occmax
    for dx in (-1, 1):
        out = jnp.maximum(out, shift(occmax, dx, 0, wrap))
    m = out
    for dy in (-1, 1):
        out = jnp.maximum(out, shift(m, dy, 1, False))
    return out


def _pass_a_tiled3d_sharded(
    pf: Dict[str, jax.Array],
    params: Params,
    geom: Geometry,
    cfg,
    mesh,
    axis: str = "x",
    interpret: bool = False,
    meta: jax.Array | None = None,
) -> Dict[str, jax.Array]:
    """Sharded driver for the tiled 3D kernel: x-plane slabs per device.

    Each device holds nx/n x-planes and exchanges ONE plane per side with
    its mesh neighbors via lax.ppermute (a plane is NYZ contiguous lanes,
    so halo.exchange_slabs applies unchanged with width=NYZ) — the 3D
    brick ghost exchange with the y/z directions local by construction.
    The j occupancy bound for the first/last plane's blocks assumes a full
    neighbor slab (occupancy unknown locally), like the 2D occ_edge="cap".
    """
    NC, cap = geom.ncells_total, geom.cap
    n_shards = mesh.shape[axis]
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    if ngx % n_shards:
        raise ValueError(
            f"nx={ngx} does not split into plane slabs over {n_shards} shards"
        )
    nx_loc = ngx // n_shards
    if nx_loc < 2:
        raise ValueError("need at least 2 x-planes per shard")
    BLK = _tile_block(geom)
    NYZ = ngy * ngz
    NYZ_pad = _round_up(NYZ, BLK)
    n_yb = NYZ_pad // BLK
    capk = _round_up(cap, 8)
    wrap = halo_mod.wrap_x(geom)

    PF = _pack(pf, _field_layout(params, cfg), cap, NC)
    PF = jnp.pad(PF, ((0, 0), (0, capk - cap), (0, 0)))
    PFg = halo_mod.add_ghosts(PF, geom)

    def local(PFl, *margs):
        hl, hr = halo_mod.exchange_slabs(PFl, NYZ, axis, n_shards, wrap)
        lead = PFl.shape[:-1]
        PF4p = halo_mod.assemble_tiled(
            PFl, geom, BLK, NYZ_pad, wrap=False,
            plane_left=hl.reshape(lead + (1, NYZ)),
            plane_right=hr.reshape(lead + (1, NYZ)),
            n_planes=nx_loc,
        )
        PF4p = jnp.transpose(PF4p, (0, 2, 1, 3))
        occ = _occ_from_packed(PFl).reshape(nx_loc, NYZ)
        occ = jnp.pad(occ, ((0, 0), (0, NYZ_pad - NYZ)))
        occmax = jnp.max(occ.reshape(nx_loc, n_yb, BLK), axis=2)
        occ9 = _neighborhood_max(occmax, False)
        # neighbor-shard planes: occupancy unknown locally — assume full
        occ9 = occ9.at[0].set(cap).at[-1].set(cap)
        occ2 = jnp.stack([occmax.reshape(-1), occ9.reshape(-1)], axis=0)
        out = _call_tiled3d(
            PF4p, occ2, params, geom, cfg, nx_loc, BLK, interpret,
            meta=margs[0] if margs else None,
        )
        out = jnp.transpose(out, (0, 2, 1, 3))[:, :cap]
        return out[..., :NYZ].reshape(out.shape[0], cap, nx_loc * NYZ)

    # the thermal meta scalars (dt/step/seed) are trace-time values, not
    # shard-varying — replicate them to every device
    margs = () if meta is None else (meta,)
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis),) + (P(None),) * len(margs),
        out_specs=P(None, None, axis),
        check_vma=False,
    )(PFg, *margs)
    out = halo_mod.trim_ghosts(out, geom)
    return _unpack_accs(out, params, cfg, cap, NC)


def _unpack_accs(out: jax.Array, params: Params, cfg, cap: int, NC: int):
    al = _acc_layout(params, cfg)
    arow = _row_ranges(al)
    result = {}
    for name, nrows in al:
        r0, r1 = arow[name]
        a = out[r0:r1]
        if name == "dS":
            a = a.reshape(3, 3, cap, NC)
        elif name in _SCALAR_ACCS:
            a = a[0]
        result[name] = a
    return result


def _elastic_lanes(PFg: jax.Array, params: Params, cfg, fl) -> jax.Array:
    """[NC] i32: lanes whose cells hold a valid solid with nonzero elastic
    response (G0 > 0, S != 0, or AS != 0).  For every other i the Jaumann
    dS term is EXACTLY zero (see _pass_a_dS), so the rowloop kernel skips
    the dS pass on blocks where this is all-zero; and for every PAIR whose
    window holds no such lane, the artificial-stress and deviatoric forces
    are exactly zero too (AS != 0 needs solid & tensile total stress —
    included here for the non-abs_p variants where that can happen with
    S == 0 — and f_dev needs S on one side), so the window-folded flag
    gates the deferred elastic-force pass (`_pass_a_elastic_f_offset`)."""
    fr = _row_ranges(fl)

    def row(name):
        r0, r1 = fr[name]
        return PFg[r0:r1]

    valid = row("valid")[0] != 0
    solid = row("solid")[0] != 0
    if cfg.g0_chem_coupling:
        g0 = row("G0")[0] > 0
    else:
        g0 = params.G0[row("ptype")[0].astype(jnp.int32)] > 0
    s_nz = jnp.any(row("S") != 0, axis=0)
    if "AS" in fr:  # staged only when solids_present (f_art exists at all)
        s_nz = s_nz | jnp.any(row("AS") != 0, axis=0)
    lane = jnp.any(valid & solid & (g0 | s_nz), axis=0)
    return lane.astype(jnp.int32)


def _occ_from_packed(PFg: jax.Array) -> jax.Array:
    """Occupancy per lane from the (ghosted) packed matrix's valid row."""
    return jnp.sum((PFg[0] != 0.0).astype(jnp.int32), axis=0)


def pass_a_pallas(
    pf: Dict[str, jax.Array],
    params: Params,
    geom: Geometry,
    cfg,
    block: int = 0,
    interpret: bool = False,
    rowloop: bool | None = None,
    dt=0.0,
    step=0,
    seed=0,
) -> Dict[str, jax.Array]:
    """Run pass A as one Pallas kernel; returns the accumulator dict.

    Default block: shape-aware, see ``_kernel_block`` (768 on big 2D
    grids, 256/128 on small grouped/rowloop grids; 128 in 3D, where
    per-op vreg counts are ~8x larger and bigger blocks push Mosaic's
    fully-unrolled lowering past a 30-minute compile).
    """
    meta = _thermal_meta(dt, step, seed) if cfg.thermal else None
    if geom.dim >= 3:
        return _pass_a_tiled3d(
            pf, params, geom, cfg, block=0, interpret=interpret, meta=meta
        )
    if rowloop is None:
        rowloop = _default_rowloop(geom)
    NC, cap = geom.ncells_total, geom.cap
    BLK = _kernel_block(geom, block, rowloop)
    max_off = halo_mod.max_flat_offset(geom)

    fl = _field_layout(params, cfg)
    PF = _pack(pf, fl, cap, NC)
    if rowloop:
        # sublane-multiple slot rows so the tiled fori loops need no tail
        PF = jnp.pad(PF, ((0, 0), (0, _round_up(cap, 8) - cap), (0, 0)))
    PFg = halo_mod.add_ghosts(PF, geom)
    NCg = PFg.shape[-1]
    NC_pad = _round_up(NCg, BLK)
    PFp = halo_mod.assemble_padded(
        PFg, BLK, NC_pad, halo_mod.wrap_x(geom), max_off
    )
    if not rowloop and getattr(cfg, "preshift_window", False):
        out = _call_preshift(
            PFp, _occ_from_packed(PFg), params, geom, cfg, NCg, BLK,
            interpret, meta=meta,
        )
    else:
        out = _call_padded(
            PFp, _occ_from_packed(PFg), params, geom, cfg, NCg, BLK,
            interpret, rowloop,
            occ_edge="wrap" if halo_mod.wrap_x(geom) else "walls",
            meta=meta,
            eflag=_elastic_lanes(PFg, params, cfg, fl)
            if rowloop and cfg.elastic_present
            else None,
        )
    out = halo_mod.trim_ghosts(out[:, :cap, :NCg], geom)
    return _unpack_accs(out, params, cfg, cap, NC)


def sharded_eligible(geom: Geometry, n_shards: int) -> bool:
    """Extra constraints for the shard_map kernel path: x-aligned slabs
    (use Scene.ncx_multiple_of).  2D: each flat-lane slab must exceed the
    stencil reach (the halo exchange only covers nearest-neighbor shards).
    3D (tiled plane exchange): at least 2 x-planes per shard."""
    if geom.ncells[0] % n_shards:
        return False
    ngx, ngy, ngz = halo_mod.ghosted_ncells(geom)
    if geom.dim >= 3:
        return ngx // n_shards >= 2
    NCg = ngx * ngy * ngz
    return NCg // n_shards > halo_mod.max_flat_offset(geom)


def pass_a_sharded(
    pf: Dict[str, jax.Array],
    params: Params,
    geom: Geometry,
    cfg,
    mesh,
    axis: str = "x",
    block: int = 0,
    interpret: bool = False,
    rowloop: bool | None = None,
    dt=0.0,
    step=0,
    seed=0,
) -> Dict[str, jax.Array]:
    """Pass A with per-device Pallas kernels under shard_map.

    The packed field matrix is split along the flat cell axis; each device
    exchanges ``max_off``-wide edge slabs with its mesh neighbors via
    ``lax.ppermute`` (ring-wrapped when x is periodic) and runs the same
    kernel as the single-device path on its local lanes plus halo.  This is
    the fast-path analog of the reference's forward ghost exchange
    (comm_brick.cpp:460); there is no reverse exchange because pair sums
    are full-neighbor (newton off).
    """
    meta = _thermal_meta(dt, step, seed) if cfg.thermal else None
    if geom.dim >= 3:
        return _pass_a_tiled3d_sharded(
            pf, params, geom, cfg, mesh, axis, interpret=interpret,
            meta=meta,
        )
    if rowloop is None:
        rowloop = _default_rowloop(geom)
    NC, cap = geom.ncells_total, geom.cap
    n_shards = mesh.shape[axis]
    max_off = halo_mod.max_flat_offset(geom)

    if geom.ncells[0] % n_shards:
        raise ValueError(
            f"nx={geom.ncells[0]} does not split into x-aligned slabs over "
            f"{n_shards} shards (use Scene.ncx_multiple_of)"
        )
    fl = _field_layout(params, cfg)
    PF = _pack(pf, fl, cap, NC)
    if rowloop:
        PF = jnp.pad(PF, ((0, 0), (0, _round_up(cap, 8) - cap), (0, 0)))
    PFg = halo_mod.add_ghosts(PF, geom)
    NCg = PFg.shape[-1]
    NC_loc = NCg // n_shards
    if NC_loc <= max_off:
        raise ValueError(
            f"local slab of {NC_loc} lanes is narrower than the stencil "
            f"reach {max_off} — the nearest-neighbor halo exchange cannot "
            f"cover it; use fewer shards or a larger grid"
        )
    BLK = _kernel_block(geom, block, rowloop)
    NC_pad = _round_up(NC_loc, BLK)

    def local(PFl, *margs):
        hl, hr = halo_mod.exchange_slabs(
            PFl, max_off, axis, n_shards, halo_mod.wrap_x(geom)
        )
        PFp = halo_mod.assemble_padded(
            PFl, BLK, NC_pad, wrap=False, max_off=max_off,
            halo_left=hl, halo_right=hr,
        )
        out = _call_padded(
            PFp, _occ_from_packed(PFl), params, geom, cfg, NC_loc, BLK,
            interpret, rowloop,
            # edge blocks read ppermute'd neighbor slabs whose occupancy is
            # unknown locally — assume full there
            occ_edge="cap",
            meta=margs[0] if margs else None,
            eflag=_elastic_lanes(PFl, params, cfg, fl)
            if rowloop and cfg.elastic_present
            else None,
        )
        return out[:, :geom.cap, :NC_loc]

    # thermal meta scalars replicate to every device (trace-time values);
    # the pair-tag-keyed counter noise is shard-invariant by construction,
    # so each shard draws the same stream for the same pair as the
    # single-device kernel (the reference's random force under MPI:
    # pair...transport_velocity.cpp:406-431)
    margs = () if meta is None else (meta,)
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis),) + (P(None),) * len(margs),
        out_specs=P(None, None, axis),
        # the kernel's ShapeDtypeStruct outputs carry no vma annotation
        check_vma=False,
    )(PFg, *margs)
    out = halo_mod.trim_ghosts(out, geom)
    return _unpack_accs(out, params, cfg, cap, NC)
