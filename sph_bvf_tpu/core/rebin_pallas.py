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
produce IDENTICAL slot assignments) and compacts matches into output slots
with a running per-lane counter and a select crossbar.  No sort, no
scatter, no [M] relayouts; traffic is ~4x the state size (3x halo read +
1x write).

A particle that moves MORE than one cell ring between rebins (drift
contract already violated, counted by ``state.drift_violation``) is lost
by this kernel rather than moved; the caller accounts every loss into
``state.overflow`` via an n_valid_before - n_valid_after reduction, so the
"lost atoms" invariant (host asserts overflow == 0) still holds.

Eligibility mirrors the pair kernel: f32 state, no periodic axis with more
than one cell (a wrap jumps across the whole flat axis, breaking the
3-block locality), TPU backend.  The jnp path remains the fallback and the
executable spec.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def rebin_pallas_eligible(dtype, geom) -> bool:
    if dtype != jnp.float32:
        return False
    if geom.dim >= 3:
        # 3^dim * cap candidate crossbars exceed Mosaic's compile budget
        # in 3D (same limitation as the pass-A kernel — see
        # ops/pair_pallas.py pallas_eligible)
        return False
    # below ~3k cells the jnp sort pipeline is already cheap and the
    # kernel's fixed per-candidate crossbar cost loses (measured crossover
    # between NC=1.3k and 4.8k on v5e; 3.7x ahead by NC=113k)
    if geom.ncells_total < 3000:
        return False
    if any(p and n > 1 for p, n in zip(geom.periodic, geom.ncells)):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def move_pallas(
    fields: Dict[str, jax.Array], geom, block: int = 0, interpret: bool = False
) -> Dict[str, jax.Array]:
    """Move every particle leaf to its new cell slot; returns the new dict.

    ``fields`` must already be position-wrapped (wrap_pbc) and must contain
    ``x`` and ``valid``.  Particles landing in a full cell (rank >= cap) or
    outside the one-cell drift ring are zeroed (valid=False) — the caller
    counts them by differencing n_valid.
    """
    if block <= 0:
        # 768 measured best in 2D at 1M particles; 3D candidate crossbars
        # (3^dim * cap iterations) need small blocks to keep Mosaic's
        # unrolled lowering compileable.
        block = 768 if geom.dim < 3 else 128
    NC, cap = geom.ncells_total, geom.cap
    nx, ny, nz = geom.ncells
    sx, sy, sz = geom.strides

    # candidate order: flat cell offset ascending (with slot-major outer
    # loop this reproduces the jnp path's stable (cell, old flat) sort)
    offs = sorted(
        (off[0] * sx + off[1] * sy + off[2] * sz, off)
        for off in geom.stencil_offsets()
    )
    max_off = max(abs(o) for o, _ in offs)
    BLK = max(block, _round_up(max_off + 1, 128))
    NC_pad = _round_up(NC, BLK)
    grid = NC_pad // BLK

    # -- pack: floats -> PF [Ff, cap, NC], ints(+valid first) -> PI ---------
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
    PF = jnp.concatenate(fmats, axis=0)
    PI = jnp.concatenate(imats, axis=0)
    Ff, Fi = PF.shape[0], PI.shape[0]
    pad = ((0, 0), (0, 0), (BLK, BLK + NC_pad - NC))
    PF = jnp.pad(PF, pad)
    PI = jnp.pad(PI, pad)

    xr = 0
    for name, nrows, _, _ in fmeta:
        if name == "x":
            break
        xr += nrows

    import numpy as np

    lo = tuple(float(v) for v in geom.lo)
    # pre-round to f32 so the in-kernel multiply matches cell_index_of,
    # where the f64 python constant is rounded at trace time
    inv = tuple(float(np.float32(1.0 / cs)) for cs in geom.cell_size)

    def kernel(fl, fm, fr, il, im, ir, outf_ref, outi_ref):
        b = pl.program_id(0)
        buf_f = jnp.concatenate([fl[:], fm[:], fr[:]], axis=-1)
        buf_i = jnp.concatenate([il[:], im[:], ir[:]], axis=-1)

        g = b * BLK + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        cz = g % nz
        cy = (g // sy) % ny
        cx = g // sx

        accF = jnp.zeros((Ff, cap, BLK), jnp.float32)
        accI = jnp.zeros((Fi, cap, BLK), jnp.int32)
        cnt = jnp.zeros((1, BLK), jnp.int32)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)

        for s_old in range(cap):
            for off_flat, off in offs:
                sl = slice(BLK + off_flat, 2 * BLK + off_flat)
                vj = buf_i[0:1, s_old, sl] != 0  # [1, BLK]
                for o, c, n in (
                    (off[0], cx, nx), (off[1], cy, ny), (off[2], cz, nz)
                ):
                    if o != 0:
                        vj = vj & (c + o >= 0) & (c + o < n)
                # candidate's new flat cell from its wrapped position
                ncell = jnp.zeros((1, BLK), jnp.int32)
                for ax, (s, n) in enumerate(
                    ((sx, nx), (sy, ny), (sz, nz))
                ):
                    if n == 1:
                        continue
                    xa = buf_f[xr + ax : xr + ax + 1, s_old, sl]
                    ci = jnp.floor((xa - lo[ax]) * inv[ax]).astype(jnp.int32)
                    ncell = ncell + jnp.clip(ci, 0, n - 1) * s
                match = vj & (ncell == g)  # [1, BLK]
                sel = match & (cnt == iota_s)  # [cap, BLK]
                accF = jnp.where(
                    sel[None], buf_f[:, s_old, sl][:, None, :], accF
                )
                accI = jnp.where(
                    sel[None], buf_i[:, s_old, sl][:, None, :], accI
                )
                cnt = cnt + match.astype(jnp.int32)

        outf_ref[...] = accF
        outi_ref[...] = accI

    spec = lambda F, shift: pl.BlockSpec(
        (F, cap, BLK), lambda b: (0, 0, b + shift), memory_space=pltpu.VMEM
    )
    outf, outi = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec(Ff, 0), spec(Ff, 1), spec(Ff, 2),
                  spec(Fi, 0), spec(Fi, 1), spec(Fi, 2)],
        out_specs=[
            pl.BlockSpec((Ff, cap, BLK), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fi, cap, BLK), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Ff, cap, NC_pad), jnp.float32),
            jax.ShapeDtypeStruct((Fi, cap, NC_pad), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(PF, PF, PF, PI, PI, PI)

    outf = outf[:, :, :NC]
    outi = outi[:, :, :NC]
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
