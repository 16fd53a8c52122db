"""MXU-offloaded stencil staging probe (round-4 verdict #1b).

Isolates the ROTATION MECHANISM of the pass-A kernel: producing the 9
stencil-shifted [R, BLK] views of a staged [R, W] window (W = BLK + 2H).
Three Pallas micro-kernels at the cavity N=200 working shape, timed on the
real chip with the pinned min-of-7 pattern:

  * slice  — 9 lane-misaligned value slices (what `_call_padded` does)
  * mxu    — ONE jnp.dot(X, S) with a constant banded 0/1 matrix
             S [W, 9*BLK]: the shifts leave the VPU entirely; per-offset
             views become lane-ALIGNED slices of the product
  * base   — one aligned slice (the floor: everything but the shifts)

Each kernel folds the 9 views with distinct per-offset constants (defeats
CSE) and writes one [R, BLK] block, so the only difference is the staging
mechanism.  The mxu kernel is checked bit-identical to slice first (0/1
selection at HIGHEST precision is exact: every output element is one
input times 1.0).

FLOP context: the dot is R*W*9*BLK MACs/block (~415M at the default
shape, ~2.5 GFLOP-bf16 after f32 3-pass) — vs ~9*R*BLK*4B of vector copy
for slice.  The probe answers whether trading that is a win when the MXU
is otherwise idle.

Usage (real TPU): python tools/mxu_rotation_probe.py [--blocks 256]
Emits one JSON line per kernel + a summary.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

# cavity N=200 working shape: F=22 field rows x capk=16 slot rows, BLK=256,
# H=128 side halos, 9 offsets at flat shifts {-(s+1)..-(s-1), -1,0,1, ...}
R, BLK, H = 22 * 16, 256, 128
W = BLK + 2 * H
S_STRIDE = 70  # the cavity x-stride (ngy)
OFFS = [dx * S_STRIDE + dy for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
CS = [1.0 + 0.125 * i for i in range(9)]  # distinct fold constants


def _shift_matrix() -> np.ndarray:
    S = np.zeros((W, 9 * BLK), np.float32)
    for o, off in enumerate(OFFS):
        lo = H + off
        for l in range(BLK):
            S[lo + l, o * BLK + l] = 1.0
    return S


def _k_slice(x_ref, o_ref):
    acc = jnp.zeros((R, BLK), jnp.float32)
    for off, c in zip(OFFS, CS):
        lo = H + off
        acc = acc + c * x_ref[:, lo:lo + BLK]
    o_ref[...] = acc


def _k_mxu(x_ref, s_ref, o_ref):
    y = jax.lax.dot_general(
        x_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    acc = jnp.zeros((R, BLK), jnp.float32)
    for o, c in enumerate(CS):
        acc = acc + c * y[:, o * BLK:(o + 1) * BLK]
    o_ref[...] = acc


def _k_base(x_ref, o_ref):
    # one aligned slice, same fold count (constants only): the floor
    acc = jnp.zeros((R, BLK), jnp.float32)
    mid = x_ref[:, H:H + BLK]
    for c in CS:
        acc = acc + c * mid
    o_ref[...] = acc


def _call(kernel, x, g, extra=()):
    n_in = 1 + len(extra)
    in_specs = [
        pl.BlockSpec((R, W), lambda b: (0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(a.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for a in extra
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (R, BLK), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, g * BLK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x, *extra)


def _time(fn, x, repeats=200, outer=7):
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(x + 1e-30 * c[:1, :1])
            return out[:1, :1], ()

        c, _ = jax.lax.scan(
            body, jnp.zeros((1, 1), jnp.float32), None, length=repeats)
        return c

    _ = float(jnp.sum(run(x)))
    _ = float(jnp.sum(run(x)))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _ = float(jnp.sum(run(x)))
        ts.append((time.perf_counter() - t0) * 1e3 / repeats)
    ts.sort()
    return ts[0], (ts[len(ts) // 2] - ts[0]) / max(ts[0], 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=19,
                    help="grid length (cavity N=200 has 19 blocks)")
    ap.add_argument("--repeats", type=int, default=200)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)
    S = jnp.asarray(_shift_matrix())
    g = args.blocks

    f_slice = functools.partial(_call, _k_slice, g=g)
    f_mxu = lambda x: _call(_k_mxu, x, g, extra=(S,))
    f_base = functools.partial(_call, _k_base, g=g)

    # exactness: 0/1 selection through the MXU must be bit-identical
    a, b = np.asarray(f_slice(x)), np.asarray(f_mxu(x))
    exact = bool((a == b).all())
    print(json.dumps({"mxu_bit_identical": exact,
                      "max_abs_diff": float(np.abs(a - b).max())}),
          flush=True)

    out = {"R": R, "W": W, "BLK": BLK, "blocks": g,
           "backend": jax.devices()[0].platform}
    for name, fn in (("slice", f_slice), ("mxu", f_mxu), ("base", f_base)):
        ms, spread = _time(fn, x, args.repeats)
        out[f"{name}_ms"] = round(ms, 5)
        print(json.dumps({f"{name}_ms": out[f"{name}_ms"],
                          "spread": round(spread, 3)}), flush=True)
    out["rotation_cost_ms"] = round(out["slice_ms"] - out["base_ms"], 5)
    out["mxu_cost_ms"] = round(out["mxu_ms"] - out["base_ms"], 5)
    out["mxu_vs_slice"] = round(
        out["mxu_cost_ms"] / max(out["rotation_cost_ms"], 1e-9), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
