"""BLK sweep for the 2D grouped pass-A kernel with narrow side halos.

Times ``pass_a_pallas`` directly (no prep, no pass B) with explicit block
sizes, on the real TPU, via the scanned-loop pattern.  The narrow-halo
change (_halo_width) only activates when BLK exceeds the stencil reach
(H = round_up(maxoff+1, 128)): at cavity N=200 H=256, so BLK 512/768 get
the [256 | BLK | 256] window while BLK 256 is the round-3 equal-block
baseline.

Usage: python tools/passa_blocksweep.py [--n 200] [--blocks 256 512 768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from sph_bvf_tpu.core import halo as halo_mod  # noqa: E402
from sph_bvf_tpu.core.stepper import setup  # noqa: E402
from sph_bvf_tpu.models import lid_cavity  # noqa: E402
from sph_bvf_tpu.ops.pair import _per_particle  # noqa: E402
from sph_bvf_tpu.ops.pair_pallas import _halo_width, pass_a_pallas  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--blocks", type=int, nargs="*",
                    default=[256, 512, 768, 1536])
    ap.add_argument("--repeats", type=int, default=50)
    args = ap.parse_args()

    state, params, spec, _ = lid_cavity.build(N=args.n, Re=100.0)
    state = setup(state, params, spec, dt=1e-4)
    geom, cfg = spec.geom, spec.pair
    n = int(state.n_valid)
    maxoff = halo_mod.max_flat_offset(geom)
    print(json.dumps({"n_particles": n, "maxoff": maxoff,
                      "ncells": list(geom.ncells)}), flush=True)

    for blk in args.blocks:
        if blk <= maxoff:
            print(json.dumps({"block": blk, "skipped": "blk <= maxoff"}),
                  flush=True)
            continue

        def run(s, blk=blk):
            def body(c, _):
                pf = _per_particle(c, params, cfg)
                acc = pass_a_pallas(pf, params, geom, cfg, block=blk)
                import dataclasses
                c = dataclasses.replace(c, x=c.x + 1e-30 * acc["f"])
                return c, ()

            s, _ = jax.lax.scan(body, s, None, length=args.repeats)
            return s

        fn = jax.jit(run)
        s = fn(state)
        float(jnp.sum(s.rho))  # barrier
        t0 = time.perf_counter()
        s = fn(state)
        float(jnp.sum(s.rho))
        ms = (time.perf_counter() - t0) * 1e3 / args.repeats
        print(json.dumps({
            "block": blk, "H": _halo_width(geom, blk),
            "ms": round(ms, 4),
            "mps": round(n / ms * 1e3 / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
