"""Measure the reference C++ build's serial throughput per example model.

Reuses the golden-comparison script patching (tools/golden_compare.py) to
run each reference example for a fixed number of steps and parses the
Finish banner ("Loop time of T on P procs for S steps with M atoms",
/root/reference/src/finish.cpp:64) into particle-steps/s.  Results merge
into bench_baseline.json under "models", which bench.py reads for the
per-model vs_baseline ratios.

Usage:  python tools/measure_baselines.py [--steps-scale 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.golden_compare import CASES, make_cpp_script  # noqa: E402

# (case, nx, steps): nx matches the config bench.py times on TPU; steps are
# sized for ~2-5 min of serial C++ each.
RUNS = [
    ("lid_cavity", 200, 2000),
    ("natural_convection", 200, 500),
    ("fsi", 60, 2000),
    ("cell_polarization", 100, 2000),
]

LOOP_RE = re.compile(
    r"Loop time of ([0-9.eE+-]+) on (\d+) procs for (\d+) steps with (\d+) atoms"
)


def measure(lmp_bin: str, case_name: str, nx: int, steps: int) -> dict:
    case = CASES[case_name]
    outdir = tempfile.mkdtemp(prefix=f"baseline_{case_name}_")
    script = make_cpp_script(case, nx, steps, outdir)
    log = os.path.join(outdir, "log.lammps")
    subprocess.run(
        [lmp_bin, "-in", script, "-log", log],
        check=True, cwd=outdir, capture_output=True,
    )
    m = LOOP_RE.search(open(log).read())
    if not m:
        raise RuntimeError(f"no Loop time in {log}")
    loop_t, procs, nsteps, natoms = (
        float(m.group(1)), int(m.group(2)), int(m.group(3)), int(m.group(4))
    )
    ps = natoms * nsteps / loop_t
    return dict(
        particle_steps_per_sec=round(ps),
        nx=nx, steps=nsteps, atoms=natoms, loop_time_s=loop_t, procs=procs,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmp", default="/tmp/lmpbuild/src/lmp_serial")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_baseline.json"))
    args = ap.parse_args()

    data = json.load(open(args.out)) if os.path.exists(args.out) else {}
    models = data.setdefault("models", {})
    for case_name, nx, steps in RUNS:
        print(f"[{case_name}] nx={nx} steps={steps} ...", flush=True)
        r = measure(args.lmp, case_name, nx, steps)
        print(f"  {r}", flush=True)
        models[case_name] = r
    json.dump(data, open(args.out, "w"), indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
