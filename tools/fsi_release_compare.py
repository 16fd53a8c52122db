"""Long-horizon FSI validation: beam dynamics PAST the solid-release gate.

Round-1 gap: the FSI beam was golden-validated only while frozen (the
mechanics integrator releases solids at step 1e6,
fix_ssa_tsdpd_bvf_mechanics.cpp:151 — far beyond any feasible serial C++
comparison on this host).  Both sides therefore run with the release gate
moved to step 20k: ours via fsi.build(tdamp_solid=2e4), the C++ build via
an SSA_TDAMP_SOLID env override patched into the /tmp/lmpbuild copy of the
fix (the only source change; same physics, earlier gate).  120k steps at
dt=1e-8 gives 100k steps of free-beam Jaumann dynamics.

After ~release the trajectories decorrelate at f32 vs f64 rounding, so the
comparison is of the macroscopic observable the paper uses — the beam tip
deflection trajectory — plus field-level agreement while correlation
lasts.

Inputs: /tmp/fsi_release/cpp_*.txt (C++ dumps every 10k) and
/tmp/fsi_release_ours.npz (tools-side snapshots).  Run both first; see
VALIDATION.md "FSI release".
"""

from __future__ import annotations

import glob
import re
import sys

import numpy as np


def read_dump(path: str) -> dict:
    with open(path) as f:
        lines = f.read().splitlines()
    n = int(lines[lines.index("ITEM: NUMBER OF ATOMS") + 1])
    hdr = next(l for l in lines if l.startswith("ITEM: ATOMS"))
    cols = hdr.split()[2:]
    start = lines.index(hdr) + 1
    data = np.loadtxt(lines[start : start + n])
    return {c: data[:, k] for k, c in enumerate(cols)}


def main():
    cpp_files = {
        int(re.findall(r"(\d+)", p)[-1]): p
        for p in glob.glob("/tmp/fsi_release/cpp_*.txt")
    }
    ours = np.load("/tmp/fsi_release_ours.npz")
    steps = sorted(
        s for s in cpp_files
        if s > 0 and f"{s}_x" in ours
    )
    if not steps:
        print("no overlapping snapshots yet"); sys.exit(1)

    # tip particles: top 3um of the beam (type 2) in the C++ initial dump
    d0 = read_dump(cpp_files[min(cpp_files)])
    beam0 = d0["type"].astype(int) == 2
    ytop = d0["y"][beam0].max()
    tip_ids = set(d0["id"][beam0][d0["y"][beam0] > ytop - 3e-6].astype(int))

    # id map: our tag numbering is NOT the C++ atom id (creation order
    # differs), but the step-0 geometries are identical — match by
    # position.  tag2cid[tag] = C++ id of the particle at the same x0.
    tags0 = ours["0_tag"].astype(int)
    x0 = ours["0_x"][:, :2]
    cpp_xy0 = np.stack([d0["x"], d0["y"]], 1)
    cpp_ids0 = d0["id"].astype(int)
    # lexicographic sort both sides by (x, y); positions agree to f32 eps
    oc = np.lexsort((cpp_xy0[:, 1], cpp_xy0[:, 0]))
    oo = np.lexsort((x0[:, 1], x0[:, 0]))
    assert np.abs(cpp_xy0[oc] - x0[oo]).max() < 1e-9, "step-0 geometry mismatch"
    tag2cid = dict(zip(tags0[oo], cpp_ids0[oc]))

    print(f"{'step':>8} {'tip_x cpp':>12} {'tip_x ours':>12} {'dtip':>10} "
          f"{'max|dv|':>10} {'vscale':>10}")
    for s in steps:
        c = read_dump(cpp_files[s])
        sel = np.isin(c["id"].astype(int), list(tip_ids))
        tip_c = c["x"][sel].mean()

        tags = ours[f"{s}_tag"].astype(int)
        cids = np.array([tag2cid[t] for t in tags])
        xo = ours[f"{s}_x"]
        sel_o = np.isin(cids, list(tip_ids))
        tip_o = xo[sel_o][:, 0].mean()

        # field comparison on matched ids
        order_c = np.argsort(c["id"].astype(int))
        order_o = np.argsort(cids)
        v_c = np.stack([c["vx"], c["vy"]], 1)[order_c]
        v_o = ours[f"{s}_v"][order_o][:, :2]
        dv = np.abs(v_c - v_o).max()
        vs = np.abs(v_c).max()
        print(f"{s:>8} {tip_c:>12.5e} {tip_o:>12.5e} "
              f"{tip_o - tip_c:>10.2e} {dv:>10.2e} {vs:>10.2e}")


if __name__ == "__main__":
    main()
