#!/usr/bin/env python
"""Golden-field comparison: this framework vs the reference C++ build.

Runs the SAME lid-driven-cavity input on both implementations and diffs the
per-particle fields — the acceptance criterion from BASELINE.md ("field-level
match to reference VTK output").  The reference script's `dump vtk` is
swapped for `dump custom` (text) so the C++ build doesn't need libvtk.

Usage:
    python tools/golden_compare.py [--lmp /tmp/lmpbuild/src/lmp_serial]
                                   [--nx 50] [--steps 200] [--f64]

Particles are matched by initial lattice position (ids are assigned in the
same creation order on both sides, but position matching is robust to it).
Reports max/mean relative differences for v and rho.
"""

import argparse
import glob
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = {
    "lid_cavity": dict(
        script="/root/reference/examples/ssa-tsdpd/lid_driven_cavity/"
               "Re100_N50/lid_driven_cavity.lmp",
        nt_line="variable     nt equal 20000000",
        nx_lines=["variable           nx equal 50"],
        dump_fields="id type x y z vx vy vz c_rhoatom c_phiatom",
    ),
    "natural_convection": dict(
        script="/root/reference/examples/ssa-tsdpd/natural_convection/"
               "Ra_10E4/natural_convection.lmp",
        nt_line="variable     nt equal 10000000",
        nx_lines=["variable           Nxint equal 200",
                  "variable           Nyint equal 200"],
        dump_fields="id type x y z vx vy vz c_rho c_phi c_concentration1",
    ),
    "natural_convection_ra5": dict(
        model="natural_convection",
        script="/root/reference/examples/ssa-tsdpd/natural_convection/"
               "Ra_10E5/natural_convection.lmp",
        nt_line="variable     nt equal 10000000",
        nx_lines=["variable           Nxint equal 200",
                  "variable           Nyint equal 200"],
        dump_fields="id type x y z vx vy vz c_rho c_phi c_concentration1",
        build_kwargs=lambda nx: dict(N=nx, Ra=1e5, dt=1e-4),
    ),
    "natural_convection_ra6": dict(
        model="natural_convection",
        script="/root/reference/examples/ssa-tsdpd/natural_convection/"
               "Ra_10E6/natural_convection.lmp",
        nt_line="variable     nt equal 10000000",
        nx_lines=["variable           Nxint equal 200",
                  "variable           Nyint equal 200"],
        dump_fields="id type x y z vx vy vz c_rho c_phi c_concentration1",
        build_kwargs=lambda nx: dict(N=nx, Ra=1e6, dt=1e-4),
    ),
    "cell_polarization": dict(
        script="/root/reference/examples/ssa-tsdpd/cell_polarization/"
               "case_1/cell_polarization.lmp",
        nt_line="variable     nt equal 40000",
        nx_lines=["variable           nx equal 100"],
        dump_fields="id type x y z vx vy vz c_rhoatom c_phiatom "
                    "c_concentration1",
        via_lmp={"nx"},  # build ours from the same script (multi-lattice
        # construction with atom-variable group splits; the Python model
        # mirrors case_2, so script-parity is the honest comparison)
        dt_var="dt",
    ),
    "fsi": dict(
        script="/root/reference/examples/ssa-tsdpd/fsi/fsi.lmp",
        nt_line="variable     nt equal 1000000000",
        nx_lines=["variable\t   nx equal 60"],
        dump_fields="id type x y z vx vy vz c_rhoatom c_phiatom c_stressxx",
        build_kwargs=lambda nx: dict(nx=nx, dt=1e-8),  # tdamp_solid stays 1e6 like the script
        dt=1e-8,
    ),
}


def make_cpp_script(case: dict, nx: int, steps: int, outdir: str) -> str:
    text = open(case["script"]).read()
    if case["nt_line"] not in text:
        raise RuntimeError("nt line not found in reference script")
    text = text.replace(case["nt_line"],
                        re.sub(r"\d+$", str(steps), case["nt_line"]))
    for line in case["nx_lines"]:
        if line not in text:
            raise RuntimeError(f"line not found: {line}")
        text = text.replace(line, re.sub(r"\d+$", str(nx), line))
    text = re.sub(
        r"dump\s+dmpvtk.*\n",
        f"dump dmp all custom {steps} {outdir}/cpp_*.txt "
        + case["dump_fields"] + "\n",
        text,
    )
    text = re.sub(r"thermo\s+\$\{freq_screen\}", "thermo 1000", text)
    path = os.path.join(outdir, "golden.lmp")
    open(path, "w").write(text)
    return path


def read_dump_custom(path: str) -> dict:
    with open(path) as f:
        lines = f.read().splitlines()
    i = lines.index("ITEM: NUMBER OF ATOMS")
    n = int(lines[i + 1])
    hdr = next(l for l in lines if l.startswith("ITEM: ATOMS"))
    cols = hdr.split()[2:]
    start = lines.index(hdr) + 1
    data = np.loadtxt(lines[start : start + n])
    return {c: data[:, k] for k, c in enumerate(cols)}


def run_cpp(lmp_bin: str, case: dict, nx: int, steps: int, outdir: str) -> dict:
    script = make_cpp_script(case, nx, steps, outdir)
    subprocess.run(
        [lmp_bin, "-in", script, "-log", os.path.join(outdir, "log.lammps")],
        check=True, cwd=outdir, capture_output=True,
    )
    dumps = sorted(glob.glob(os.path.join(outdir, "cpp_*.txt")),
                   key=lambda p: int(re.findall(r"(\d+)", p)[-1]))
    return read_dump_custom(dumps[0]), read_dump_custom(dumps[-1])


def run_ours_lmp(case: dict, nx: int, steps: int, f64: bool):
    """Build ours by parsing the SAME reference script (api/lmp front end)."""
    import jax

    if f64:
        jax.config.update("jax_enable_x64", True)
    from sph_bvf_tpu.api.lmp import parse_script
    from sph_bvf_tpu.core.state import gather_particles

    overrides = {v: nx for v in case["via_lmp"]}
    model = parse_script(open(case["script"]).read(), overrides=overrides)
    state, params, spec = model.build()
    init = gather_particles(state, spec.geom, fields=("x",))
    state, params, spec = model.run(max_steps=steps, thermo=False,
                                    out_dir=tempfile.mkdtemp())
    fields = ("x", "v", "rho", "phi", "S", "Pnew") + (
        ("C",) if params.n_sdpd else ())
    out = gather_particles(state, spec.geom, fields=fields)
    return init, out


def run_ours(model: str, nx: int, steps: int, f64: bool):
    import jax

    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from sph_bvf_tpu.core.state import gather_particles
    from sph_bvf_tpu.models import REGISTRY
    from sph_bvf_tpu.core.stepper import run_chunk, setup

    case = CASES[model]
    kw = case.get("build_kwargs", lambda n: dict(N=n, dt=1e-4))(nx)
    dt = case.get("dt", 1e-4)
    state, params, spec, sc = REGISTRY[case.get("model", model)](
        rebin_every=10, **kw)
    if f64:
        import dataclasses

        state = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32
            else a,
            state,
        )
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    state = setup(state, params, spec, dt=dt)
    init = gather_particles(state, spec.geom, fields=("x", "v", "rho"))
    done = 0
    while done < steps:
        n = min(spec.rebin_every, steps - done)
        state = run_chunk(state, params, spec, n)
        done += n
    fields = ("x", "v", "rho", "phi", "S", "Pnew") + (
        ("C",) if params.n_sdpd else ())
    out = gather_particles(state, spec.geom, fields=fields)
    return init, out


def match_by_position(x_ref: np.ndarray, x_ours: np.ndarray) -> np.ndarray:
    """Index array m with ours[m[i]] at the same initial site as ref[i]."""
    from scipy.spatial import cKDTree  # available via numpy/scipy? fall back

    tree = cKDTree(x_ours)
    d, m = tree.query(x_ref)
    assert d.max() < 1e-8, f"initial positions mismatch: {d.max()}"
    return m


def match_by_sorted_order(x_ref, x_ours):
    """Lexicographic position sort on both sides (no scipy needed)."""
    def order(x):
        return np.lexsort((x[:, 2].round(12), x[:, 1].round(12),
                           x[:, 0].round(12)))
    return order(x_ref), order(x_ours)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="lid_cavity", choices=sorted(CASES))
    ap.add_argument("--lmp", default="/tmp/lmpbuild/src/lmp_serial")
    ap.add_argument("--nx", type=int, default=50)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--field-bins", type=int, default=0,
                    help="also compare bin-averaged Eulerian velocity "
                         "fields on a BxB grid (the meaningful metric at "
                         "long horizons, where per-particle trajectories "
                         "have decorrelated chaotically)")
    ap.add_argument("--reuse-cpp", default=None, metavar="DIR",
                    help="reuse cpp_*.txt dumps from a previous workdir "
                         "instead of re-running the reference binary")
    args = ap.parse_args()

    case = CASES[args.case]
    if args.reuse_cpp:
        outdir = args.reuse_cpp
        print(f"workdir (reused): {outdir}")
        dumps = sorted(glob.glob(os.path.join(outdir, "cpp_*.txt")),
                       key=lambda p: int(re.findall(r"(\d+)", p)[-1]))
        cpp0, cpp1 = read_dump_custom(dumps[0]), read_dump_custom(dumps[-1])
    else:
        outdir = tempfile.mkdtemp(prefix="golden_")
        print(f"workdir: {outdir}")
        cpp0, cpp1 = run_cpp(args.lmp, case, args.nx, args.steps, outdir)
    if "via_lmp" in case:
        init, ours = run_ours_lmp(case, args.nx, args.steps, args.f64)
    else:
        init, ours = run_ours(args.case, args.nx, args.steps, args.f64)

    x_ref0 = np.stack([cpp0["x"], cpp0["y"], cpp0["z"]], axis=1)
    # order both initial dumps identically; apply to the final dumps by id/tag
    oref, oours = match_by_sorted_order(x_ref0, init["x"])
    site_err = np.abs(x_ref0[oref] - init["x"][oours]).max()
    print(f"initial-site max mismatch: {site_err:.3e}")
    ref_ids = cpp0["id"][oref].astype(int)
    our_tags = init["tag"][oours].astype(int)

    id2row1 = {int(i): k for k, i in enumerate(cpp1["id"].astype(int))}
    tag2row1 = {int(t): k for k, t in enumerate(ours["tag"].astype(int))}
    rref = np.array([id2row1[i] for i in ref_ids])
    rours = np.array([tag2row1[t] for t in our_tags])

    v_ref = np.stack([cpp1["vx"], cpp1["vy"]], axis=1)[rref]
    v_ours = ours["v"][rours][:, :2]
    rho_key = "c_rhoatom" if "c_rhoatom" in cpp1 else "c_rho"
    phi_key = "c_phiatom" if "c_phiatom" in cpp1 else "c_phi"
    rho_ref = cpp1[rho_key][rref]
    rho_ours = ours["rho"][rours]
    phi_ref = cpp1[phi_key][rref]
    phi_ours = ours["phi"][rours]

    vscale = np.abs(v_ref).max()
    print(f"n={len(rref)} steps={args.steps} (ours {'f64' if args.f64 else 'f32'})")
    comps = [
        ("v", v_ref, v_ours, vscale),
        ("rho", rho_ref, rho_ours, 1.0),
        ("phi", phi_ref, phi_ours, max(np.abs(phi_ref).max(), 1e-12)),
    ]
    if "c_concentration1" in cpp1 and "C" in ours:
        comps.append(("C", cpp1["c_concentration1"][rref],
                      ours["C"][rours][:, 0],
                      max(np.abs(cpp1["c_concentration1"]).max(), 1e-12)))
    if "c_stressxx" in cpp1:
        # the reference computes stress only for the beam group (type 2)
        beam = cpp1["type"][rref].astype(int) == 2
        sxx = (ours["S"][rours][:, 2, 2] - ours["Pnew"][rours])[beam]
        comps.append(("Sxx", cpp1["c_stressxx"][rref][beam], sxx,
                      max(np.abs(cpp1["c_stressxx"]).max(), 1e-12)))
    for name, a, b, scale in comps:
        d = np.abs(a - b)
        print(f"{name:4s} max|diff|={d.max():.3e}  mean|diff|={d.mean():.3e}  "
              f"rel(max)={d.max()/scale:.3e}")

    if args.field_bins:
        # Eulerian field comparison: bin final velocities on a BxB grid and
        # compare bin means.  Per-particle comparison is only meaningful at
        # short horizons — individual SPH trajectories decorrelate
        # chaotically (f32 vs f64 seeds the divergence) long before the
        # mean flow differs, exactly like molecular trajectories vs
        # thermodynamic fields.
        B = args.field_bins
        xr = np.stack([cpp1["x"], cpp1["y"]], axis=1)
        xo = np.asarray(ours["x"])[:, :2]
        vr = np.stack([cpp1["vx"], cpp1["vy"]], axis=1)
        vo = np.asarray(ours["v"])[:, :2]
        lo = np.minimum(xr.min(0), xo.min(0)) - 1e-9
        hi = np.maximum(xr.max(0), xo.max(0)) + 1e-9

        def binmean(x, v):
            ix = ((x - lo) / (hi - lo) * B).astype(int).clip(0, B - 1)
            flat = ix[:, 0] * B + ix[:, 1]
            cnt = np.bincount(flat, minlength=B * B)
            s = np.stack(
                [np.bincount(flat, weights=v[:, k], minlength=B * B)
                 for k in range(v.shape[1])], axis=1)
            return s / np.maximum(cnt, 1)[:, None], cnt

        fr, cr = binmean(xr, vr)
        fo, co = binmean(xo, vo)
        both = (cr > 0) & (co > 0)
        d = np.abs(fr - fo)[both]
        print(f"field({B}x{B}) bins={int(both.sum())} "
              f"max|dU|={d.max():.3e}  mean|dU|={d.mean():.3e}  "
              f"rel(max)={d.max()/vscale:.3e}  "
              f"rel(mean)={d.mean()/vscale:.3e}")
        if "c_concentration1" in cpp1 and "C" in ours:
            # Eulerian temperature/species field (convection: C[0] is the
            # nondimensional temperature)
            Tr = cpp1["c_concentration1"][:, None]
            To = np.asarray(ours["C"])[:, :1]
            ftr, _ = binmean(xr, Tr)
            fto, _ = binmean(xo, To)
            dT = np.abs(ftr - fto)[both]
            tscale = max(np.abs(ftr[both]).max(), 1e-12)
            print(f"field({B}x{B}) T: max|dT|={dT.max():.3e}  "
                  f"mean|dT|={dT.mean():.3e}  "
                  f"rel(max)={dT.max()/tscale:.3e}  "
                  f"rel(mean)={dT.mean()/tscale:.3e}")


if __name__ == "__main__":
    main()
