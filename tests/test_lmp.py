"""LAMMPS input-script front end tests.

When the reference tree is present (/root/reference), the four shipped
example scripts must parse, build, and step unmodified (grid sizes shrunk
via the -var override mechanism).  A synthetic script covers the parser
features independently of the reference tree.
"""

import glob
import os

import numpy as np
import pytest

from sph_bvf_tpu.api.lmp import LmpError, parse_script

REF = "/root/reference/examples/ssa-tsdpd"

SYNTHETIC = """
dimension 2
units si
atom_style ssa_tsdpd/atomic 1 0 0
boundary f f p
variable L equal 1.0
variable nx equal 12
variable delta equal v_L/v_nx
variable h equal "2.5*v_delta"
variable rho0 equal 1.0
region domain block 0 ${L} 0 ${L} 0 ${delta} units box
create_box 2 domain
lattice sq ${delta} origin 0.5 0.5 0.0
region lower block EDGE EDGE 0 0.5 EDGE EDGE units box
create_atoms 1 region lower
region upper block EDGE EDGE 0.5 EDGE EDGE EDGE units box
delete_atoms region upper
create_atoms 2 region upper
group bottom region lower
group top subtract all bottom
variable nb equal count(bottom)
variable mi equal v_rho0*v_L*v_L/(2*v_nb)
mass * ${mi}
set group all ssa_tsdpd/rho ${rho0}
set group all ssa_tsdpd/C 0 0.25
set group top ssa_tsdpd/solid_tag 1 fixed
pair_style ssa_tsdpd/bvf/transportVelocity
pair_coeff * * ${rho0} 10.0 1e-2 ${h} ${h} 0.0 0.05
fix integration all ssa_tsdpd/bvf/transportVelocity
compute rhoatom all ssa_tsdpd/rho/atom
compute c0atom all ssa_tsdpd/C/atom 0
dump d1 all vtk 10 out*.vtk id type vx vy vz c_rhoatom c_c0atom
thermo 100
timestep 1e-4
run 1000
"""


def test_synthetic_script(tmp_path):
    model = parse_script(SYNTHETIC)
    assert model.dt == 1e-4 and model.nsteps == 1000
    assert model.variables["nb"] > 0
    state, params, spec = model.run(max_steps=10, out_dir=str(tmp_path),
                                    thermo=False)
    assert int(state.overflow) == 0
    vtks = glob.glob(os.path.join(tmp_path, "out*.vtk"))
    assert vtks, "dump file not written"
    from sph_bvf_tpu.io.vtk import read_vtk

    pts, data = read_vtk(vtks[0])
    assert set(data) >= {"id", "type", "vx", "vy", "vz", "c_rhoatom", "c_c0atom"}
    assert np.allclose(data["c_rhoatom"].mean(), 1.0, atol=0.05)
    # the domain companion grid (dump_vtk.cpp boundingBox analog)
    bbox = glob.glob(os.path.join(tmp_path, "*_boundingBox.vtk"))
    assert bbox, "boundingBox companion not written"
    txt = open(bbox[0]).read()
    assert "RECTILINEAR_GRID" in txt and "DIMENSIONS 2 2 2" in txt
    assert "X_COORDINATES 2 double" in txt


def test_unknown_command_raises():
    with pytest.raises(LmpError, match="unsupported command"):
        parse_script("bogus_command 1 2 3")


def test_undefined_variable_raises():
    with pytest.raises(LmpError, match="undefined variable"):
        parse_script("variable a equal ${nope}")


_REF_SCRIPTS = [
    ("lid_driven_cavity/Re100_N50/lid_driven_cavity.lmp", {"nx": 16}),
    ("natural_convection/Ra_10E4/natural_convection.lmp",
     {"Nxint": 24, "Nyint": 24}),
    ("fsi/fsi.lmp", {"nx": 20}),
    ("cell_polarization/case_1/cell_polarization.lmp", {"nx": 30}),
]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
@pytest.mark.parametrize("rel,overrides", _REF_SCRIPTS)
def test_reference_example_scripts(rel, overrides, tmp_path):
    with open(os.path.join(REF, rel)) as f:
        model = parse_script(f.read(), overrides=overrides)
    state, params, spec = model.run(max_steps=10, out_dir=str(tmp_path),
                                    thermo=False)
    assert int(state.overflow) == 0
    assert int(state.step) == 10
    assert glob.glob(os.path.join(tmp_path, "*.vtk"))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_all_reference_scripts_parse():
    """Every .lmp script the reference ships (all 12 — the 4 families'
    Re/N/Ra/case parameter variants) must parse through the front end
    with zero unconsumed commands; the variants differ only in variable
    values (verified by diff), so the per-family run tests above cover
    the execution path."""
    scripts = sorted(glob.glob(os.path.join(REF, "*", "**", "*.lmp"),
                               recursive=True))
    assert len(scripts) >= 12, scripts
    for path in scripts:
        with open(path) as f:
            model = parse_script(f.read())
        assert model.nsteps > 0 and model.dt > 0, path
        assert model.scene.ntypes > 0 and len(model.scene._x) > 0, path


def test_cli_main(tmp_path):
    """`python -m sph_bvf_tpu` mirrors the reference CLI (lammps.cpp:112-192)."""
    from sph_bvf_tpu.__main__ import main

    script = tmp_path / "mini.lmp"
    script.write_text(SYNTHETIC)
    log = tmp_path / "log.mini"
    rc = main([
        "-in", str(script), "-var", "nx", "10", "-log", str(log),
        "-echo", "screen", "-sf", "omp",
        "--max-steps", "10", "--out", str(tmp_path / "out"),
    ])
    assert rc == 0
    assert glob.glob(str(tmp_path / "out" / "out*.vtk"))
    assert "steps/s" in log.read_text()  # thermo rows reached the -log file


def test_read_restart_resumes(tmp_path):
    """`restart N file` + `read_restart` resume (read_restart.cpp analog)."""
    import numpy as np

    base = SYNTHETIC.replace("run 1000", "run 20").replace(
        "dump d1 all vtk 10 out*.vtk id type vx vy vz c_rhoatom c_c0atom", ""
    )
    writer = base.replace("thermo 100", "thermo 100\nrestart 10 ck*.npz")
    model = parse_script(writer)
    state_a, params, spec = model.run(out_dir=str(tmp_path), thermo=False)
    ck = tmp_path / "ck10.npz"
    assert ck.exists() and (tmp_path / "ck20.npz").exists()

    resume = base.replace("run 20", f"read_restart {ck}\nrun 10")
    model_b = parse_script(resume)
    state_b, _, _ = model_b.run(out_dir=str(tmp_path / "b"), thermo=False)
    assert int(state_b.step) == 20

    # resume is deterministic (counter-based RNG rides in the checkpoint)
    state_c, _, _ = parse_script(resume).run(out_dir=str(tmp_path / "c"),
                                             thermo=False)
    for f in ("x", "v", "rho", "C"):
        np.testing.assert_array_equal(np.asarray(getattr(state_b, f)),
                                      np.asarray(getattr(state_c, f)))

    # and lands near the uninterrupted run (setup resets vest=v at step 10,
    # the reference's own fix-setup semantics on a restart —
    # fix...transport_velocity.cpp:76-95 — so bitwise equality is not expected)
    # measured: the reset perturbs v by ~0.5% of vmax over the next 10 steps
    # in this developing-flow scene; gate at 1%
    va, vb = np.asarray(state_a.v), np.asarray(state_b.v)
    assert np.max(np.abs(va - vb)) < 1e-2 * max(np.max(np.abs(va)), 1e-12) + 1e-9


def test_variable_styles_index_loop_string():
    """index/loop/world/string variables (variable.cpp): single-partition
    first-value semantics, -var overrides winning, string substitution in
    ${} expansion; `next`/`jump` advancing stays a loud error."""
    from sph_bvf_tpu.api.lmp import LmpError

    script = SYNTHETIC.replace(
        "variable nx equal 12",
        "variable nx index 12 24\n"
        "variable it loop 5\n"
        "variable tag string caseA\n"
        "variable wrank world 0",
    ).replace("run 1000", "print ${tag}_${it}\nrun 1000")
    model = parse_script(script)
    assert model.variables["nx"] == 12.0   # first index value
    assert model.variables["it"] == 1.0    # loop starts at 1
    assert model.variables["wrank"] == 0.0

    # -var override wins (reference CLI behavior)
    model2 = parse_script(script, overrides={"nx": 8})
    assert model2.variables["nx"] == 8.0

    # the advancing machinery is not silently accepted
    import pytest as _pytest
    with _pytest.raises(LmpError):
        parse_script(script + "\nnext it\n")
