"""VTK IO: native C++ writer vs the pure-Python spec, and reader roundtrip."""

import os

import numpy as np
import pytest

from sph_bvf_tpu.io.vtk import _load_native, read_vtk, write_vtk


def _sample(n=257):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    data = {
        "id": np.arange(1, n + 1, dtype=np.int32),
        "type": rng.integers(1, 3, n).astype(np.int32),
        "c_rhoatom": rng.uniform(0.9, 1.1, n).astype(np.float32),
    }
    return pts, data


def test_python_writer_roundtrip(tmp_path):
    pts, data = _sample()
    p = os.path.join(tmp_path, "a.vtk")
    write_vtk(p, pts, data, native=False)
    rpts, rdata = read_vtk(p)
    np.testing.assert_allclose(rpts, pts, atol=1e-6)
    for k in data:
        np.testing.assert_allclose(rdata[k], data[k], atol=1e-6)


@pytest.mark.skipif(_load_native() is None, reason="no C++ toolchain")
def test_native_matches_python(tmp_path):
    pts, data = _sample()
    pn = os.path.join(tmp_path, "native.vtk")
    pp = os.path.join(tmp_path, "python.vtk")
    assert write_vtk(pn, pts, data, native=True) is None
    write_vtk(pp, pts, data, native=False)
    a, b = read_vtk(pn), read_vtk(pp)
    np.testing.assert_allclose(a[0], b[0], atol=1e-7)
    for k in data:
        np.testing.assert_allclose(a[1][k], b[1][k], atol=1e-7)


@pytest.mark.skipif(_load_native() is None, reason="no C++ toolchain")
def test_native_binary_readable_by_numpy(tmp_path):
    """Binary legacy VTK: spot-check the header and big-endian payload."""
    pts, data = _sample(8)
    p = os.path.join(tmp_path, "b.vtk")
    write_vtk(p, pts, data, native=True, binary=True)
    raw = open(p, "rb").read()
    assert b"BINARY" in raw and b"POINTS 8 float" in raw
    off = raw.index(b"POINTS 8 float\n") + len(b"POINTS 8 float\n")
    got = np.frombuffer(raw[off : off + 8 * 3 * 4], dtype=">f4").reshape(8, 3)
    np.testing.assert_allclose(got, pts, atol=1e-7)


def test_xml_vtp_vtu_writers(tmp_path):
    """write_vtp/write_vtu (dump_vtk.cpp:1348,1412 analogs): well-formed XML,
    round-trippable points and point data, ascii and base64-binary."""
    import base64
    import xml.etree.ElementTree as ET

    from sph_bvf_tpu.io.vtk import write_auto, write_vtp, write_vtu

    pts = np.random.RandomState(0).rand(17, 3).astype(np.float32)
    pd = {
        "id": np.arange(17, dtype=np.int32),
        "rho": np.linspace(1, 2, 17).astype(np.float32),
        "vel": np.random.RandomState(1).rand(17, 3).astype(np.float32),
    }

    def decode(el, dtype):
        if el.attrib["format"] == "binary":
            raw = base64.b64decode(el.text.strip())
            nbytes = np.frombuffer(raw[:4], "<u4")[0]
            return np.frombuffer(raw[4 : 4 + nbytes], dtype)
        return np.array(el.text.split(), dtype=dtype)

    for binary in (False, True):
        for ext in ("vtp", "vtu"):
            path = str(tmp_path / f"t{binary}.{ext}")
            write_auto(path, pts, pd, binary=binary)
            root = ET.parse(path).getroot()
            arrays = {
                el.attrib.get("Name"): el for el in root.iter("DataArray")
            }
            np.testing.assert_allclose(
                decode(arrays["Points"], "<f4").reshape(-1, 3), pts, rtol=1e-6
            )
            np.testing.assert_array_equal(
                decode(arrays["id"], "<i4"), pd["id"]
            )
            np.testing.assert_allclose(
                decode(arrays["vel"], "<f4").reshape(-1, 3), pd["vel"],
                rtol=1e-6,
            )
            if ext == "vtu":
                np.testing.assert_array_equal(
                    decode(arrays["types"], "<i4"), np.ones(17, np.int32)
                )


def test_parallel_collection_writers(tmp_path):
    """write_pvtp/write_pvtu (dump_vtk.cpp:1281,1412 parallel branches):
    the summary references a piece file that round-trips the data."""
    import xml.etree.ElementTree as ET

    from sph_bvf_tpu.io.vtk import write_auto

    pts = np.random.RandomState(2).rand(9, 3).astype(np.float32)
    pd = {"id": np.arange(9, dtype=np.int32),
          "vel": np.random.RandomState(3).rand(9, 3).astype(np.float32)}
    for ext in ("pvtp", "pvtu"):
        path = str(tmp_path / f"c.{ext}")
        write_auto(path, pts, pd)
        root = ET.parse(path).getroot()
        pieces = [el.attrib["Source"] for el in root.iter("Piece")]
        assert len(pieces) == 1
        declared = {el.attrib["Name"] for el in root.iter("PDataArray")}
        assert {"Points", "id", "vel"} <= declared
        piece = ET.parse(str(tmp_path / pieces[0])).getroot()
        arrays = {el.attrib.get("Name"): el for el in piece.iter("DataArray")}
        got = np.array(arrays["Points"].text.split(), "<f4").reshape(-1, 3)
        np.testing.assert_allclose(got, pts, rtol=1e-6)
        np.testing.assert_array_equal(
            np.array(arrays["id"].text.split(), "<i4"), pd["id"]
        )


def test_dump_custom_text_format(tmp_path):
    """`dump custom` writes the reference's text dump format (readable by
    LAMMPS tooling and by tools/golden_compare.read_dump_custom)."""
    from sph_bvf_tpu.api.lmp import parse_script

    script = f"""
dimension 2
units si
atom_style ssa_tsdpd/atomic 0 0 0
boundary f f p
region box block 0 1 0 1 -0.05 0.05 units box
create_box 1 box
lattice sq 0.1 origin 0.5 0.5 0.0
create_atoms 1 region box
mass 1 0.01
set group all ssa_tsdpd/rho 1000
set group all ssa_tsdpd/e 0.
pair_style ssa_tsdpd/bvf/transportVelocity
pair_coeff 1 1 1000 0.1 1e-3 0.25 0.25 0
fix integration all ssa_tsdpd/bvf/transportVelocity
compute rhoatom all ssa_tsdpd/rho/atom
dump dmp all custom 5 {tmp_path}/d_*.txt id type x y vx c_rhoatom
timestep 1e-5
run 5
"""
    model = parse_script(script)
    model.run(out_dir=str(tmp_path), thermo=False)
    path = tmp_path / "d_5.txt"
    assert path.exists()
    lines = path.read_text().splitlines()
    assert lines[0] == "ITEM: TIMESTEP" and lines[1] == "5"
    n = int(lines[lines.index("ITEM: NUMBER OF ATOMS") + 1])
    assert n == 100
    hdr = next(l for l in lines if l.startswith("ITEM: ATOMS"))
    assert hdr.split()[2:] == ["id", "type", "x", "y", "vx", "c_rhoatom"]
    row = lines[lines.index(hdr) + 1].split()
    assert len(row) == 6 and float(row[5]) > 0
