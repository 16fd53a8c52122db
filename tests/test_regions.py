"""Region styles (region_{block,sphere,cylinder,cone,plane,prism,union,
intersect}.cpp) — geometric containment unit tests, plus the .lmp
`region` command surface including `side out`."""

import numpy as np

from sph_bvf_tpu.api.scene import Region


def pts(*rows):
    return np.asarray(rows, dtype=float)


def test_block_inclusive_edges():
    r = Region.block(0, 1, 0, 2, 0, 3)
    x = pts((0, 0, 0), (1, 2, 3), (0.5, 1, 1), (1.001, 0, 0))
    assert r.contains(x).tolist() == [True, True, True, False]


def test_sphere():
    r = Region.sphere(1, 1, 1, 0.5)
    x = pts((1, 1, 1), (1.5, 1, 1), (1.51, 1, 1))
    assert r.contains(x).tolist() == [True, True, False]


def test_cylinder_axis_mapping():
    # axis z: c1,c2 = (x,y) center; lo/hi bound z (region_cylinder.cpp)
    r = Region.cylinder("z", 1.0, 2.0, 0.5, -1.0, 1.0)
    x = pts((1, 2, 0), (1.4, 2, 0), (1.6, 2, 0), (1, 2, 1.5), (1, 2.4, -0.9))
    assert r.contains(x).tolist() == [True, True, False, False, True]
    # axis x: c1,c2 = (y,z)
    r = Region.cylinder("x", 0.0, 0.0, 1.0, 0.0, 5.0)
    x = pts((2, 0.5, 0.5), (2, 1.5, 0), (-0.1, 0, 0))
    assert r.contains(x).tolist() == [True, False, False]


def test_cone_linear_radius():
    # radius 0 at z=0 growing to 1 at z=1
    r = Region.cone("z", 0.0, 0.0, 0.0, 1.0, 0.0, 1.0)
    x = pts((0.05, 0, 0.1), (0.5, 0, 0.25), (0.45, 0, 0.5), (0.99, 0, 1.0))
    assert r.contains(x).tolist() == [True, False, True, True]


def test_plane_halfspace():
    # plane through origin, normal +x: inside = x >= 0
    r = Region.plane(0, 0, 0, 1, 0, 0)
    x = pts((0.5, 9, -9), (0, 0, 0), (-0.01, 0, 0))
    assert r.contains(x).tolist() == [True, True, False]


def test_prism_tilt():
    # unit cube sheared by xy=0.5: x range at y is [y*0.5, 1 + y*0.5]
    r = Region.prism(0, 1, 0, 1, 0, 1, 0.5, 0.0, 0.0)
    x = pts((0.25, 0, 0.5), (1.25, 1, 0.5), (0.25, 1, 0.5), (1.45, 0.9, 0.5))
    assert r.contains(x).tolist() == [True, True, False, True]


def test_prism_degenerate_z_2d():
    r = Region.prism(0, 1, 0, 1, 0, 0, 0.0, 0.0, 0.0)
    x = pts((0.5, 0.5, 0.0), (0.5, 0.5, 0.5))
    got = r.contains(x)
    assert got[0]
    assert not got[1]


def test_union_intersect_algebra():
    a = Region.sphere(0, 0, 0, 1.0)
    b = Region.sphere(1.5, 0, 0, 1.0)
    u = Region.union(a, b)
    i = Region.intersect(a, b)
    x = pts((0, 0, 0), (1.5, 0, 0), (0.75, 0, 0), (3.0, 0, 0))
    assert u.contains(x).tolist() == [True, True, True, False]
    assert i.contains(x).tolist() == [False, False, True, False]


def test_lmp_region_styles_and_side_out():
    from sph_bvf_tpu.api.lmp import parse_script

    script = """
dimension          2
units              si
atom_style         ssa_tsdpd/atomic 0 0 0
boundary           f f p
region             box block 0 1 0 1 -0.005 0.005
create_box         1 box
lattice            sq 0.1
region             cyl cylinder z 0.5 0.5 0.25 EDGE EDGE
region             notcyl cylinder z 0.5 0.5 0.25 EDGE EDGE side out
region             both union 2 cyl notcyl
create_atoms       1 region both
mass               1 1.0
set                group all ssa_tsdpd/rho 1.0
pair_style         ssa_tsdpd/bvf/transportVelocity
pair_coeff         1 1 1.0 10.0 0.01 0.25 0.25 0.0
fix                integ all ssa_tsdpd/bvf/transportVelocity
timestep           1e-4
run                0
"""
    model = parse_script(script)
    sc = model.scene
    # cyl + (side out) covers the whole box: every lattice site created
    n = sum(a.reshape(-1, 3).shape[0] for a in sc._x)
    assert n == 100
