"""The four paper-example model families (examples/ssa-tsdpd in the reference).

Each module exposes ``build(...) -> (state, params, spec, scene)``.
"""

from sph_bvf_tpu.models import (  # noqa: F401
    cell_polarization,
    fsi,
    lid_cavity,
    lid_cavity3d,
    natural_convection,
)

REGISTRY = {
    "lid_cavity": lid_cavity.build,
    "lid_cavity3d": lid_cavity3d.build,
    "natural_convection": natural_convection.build,
    "fsi": fsi.build,
    "cell_polarization": cell_polarization.build,
}
