"""sph_bvf_tpu — a TPU-native SPH-BVF framework.

A from-scratch JAX/XLA/Pallas re-design of the physics in briandrawert/SPH-BVF
(a LAMMPS fork carrying the USER-SSA-TSDPD package): weakly-compressible SPH
with a transport-velocity formulation (Adami 2013), boundary-volume-fraction
(BVF) walls (Zhen Li 2018), linear-elastic solids with Jaumann-rate deviatoric
stress, deterministic reaction-diffusion of continuum species (tSDPD), and
stochastic (SSA) reaction-diffusion of integer species counts.

Design (TPU-first, not a port):

- Particle state lives in a dense *cell-slot* layout ``[ncells, cap, ...]``.
  Neighbor access is a static shift over the cell grid instead of pointer
  chasing through binned linked lists (reference: src/nbin_standard.cpp,
  src/npair_half_bin_newton.cpp). Shifts are compiler-visible, fuse into the
  pair kernels, and lower to ICI collective-permutes when the cell grid is
  sharded over a device mesh.
- Pair physics uses full (newton-off) interactions: every particle reduces
  over its own neighbor candidates; there are no scatter-adds and no reverse
  ghost communication (reference: comm_brick.cpp reverse_comm).  The
  reference's own FSI pair style already runs in full-list mode
  (pair_ssa_tsdpd_bvf_fsi.cpp:72-77), which establishes physics equivalence.
- The whole Verlet stage sequence (reference: verlet.cpp:240-353) is one
  jitted function, scanned with ``lax.scan``; host callbacks only at
  dump/thermo boundaries.
- Stochastic (SSA) reaction-diffusion is re-derived on counter-based
  ``jax.random`` so it is reproducible and parallel (the reference seeds from
  wall-clock, pair_ssa_tsdpd_bvf_transport_velocity.cpp:957, and refuses to
  run SSA on >1 rank, atom_vec_ssa_tsdpd_atomic.cpp:97).
"""

__version__ = "0.1.0"

from sph_bvf_tpu.core.state import State, Params, Geometry  # noqa: F401


def __getattr__(name):
    # lazy convenience exports (keep bare `import sph_bvf_tpu` light)
    if name == "Scene":
        from sph_bvf_tpu.api.scene import Scene

        return Scene
    if name == "Region":
        from sph_bvf_tpu.api.scene import Region

        return Region
    if name == "parse_script":
        from sph_bvf_tpu.api.lmp import parse_script

        return parse_script
    raise AttributeError(name)
