#!/usr/bin/env python
"""Steady-state lid cavity vs Ghia, Ghia & Shin (1982) — the paper's
headline physics validation.  Runs 250k steps (t=25) at N=100, Re=100 and
prints the centerline u-velocity against the reference solution values.
Results recorded in VALIDATION.md."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp, time
from sph_bvf_tpu.core.stepper import run_chunk, setup
from sph_bvf_tpu.core.state import gather_particles
from sph_bvf_tpu.models import lid_cavity

STEPS = int(os.environ.get("GHIA_STEPS", "250000"))       # t = dt * STEPS
PROFILE_EVERY = int(os.environ.get("GHIA_PROFILE_EVERY", "250000"))
RE = int(os.environ.get("GHIA_RE", "100"))     # 100 or 1000 (both are
N = int(os.environ.get("GHIA_N", "100"))       # reference example configs)

# Ghia, Ghia & Shin (1982), Table I: u through the vertical centerline.
ys = np.array([0.9766, 0.8516, 0.7344, 0.5000, 0.2813, 0.1016, 0.0547])
GHIA_U = {
    100: [0.84123, 0.23151, 0.00332, -0.20581, -0.15662, -0.06434, -0.03717],
    1000: [0.65928, 0.33304, 0.18719, -0.06080, -0.27805, -0.29730, -0.18109],
}
ghia = np.array(GHIA_U[RE])
# dt per the reference's own example scripts (1e-4 at Re100, 8e-5 at Re1000)
dt = {100: 1e-4, 1000: 8e-5}[RE]

state, params, spec, sc = lid_cavity.build(N=N, Re=float(RE), rebin_every=10)
state = setup(state, params, spec, dt=dt)
t0 = time.perf_counter()
dx = 1.0 / N


def profile(state):
    out = gather_particles(state, spec.geom, fields=("x", "v", "solid_tag"))
    fl = out["solid_tag"] == 0
    x, v = out["x"][fl], out["v"][fl]
    errs = []
    for y, g in zip(ys, ghia):
        w = np.exp(-(((x[:,0]-0.5)**2 + (x[:,1]-y)**2) / (1.5*dx)**2))
        u = (w * v[:,0]).sum() / w.sum()
        errs.append(abs(u-g))
        print(f"y={y:.4f}  u_ours={u:+.5f}  u_ghia={g:+.5f}  diff={u-g:+.4f}",
              flush=True)
    print(f"steps={int(state.step)}: max|diff| = {max(errs):.4f} of U0=1",
          flush=True)


done = 0
while done < STEPS:
    for _ in range(2500):  # 25k-step progress blocks
        state = run_chunk(state, params, spec, 10)
    done += 25000
    _ = float(jnp.sum(state.rho))
    print(f"steps={int(state.step)} wall={time.perf_counter()-t0:.0f}s "
          f"overflow={int(state.overflow)}", flush=True)
    if done % PROFILE_EVERY == 0:
        profile(state)
