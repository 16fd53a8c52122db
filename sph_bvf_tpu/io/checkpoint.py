"""Checkpoint / resume — the analog of write_restart / read_restart.

The reference packs x, v, tag, type, mask, image, rho, e, cv, vest, C, Cd
and the SSA matrices per atom (atom_vec_ssa_tsdpd_atomic.cpp:1668
pack_restart) into a binary restart file, but does NOT save RNG state — and
its pair styles seed from wall clock (srand(clock()),
pair_ssa_tsdpd_bvf_transport_velocity.cpp:957), so a reference resume is not
reproducible.  Here the checkpoint is the full State pytree (every
per-particle field plus step, dt, PRNG key, overflow counter), so resume is
bitwise identical to an uninterrupted run.

Format: a single .npz per checkpoint (portable, no external deps), with the
geometry fingerprint stored for shape validation on load.  ``save`` /
``load`` round-trip any State regardless of sharding (arrays are fetched to
host); re-shard after load with parallel.mesh.shard_state.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from sph_bvf_tpu.core.state import Geometry, State

_FORMAT_VERSION = 1


def _geom_meta(geom: Geometry) -> dict:
    return dict(
        version=_FORMAT_VERSION,
        dim=geom.dim,
        lo=list(geom.lo),
        hi=list(geom.hi),
        ncells=list(geom.ncells),
        cell_size=list(geom.cell_size),
        cap=geom.cap,
        periodic=list(geom.periodic),
        drift_budget=geom.drift_budget,
        base_occ=geom.base_occ,
        x_edges=list(geom.x_edges) if geom.x_edges is not None else None,
        x_quantum=geom.x_quantum,
        cutoff=geom.cutoff,
    )


def save(path: str, state: State, geom: Geometry) -> None:
    """Write the full state (incl. step, dt, RNG key) to ``path`` (.npz)."""
    arrays = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(_geom_meta(geom)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load(path: str, geom: Geometry) -> State:
    """Read a checkpoint; validates the geometry fingerprint."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        want = _geom_meta(geom)
        for k in ("dim", "ncells", "cap"):
            if meta[k] != want[k]:
                raise ValueError(
                    f"checkpoint geometry mismatch: {k}={meta[k]} vs {want[k]}"
                )
        kwargs = {
            f.name: jnp.asarray(z[f.name]) for f in dataclasses.fields(State)
        }
    return State(**kwargs)


def load_with_geometry(path: str):
    """read_restart analog (read_restart.cpp): rebuild the Geometry from the
    checkpoint's own metadata, so a resume needs no scene re-construction.
    Returns (state, geom)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        geom = Geometry(
            dim=meta["dim"],
            lo=tuple(meta["lo"]),
            hi=tuple(meta["hi"]),
            ncells=tuple(meta["ncells"]),
            cell_size=tuple(meta["cell_size"]),
            cap=meta["cap"],
            periodic=tuple(meta["periodic"]),
            drift_budget=meta.get("drift_budget", 0.0),
            base_occ=int(meta.get("base_occ", 0)),
            x_edges=(
                tuple(meta["x_edges"])
                if meta.get("x_edges") is not None
                else None
            ),
            x_quantum=float(meta.get("x_quantum", 0.0)),
            cutoff=float(meta.get("cutoff", 0.0)),
        )
        kwargs = {
            f.name: jnp.asarray(z[f.name]) for f in dataclasses.fields(State)
        }
    return State(**kwargs), geom


class Restart:
    """Periodic checkpointing, like the `restart N file` command
    (output.cpp:86-91).  Call from the simulate() callback."""

    def __init__(self, every: int, path_template: str, geom: Geometry):
        self.every = every
        self.path_template = path_template
        self.geom = geom

    def __call__(self, state: State):
        step = int(state.step)
        if step % self.every == 0:
            save(self.path_template.format(step=step), state, self.geom)
