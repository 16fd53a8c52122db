"""Lucy smoothing kernels in 1/2/3D.

The Lucy (1977) quartic kernel is

    W(r, h) = A_d * (1 + 3 r/h) * (1 - r/h)^3        for r < h, else 0

with normalization A_1 = 5/(4h), A_2 = 5/(pi h^2), A_3 = 105/(16 pi h^3).
The radial derivative factors as (1/r) dW/dr = -12 A_d (h - r)^2 / h^4,
which is the quantity ("wfd") SPH pair sums actually consume.

The reference hardcodes the same constants inline in every sweep
(pair_ssa_tsdpd_bvf_transport_velocity.cpp:204-241: gradient coefficients
-25.066903536973515383/h^7 in 3D, -19.098593171027440292/h^6 in 2D,
-15/h^5 in 1D; value coefficients 2.088908628081126 = 105/(16 pi) in 3D and
1.591549430918954 = 5/pi in 2D). Here they are derived analytically once.

All functions accept r (or rsq) and h broadcastable to any shape and return
0 beyond the support radius, so callers can evaluate entire padded neighbor
candidate blocks and rely on the built-in masking.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Normalization constants A_d for the Lucy kernel per dimension.
_A = {
    1: 5.0 / 4.0,  # * 1/h
    2: 5.0 / math.pi,  # * 1/h^2
    3: 105.0 / (16.0 * math.pi),  # * 1/h^3
}


def lucy_w(r, h, dim: int):
    """Kernel value W(r, h); zero for r >= h."""
    ih = 1.0 / h
    q = r * ih
    t = jnp.maximum(1.0 - q, 0.0)
    return (_A[dim] * ih**dim) * t * t * t * (1.0 + 3.0 * q)


def lucy_wfd(r, h, dim: int):
    """(1/r) dW/dr = -12 A_d (h-r)^2 / h^(dim+4) * h^2 ... i.e. -12 A_d (1-q)^2 / h^(dim+2).

    This is the "wfd" of the reference pair sweeps; it is negative inside the
    support and zero for r >= h.
    """
    ih = 1.0 / h
    q = r * ih
    t = jnp.maximum(1.0 - q, 0.0)
    return (-12.0 * _A[dim] * ih ** (dim + 2)) * t * t


def lucy_w_rsq(rsq, h, dim: int):
    """W from squared distance (saves a sqrt when caller already has rsq)."""
    return lucy_w(jnp.sqrt(rsq), h, dim)


def lucy_wfd_rsq(rsq, h, dim: int):
    return lucy_wfd(jnp.sqrt(rsq), h, dim)


def lucy_self_w(h, dim: int):
    """W(0, h) — the self-contribution used by Shepard-style density sums."""
    return _A[dim] / h**dim


def lucy_w_ih(r, ih, dim: int):
    """W(r) given the precomputed inverse support 1/h (no division)."""
    q = r * ih
    t = jnp.maximum(1.0 - q, 0.0)
    return (_A[dim] * ih**dim) * t * t * t * (1.0 + 3.0 * q)


def lucy_wfd_ih(r, ih, dim: int):
    """(1/r) dW/dr given 1/h (no division)."""
    q = r * ih
    t = jnp.maximum(1.0 - q, 0.0)
    return (-12.0 * _A[dim] * ih ** (dim + 2)) * t * t
