"""Equation of state.

The reference uses a linearized Tait EOS everywhere:

    P = 7 B (rho/rho0 - 1),   with  B = c0^2 rho0 / 7

(pair_ssa_tsdpd_bvf_transport_velocity.cpp:185,299 for the pressure, :981 for
B in coeff()).  Algebraically P = c0^2 (rho - rho0); we keep the 7B form so
coefficient tables stay structurally comparable with the reference.
"""

from __future__ import annotations


def tait_b(c0, rho0):
    """B = c0^2 rho0 / 7 (reference coeff(), pair...transport_velocity.cpp:981)."""
    return c0 * c0 * rho0 / 7.0


def tait_pressure(rho, rho0, b):
    """P = 7 B (rho/rho0 - 1)."""
    return 7.0 * b * (rho / rho0 - 1.0)
