"""Unit tests for the Lucy kernel & EOS against the reference's hardcoded forms.

Reference forms (pair_ssa_tsdpd_bvf_transport_velocity.cpp:204-241):
  3D: wfd = -25.066903536973515383 (h-r)^2 / h^7
      wf  =   2.088908628081126    (h-r)^3 (h+3r) / h^7
  2D: wfd = -19.098593171027440292 (h-r)^2 / h^6
      wf  =   1.591549430918954    (h-r)^3 (h+3r) / h^6
  1D: wfd = -15 (h-r)^2 / h^5
      wf  = (5/4)/h (1-r/h)^3 (1+3r/h)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_bvf_tpu.ops.kernels import lucy_w, lucy_wfd
from sph_bvf_tpu.ops.eos import tait_b, tait_pressure

jax.config.update("jax_enable_x64", True)


def ref_wf(r, h, dim):
    if dim == 3:
        return 2.088908628081126 * (h - r) ** 3 * (h + 3 * r) / h**7
    if dim == 2:
        return 1.591549430918954 * (h - r) ** 3 * (h + 3 * r) / h**6
    return (5.0 / 4.0) / h * (1 - r / h) ** 3 * (1 + 3 * r / h)


def ref_wfd(r, h, dim):
    if dim == 3:
        return -25.066903536973515383 * (h - r) ** 2 / h**7
    if dim == 2:
        return -19.098593171027440292 * (h - r) ** 2 / h**6
    return -15.0 * (h - r) ** 2 / h**5


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_matches_reference_constants(dim):
    h = 0.05
    r = np.linspace(0.0, h * 0.999, 100)
    np.testing.assert_allclose(
        np.asarray(lucy_w(jnp.float64(r), h, dim)), ref_wf(r, h, dim), rtol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(lucy_wfd(jnp.float64(r), h, dim)), ref_wfd(r, h, dim), rtol=1e-11
    )


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_compact_support(dim):
    h = 1.3
    r = np.array([h, 1.01 * h, 5 * h])
    assert np.all(np.asarray(lucy_w(jnp.asarray(r), h, dim)) == 0.0)
    assert np.all(np.asarray(lucy_wfd(jnp.asarray(r), h, dim)) == 0.0)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_unit_normalization(dim):
    """Integral of W over R^dim must be 1."""
    h = 0.7
    n = 4001
    r = np.linspace(0, h, n)
    w = np.asarray(lucy_w(jnp.float64(r), h, dim))
    if dim == 1:
        integral = 2 * np.trapezoid(w, r)
    elif dim == 2:
        integral = np.trapezoid(2 * np.pi * r * w, r)
    else:
        integral = np.trapezoid(4 * np.pi * r**2 * w, r)
    assert abs(integral - 1.0) < 1e-6


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_gradient_consistency(dim):
    """wfd must equal (1/r) dW/dr."""
    h = 0.9
    r = jnp.linspace(0.05 * h, 0.95 * h, 50, dtype=jnp.float64)
    dw = jax.vmap(jax.grad(lambda rr: lucy_w(rr, h, dim)))(r)
    np.testing.assert_allclose(
        np.asarray(dw / r), np.asarray(lucy_wfd(r, h, dim)), rtol=1e-9
    )


def test_tait_eos():
    rho0, c0 = 1.0, 10.0
    b = tait_b(c0, rho0)
    assert abs(b - c0 * c0 * rho0 / 7.0) < 1e-15
    # P = 7B(rho/rho0 - 1) == c0^2 (rho - rho0)
    rho = np.linspace(0.9, 1.1, 11)
    np.testing.assert_allclose(
        np.asarray(tait_pressure(jnp.float64(rho), rho0, b)),
        c0**2 * (rho - rho0),
        rtol=1e-12,
    )
