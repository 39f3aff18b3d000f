"""Parity between the numpy setup twin (sh_np) and the traced SH core."""

import jax.numpy as jnp
import numpy as np

from spherharm_tpu.ops import sh_math, sh_np


def test_basis_twins_agree():
    rng = np.random.default_rng(0)
    theta = rng.uniform(0.05, np.pi - 0.05, 50)
    phi = rng.uniform(0, 2 * np.pi, 50)
    for lmax in (0, 3, 8):
        a = sh_np.real_sh_basis_np(theta, phi, lmax)
        b = np.asarray(
            sh_math.real_sh_basis(
                jnp.asarray(theta, jnp.float64), jnp.asarray(phi, jnp.float64), lmax
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)


def test_grad_twins_agree():
    rng = np.random.default_rng(1)
    theta = rng.uniform(0.1, np.pi - 0.1, 30)
    phi = rng.uniform(0, 2 * np.pi, 30)
    lmax = 6
    a = sh_np.real_sh_basis_grad_np(theta, phi, lmax)
    b = sh_math.real_sh_basis_grad(
        jnp.asarray(theta, jnp.float64), jnp.asarray(phi, jnp.float64), lmax
    )
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, np.asarray(y), rtol=1e-10, atol=1e-12)


def test_radius_table_twins_agree():
    rng = np.random.default_rng(2)
    lmax = 4
    c = rng.normal(size=(2, (lmax + 1) ** 2)) * 0.1
    c[:, 0] = 3.0
    a = sh_np.build_radius_table_np(c, lmax, 16, 32)
    b = np.asarray(sh_math.build_radius_table(
        jnp.asarray(c, jnp.float64), lmax, 16, 32))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_quadrature_twins_agree():
    a = sh_np.SphereQuadratureNp(8, 16)
    b = sh_math.SphereQuadrature(8, 16, dtype=jnp.float64)
    np.testing.assert_allclose(a.theta, np.asarray(b.theta))
    np.testing.assert_allclose(a.weights, np.asarray(b.weights))
    np.testing.assert_allclose(a.dirs, np.asarray(b.dirs))
    assert abs(a.weights.sum() - 4 * np.pi) < 1e-10
