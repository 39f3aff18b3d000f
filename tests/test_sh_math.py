"""Unit oracle tests for the SH math core (SURVEY.md section 4.3:
"math_sh module vs scipy.special")."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import sph_harm_y

from spherharm_tpu.models import shapes_library as shapes_lib
from spherharm_tpu.ops import sh_math


def scipy_real_sh(n, m, theta, phi):
    """Real, fully-normalized, no-Condon-Shortley SH from scipy's complex Y."""
    if m == 0:
        return np.real(sph_harm_y(n, 0, theta, phi))
    if m > 0:
        return math.sqrt(2.0) * (-1) ** m * np.real(sph_harm_y(n, m, theta, phi))
    return math.sqrt(2.0) * (-1) ** (-m) * np.imag(sph_harm_y(n, -m, theta, phi))


@pytest.mark.parametrize("lmax", [0, 2, 5, 8])
def test_basis_matches_scipy(lmax):
    rng = np.random.default_rng(0)
    theta = rng.uniform(0.05, np.pi - 0.05, 40)
    phi = rng.uniform(0, 2 * np.pi, 40)
    Y = np.asarray(
        sh_math.real_sh_basis(
            jnp.asarray(theta, jnp.float64), jnp.asarray(phi, jnp.float64), lmax
        )
    )
    for n in range(lmax + 1):
        for m in range(-n, n + 1):
            ref = scipy_real_sh(n, m, theta, phi)
            got = Y[:, sh_math.sh_index(n, m)]
            np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_basis_orthonormal():
    lmax = 6
    q = sh_math.default_quadrature(lmax, oversample=2, dtype=jnp.float64)
    Y = sh_math.real_sh_basis(q.theta, q.phi, lmax)
    gram = np.asarray(jnp.einsum("g,gi,gj->ij", q.weights, Y, Y))
    np.testing.assert_allclose(gram, np.eye(sh_math.n_coeffs(lmax)), atol=1e-10)


def test_basis_grad_matches_finite_difference():
    lmax = 6
    rng = np.random.default_rng(1)
    theta = jnp.asarray(rng.uniform(0.2, np.pi - 0.2, 30), jnp.float64)
    phi = jnp.asarray(rng.uniform(0, 2 * np.pi, 30), jnp.float64)
    Y, dYt, dYp = sh_math.real_sh_basis_grad(theta, phi, lmax)
    eps = 1e-6
    fd_t = (
        sh_math.real_sh_basis(theta + eps, phi, lmax)
        - sh_math.real_sh_basis(theta - eps, phi, lmax)
    ) / (2 * eps)
    fd_p = (
        sh_math.real_sh_basis(theta, phi + eps, lmax)
        - sh_math.real_sh_basis(theta, phi - eps, lmax)
    ) / (2 * eps)
    np.testing.assert_allclose(np.asarray(dYt), np.asarray(fd_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dYp), np.asarray(fd_p), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(Y),
        np.asarray(sh_math.real_sh_basis(theta, phi, lmax)),
        rtol=1e-12,
    )


def test_sphere_volume_inertia():
    lmax, R = 4, 1.7
    c = jnp.asarray(shapes_lib.sphere_coeffs(R, lmax), jnp.float64)
    q = sh_math.default_quadrature(lmax + 2, dtype=jnp.float64)
    vol = float(sh_math.shape_volume(c, q.theta, q.phi, q.weights, lmax))
    assert vol == pytest.approx(4.0 / 3.0 * np.pi * R**3, rel=1e-8)
    inertia = np.asarray(
        sh_math.shape_inertia(c, q.theta, q.phi, q.weights, q.dirs, lmax)
    )
    # Unit density: I = (2/5) M R^2, M = rho * V.
    expect = 0.4 * vol * R**2
    np.testing.assert_allclose(
        inertia, expect * np.eye(3), rtol=1e-8, atol=1e-10 * expect
    )


def test_ellipsoid_volume_inertia():
    lmax = 8
    a, b, c_ = 1.0, 0.7, 0.5
    coef = jnp.asarray(shapes_lib.ellipsoid_coeffs(a, b, c_, lmax), jnp.float64)
    q = sh_math.default_quadrature(lmax + 4, dtype=jnp.float64)
    vol = float(sh_math.shape_volume(coef, q.theta, q.phi, q.weights, lmax))
    # SH truncation at lmax=8 approximates the ellipsoid to ~0.1%.
    assert vol == pytest.approx(4.0 / 3.0 * np.pi * a * b * c_, rel=2e-3)
    inertia = np.asarray(
        sh_math.shape_inertia(coef, q.theta, q.phi, q.weights, q.dirs, lmax)
    )
    M = vol
    expect = M / 5.0 * np.array([b**2 + c_**2, a**2 + c_**2, a**2 + b**2])
    np.testing.assert_allclose(np.diag(inertia), expect, rtol=2e-2)
    off = inertia - np.diag(np.diag(inertia))
    assert np.abs(off).max() < 1e-6 * np.diag(inertia).max()


def test_radius_table_interp():
    lmax = 6
    coef = jnp.asarray(
        shapes_lib.blob_coeffs(lmax, seed=3, roughness=0.2), jnp.float64
    )
    table = sh_math.build_radius_table(coef, lmax, n_theta=128, n_phi=256)
    rng = np.random.default_rng(2)
    theta = jnp.asarray(rng.uniform(0.1, np.pi - 0.1, 200), jnp.float64)
    phi = jnp.asarray(rng.uniform(0, 2 * np.pi, 200), jnp.float64)
    r_i, drt_i, drp_i = sh_math.interp_radius(table, theta, phi)
    Y, dYt, dYp = sh_math.real_sh_basis_grad(theta, phi, lmax)
    r = sh_math.radius_from_basis(coef, Y)
    drt = sh_math.radius_from_basis(coef, dYt)
    np.testing.assert_allclose(np.asarray(r_i), np.asarray(r), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(drt_i), np.asarray(drt), atol=5e-3 * float(jnp.abs(drt).max() + 1)
    )


def test_phi_wraparound_interp():
    lmax = 4
    coef = jnp.asarray(shapes_lib.blob_coeffs(lmax, seed=5), jnp.float64)
    table = sh_math.build_radius_table(coef, lmax, n_theta=64, n_phi=128)
    th = jnp.asarray([1.0, 1.0], jnp.float64)
    ph = jnp.asarray([0.0, 2 * np.pi - 1e-9], jnp.float64)
    r, _, _ = sh_math.interp_radius(table, th, ph)
    assert abs(float(r[0] - r[1])) < 1e-4


def test_blob_star_convex():
    lmax = 8
    coef = jnp.asarray(shapes_lib.blob_coeffs(lmax, seed=11, roughness=0.25))
    q = sh_math.SphereQuadrature(64, 128)
    Y = sh_math.real_sh_basis(q.theta, q.phi, lmax)
    r = sh_math.radius_from_basis(coef, Y)
    assert float(jnp.min(r)) > 0.2  # strictly positive radius everywhere


def test_build_shapes_tables():
    lmax = 4
    coeffs = np.stack(
        [
            shapes_lib.sphere_coeffs(1.0, lmax),
            shapes_lib.ellipsoid_coeffs(1.0, 0.8, 0.6, lmax),
        ]
    )
    sh = shapes_lib.build_shapes(coeffs, lmax, density=2.0)
    assert sh.n_types == 2
    assert sh.node_r.shape == (2, sh.n_nodes)
    assert float(sh.rchar[0]) == pytest.approx(1.0, rel=1e-6)
    assert float(sh.vol[0]) == pytest.approx(4 / 3 * np.pi, rel=1e-4)
    # Sphere normals point radially outward.
    dots = jnp.sum(sh.node_normals[0] * sh.quad_dirs, axis=-1)
    assert float(jnp.min(dots)) > 0.999
    # Mass/inertia helpers include scale laws.
    m = sh.mass_of(jnp.asarray([0]), jnp.asarray([2.0]))
    assert float(m[0]) == pytest.approx(2.0 * 4 / 3 * np.pi * 8.0, rel=1e-4)
