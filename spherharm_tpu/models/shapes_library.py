"""Shape pipeline: SH coefficient generation + per-type table precompute.

Covers the reference capability "SH coefficient tables" / per-shape
quadrature precompute (SURVEY.md section 2 B.2 SPHERHARM atom style:
"precomputed per-shape quadrature data: GL nodes/weights, per-node radii,
volume, inertia"). Everything here is setup-path (host, run-once); the
products are the dense tables the hot contact kernel consumes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from spherharm_tpu.core.state import Shapes
from spherharm_tpu.ops import sh_math
from spherharm_tpu.ops.sh_math import (
    SphereQuadrature,
    build_radius_table,
    n_coeffs,
    radius_from_basis,
    real_sh_basis,
    real_sh_basis_grad,
    sh_index,
)

SQRT4PI = math.sqrt(4.0 * math.pi)


def sphere_coeffs(radius: float, lmax: int) -> np.ndarray:
    """A sphere is the single l=0 coefficient a_00 = R * sqrt(4 pi)."""
    c = np.zeros(n_coeffs(lmax))
    c[0] = radius * SQRT4PI
    return c


def project_radius_fn(radius_fn, lmax: int, n_quad: int = 64) -> np.ndarray:
    """Project an arbitrary radius function r(theta, phi) onto the SH basis.

    a_nm = integral r(theta,phi) Y_nm dOmega (orthonormal basis).
    radius_fn: vectorized (theta[G], phi[G]) -> r[G].
    """
    q = SphereQuadrature(n_quad, 2 * n_quad, dtype=jnp.float32)
    Y = real_sh_basis(q.theta, q.phi, lmax)  # [G, NC]
    r = jnp.asarray(radius_fn(q.theta, q.phi))
    return np.asarray(jnp.sum(q.weights[:, None] * r[:, None] * Y, axis=0))


def ellipsoid_coeffs(a: float, b: float, c: float, lmax: int,
                     n_quad: int = 64) -> np.ndarray:
    """SH projection of an axis-aligned ellipsoid's polar radius.

    r(theta,phi) = (sin^2 t (cos^2 p / a^2 + sin^2 p / b^2)
                    + cos^2 t / c^2)^(-1/2).
    Principal axes align with the body frame by construction.
    """

    def fn(theta, phi):
        st2 = jnp.sin(theta) ** 2
        return 1.0 / jnp.sqrt(
            st2 * (jnp.cos(phi) ** 2 / a**2 + jnp.sin(phi) ** 2 / b**2)
            + jnp.cos(theta) ** 2 / c**2
        )

    return project_radius_fn(fn, lmax, n_quad)


def blob_coeffs(lmax: int, seed: int = 0, mean_radius: float = 1.0,
                roughness: float = 0.15, spectral_decay: float = 1.5,
                ) -> np.ndarray:
    """Random 'scanned-particle-like' smooth shape with diagonal inertia.

    Generates random coefficients restricted to the symmetry class
    r(t,p) = r(t,-p) = r(t,pi-p) = r(pi-t,p)  (three mirror symmetries:
    only m >= 0 even cosine terms with n+m even), which guarantees the
    body-frame inertia tensor is diagonal — so principal axes are the
    coordinate axes and no Wigner rotation of coefficients is needed.

    Amplitudes decay as n^{-spectral_decay}; total perturbation is scaled
    so min r stays >= (1 - 2*roughness) * mean_radius (star-convex, r > 0).
    """
    rng = np.random.default_rng(seed)
    c = np.zeros(n_coeffs(lmax))
    c[0] = mean_radius * SQRT4PI
    for n in range(2, lmax + 1):
        for m in range(0, n + 1, 2):
            if (n + m) % 2 != 0:
                continue
            amp = mean_radius * roughness / (n**spectral_decay)
            c[sh_index(n, m)] = rng.normal() * amp
    # Safety clamp: rescale perturbation if the surface dips too low.
    q = SphereQuadrature(48, 96)
    Y = real_sh_basis(q.theta, q.phi, lmax)
    r = np.asarray(radius_from_basis(jnp.asarray(c, jnp.float32), Y))
    rmin_target = (1.0 - 2.0 * roughness) * mean_radius
    pert_min = float(r.min()) - mean_radius
    if mean_radius + pert_min < rmin_target and pert_min < 0:
        s = (mean_radius - rmin_target) / (-pert_min)
        c[1:] *= s
    return c


def build_shapes(
    coeffs,
    lmax: int,
    density=1.0,
    contact_quad: tuple[int, int] | None = None,
    table_res: tuple[int, int] = (64, 128),
    setup_quad_n: int = 48,
    dtype=jnp.float32,
) -> Shapes:
    """Precompute all per-type tables and pack a ``Shapes`` pytree.

    coeffs: [T, (lmax+1)^2] array-like of real SH coefficients.
    contact_quad: (n_theta, n_phi) of the surface node set used by the
      contact kernel; defaults to ((lmax+1), 2*(lmax+1)) — Gauss-Legendre
      exact for the surface itself, kept deliberately leaner than the
      setup integrals ("high-order quadrature" configs raise it).
    """
    coeffs = jnp.asarray(np.atleast_2d(np.asarray(coeffs)), dtype)
    T = coeffs.shape[0]
    density = jnp.broadcast_to(jnp.asarray(density, dtype), (T,))

    # Contact node set (rides in the hot loop).
    if contact_quad is None:
        contact_quad = (max(lmax + 1, 4), 2 * max(lmax + 1, 4))
    cq = SphereQuadrature(contact_quad[0], contact_quad[1], dtype=dtype)
    Y, dYt, dYp = real_sh_basis_grad(cq.theta, cq.phi, lmax)

    def per_type_nodes(c):
        r = radius_from_basis(c, Y)
        drt = radius_from_basis(c, dYt)
        drp = radius_from_basis(c, dYp)
        nrm = sh_math.surface_normal(r, drt, drp, cq.theta, cq.phi)
        cos_ang = jnp.clip(jnp.sum(nrm * cq.dirs, axis=-1), 0.05, 1.0)
        area = cq.weights * r**2 / cos_ang
        return r, nrm, area

    node_r, node_normals, node_area = jax.vmap(per_type_nodes)(coeffs)

    # High-order setup quadrature for volume / inertia / rmax.
    sq = SphereQuadrature(setup_quad_n, 2 * setup_quad_n, dtype=dtype)
    Ys = real_sh_basis(sq.theta, sq.phi, lmax)

    def per_type_integrals(c):
        r = radius_from_basis(c, Ys)
        vol = jnp.sum(sq.weights * r**3) / 3.0
        w5 = sq.weights * r**5 / 5.0
        nn = sq.dirs[:, :, None] * sq.dirs[:, None, :]
        inertia_full = jnp.sum(
            w5[:, None, None] * (jnp.eye(3, dtype=dtype) - nn), axis=0
        )
        rmax = jnp.max(r) * 1.01
        return vol, inertia_full, rmax

    vol, inertia_full, rmax = jax.vmap(per_type_integrals)(coeffs)
    off = np.asarray(
        jnp.abs(inertia_full - inertia_full * jnp.eye(3)[None]).max(axis=(1, 2))
    )
    diag = np.asarray(jax.vmap(jnp.diag)(inertia_full))
    if np.any(off > 1e-3 * diag.max(axis=-1)):
        raise ValueError(
            "Shape inertia tensor is not diagonal — shapes must be given in "
            f"their principal frame (max off-diagonal/diag: {float((off / diag.max(-1)).max()):.2e})."
        )

    table = build_radius_table(coeffs, lmax, table_res[0], table_res[1])

    return Shapes(
        lmax=lmax,
        coeffs=coeffs,
        quad_theta=cq.theta,
        quad_phi=cq.phi,
        quad_w=cq.weights,
        quad_dirs=cq.dirs,
        node_r=node_r,
        node_normals=node_normals,
        node_area=node_area,
        table=jnp.asarray(table, dtype),
        rmax=rmax,
        rchar=coeffs[:, 0] / SQRT4PI,
        vol=vol,
        inertia=jnp.asarray(diag, dtype),
        density=density,
    )
