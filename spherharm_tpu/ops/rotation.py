"""Quaternion and rigid-body rotation primitives.

Conventions: quaternions are ``[w, x, y, z]`` (scalar first), unit norm,
representing the rotation that maps **body-frame** vectors to **world-frame**
vectors: ``v_world = R(q) v_body``.

These are the building blocks for the SH contact narrow phase (rotating
quadrature points between body frames; SURVEY.md section 3.3) and for the
quaternion rigid-body velocity-Verlet integrator (BASELINE.json:5).
All functions are shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)


def quat_multiply(a, b):
    """Hamilton product a*b, both [...,4] scalar-first."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate body-frame vector(s) v [...,3] into the world frame by q [...,4].

    Uses the expanded 15-mul form (cheaper than two quat products).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inv(q, v):
    """Rotate world-frame vector(s) into the body frame (R(q)^T v)."""
    w = q[..., 0:1]
    u = -q[..., 1:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_to_matrix(q):
    """Rotation matrix [...,3,3] with columns = body axes in world frame."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def quat_from_axis_angle(axis, angle):
    """Unit quaternion for a rotation of ``angle`` about unit ``axis``."""
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def omega_from_angmom(q, angmom, inertia_body):
    """World-frame angular velocity from world angmom and body principal inertia.

    omega_world = R(q) I_body^{-1} R(q)^T L_world.
    inertia_body: [...,3] principal moments (diagonal body-frame inertia).
    """
    L_body = quat_rotate_inv(q, angmom)
    w_body = L_body / jnp.maximum(inertia_body, 1e-30)
    return quat_rotate(q, w_body)


def quat_derivative(q, omega_world):
    """dq/dt = 0.5 * (0, omega_world) * q."""
    ow = jnp.zeros_like(omega_world[..., :1])
    oq = jnp.concatenate([ow, omega_world], axis=-1)
    return 0.5 * quat_multiply(oq, q)


def angles_from_unit(u):
    """(theta, phi) spherical angles of unit vectors u [...,3].

    theta in [0, pi] from +z, phi in [0, 2 pi).
    """
    theta = jnp.arccos(jnp.clip(u[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(u[..., 1], u[..., 0])
    phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
    return theta, phi
