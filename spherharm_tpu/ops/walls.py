"""Granular wall contacts for SH particles (planes, rotating cylinders).

TPU-native equivalent of the reference's ``fix wall/gran`` + wall regions
(SURVEY.md section 2 B.5: "container walls (box, rotating drum of config
4) with the same Hertz/friction contact law"). Walls use the same
quadrature-integral overlap (area / volume / centroid over the particle's
surface nodes beyond the wall) and the same Hertz + history-friction law
as the pair kernel, with the wall as an infinite-mass flat partner.

Walls are pytree dataclasses: the wall *kind* is the pytree structure
(fixes the traced code) while its parameters are array leaves, so wall
position / spin can change without recompilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from spherharm_tpu.ops.rotation import omega_from_angmom, quat_rotate


@struct.dataclass
class PlaneWall:
    """Half-space wall: particles confined to the side ``normal`` points to.

    depth(p) = -(p - point) . normal  (> 0 means p penetrates the wall).
    ``velocity`` is the wall's surface velocity (conveyor-style).
    """

    point: jax.Array
    normal: jax.Array
    velocity: jax.Array

    @classmethod
    def create(cls, point, normal, velocity=(0.0, 0.0, 0.0), dtype=jnp.float32):
        n = jnp.asarray(normal, dtype)
        return cls(
            point=jnp.asarray(point, dtype),
            normal=n / jnp.linalg.norm(n),
            velocity=jnp.asarray(velocity, dtype),
        )

    def depth_and_normal(self, p):
        depth = -jnp.sum((p - self.point) * self.normal, axis=-1)
        n = jnp.broadcast_to(self.normal, p.shape)
        return depth, n

    def surface_velocity(self, c):
        return jnp.broadcast_to(self.velocity, c.shape)


@struct.dataclass
class CylinderWall:
    """Inside of a (possibly rotating) cylinder — the drum of config 4.

    Axis through ``axis_point`` along unit ``axis_dir``; particles confined
    inside radius R. ``omega`` is the spin rate about the axis (rad/time):
    wall surface velocity at contact point c is omega * axis x (c - a).
    """

    axis_point: jax.Array
    axis_dir: jax.Array
    radius: jax.Array
    omega: jax.Array

    @classmethod
    def create(cls, axis_point, axis_dir, radius, omega=0.0, dtype=jnp.float32):
        ad = jnp.asarray(axis_dir, dtype)
        return cls(
            axis_point=jnp.asarray(axis_point, dtype),
            axis_dir=ad / jnp.linalg.norm(ad),
            radius=jnp.asarray(radius, dtype),
            omega=jnp.asarray(omega, dtype),
        )

    def depth_and_normal(self, p):
        rel = p - self.axis_point
        ax = jnp.sum(rel * self.axis_dir, axis=-1, keepdims=True)
        rad_vec = rel - ax * self.axis_dir
        rad = jnp.linalg.norm(rad_vec, axis=-1)
        depth = rad - self.radius  # > 0: beyond the shell
        n = -rad_vec / jnp.maximum(rad, 1e-12)[..., None]  # inward normal
        return depth, n

    def surface_velocity(self, c):
        rel = c - self.axis_point
        return self.omega * jnp.cross(
            jnp.broadcast_to(self.axis_dir, rel.shape), rel
        )


def wall_contact(state, shapes, params, wall, hist):
    """Hertz/friction contact of every particle against one wall.

    hist: [N, 3] tangential springs for this wall.
    Returns (force [N,3], torque [N,3], new_hist [N,3], pe [N]).
    """
    # Broad phase: bounding sphere vs wall.
    depth_c, n_c = wall.depth_and_normal(state.x)
    rmax = shapes.rmax[state.shtype] * state.scale
    near = state.active & (depth_c > -rmax)

    # Surface nodes in world frame: [N, G, 3].
    nodes_body = (
        shapes.node_r[state.shtype][..., None] * shapes.quad_dirs[None, :, :]
    ) * state.scale[:, None, None]
    rel = quat_rotate(state.q[:, None, :], nodes_body)
    p = state.x[:, None, :] + rel
    depth, n_at = wall.depth_and_normal(p)

    # Smoothed containment weight (see ops/contact.py: kink-free overlap
    # integrals for energy conservation).
    w_smooth = (0.01 * shapes.rchar[state.shtype] * state.scale)[:, None]
    depth = jnp.where(near[:, None], jnp.maximum(depth, 0.0), 0.0)
    t_in = jnp.clip(depth / w_smooth, 0.0, 1.0)
    s_in = t_in * t_in * (3.0 - 2.0 * t_in)  # C^2 smoothstep
    dA = shapes.node_area[state.shtype] * (state.scale**2)[:, None]
    w = s_in * dA
    area = jnp.sum(w, axis=-1)
    vol = jnp.sum(w * depth, axis=-1)
    in_contact = near & (area > 0)
    delta = jnp.where(in_contact, 2.0 * vol / jnp.maximum(area, 1e-12), 0.0)
    centroid = jnp.where(
        in_contact[:, None],
        jnp.sum(w[..., None] * rel, axis=-2) / jnp.maximum(area, 1e-12)[:, None],
        0.0,
    )
    n_hat = jnp.sum(w[..., None] * n_at, axis=-2)
    nn = jnp.linalg.norm(n_hat, axis=-1, keepdims=True)
    n_hat = jnp.where(nn > 1e-10, n_hat / jnp.maximum(nn, 1e-12), n_c)

    r_eff = shapes.rchar[state.shtype] * state.scale  # flat wall partner
    m_eff = shapes.mass_of(state.shtype, state.scale)
    inertia = shapes.inertia_of(state.shtype, state.scale)
    om = omega_from_angmom(state.q, state.angmom, inertia)
    c_world = state.x + centroid
    v_rel = state.v + jnp.cross(om, centroid) - wall.surface_velocity(c_world)

    vn_mag = jnp.sum(v_rel * n_hat, axis=-1)
    vn = vn_mag[..., None] * n_hat
    vt = v_rel - vn

    poly = jnp.sqrt(jnp.maximum(delta * r_eff, 0.0))
    fn_mag = jnp.maximum(
        poly * (params.kn * delta - m_eff * params.gamma_n * vn_mag), 0.0
    )
    f_n = fn_mag[..., None] * n_hat

    xi = hist - jnp.sum(hist * n_hat, axis=-1, keepdims=True) * n_hat
    xi = jnp.where(in_contact[:, None], xi + vt * params.dt, 0.0)
    f_t = -poly[:, None] * (params.kt * xi + m_eff[:, None] * params.gamma_t * vt)
    ft_mag = jnp.linalg.norm(f_t, axis=-1)
    cap = params.mu * fn_mag
    over = ft_mag > jnp.maximum(cap, 1e-30)
    f_t = f_t * jnp.where(over, cap / jnp.maximum(ft_mag, 1e-30), 1.0)[:, None]
    xi = jnp.where(
        (over & (poly > 0))[:, None],
        -(f_t / jnp.maximum(poly, 1e-30)[:, None]
          + m_eff[:, None] * params.gamma_t * vt) / params.kt,
        xi,
    )

    force = jnp.where(in_contact[:, None], f_n + f_t, 0.0)
    torque = jnp.cross(centroid, force)
    pe = jnp.where(in_contact, 0.4 * params.kn * jnp.sqrt(r_eff) * delta**2.5, 0.0)
    return force, torque, xi, pe
