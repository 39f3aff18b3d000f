"""Pallas-fused wall narrow phase (fix wall/gran; SURVEY.md 2 B.5).

One ``pallas_call`` evaluates the full cap-quadrature wall contact for a
block of B near-wall particles in VMEM — the wall twin of the pair
kernel (ops/contact_pallas.py): cap construction toward the wall,
power-basis radius+gradient evaluation, depth-moment overlap integrals
against the analytic wall surface, Hertz + history friction + rolling.
The jnp reference (ops/walls.py) stays the source of truth; tests pin
parity (tests/test_walls_pallas.py).

Wall geometry is degenerate enough to stay scalar: the wall *kind*
(plane / inside-of-cylinder) selects the depth/normal formula as a
static kernel variant; the wall's parameters ride in SMEM, and its
surface velocity field is packed as the affine v(c) = v0 + W x c
(plane: W = 0; cylinder about axis a, direction u, spin w:
W = w u, v0 = -W x a).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spherharm_tpu.ops.contact_pallas import (
    _cross3,
    _dot3,
    _radius_grad_power,
    _rot,
    _rot_inv,
    _surface_normal,
    _unit_trig,
)

# Packed per-particle row [B, _FW]: x 0:3, v 3:6, q 6:10, om 10:13,
# m 13, rmax 14, rchar 15, near 16, depth_c 17, n_c 18:21 (inward wall
# normal at the center), hist 21:27 (tangential + rolling springs).
_FW = 32
# SMEM params [1, _NPW]: dt kn kt gn gt mu kr gr mur | v0 (3) W (3) |
# p0 (3) u0 (3) R   (plane: p0 = point, u0 = unit normal, R unused;
# cylinder: p0 = axis point, u0 = axis dir, R = radius).
_NPW = 24
# Output row [B, 16]: force 0:3, torque 3:6, hist 6:12, pe 12, contact 13.
_NOUTW = 16


def _make_wall_kernel(lmax: int, kind: str):
    if kind not in ("plane", "cylinder"):
        raise ValueError(f"unknown wall kind {kind!r}")

    def kernel(pairs_ref, tbl_ref, cap_ref, par_ref, out_ref):
        pairs = pairs_ref[:, :]
        tbl = tbl_ref[:, :]

        def col(k):
            return pairs[:, k:k + 1]

        def vec(lo):
            return (pairs[:, lo:lo + 1], pairs[:, lo + 1:lo + 2],
                    pairs[:, lo + 2:lo + 3])

        cap_x = cap_ref[0:1, :]
        cap_glw = cap_ref[1:2, :]
        cap_cpsi = cap_ref[2:3, :]
        cap_spsi = cap_ref[3:4, :]

        dt = par_ref[0, 0]
        kn = par_ref[0, 1]
        kt = par_ref[0, 2]
        gn = par_ref[0, 3]
        gt = par_ref[0, 4]
        mu = par_ref[0, 5]
        k_roll = par_ref[0, 6]
        g_roll = par_ref[0, 7]
        mu_roll = par_ref[0, 8]
        v0 = (par_ref[0, 9], par_ref[0, 10], par_ref[0, 11])
        Wv = (par_ref[0, 12], par_ref[0, 13], par_ref[0, 14])
        p0 = (par_ref[0, 15], par_ref[0, 16], par_ref[0, 17])
        u0 = (par_ref[0, 18], par_ref[0, 19], par_ref[0, 20])
        R = par_ref[0, 21]

        x = vec(0)
        v = vec(3)
        q = (pairs[:, 6:7], pairs[:, 7:8], pairs[:, 8:9], pairs[:, 9:10])
        om = vec(10)
        m_eff = col(13)
        rmax = col(14)
        r_eff = col(15)
        near = col(16) > 0.5
        dc = col(17)
        nc = vec(18)

        # Cap grid toward the wall (jnp twin: ops/walls.py lines
        # 162-177): probe directions around e = -n_c within the
        # penetration-possible cone bound by rmax.
        e_w = (-nc[0], -nc[1], -nc[2])
        e_b = _rot_inv(q, e_w)
        dist_w = -dc
        cos_gmax = jnp.clip(dist_w / jnp.maximum(rmax, 1e-12),
                            -1.0, 1.0 - 1e-6)
        one_m = 1.0 - cos_gmax
        cos_g = 1.0 - one_m * cap_x
        sin_g = jnp.sqrt(jnp.maximum(1.0 - cos_g * cos_g, 0.0))
        ex, ey, ez = e_b
        use_x = jnp.abs(ex) < 0.9
        hx = jnp.where(use_x, 1.0, 0.0)
        hy = jnp.where(use_x, 0.0, 1.0)
        t1x = -ez * hy
        t1y = ez * hx
        t1z = ex * hy - ey * hx
        inv_t1 = jax.lax.rsqrt(
            jnp.maximum(t1x * t1x + t1y * t1y + t1z * t1z, 1e-24)
        )
        t1x, t1y, t1z = t1x * inv_t1, t1y * inv_t1, t1z * inv_t1
        t2x = ey * t1z - ez * t1y
        t2y = ez * t1x - ex * t1z
        t2z = ex * t1y - ey * t1x
        sc = sin_g * cap_cpsi
        ss = sin_g * cap_spsi
        dirx = cos_g * ex + sc * t1x + ss * t2x
        diry = cos_g * ey + sc * t1y + ss * t2y
        dirz = cos_g * ez + sc * t1z + ss * t2z

        ct, st, cp, sp = _unit_trig(dirx, diry, dirz)
        r, drt, drp = _radius_grad_power(tbl, ct, st, cp, sp, lmax)
        nbx, nby, nbz = _surface_normal(r, drt, drp, ct, st, cp, sp)
        cos_incl = jnp.clip(nbx * dirx + nby * diry + nbz * dirz,
                            0.05, 1.0)
        dA = (one_m * cap_glw) * r * r / cos_incl

        rel = _rot(q, (r * dirx, r * diry, r * dirz))
        px = x[0] + rel[0]
        py = x[1] + rel[1]
        pz = x[2] + rel[2]

        if kind == "plane":
            depth = -((px - p0[0]) * u0[0] + (py - p0[1]) * u0[1]
                      + (pz - p0[2]) * u0[2])
            n_at = (u0[0] + 0.0 * depth, u0[1] + 0.0 * depth,
                    u0[2] + 0.0 * depth)
        else:
            r2x, r2y, r2z = px - p0[0], py - p0[1], pz - p0[2]
            axc = r2x * u0[0] + r2y * u0[1] + r2z * u0[2]
            rvx = r2x - axc * u0[0]
            rvy = r2y - axc * u0[1]
            rvz = r2z - axc * u0[2]
            rad = jnp.sqrt(jnp.maximum(
                rvx * rvx + rvy * rvy + rvz * rvz, 1e-24
            ))
            depth = rad - R
            inv_rad = 1.0 / rad
            n_at = (-rvx * inv_rad, -rvy * inv_rad, -rvz * inv_rad)

        depth = jnp.where(near, jnp.maximum(depth, 0.0), 0.0)
        wd = dA * depth
        s1 = jnp.sum(wd, axis=1, keepdims=True)
        s2 = jnp.sum(wd * depth, axis=1, keepdims=True)
        in_contact = near & (s1 > 0)
        denom = jnp.maximum(s1, 1e-30)
        delta = jnp.where(in_contact, 1.5 * s2 / denom, 0.0)
        cen = tuple(
            jnp.where(
                in_contact,
                jnp.sum(wd * rel[k], axis=1, keepdims=True) / denom,
                0.0,
            )
            for k in range(3)
        )
        nh = tuple(jnp.sum(wd * n_at[k], axis=1, keepdims=True)
                   for k in range(3))
        nn = jnp.sqrt(jnp.maximum(_dot3(nh, nh), 1e-40))
        n_hat = tuple(
            jnp.where(nn > 1e-10, nh[k] / jnp.maximum(nn, 1e-12), nc[k])
            for k in range(3)
        )

        # Wall surface velocity at the contact point: v0 + W x c.
        c_w = (x[0] + cen[0], x[1] + cen[1], x[2] + cen[2])
        wxc = _cross3(Wv, c_w)
        oxc = _cross3(om, cen)
        v_rel = tuple(v[k] + oxc[k] - (v0[k] + wxc[k]) for k in range(3))
        vn_mag = _dot3(v_rel, n_hat)
        vt = tuple(v_rel[k] - vn_mag * n_hat[k] for k in range(3))

        poly = jnp.sqrt(jnp.maximum(delta * r_eff, 0.0))
        fn_mag = jnp.maximum(
            poly * (kn * delta - m_eff * gn * vn_mag), 0.0
        )

        hist = (pairs[:, 21:22], pairs[:, 22:23], pairs[:, 23:24])
        hist_r = (pairs[:, 24:25], pairs[:, 25:26], pairs[:, 26:27])
        xi_dot_n = _dot3(hist, n_hat)
        xi = tuple(hist[k] - xi_dot_n * n_hat[k] for k in range(3))
        xi = tuple(
            jnp.where(in_contact, xi[k] + vt[k] * dt, 0.0)
            for k in range(3)
        )
        f_t = tuple(-poly * (kt * xi[k] + m_eff * gt * vt[k])
                    for k in range(3))
        ft_mag = jnp.sqrt(jnp.maximum(_dot3(f_t, f_t), 1e-30))
        capf = mu * fn_mag
        over = ft_mag > jnp.maximum(capf, 1e-30)
        scale_ft = jnp.where(over, capf / ft_mag, 1.0)
        f_t = tuple(f_t[k] * scale_ft for k in range(3))
        inv_poly = 1.0 / jnp.maximum(poly, 1e-30)
        xi = tuple(
            jnp.where(
                over & (poly > 0),
                -(f_t[k] * inv_poly + m_eff * gt * vt[k])
                / jnp.maximum(kt, 1e-30),
                xi[k],
            )
            for k in range(3)
        )

        roll_on = (k_roll > 0) | (g_roll > 0)
        dom = tuple(om[k] - Wv[k] for k in range(3))
        n_x_dom = _cross3(n_hat, dom)
        v_roll = tuple(-r_eff * n_x_dom[k] for k in range(3))
        xir_dot_n = _dot3(hist_r, n_hat)
        xi_r = tuple(hist_r[k] - xir_dot_n * n_hat[k] for k in range(3))
        xi_r = tuple(
            jnp.where(in_contact & roll_on, xi_r[k] + v_roll[k] * dt, 0.0)
            for k in range(3)
        )
        f_r = tuple(-(k_roll * xi_r[k] + g_roll * v_roll[k])
                    for k in range(3))
        fr_mag = jnp.sqrt(jnp.maximum(_dot3(f_r, f_r), 1e-30))
        cap_r = mu_roll * fn_mag
        over_r = fr_mag > jnp.maximum(cap_r, 1e-30)
        scale_fr = jnp.where(over_r, cap_r / fr_mag, 1.0)
        f_r = tuple(f_r[k] * scale_fr for k in range(3))
        xi_r = tuple(
            jnp.where(
                over_r & (k_roll > 0),
                -(f_r[k] + g_roll * v_roll[k])
                / jnp.maximum(k_roll, 1e-30),
                xi_r[k],
            )
            for k in range(3)
        )
        n_x_fr = _cross3(n_hat, f_r)
        tau_roll = tuple(
            jnp.where(in_contact, r_eff * n_x_fr[k], 0.0)
            for k in range(3)
        )

        force = tuple(
            jnp.where(in_contact, fn_mag * n_hat[k] + f_t[k], 0.0)
            for k in range(3)
        )
        tq = _cross3(cen, force)
        torque = tuple(tq[k] + tau_roll[k] for k in range(3))
        pe = jnp.where(
            in_contact,
            0.4 * kn * jnp.sqrt(r_eff) * delta * delta * jnp.sqrt(delta),
            0.0,
        )
        out = jnp.concatenate(
            list(force) + list(torque) + list(xi) + list(xi_r)
            + [pe, in_contact.astype(pe.dtype)]
            + [jnp.zeros_like(pe)] * (_NOUTW - 14),
            axis=1,
        )
        out_ref[:, :] = out

    return kernel


@partial(jax.jit, static_argnames=("lmax", "kind", "block", "interpret"))
def wall_contact_pallas(packed, tbl, cap, par, lmax: int, kind: str,
                        block: int = 128, interpret: bool | None = None):
    """Run the wall kernel. packed: [B, _FW] rows; tbl: [B, W] pre-scaled
    power-table rows; cap: [4, G]; par: [1, _NPW]. Returns [B, _NOUTW]."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    P = packed.shape[0]
    W = tbl.shape[1]
    G = cap.shape[1]
    n_blocks = -(-P // block)
    pad = n_blocks * block - P
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
        tbl = jnp.pad(tbl, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _make_wall_kernel(lmax, kind),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, _NOUTW),
                                       packed.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, _FW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NPW), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, _NOUTW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed, tbl, cap, par)
    return out[:P]


def pack_wall(state, shapes, params, wall, hist, depth_c, n_c, om):
    """Build (packed, tbl, cap, par, kind) kernel inputs for one wall.

    depth_c/n_c: the wall's center-depth and inward normal at each
    particle center (the caller computes them for the broad phase
    anyway); om: world-frame angular velocities.
    """
    from spherharm_tpu.ops import walls as walls_mod

    f32 = jnp.float32
    m = shapes.mass_of(state.shtype, state.scale)
    rmax = shapes.rmax[state.shtype] * state.scale
    rchar = shapes.rchar[state.shtype] * state.scale
    near = state.active & (depth_c > -rmax)
    packed = jnp.concatenate([
        state.x.astype(f32), state.v.astype(f32), state.q.astype(f32),
        om.astype(f32), m[:, None].astype(f32),
        rmax[:, None].astype(f32), rchar[:, None].astype(f32),
        near.astype(f32)[:, None], depth_c[:, None].astype(f32),
        n_c.astype(f32), hist.astype(f32),
    ], axis=1)
    packed = jnp.pad(packed, ((0, 0), (0, _FW - packed.shape[1])))
    tbl = shapes.power_tbl[state.shtype] * state.scale[:, None]
    cap = jnp.stack([shapes.cap_x, shapes.cap_glw, shapes.cap_cpsi,
                     shapes.cap_spsi], axis=0)
    if isinstance(wall, walls_mod.PlaneWall):
        kind = "plane"
        v0 = wall.velocity
        Wv = jnp.zeros((3,), f32)
        p0, u0 = wall.point, wall.normal
        R = jnp.zeros((), f32)
    else:
        kind = "cylinder"
        Wv = wall.omega * wall.axis_dir
        v0 = -jnp.cross(Wv, wall.axis_point)
        p0, u0 = wall.axis_point, wall.axis_dir
        R = wall.radius
    z = jnp.zeros((), f32)
    if wall.mat is not None:
        mat8 = [wall.mat[k] for k in range(8)]
    else:
        mat8 = [params.kn, params.kt, params.gamma_n, params.gamma_t,
                params.mu, params.k_roll, params.gamma_roll,
                params.mu_roll]
    par = jnp.stack([
        params.dt, *mat8,
        v0[0], v0[1], v0[2], Wv[0], Wv[1], Wv[2],
        p0[0], p0[1], p0[2], u0[0], u0[1], u0[2], R, z, z,
    ])[None, :].astype(f32)
    return packed, tbl, cap, par, kind
