"""Pallas-fused SH contact narrow phase — the hot kernel, hand-scheduled.

One ``pallas_call`` evaluates the full both-sided cap-quadrature contact
law (ops/contact.py docstring) for a block of B candidate pairs entirely
in VMEM: cap construction, streaming ALP/Ylm radius+gradient evaluation
(no [B, G, NC] basis tensor), containment integrals, Hertz + history
friction, torque. Design notes:

* all 3-vectors live as separate [B, G] (or [B, 1]) component planes —
  every intermediate is a clean (sublane, lane) tile, no size-3 lanes
  in the inner loop;
* per-pair inputs arrive packed as one [B, F] row (single aligned load),
  SH coefficient rows (pre-scaled by the particle scale factor) as
  [B, NC] blocks;
* the quadrature grid G should be a lane multiple (the default
  (8, 16) cap grid = 128 nodes exactly fills the lanes);
* outputs pack into [B, 16] (force, torque_i, torque_j, new spring, pe,
  contact).

The jnp reference implementation (ops/contact.py) stays the source of
truth; tests pin this kernel against it.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from spherharm_tpu.core import state as state_mod
from spherharm_tpu.ops import sh_power

# Packed per-pair input layout [P, F].
_F = 64  # padded width
_SLOTS = {
    "xi": (0, 3), "vi": (3, 6), "qi": (6, 10), "omi": (10, 13),
    "mi": (13, 14), "rbi": (14, 15), "rmi": (15, 16), "rci": (16, 17),
    "xj": (17, 20), "vj": (20, 23), "qj": (23, 27), "omj": (27, 30),
    "mj": (30, 31), "rbj": (31, 32), "rmj": (32, 33), "rcj": (33, 34),
    "hist": (34, 40), "mask": (40, 41), "d": (41, 44),
    "tail": (44, 45),  # stage-1 truncation bound tail_i*s_i + tail_j*s_j
    # Per-type-pair material row (core.state.pair_material): kn, kt,
    # gamma_n, gamma_t, mu, k_roll, gamma_roll, mu_roll.
    "mat": (45, 53),
    # Shape-type ids (as float) + particle scales: the kernel builds its
    # per-pair power-table rows IN VMEM from the tiny per-type table via
    # a one-hot MXU contraction, so the [P, W]x2 table gathers (the
    # dominant HBM traffic of the per-step pack AND the rebuild-cadence
    # probe at candidate scale) never materialize.
    "typ": (53, 55), "scl": (55, 57),
}
_NOUT = 24  # force 0:3, tau_i 3:6, tau_j 6:9, springs 9:15, pe 15, contact 16
_NPAR = 16


def _rot(q, v):
    """Rotate component-tuple v by quaternion component-tuple q."""
    w, x, y, z = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return (
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    )


def _rot_inv(q, v):
    w, x, y, z = q
    return _rot((w, -x, -y, -z), v)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _side_tables(pairs, tbl):
    """Per-pair pre-scaled power-table rows [B, W] from the per-TYPE
    table ``tbl`` [T, W] (T padded to a sublane multiple by pack_pairs).

    One-hot MXU contraction: onehot[B, T] @ tbl[T, W], then scale by the
    per-particle scale column. Replaces the [P, W] HBM gathers the pack
    used to materialize per pair per step (and per candidate per rebuild
    probe) — the table itself is a few KB and lives in VMEM."""
    t_lo, _ = _SLOTS["typ"]
    s_lo, _ = _SLOTS["scl"]
    T = tbl.shape[0]
    # Mosaic's tpu.iota only produces integer vectors — build the id row
    # as int32 and compare against the int-cast typ column.
    tids = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def one(col_t, col_s):
        ids = pairs[:, col_t:col_t + 1].astype(jnp.int32)
        onehot = (ids == tids).astype(tbl.dtype)
        rows = jnp.dot(onehot, tbl, preferred_element_type=jnp.float32)
        return rows * pairs[:, col_s:col_s + 1]

    return one(t_lo, s_lo), one(t_lo + 1, s_lo + 1)


def _horner(tbl, off: int, n: int, ct):
    """Horner eval of one [B, 1]-coefficient run against ct [B, G]."""
    acc = tbl[:, off:off + 1]
    for k in range(1, n):
        acc = acc * ct + tbl[:, off + k:off + k + 1]
    return acc


def _radius_grad_power(tbl, cos_t, sin_t, cos_p, sin_p, lmax: int,
                       bf16: bool = False):
    """(r, dr/dtheta, dr/dphi) from per-pair power-table rows [B, W].

    Pure Horner + cos/sin(m phi) and sin^m recurrences on [B, G] planes
    — ~3x fewer FLOPs than the streaming ALP chain, exactly the same
    function (ops/sh_power.py builds the tables; parity pinned there).
    The theta-derivative is polynomial at the poles: no 1/sin guard.

    ``bf16``: run the per-m Horner chains (where the coefficient-count
    FLOPs are) in bfloat16, assembling the m-sum in f32 — a VPU
    fast-path experiment (SPHERHARM_STAGE2_BF16=1). Radius error is
    ~1e-3 relative; in conservative mode the force is then the exact
    gradient of a *slightly perturbed* potential, so the <1%/1M drift
    claim must be re-measured on TPU before this defaults on.
    """
    runs = sh_power.power_layout(lmax)["runs"]
    if bf16:
        tbl_h = tbl.astype(jnp.bfloat16)
        ct_h = cos_t.astype(jnp.bfloat16)
        hr = lambda off, n: _horner(tbl_h, off, n, ct_h).astype(jnp.float32)
    else:
        hr = lambda off, n: _horner(tbl, off, n, cos_t)
    A = {m: hr(off, n) for m, off, n in runs["A"]}
    B = {m: hr(off, n) for m, off, n in runs["B"]}
    At = {m: hr(off, n) for m, off, n in runs["At"]}
    Bt = {m: hr(off, n) for m, off, n in runs["Bt"]}

    r = A[0] + jnp.zeros_like(cos_t)
    drt = sin_t * At[0]
    drp = jnp.zeros_like(cos_t)
    cos_m, sin_m = cos_p, sin_p
    st_m1 = 1.0
    for m in range(1, lmax + 1):
        if m > 1:
            cos_m, sin_m = (
                cos_m * cos_p - sin_m * sin_p,
                sin_m * cos_p + cos_m * sin_p,
            )
        st_m = st_m1 * sin_t
        r = r + st_m * (cos_m * A[m] + sin_m * B[m])
        drt = drt + st_m1 * (cos_m * At[m] + sin_m * Bt[m])
        drp = drp + m * st_m * (cos_m * B[m] - sin_m * A[m])
        st_m1 = st_m
    return r, drt, drp


def _radius_power_ab(tbl, cos_t, sin_t, cos_p, sin_p, lmax: int):
    """r only from the A/B prefix of a power-table row (stage-1 probe).

    The A and B runs are laid out first (ops/sh_power.power_layout), so
    an l1-truncated [B, (l1+1)^2] table slice is self-contained."""
    runs = sh_power.power_layout(lmax)["runs"]
    A = {m: _horner(tbl, off, n, cos_t) for m, off, n in runs["A"]}
    B = {m: _horner(tbl, off, n, cos_t) for m, off, n in runs["B"]}
    r = A[0] + jnp.zeros_like(cos_t)
    cos_m, sin_m = cos_p, sin_p
    st_m = 1.0
    for m in range(1, lmax + 1):
        if m > 1:
            cos_m, sin_m = (
                cos_m * cos_p - sin_m * sin_p,
                sin_m * cos_p + cos_m * sin_p,
            )
        st_m = st_m * sin_t
        r = r + st_m * (cos_m * A[m] + sin_m * B[m])
    return r


def _surface_normal(r, drt, drp, ct, st, cp, sp):
    inv_r = 1.0 / jnp.maximum(r, 1e-12)
    inv_rs = inv_r / jnp.maximum(jnp.abs(st), 1e-6)
    a = drt * inv_r
    b = drp * inv_rs
    nx = st * cp - a * ct * cp + b * sp
    ny = st * sp - a * ct * sp - b * cp
    nz = ct + a * st
    inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
    return nx * inv_n, ny * inv_n, nz * inv_n


def _unit_trig(ux, uy, uz):
    ct = jnp.clip(uz, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(ux * ux + uy * uy, 1e-24))
    inv = 1.0 / jnp.maximum(st, 1e-12)
    return ct, st, ux * inv, uy * inv


def _probe(col, ti_or_tj, pre, side, cap, lmax, bf16=False):
    """One-sided cap probe. side='ij' probes i's nodes into j.

    col(name): [B,1] column getter; pre: dict of precomputed [B,1];
    ti_or_tj: (t_i, t_j) power-table rows [B, W] (ops/sh_power.py);
    cap: (x, glw, cpsi, spsi) each [1, G]. Returns integrals (all [B,1])
    and the probe point components rel to the probing center [B,G].
    """
    if side == "ij":
        q_a, q_b = pre["qi"], pre["qj"]
        t_a, t_b = ti_or_tj
        rb_b = col("rbj")
        rm_a, rb_a = col("rmi"), col("rbi")
        dx, dy, dz = pre["d"]
    else:
        q_a, q_b = pre["qj"], pre["qi"]
        t_b, t_a = ti_or_tj
        rb_b = col("rbi")
        rm_a, rb_a = col("rmj"), col("rbj")
        dx, dy, dz = [-v for v in pre["d"]]

    dist = pre["dist"]
    inv_dist = pre["inv_dist"]
    e_w = (dx * inv_dist, dy * inv_dist, dz * inv_dist)
    e_b = _rot_inv(q_a, e_w)

    rho_star = jnp.sqrt(jnp.maximum(dist * dist - rb_b * rb_b, 0.0))
    rho_c = jnp.clip(rho_star, rm_a, rb_a)
    cos_gmax = (rho_c * rho_c + dist * dist - rb_b * rb_b) / jnp.maximum(
        2.0 * rho_c * dist, 1e-12
    )
    cos_gmax = jnp.clip(cos_gmax, -1.0, 1.0 - 1e-6)

    cap_x, cap_glw, cap_cpsi, cap_spsi = cap
    one_m = 1.0 - cos_gmax                       # [B,1]
    cos_g = 1.0 - one_m * cap_x                  # [B,G]
    sin_g = jnp.sqrt(jnp.maximum(1.0 - cos_g * cos_g, 0.0))

    # Orthobasis around e_b.
    ex, ey, ez = e_b
    use_x = jnp.abs(ex) < 0.9
    hx = jnp.where(use_x, 1.0, 0.0)
    hy = jnp.where(use_x, 0.0, 1.0)
    # t1 = normalize(e x h)
    t1x = ey * 0.0 - ez * hy
    t1y = ez * hx - ex * 0.0
    t1z = ex * hy - ey * hx
    inv_t1 = jax.lax.rsqrt(jnp.maximum(t1x * t1x + t1y * t1y + t1z * t1z, 1e-24))
    t1x, t1y, t1z = t1x * inv_t1, t1y * inv_t1, t1z * inv_t1
    t2x = ey * t1z - ez * t1y
    t2y = ez * t1x - ex * t1z
    t2z = ex * t1y - ey * t1x

    sc = sin_g * cap_cpsi
    ss = sin_g * cap_spsi
    dirx = cos_g * ex + sc * t1x + ss * t2x
    diry = cos_g * ey + sc * t1y + ss * t2y
    dirz = cos_g * ez + sc * t1z + ss * t2z

    ct_a, st_a, cp_a, sp_a = _unit_trig(dirx, diry, dirz)
    r_a, drt_a, drp_a = _radius_grad_power(
        t_a, ct_a, st_a, cp_a, sp_a, lmax, bf16)
    na = _surface_normal(r_a, drt_a, drp_a, ct_a, st_a, cp_a, sp_a)
    cos_incl = jnp.clip(dirx * na[0] + diry * na[1] + dirz * na[2], 0.05, 1.0)
    w_solid = one_m * cap_glw
    dA = w_solid * r_a * r_a / cos_incl

    # Probe points relative to the probing center, world frame.
    rel = _rot(q_a, (r_a * dirx, r_a * diry, r_a * dirz))
    # Into the target's body frame.
    u = _rot_inv(q_b, (rel[0] - dx, rel[1] - dy, rel[2] - dz))
    rho = jnp.sqrt(
        jnp.maximum(u[0] * u[0] + u[1] * u[1] + u[2] * u[2], 1e-24)
    )
    inv_rho = 1.0 / rho
    ct_b, st_b, cp_b, sp_b = _unit_trig(
        u[0] * inv_rho, u[1] * inv_rho, u[2] * inv_rho
    )
    r_b, drt_b, drp_b = _radius_grad_power(
        t_b, ct_b, st_b, cp_b, sp_b, lmax, bf16)

    # Depth-moment overlap integrals (see ops/contact.py: no containment
    # indicator — kink-free and lens-exact via delta = 1.5*S2/S1).
    depth = jnp.maximum(r_b - rho, 0.0)
    wd = dA * depth

    s1 = jnp.sum(wd, axis=1, keepdims=True)
    s2 = jnp.sum(wd * depth, axis=1, keepdims=True)
    cx = jnp.sum(wd * rel[0], axis=1, keepdims=True)
    cy = jnp.sum(wd * rel[1], axis=1, keepdims=True)
    cz = jnp.sum(wd * rel[2], axis=1, keepdims=True)

    nb = _surface_normal(r_b, drt_b, drp_b, ct_b, st_b, cp_b, sp_b)
    nw = _rot(q_b, nb)
    nxs = jnp.sum(wd * nw[0], axis=1, keepdims=True)
    nys = jnp.sum(wd * nw[1], axis=1, keepdims=True)
    nzs = jnp.sum(wd * nw[2], axis=1, keepdims=True)
    return s1, s2, (cx, cy, cz), (nxs, nys, nzs)


def _probe_cons(col, ti_or_tj, pre, side, cap, lmax, bf16=False):
    """One-sided cap probe + HAND-DERIVED gradient integrals of the
    depth moments (conservative mode).

    The measure here is inclination-free, A = one_m * glw * r_a^2
    (solid-angle element; see ops.contact.surface_probe(incl=False)):
    with that choice the exact gradient of s_m = sum_k A_k depth_k^m
    w.r.t. (d, world-rotation of a, world-rotation of b) needs only the
    radius fields and their FIRST angular derivatives — all already in
    the forward pass — so the backward is ~100 FLOPs/node of vector
    algebra instead of a transposed ALP chain. (A jax.vjp-in-kernel
    version was measured 80x slower: residuals of the unrolled chain
    blow scoped VMEM; jax.checkpoint's remat2 doesn't lower in Mosaic.)

    Derivation sketch (per node; reverse-mode with per-m accumulators):
      depth D = max(r_b(u_hat) - rho, 0), u = R_b^T(rel - d),
      rel = R_a(r_a dir), dir = cos_g e_b + sin_g (cpsi t1 + spsi t2),
      e_b = R_a^T e_w, cos_g = 1 - one_m x_k, one_m = 1 - cos_gmax(dist).
      dD = (g_b/rho - u_hat) . du  with g_b the tangent surface gradient;
      du = R_b^T(d rel - dd) - R_b^T(dtheta_b x (rel - d)).
    Returns (s1, s2, cen, nsum, grads) with grads[m] = (G_d, G_tha,
    G_thb), each a component-3-tuple of [B,1] gradient integrals of
    s_{m+1}; rotations are world-frame (torque = -omega . grad).
    """
    cap_x, cap_glw, cap_cpsi, cap_spsi = cap
    if side == "ij":
        q_a, q_b = pre["qi"], pre["qj"]
        t_a, t_b = ti_or_tj
        rb_b = col("rbj")
        rm_a, rb_a = col("rmi"), col("rbi")
        d3 = pre["d"]
    else:
        q_a, q_b = pre["qj"], pre["qi"]
        t_b, t_a = ti_or_tj
        rb_b = col("rbi")
        rm_a, rb_a = col("rmj"), col("rbj")
        d3 = tuple(-v for v in pre["d"])
    dx, dy, dz = d3

    dist = pre["dist"]
    inv_dist = pre["inv_dist"]
    e_w = (dx * inv_dist, dy * inv_dist, dz * inv_dist)
    e_b = _rot_inv(q_a, e_w)

    # cos_gmax(dist) with its analytic derivative (clip subgradients
    # match jnp autodiff of the clipped forward).
    rb2 = rb_b * rb_b
    rho_star = jnp.sqrt(jnp.maximum(dist * dist - rb2, 0.0))
    unclipped = (rho_star > rm_a) & (rho_star < rb_a)
    rho_c = jnp.clip(rho_star, rm_a, rb_a)
    cg_raw = (rho_c * rho_c + dist * dist - rb2) / jnp.maximum(
        2.0 * rho_c * dist, 1e-12
    )
    cos_gmax = jnp.clip(cg_raw, -1.0, 1.0 - 1e-6)
    cg_free = (cg_raw > -1.0) & (cg_raw < 1.0 - 1e-6)
    inv_rcd = 1.0 / jnp.maximum(rho_c * dist * dist, 1e-30)
    dcg_ddist = jnp.where(
        unclipped,
        rb2 * inv_rcd,
        0.5 * (dist * dist - rho_c * rho_c + rb2) * inv_rcd,
    )
    dcg_ddist = jnp.where(cg_free, dcg_ddist, 0.0)

    one_m = 1.0 - cos_gmax                      # [B,1]
    cos_g = 1.0 - one_m * cap_x                 # [B,G]
    sin_g = jnp.sqrt(jnp.maximum(1.0 - cos_g * cos_g, 1e-12))

    # Orthobasis around e_b (h piecewise constant per pair).
    ex, ey, ez = e_b
    use_x = jnp.abs(ex) < 0.9
    hx = jnp.where(use_x, 1.0, 0.0)
    hy = jnp.where(use_x, 0.0, 1.0)
    h3 = (hx, hy, jnp.zeros_like(hx))
    tau3 = _cross3(e_b, h3)
    inv_t1 = jax.lax.rsqrt(jnp.maximum(_dot3(tau3, tau3), 1e-24))
    t1 = tuple(tau3[k] * inv_t1 for k in range(3))
    t2 = _cross3(e_b, t1)

    sc = sin_g * cap_cpsi
    ss = sin_g * cap_spsi
    dir3 = tuple(cos_g * e_b[k] + sc * t1[k] + ss * t2[k] for k in range(3))

    ct_a, st_a, cp_a, sp_a = _unit_trig(*dir3)
    r_a, drt_a, drp_a = _radius_grad_power(t_a, ct_a, st_a, cp_a, sp_a,
                                           lmax, bf16)
    # Tangent surface gradient of r_a in a's body frame:
    # g = drt * theta_hat + (drp / sin t) * phi_hat.
    inv_st_a = 1.0 / jnp.maximum(st_a, 1e-6)
    gpa = drp_a * inv_st_a
    ga = (drt_a * ct_a * cp_a - gpa * sp_a,
          drt_a * ct_a * sp_a + gpa * cp_a,
          -drt_a * st_a)

    glr2 = cap_glw * r_a * r_a
    A = one_m * glr2                              # [B,G]
    rel = _rot(q_a, tuple(r_a * dir3[k] for k in range(3)))
    w3 = (rel[0] - dx, rel[1] - dy, rel[2] - dz)
    u3 = _rot_inv(q_b, w3)
    rho = jnp.sqrt(jnp.maximum(_dot3(u3, u3), 1e-24))
    inv_rho = 1.0 / rho
    uh = tuple(u3[k] * inv_rho for k in range(3))
    ct_b, st_b, cp_b, sp_b = _unit_trig(*uh)
    r_b, drt_b, drp_b = _radius_grad_power(t_b, ct_b, st_b, cp_b, sp_b,
                                           lmax, bf16)
    inv_st_b = 1.0 / jnp.maximum(st_b, 1e-6)
    gpb = drp_b * inv_st_b
    gb = (drt_b * ct_b * cp_b - gpb * sp_b,
          drt_b * ct_b * sp_b + gpb * cp_b,
          -drt_b * st_b)

    depth_raw = r_b - rho
    inside = depth_raw > 0
    D = jnp.maximum(depth_raw, 0.0)
    wd = A * D
    s1 = jnp.sum(wd, axis=1, keepdims=True)
    s2 = jnp.sum(wd * D, axis=1, keepdims=True)
    cen = tuple(jnp.sum(wd * rel[k], axis=1, keepdims=True)
                for k in range(3))
    nb = _surface_normal(r_b, drt_b, drp_b, ct_b, st_b, cp_b, sp_b)
    nw = _rot(q_b, nb)
    nsum = tuple(jnp.sum(wd * nw[k], axis=1, keepdims=True)
                 for k in range(3))

    # ---- gradient integrals (reverse pass, shared node vectors) ----
    # dD propagates through u as cw . (d rel - dd + dtheta_b x w):
    cw = _rot(q_b, tuple(gb[k] * inv_rho - uh[k] for k in range(3)))
    crb = _rot_inv(q_a, cw)
    crb_dot_dir = _dot3(crb, dir3)
    rel_x_cw = _cross3(rel, cw)
    cw_x_w = _cross3(cw, w3)
    two_gl_r = 2.0 * one_m * cap_glw * r_a
    cgs = cos_g / sin_g

    grads = []
    for al, be in ((D, jnp.where(inside, A, 0.0)),
                   (D * D, 2.0 * wd)):
        G_d = [-jnp.sum(be * cw[k], axis=1, keepdims=True)
               for k in range(3)]
        G_ta = [jnp.sum(be * rel_x_cw[k], axis=1, keepdims=True)
                for k in range(3)]
        G_tb = tuple(jnp.sum(be * cw_x_w[k], axis=1, keepdims=True)
                     for k in range(3))
        c_ra = al * two_gl_r + be * crb_dot_dir
        cdir = tuple(be * r_a * crb[k] + c_ra * ga[k] for k in range(3))
        cdir_dot_eb = _dot3(cdir, e_b)
        cdir_dot_dir = _dot3(cdir, dir3)
        cdir_dot_p = (cdir_dot_dir - cos_g * cdir_dot_eb) / sin_g
        C_eb = [jnp.sum(cos_g * cdir[k], axis=1, keepdims=True)
                for k in range(3)]
        C_t1 = tuple(jnp.sum(sc * cdir[k], axis=1, keepdims=True)
                     for k in range(3))
        C_t2 = tuple(jnp.sum(ss * cdir[k], axis=1, keepdims=True)
                     for k in range(3))
        C_onem = jnp.sum(
            al * glr2 - cap_x * (cdir_dot_eb - cgs * cdir_dot_p),
            axis=1, keepdims=True,
        )
        # Pair-level chains ([B,1] algebra). Orthobasis backward:
        # t2 = e x t1 -> c_eb += t1 x C_t2, c_t1 += C_t2 x e;
        # t1 = normalize(e x h) -> c_tau = (I - t1 t1^T) c_t1 / |tau|,
        # c_eb += h x c_tau.
        ct1p = tuple(C_t1[k] + _cross3(C_t2, e_b)[k] for k in range(3))
        t1_dot = _dot3(t1, ct1p)
        c_tau = tuple((ct1p[k] - t1[k] * t1_dot) * inv_t1 for k in range(3))
        t1_x_Ct2 = _cross3(t1, C_t2)
        h_x_ctau = _cross3(h3, c_tau)
        c_eb = tuple(C_eb[k] + t1_x_Ct2[k] + h_x_ctau[k] for k in range(3))
        # e_b = R_a^T e_w: rotation-a picks up (R_a c_eb) x e_w; the
        # e_w path flows to d through the normalized direction.
        Rc = _rot(q_a, c_eb)
        Rc_x_ew = _cross3(Rc, e_w)
        for k in range(3):
            G_ta[k] = G_ta[k] + Rc_x_ew[k]
        ew_dot_Rc = _dot3(e_w, Rc)
        for k in range(3):
            G_d[k] = (G_d[k]
                      + (Rc[k] - e_w[k] * ew_dot_Rc) * inv_dist
                      - C_onem * dcg_ddist * e_w[k])
        grads.append((tuple(G_d), tuple(G_ta), G_tb))

    return s1, s2, cen, nsum, grads


def _make_kernel(lmax: int, conservative: bool = False,
                 bf16: bool = False):
    """Fused contact kernel. ``conservative=True`` replaces the geometric
    elastic force/torques with the EXACT gradient of the sampled elastic
    PE, via the hand-derived backward in _probe_cons (measure: incl-free,
    twin of ops.contact.pair_elastic_grad with the same measure;
    parity-tested). ``bf16`` runs the Horner coefficient chains in
    bfloat16 (see _radius_grad_power; experiment knob, drift must be
    re-measured before it defaults on)."""

    def kernel(pairs_ref, tbl_ref, cap_ref, par_ref, out_ref):
        # BLOCK SKIP: prefilter compaction packs valid pairs to the
        # FRONT of the list, so the padding between n_survivors and the
        # static capacity arrives here as whole blocks of mask=0 rows.
        # One scalar predicate turns those blocks into a zero-fill
        # instead of the full ~2k-FLOP/node body — capacity headroom
        # stops costing compute (the DMA still streams; compute is the
        # wall). Masked rows produce all-zero outputs in the live body
        # too, so the fill is exactly equivalent.
        pairs = pairs_ref[:, :]
        m_lo, _ = _SLOTS["mask"]
        alive = jnp.max(pairs[:, m_lo]) > 0.5

        @pl.when(jnp.logical_not(alive))
        def _():
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(alive)
        def _():
            _kernel_body(pairs, tbl_ref, cap_ref, par_ref, out_ref)

    def _kernel_body(pairs, tbl_ref, cap_ref, par_ref, out_ref):
        # Per-pair pre-scaled power-table rows, built in VMEM from the
        # per-type table (see _side_tables).
        ti, tj = _side_tables(pairs, tbl_ref[:, :])

        def col(name):
            lo, hi = _SLOTS[name]
            assert hi - lo == 1
            return pairs[:, lo:hi]

        def vec(name):
            lo, hi = _SLOTS[name]
            return tuple(pairs[:, c:c + 1] for c in range(lo, hi))

        cap = tuple(cap_ref[k:k + 1, :] for k in range(4))

        d = vec("d")
        dist2 = _dot3(d, d)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
        inv_dist = 1.0 / dist
        pre = {
            "qi": vec("qi"), "qj": vec("qj"), "d": d,
            "dist": dist, "inv_dist": inv_dist,
        }
        rsum = col("rbi") + col("rbj")
        cull = (col("mask") > 0.5) & (dist < rsum) & (dist > 1e-12)

        if conservative:
            s1a, s2a, c1, n1, g_ij = _probe_cons(
                col, (ti, tj), pre, "ij", cap, lmax, bf16)
            s1b, s2b, c2, n2, g_ji = _probe_cons(
                col, (ti, tj), pre, "ji", cap, lmax, bf16)
            s1 = s1a + s1b
            s2 = s2a + s2b
        else:
            s1a, s2a, c1, n1 = _probe(col, (ti, tj), pre, "ij", cap, lmax,
                                      bf16)
            s1b, s2b, c2, n2 = _probe(col, (ti, tj), pre, "ji", cap, lmax,
                                      bf16)
            s1 = s1a + s1b
            s2 = s2a + s2b
        denom = jnp.maximum(s1, 1e-30)
        # c2 is relative to x_j; fold into i-relative via + s1b*d.
        cen = tuple(
            jnp.where(s1 > 0, (c1[k] + c2[k] + s1b * d[k]) / denom,
                      0.5 * d[k])
            for k in range(3)
        )
        nraw = tuple(n1[k] - n2[k] for k in range(3))
        nn = jnp.sqrt(jnp.maximum(_dot3(nraw, nraw), 1e-40))
        d_hat = tuple(d[k] * inv_dist for k in range(3))
        n_hat = tuple(
            jnp.where(nn > 1e-20, nraw[k] / nn, -d_hat[k]) for k in range(3)
        )

        in_contact = cull & (s1 > 0)
        delta = jnp.where(in_contact, 1.5 * s2 / denom, 0.0)

        rci, rcj = col("rci"), col("rcj")
        r_eff = rci * rcj / jnp.maximum(rci + rcj, 1e-12)
        mi, mj = col("mi"), col("mj")
        m_eff = mi * mj / jnp.maximum(mi + mj, 1e-30)
        poly = jnp.sqrt(jnp.maximum(delta * r_eff, 0.0))

        dt = par_ref[0, 0]
        # Per-pair material columns [B, 1] (pair_coeff i j ... tables;
        # pack_pairs broadcasts the global scalars when no table is set).
        mat_lo, _ = _SLOTS["mat"]
        (kn, kt, gn, gt, mu, k_roll, g_roll, mu_roll) = (
            pairs[:, mat_lo + k:mat_lo + k + 1] for k in range(8)
        )

        vi, vj = vec("vi"), vec("vj")
        omi, omj = vec("omi"), vec("omj")
        arm_i = cen
        arm_j = tuple(cen[k] - d[k] for k in range(3))
        wxi = _cross3(omi, arm_i)
        wxj = _cross3(omj, arm_j)
        v_rel = tuple(vi[k] + wxi[k] - vj[k] - wxj[k] for k in range(3))
        vn_mag = _dot3(v_rel, n_hat)
        vt = tuple(v_rel[k] - vn_mag * n_hat[k] for k in range(3))

        fn_mag = jnp.maximum(poly * (kn * delta - m_eff * gn * vn_mag), 0.0)

        hist6 = vec("hist")
        hist = hist6[0:3]
        hist_r = hist6[3:6]
        xi_dot_n = _dot3(hist, n_hat)
        xi = tuple(hist[k] - xi_dot_n * n_hat[k] for k in range(3))
        xi = tuple(
            jnp.where(in_contact, xi[k] + vt[k] * dt, 0.0) for k in range(3)
        )
        f_t = tuple(-poly * (kt * xi[k] + m_eff * gt * vt[k]) for k in range(3))
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

        # Rolling resistance (spring-dashpot-slider; twin of the jnp
        # path in ops/contact.py — direction-symmetric pure torque).
        roll_on = (k_roll > 0) | (g_roll > 0)
        dom = tuple(omi[k] - omj[k] for k in range(3))
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
            jnp.where(in_contact, r_eff * n_x_fr[k], 0.0) for k in range(3)
        )

        if conservative:
            # Exact-gradient elastic force/torques (twin of
            # ops.contact.pair_elastic_grad with the incl-free measure).
            # U = 0.4 kn sqrt(R) delta^2.5, delta = 1.5 s2/s1:
            #   dU/ds2 = kn sqrt(R) delta^1.5 * 1.5/s1,
            #   dU/ds1 = -(2/3) delta * dU/ds2.
            # Weights are zeroed out of contact; the gradient integrals
            # are guarded (no dead-branch NaNs), isfinite kept as belt.
            coef_g = kn * jnp.sqrt(r_eff) * delta * jnp.sqrt(
                jnp.maximum(delta, 0.0)
            )
            w2 = jnp.where(in_contact, coef_g * 1.5 / denom, 0.0)
            w1 = -(2.0 / 3.0) * delta * w2

            def comb_g(g, idx):
                # w1 * grad(s1) + w2 * grad(s2) of one component set
                # (idx: 0 = d, 1 = theta_a, 2 = theta_b).
                return tuple(
                    w1 * g[0][idx][k] + w2 * g[1][idx][k] for k in range(3)
                )

            def comb2(sel_ij, sel_ji, sgn):
                a = comb_g(g_ij, sel_ij)
                b = comb_g(g_ji, sel_ji)
                return tuple(a[k] + sgn * b[k] for k in range(3))

            # Side ij differentiates w.r.t. (d, th_i, th_j); side ji saw
            # d' = -d and swapped roles (a=j): map back accordingly.
            gU_d = comb2(0, 0, -1.0)
            gU_thi = comb2(1, 2, +1.0)
            gU_thj = comb2(2, 1, +1.0)
            okf = jnp.ones_like(delta, dtype=bool)
            for v in (*gU_d, *gU_thi, *gU_thj):
                okf = okf & jnp.isfinite(v)
            # U depends on x only through d = x_j - x_i: force on i is
            # +dU/dd (dU/dx_i = -dU/dd); torque = -dU/dtheta.
            f_el = tuple(jnp.where(okf, gU_d[k], 0.0) for k in range(3))
            tau_ei = tuple(jnp.where(okf, -gU_thi[k], 0.0)
                           for k in range(3))
            tau_ej = tuple(jnp.where(okf, -gU_thj[k], 0.0)
                           for k in range(3))
            fn_damp = -(poly * m_eff * gn * vn_mag)
            f_vis = tuple(
                jnp.where(in_contact, fn_damp * n_hat[k] + f_t[k], 0.0)
                for k in range(3)
            )
            force = tuple(f_el[k] + f_vis[k] for k in range(3))
            tq_c = _cross3(arm_i, f_vis)
            torque = tuple(tau_ei[k] + tq_c[k] + tau_roll[k]
                           for k in range(3))
            neg_vis = tuple(-f_vis[k] for k in range(3))
            tq_cj = _cross3(arm_j, neg_vis)
            torque_j = tuple(tau_ej[k] + tq_cj[k] - tau_roll[k]
                             for k in range(3))
        else:
            force = tuple(
                jnp.where(in_contact, fn_mag * n_hat[k] + f_t[k], 0.0)
                for k in range(3)
            )
            tq_c = _cross3(arm_i, force)
            torque = tuple(tq_c[k] + tau_roll[k] for k in range(3))
            neg_force = tuple(-force[k] for k in range(3))
            tq_cj = _cross3(arm_j, neg_force)
            torque_j = tuple(tq_cj[k] - tau_roll[k] for k in range(3))
        pe = jnp.where(
            in_contact,
            0.4 * kn * jnp.sqrt(r_eff) * delta * delta * jnp.sqrt(delta),
            0.0,
        )

        out = jnp.concatenate(
            list(force) + list(torque) + list(torque_j)
            + list(xi) + list(xi_r)
            + [pe, in_contact.astype(pe.dtype)]
            + [jnp.zeros_like(pe)] * (_NOUT - 17),
            axis=1,
        )
        out_ref[:, :] = out

    return kernel


def _make_stage1_kernel(lmax: int, l1: int, bf16: bool):
    """r-only containment probe on the coarse cap grid.

    Writes the per-pair maximum signed node depth (r_target - rho; > 0
    means a node of one surface lies inside the other) over BOTH probe
    directions, or -1e9 for pairs failing the bounding-sphere cull. The
    caller keeps pairs with depth > -margin for the full stage-2 kernel.

    The radius comes from the l1-TRUNCATED power table (Shapes.
    power_tbl1 rows; ~(l1+1)^2/(lmax+1)^2 of the full-eval FLOPs).
    Truncation stays CONSERVATIVE via the precomputed tail bound packed
    into the "tail" column (Shapes.tail1: sum_{l>l1}|c_lm| * max|Y_lm|,
    scaled per particle and summed over both sides; a node-position
    error bound_i propagates through rho one-to-one).

    ``bf16``: run the Horner chain in bfloat16 (the VPU's fast path)
    and absorb the rounding into an additive margin (2% of rb_i + rb_j
    — an order of magnitude above the observed error); the probe stays
    a conservative bound."""
    chain_dt = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(pairs_ref, tbl_ref, cap_ref, out_ref):
        # Block skip (see _make_kernel): candidate lists are padded to a
        # static capacity; all-masked blocks write the cull sentinel
        # directly instead of probing 2x128 nodes per row.
        m_lo, _ = _SLOTS["mask"]
        blk_alive = jnp.max(pairs_ref[:, m_lo]) > 0.5

        @pl.when(jnp.logical_not(blk_alive))
        def _():
            out_ref[:, :] = jnp.full(out_ref.shape, -1e9, out_ref.dtype)

        @pl.when(blk_alive)
        def _():
            _stage1_body(pairs_ref, tbl_ref, cap_ref, out_ref)

    def _stage1_body(pairs_ref, tbl_ref, cap_ref, out_ref):
        pairs = pairs_ref[:, :]
        ti1, tj1 = _side_tables(pairs, tbl_ref[:, :])

        def col(name):
            lo, hi = _SLOTS[name]
            return pairs[:, lo:hi]

        def vec(name):
            lo, hi = _SLOTS[name]
            return tuple(pairs[:, c:c + 1] for c in range(lo, hi))

        cap_x = cap_ref[0:1, :]
        cap_cpsi = cap_ref[2:3, :]
        cap_spsi = cap_ref[3:4, :]

        d = vec("d")
        dist2 = _dot3(d, d)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
        inv_dist = 1.0 / dist
        rsum = col("rbi") + col("rbj")
        cull = (col("mask") > 0.5) & (dist < rsum) & (dist > 1e-12)

        def side(q_a, q_b, c_a, c_b, rb_b, rm_a, rb_a, dx, dy, dz):
            e_w = (dx * inv_dist, dy * inv_dist, dz * inv_dist)
            e_b = _rot_inv(q_a, e_w)
            rho_star = jnp.sqrt(jnp.maximum(dist * dist - rb_b * rb_b, 0.0))
            rho_c = jnp.clip(rho_star, rm_a, rb_a)
            cos_gmax = (rho_c * rho_c + dist * dist - rb_b * rb_b) / (
                jnp.maximum(2.0 * rho_c * dist, 1e-12)
            )
            cos_gmax = jnp.clip(cos_gmax, -1.0, 1.0 - 1e-6)
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
            ct_a, st_a, cp_a, sp_a = _unit_trig(dirx, diry, dirz)
            r_a = _radius_power_ab(
                c_a.astype(chain_dt), ct_a.astype(chain_dt),
                st_a.astype(chain_dt), cp_a.astype(chain_dt),
                sp_a.astype(chain_dt), l1,
            ).astype(jnp.float32)
            rel = _rot(q_a, (r_a * dirx, r_a * diry, r_a * dirz))
            u = _rot_inv(q_b, (rel[0] - dx, rel[1] - dy, rel[2] - dz))
            rho = jnp.sqrt(
                jnp.maximum(u[0] * u[0] + u[1] * u[1] + u[2] * u[2], 1e-24)
            )
            inv_rho = 1.0 / rho
            ct_b, st_b, cp_b, sp_b = _unit_trig(
                u[0] * inv_rho, u[1] * inv_rho, u[2] * inv_rho
            )
            r_b = _radius_power_ab(
                c_b.astype(chain_dt), ct_b.astype(chain_dt),
                st_b.astype(chain_dt), cp_b.astype(chain_dt),
                sp_b.astype(chain_dt), l1,
            ).astype(jnp.float32)
            return jnp.max(r_b - rho, axis=1, keepdims=True)

        qi, qj = vec("qi"), vec("qj")
        m_ij = side(qi, qj, ti1, tj1, col("rbj"), col("rmi"),
                    col("rbi"), d[0], d[1], d[2])
        m_ji = side(qj, qi, tj1, ti1, col("rbi"), col("rmj"),
                    col("rbj"), -d[0], -d[1], -d[2])
        depth = jnp.maximum(m_ij, m_ji) + col("tail")
        if bf16:
            depth = depth + 0.02 * rsum
        # Bounding-sphere-separated pairs are NOT probed (the cap
        # geometry assumes dist < rsum) but still report a valid upper
        # bound: surfaces sit inside the spheres, so true depth
        # <= rsum - dist. This keeps REBUILD-CADENCE prefiltering sound
        # for pairs that close into sphere contact within the window
        # (per-step probing could cull them; the prefilter must not).
        depth = jnp.where(dist < rsum, depth, rsum - dist)
        alive = (col("mask") > 0.5) & (dist > 1e-12)
        depth = jnp.where(alive, depth, -1e9)
        out_ref[:, :] = jnp.broadcast_to(depth, out_ref.shape)

    return kernel


@partial(jax.jit,
         static_argnames=("lmax", "l1", "block", "interpret", "bf16"))
def stage1_depth_pallas(packed, tbl1, cap1, lmax: int, l1: int = 4,
                        block: int = 256, interpret: bool | None = None,
                        bf16: bool = True):
    """Stage-1 probe over all pairs. tbl1: [T, (l1+1)^2] l1-truncated
    per-TYPE power table (per-pair rows built in VMEM from the packed
    typ/scl columns — no candidate-scale table gathers); packed must
    carry the "tail" column (truncation bound). Returns a conservative
    UPPER BOUND on the max signed depth [P]."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    l1 = min(l1, lmax)
    P = packed.shape[0]
    T1, W1 = tbl1.shape
    G1 = cap1.shape[1]
    n_blocks = -(-P // block)
    pad = n_blocks * block - P
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
    # The FULL-basis f32 probe (the rebuild-cadence prefilter: l1 = lmax,
    # W1 = 81 at lmax = 8) needs ~23M scoped VMEM at block 256 — past the
    # default 16M cap but well inside the chip's VMEM. Raise the cap for
    # the big-basis case instead of shrinking the block (the call is off
    # the per-step hot path).
    kw = {}
    if W1 > 32 or not bf16:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        )
    out = pl.pallas_call(
        _make_stage1_kernel(lmax, l1, bf16),
        **kw,
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, 8), packed.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, _F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T1, W1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, G1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed, tbl1, cap1)
    return out[:P, 0]


# Hot-kernel block length. 64 was the VMEM ceiling with the unrolled
# ALP chain; the power-basis tables may admit 128 (fewer grid steps,
# better VPU occupancy) — sweep via env on real hardware.
_KBLOCK = int(os.environ.get("SPHERHARM_KBLOCK", "64"))
# Stage-2 Horner chains in bfloat16 (f32 assembly). Experiment knob:
# sweep on TPU (throughput) AND re-run the drift harness before ever
# defaulting on — in conservative mode the force becomes the exact
# gradient of a ~1e-3-perturbed potential.
_STAGE2_BF16 = os.environ.get("SPHERHARM_STAGE2_BF16", "0") == "1"


@partial(jax.jit, static_argnames=("lmax", "block", "interpret",
                                   "conservative", "bf16"))
def pair_contact_pallas(packed, tbl, cap, par, lmax: int,
                        block: int | None = None,
                        interpret: bool | None = None,
                        conservative: bool = False,
                        bf16: bool | None = None):
    """Run the fused kernel. packed: [P, _F]; tbl: [T, W] per-TYPE
    power table (ops/sh_power.py; T padded to a sublane multiple by
    pack_pairs — per-pair rows are built in VMEM, see _side_tables);
    cap: [4, G]; par: [1, _NPAR]. Returns [P, _NOUT].

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (so the full pipeline stays testable on the CPU mesh).

    ``conservative=True`` evaluates the elastic force/torques as the
    exact in-kernel vjp of the sampled PE (see _make_kernel)."""
    if block is None:
        block = _KBLOCK
    if bf16 is None:
        bf16 = _STAGE2_BF16
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    P = packed.shape[0]
    T, W = tbl.shape
    G = cap.shape[1]
    n_blocks = -(-P // block)
    pad = n_blocks * block - P
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
    # The conservative (hand-derived-backward) kernel at block 64 with
    # the power tables sits ~1% past the default 16M scoped-VMEM limit;
    # raise the cap rather than halving the block (v5e has headroom).
    kw = {}
    if conservative:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        )
    out = pl.pallas_call(
        _make_kernel(lmax, conservative, bf16),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, _NOUT),
                                       packed.dtype),
        grid=(n_blocks,),
        **kw,
        in_specs=[
            pl.BlockSpec((block, _F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NPAR), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, _NOUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed, tbl, cap, par)
    return out[:P]


def pack_pairs(state, shapes, params, pi, pj, mask, hist, d, rows=None,
               probe_only: bool = False):
    """Build the kernel inputs from the packed particle-row table.

    The first 17 columns of ``contact.particle_rows`` (x, v, q, om, m,
    rb, rm, rc) match the per-side _SLOTS layout exactly, so each side is
    one contiguous row-gather + slice — no per-field gathers (the TPU
    gather-count lesson, see ops/contact.py).

    Returns (packed [P, _F], tbl, cap, par): tbl is the per-TYPE power
    table [T, W] (ops/sh_power.py; T padded to a sublane multiple) —
    per-pair rows are built IN the kernel from the packed typ/scl
    columns (_side_tables), so no [P, W] table traffic ever hits HBM.
    The "tail" column carries the scaled stage-1 truncation bound for
    both sides.
    """
    from spherharm_tpu.ops import contact as contact_mod

    if rows is None:
        rows = contact_mod.particle_rows(state, shapes)
    ti_t, tj_t = state.shtype[pi], state.shtype[pj]
    si, sj = state.scale[pi], state.scale[pj]
    ri = rows[pi][:, :17].astype(jnp.float32)
    rj = rows[pj][:, :17].astype(jnp.float32)
    tail = (shapes.tail1[ti_t] * si + shapes.tail1[tj_t] * sj)
    if probe_only:
        # The r-only probe reads neither the material columns nor the
        # dynamics history — skip the [P, 8] table gather at
        # candidate-list scale (rebuild-cadence prefilter).
        mat = jnp.zeros((pi.shape[0], 8), jnp.float32)
    else:
        mat = state_mod.pair_material(params, ti_t, tj_t)
    typ = jnp.stack([ti_t, tj_t], axis=1).astype(jnp.float32)
    scl = jnp.stack([si, sj], axis=1).astype(jnp.float32)
    packed = jnp.concatenate(
        [ri, rj, hist.astype(jnp.float32),
         mask.astype(jnp.float32)[:, None], d.astype(jnp.float32),
         tail.astype(jnp.float32)[:, None], mat.astype(jnp.float32),
         typ, scl],
        axis=1,
    )
    packed = jnp.pad(packed, ((0, 0), (0, _F - packed.shape[1])))
    tbl = pad_type_table(shapes.power_tbl)
    cap = jnp.stack([shapes.cap_x, shapes.cap_glw, shapes.cap_cpsi,
                     shapes.cap_spsi], axis=0)
    z = jnp.zeros_like(params.dt)
    par = jnp.stack([
        params.dt, params.kn, params.kt, params.gamma_n, params.gamma_t,
        params.mu, params.k_roll, params.gamma_roll, params.mu_roll,
        z, z, z, z, z, z, z,
    ])[None, :].astype(jnp.float32)
    return packed, tbl, cap, par


def pad_type_table(tbl):
    """Pad the per-type power table [T, W] to a sublane multiple of 8
    so it tiles cleanly as a VMEM-resident kernel operand. Padding rows
    are all-zero and unreachable (type ids < T)."""
    T = tbl.shape[0]
    T8 = -(-T // 8) * 8
    if T8 != T:
        tbl = jnp.pad(tbl, ((0, T8 - T), (0, 0)))
    return tbl
