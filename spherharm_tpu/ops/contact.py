"""SH contact narrow phase + Hertz/friction force law — THE hot path.

TPU-native re-design of the reference's SH contact pair style
(SURVEY.md section 2 B.4 / 3.3; capability contract BASELINE.json:5:
"pairwise contact hot path (associated-Legendre/Ylm recurrences, radius
evaluation on Gauss-Legendre quadrature grids, overlap-volume and
contact-normal surface integrals), Hertz/friction force and torque
accumulation"). Instead of a per-pair C++ double loop, everything is a
batched tensor program over ``[P, G]`` (pairs x quadrature nodes).

Method (both-sides symmetric, Newton's third law by construction):

  for each candidate pair (i, j):
    build a PATCH-LOCAL Gauss-Legendre grid over the spherical cap of
    i's surface that can geometrically reach j's bounding sphere
    (half-angle gamma_max from the tangent-cone bound; the cap — and
    with it the node density — shrinks to the contact point as the
    overlap shrinks: adaptive resolution, SURVEY.md 7.3 "patch-local
    quadrature"). For each cap node k:
    p_k   = x_i + R(q_i) (s_i r_i(dir_k) dir_k)      # world node position
    u_k   = R(q_j)^T (p_k - x_j);  rho_k = |u_k|     # into j's body frame
    r_jk  = s_j * r_j(theta'_k, phi'_k)              # radius of j there
    inside_k = rho_k < r_jk;   depth_k = r_jk - rho_k
  (and the mirrored pass with i/j swapped)

  S1 = sum dA * depth           (overlap volume measure, both sides)
  S2 = sum dA * depth^2         (second depth moment)
  c  = depth-volume-weighted contact centroid (both sides)
  n  = normalized depth-weighted mean of the *other* particle's outward
       surface normal (points from j toward i)
  delta = 1.5 * S2 / S1         # smooth overlap depth; EXACT for the
                                # sphere-sphere lens (paraboloid depth
                                # profile has S2/S1 = (2/3) delta), and
                                # C^1 in the separation with NO
                                # containment indicator (kink-free:
                                # integrands vanish at the patch rim)

  Hertz + history friction (LAMMPS gran/hertz/history law):
    poly = sqrt(delta * R_eff)
    F_n  = poly * (kn * delta) * n  -  poly * m_eff * gamma_n * v_n
    xi  += v_t * dt  (projected tangent);  F_t = -poly*(kt*xi + m_eff*gamma_t*v_t)
    |F_t| <= mu |F_n|  (Coulomb cap, spring rescaled on saturation)
    tau_i += (c - x_i) x F;  equal/opposite on j via the full neighbor list.

The smooth depth-moment overlap (instead of max node depth or an
indicator-based area) is the key numerical choice: forces are smooth
functions of the geometry, so node-discretization noise and
node-crossing kinks (which velocity-Verlet rectifies into energy drift)
are absent by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from spherharm_tpu.ops import rotation, sh_math
from spherharm_tpu.ops.rotation import (
    angles_from_unit,
    quat_rotate,
    quat_rotate_inv,
)


def minimum_image(d, box_lo, box_hi, periodic):
    """Minimum-image displacement for periodic dims (static flags)."""
    L = box_hi - box_lo
    shift = jnp.round(d / L) * L
    pmask = jnp.asarray(periodic, dtype=d.dtype)
    return d - shift * pmask


def eval_radius(shapes, types, theta, phi, exact: bool):
    """Per-unit-scale radius + angular gradients of given shape types.

    types: [P], theta/phi: [P, G]. Returns (r, dr_dt, dr_dp) each [P, G].
    Exact path: unrolled ALP/Ylm recurrences + coefficient contraction
    (BASELINE.json:5 "associated-Legendre/Ylm recurrences"); table path:
    bilinear lookup in the precomputed (r, dr_dt, dr_dp) tables.
    """
    if exact:
        c = shapes.coeffs[types]  # [P, NC]
        return sh_math.radius_grad_streaming(c, theta, phi, shapes.lmax)
    return sh_math.interp_radius_batched(shapes.table, types, theta, phi)


def _unit_trig(u):
    """(cos t, sin t, cos p, sin p) of unit vectors u[..., 3] — no angles.

    Saves arccos/arctan2 + sin/cos per node (4+ transcendentals) in the
    hot loop; also the form Mosaic can lower (no acos primitive).
    """
    ct = jnp.clip(u[..., 2], -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(u[..., 0] ** 2 + u[..., 1] ** 2, 1e-24))
    inv = 1.0 / jnp.maximum(st, 1e-12)
    return ct, st, u[..., 0] * inv, u[..., 1] * inv


def eval_radius_trig(shapes, types, ct, st, cp, sp, exact: bool):
    """Trig-component twin of eval_radius."""
    if exact:
        c = shapes.coeffs[types]
        return sh_math.radius_grad_streaming_trig(c, ct, st, cp, sp,
                                                  shapes.lmax)
    theta = jnp.arccos(ct)
    phi = jnp.arctan2(sp, cp)
    return sh_math.interp_radius_batched(shapes.table, types, theta, phi)


def _orthobasis(e):
    """Two unit vectors orthogonal to unit e [...,3]."""
    h = jnp.where(
        (jnp.abs(e[..., 0:1]) < 0.9),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], e.dtype), e.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], e.dtype), e.shape),
    )
    t1 = jnp.cross(e, h)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True).clip(1e-12)
    t2 = jnp.cross(e, t1)
    return t1, t2


def surface_probe(qi, si, type_i, qj, sj, type_j,
                  rb_j, rm_i, rb_i, rc_j, d, shapes, exact: bool):
    """One-sided probe: i's cap-local surface nodes tested against j.

    All args are per-pair (leading dim P); rb/rm/rc are the pre-scaled
    bounding / inscribed / characteristic radii (so no per-pair shape
    table lookups happen here — TPU gathers are the enemy). ``d`` is the
    minimum-image x_j - x_i. Builds the adaptive cap grid on i facing j,
    evaluates i's own radius there, transforms into j's frame, tests
    containment.

    Returns per-pair integrals:
      area [P], vol [P], centroid_num [P,3] (area-weighted, relative to
      x_i), normal_num [P,3] (area-weighted outward normals of j, world),
      max_depth [P].
    """
    dist = jnp.linalg.norm(d, axis=-1)
    inv_dist = 1.0 / jnp.maximum(dist, 1e-12)
    e_world = d * inv_dist[..., None]
    e_body = quat_rotate_inv(qi, e_world)  # contact axis in i's body frame

    # Cap half-angle: largest polar angle (from e_body) at which a point of
    # i's surface (radius in [rmin_i, rmax_i]) can lie inside j's bounding
    # sphere of radius Rj at distance dist. Law of cosines, minimized over
    # the radial interval (optimum at rho* = sqrt(dist^2 - Rj^2)).
    Rj = rb_j
    rho_star = jnp.sqrt(jnp.maximum(dist**2 - Rj**2, 0.0))
    rho_c = jnp.clip(rho_star, rm_i, rb_i)
    cos_gmax = (rho_c**2 + dist**2 - Rj**2) / jnp.maximum(
        2.0 * rho_c * dist, 1e-12
    )
    cos_gmax = jnp.clip(cos_gmax, -1.0, 1.0 - 1e-6)

    # Cap node directions in i's body frame: [P, Gc, 3].
    one_m = (1.0 - cos_gmax)[..., None]  # [P,1]
    cos_g = 1.0 - one_m * shapes.cap_x[None, :]
    sin_g = jnp.sqrt(jnp.maximum(1.0 - cos_g**2, 0.0))
    t1, t2 = _orthobasis(e_body)
    dirs = (
        cos_g[..., None] * e_body[..., None, :]
        + (sin_g * shapes.cap_cpsi)[..., None] * t1[..., None, :]
        + (sin_g * shapes.cap_spsi)[..., None] * t2[..., None, :]
    )
    ct_i, st_i, cp_i, sp_i = _unit_trig(dirs)

    # i's own surface at the cap nodes.
    r_i, drt_i, drp_i = eval_radius_trig(
        shapes, type_i, ct_i, st_i, cp_i, sp_i, exact
    )
    r_i = r_i * si[..., None]
    n_i = sh_math.surface_normal_trig(
        r_i, drt_i * si[..., None], drp_i * si[..., None],
        ct_i, st_i, cp_i, sp_i,
    )
    cos_incl = jnp.clip(jnp.sum(n_i * dirs, axis=-1), 0.05, 1.0)
    w_solid = one_m * shapes.cap_glw[None, :]  # dOmega weights
    dA = w_solid * r_i**2 / cos_incl

    # World positions (relative to x_i) and j-frame containment test.
    rel_i = quat_rotate(qi[..., None, :], r_i[..., None] * dirs)
    u = quat_rotate_inv(qj[..., None, :], rel_i - d[..., None, :])
    rho = jnp.linalg.norm(u, axis=-1)
    u_hat = u / jnp.maximum(rho, 1e-12)[..., None]
    ct_j, st_j, cp_j, sp_j = _unit_trig(u_hat)
    r_j, drt_j, drp_j = eval_radius_trig(
        shapes, type_j, ct_j, st_j, cp_j, sp_j, exact
    )
    r_j = r_j * sj[..., None]

    # Depth-moment overlap integrals. No containment indicator at all:
    # the integrands (depth, depth^2) vanish smoothly at the patch rim,
    # so the sums are C^1 in the separation — a hard inside/outside
    # indicator made the force kink whenever a node crossed the surface
    # and velocity-Verlet rectified that into systematic energy gain
    # (measured +1e-3/collision); a smoothstep fix traded it for a
    # w/delta force bias. The depth moments have neither. The overlap
    # depth is recovered downstream as delta = 1.5*S2/S1, which is EXACT
    # for the sphere-sphere lens (paraboloid depth profile:
    # S2/S1 = (2/3) delta).
    depth = jnp.maximum(r_j - rho, 0.0)
    wd = dA * depth
    s1 = jnp.sum(wd, axis=-1)               # = overlap volume measure
    s2 = jnp.sum(wd * depth, axis=-1)
    centroid_num = jnp.sum(wd[..., None] * rel_i, axis=-2)  # rel to x_i

    # Outward normal of j at the probe points, j body frame -> world.
    n_body = sh_math.surface_normal_trig(
        r_j, drt_j * sj[..., None], drp_j * sj[..., None],
        ct_j, st_j, cp_j, sp_j,
    )
    n_world = quat_rotate(qj[..., None, :], n_body)
    normal_num = jnp.sum(wd[..., None] * n_world, axis=-2)

    return s1, s2, centroid_num, normal_num, jnp.max(depth, axis=-1)


# Packed per-particle row layout (single row-gather per pair side beats
# ~15 per-field gathers: TPU has no hardware gather, and small-row
# gathers dominated the step at scale). Columns:
ROW_W = 20
_RX, _RV, _RQ, _ROM = slice(0, 3), slice(3, 6), slice(6, 10), slice(10, 13)
_RM_, _RRB, _RRM, _RRC, _RS, _RACT = 13, 14, 15, 16, 17, 18


def particle_rows(state, shapes, active=None):
    """Pack the per-particle data the pair kernel needs into [N, ROW_W].

    Computed ONCE per step (elementwise; omega per particle instead of
    per pair); pair access becomes two contiguous row-gathers.
    """
    om = rotation.omega_from_angmom(
        state.q, state.angmom,
        shapes.inertia_of(state.shtype, state.scale),
    )
    m = shapes.mass_of(state.shtype, state.scale)
    s = state.scale
    if active is None:
        active = state.active
    cols = [
        state.x, state.v, state.q, om, m[:, None],
        (shapes.rmax[state.shtype] * s)[:, None],
        (shapes.rmin[state.shtype] * s)[:, None],
        (shapes.rchar[state.shtype] * s)[:, None],
        s[:, None],
        active[:, None],
    ]
    rows = jnp.concatenate([c.astype(state.x.dtype) for c in cols], axis=1)
    return jnp.pad(rows, ((0, 0), (0, ROW_W - rows.shape[1])))


@partial(jax.jit, static_argnames=("exact", "periodic"))
def pair_contact_rows(rows_i, rows_j, t_i, t_j, hist, pair_mask,
                      box_lo, box_hi, shapes, params,
                      exact: bool = False, periodic=(False, False, False)):
    """Full contact law for a batch of P candidate pairs (row inputs).

    Returns (force_on_i [P,3], torque_on_i [P,3], new_hist [P,3],
    pe [P], in_contact [P], rij [P,3]).
    """
    x_i, v_i, q_i, om_i = (rows_i[:, _RX], rows_i[:, _RV],
                           rows_i[:, _RQ], rows_i[:, _ROM])
    x_j, v_j, q_j, om_j = (rows_j[:, _RX], rows_j[:, _RV],
                           rows_j[:, _RQ], rows_j[:, _ROM])
    m_i, m_j = rows_i[:, _RM_], rows_j[:, _RM_]
    rb_i, rb_j = rows_i[:, _RRB], rows_j[:, _RRB]
    rm_i, rm_j = rows_i[:, _RRM], rows_j[:, _RRM]
    rc_i, rc_j = rows_i[:, _RRC], rows_j[:, _RRC]
    s_i, s_j = rows_i[:, _RS], rows_j[:, _RS]

    d = minimum_image(x_j - x_i, box_lo, box_hi, periodic)
    dist = jnp.linalg.norm(d, axis=-1)
    rsum = rb_i + rb_j
    cull = pair_mask & (dist < rsum) & (dist > 1e-12)

    # Both-sided probes (i's nodes in j, j's nodes in i).
    s1a, s2a, c1, n1, dep1 = surface_probe(
        q_i, s_i, t_i, q_j, s_j, t_j, rb_j, rm_i, rb_i, rc_j,
        d, shapes, exact
    )
    s1b, s2b, c2, n2, dep2 = surface_probe(
        q_j, s_j, t_j, q_i, s_i, t_i, rb_i, rm_j, rb_j, rc_i,
        -d, shapes, exact
    )
    s1 = s1a + s1b
    s2 = s2a + s2b
    # centroid relative to x_i: c1 is; (c2 + s1b*d) maps j-rel to i-rel.
    centroid = jnp.where(
        (s1 > 0)[..., None],
        (c1 + c2 + s1b[..., None] * d) / jnp.maximum(s1, 1e-30)[..., None],
        0.5 * d,
    )
    # Normal pointing from j toward i: j's outward normals (n1) minus i's (n2).
    n_raw = n1 - n2
    n_norm = jnp.linalg.norm(n_raw, axis=-1, keepdims=True)
    d_hat = d / jnp.maximum(dist, 1e-12)[..., None]
    n_hat = jnp.where(n_norm > 1e-20, n_raw / jnp.maximum(n_norm, 1e-30), -d_hat)

    in_contact = cull & (s1 > 0)
    # Lens-exact smooth overlap depth from the depth moments.
    delta = jnp.where(in_contact, 1.5 * s2 / jnp.maximum(s1, 1e-30), 0.0)

    r_eff = rc_i * rc_j / jnp.maximum(rc_i + rc_j, 1e-12)
    m_eff = m_i * m_j / jnp.maximum(m_i + m_j, 1e-30)
    poly = jnp.sqrt(jnp.maximum(delta * r_eff, 0.0))

    # Relative velocity of i w.r.t. j at the contact point.
    arm_i = centroid
    arm_j = centroid - d
    v_rel = (
        v_i + jnp.cross(om_i, arm_i) - v_j - jnp.cross(om_j, arm_j)
    )
    vn_mag = jnp.sum(v_rel * n_hat, axis=-1)
    vn = vn_mag[..., None] * n_hat
    vt = v_rel - vn

    fn_mag = poly * (
        params.kn * delta - m_eff * params.gamma_n * vn_mag
    )
    fn_mag = jnp.maximum(fn_mag, 0.0)  # contact cannot pull
    f_n = fn_mag[..., None] * n_hat

    # Tangential history spring (world frame), projected tangent each step.
    xi = hist
    xi = xi - jnp.sum(xi * n_hat, axis=-1, keepdims=True) * n_hat
    xi = jnp.where(in_contact[..., None], xi + vt * params.dt, 0.0)
    f_t = -(poly[..., None]) * (params.kt * xi + m_eff[..., None] * params.gamma_t * vt)
    ft_mag = jnp.linalg.norm(f_t, axis=-1)
    cap = params.mu * fn_mag
    over = ft_mag > jnp.maximum(cap, 1e-30)
    scale_ft = jnp.where(over, cap / jnp.maximum(ft_mag, 1e-30), 1.0)
    f_t = f_t * scale_ft[..., None]
    # Rescale the stored spring consistently on saturation (LAMMPS-style).
    xi = jnp.where(
        (over & (poly > 0))[..., None],
        -(f_t / jnp.maximum(poly, 1e-30)[..., None]
          + m_eff[..., None] * params.gamma_t * vt) / params.kt,
        xi,
    )

    force = jnp.where(in_contact[..., None], f_n + f_t, 0.0)
    torque = jnp.cross(arm_i, force)
    # Elastic PE of the Hertzian spring: integral kn*sqrt(R)*d^{3/2} dd.
    pe = jnp.where(
        in_contact,
        0.4 * params.kn * jnp.sqrt(r_eff) * delta**2.5,
        0.0,
    )
    return force, torque, xi, pe, in_contact, d


@partial(jax.jit, static_argnames=("exact", "periodic"))
def pair_contact(
    x_i, v_i, q_i, om_i, s_i, t_i, m_i,
    x_j, v_j, q_j, om_j, s_j, t_j, m_j,
    hist, pair_mask, box_lo, box_hi, shapes, params,
    exact: bool = False, periodic=(False, False, False),
):
    """Field-argument wrapper over pair_contact_rows (tests/back-compat)."""
    def pack(x, v, q, om, s, t, m):
        rows = jnp.concatenate([
            x, v, q, om, m[:, None],
            (shapes.rmax[t] * s)[:, None],
            (shapes.rmin[t] * s)[:, None],
            (shapes.rchar[t] * s)[:, None],
            s[:, None],
        ], axis=1).astype(x.dtype)
        return jnp.pad(rows, ((0, 0), (0, ROW_W - rows.shape[1])))

    return pair_contact_rows(
        pack(x_i, v_i, q_i, om_i, s_i, t_i, m_i),
        pack(x_j, v_j, q_j, om_j, s_j, t_j, m_j),
        t_i, t_j, hist, pair_mask, box_lo, box_hi, shapes, params,
        exact=exact, periodic=periodic,
    )


def gather_particle(state, shapes, idx):
    """Gather per-particle fields at indices idx (any shape)."""
    om = rotation.omega_from_angmom(
        state.q[idx], state.angmom[idx],
        shapes.inertia_of(state.shtype[idx], state.scale[idx]),
    )
    m = shapes.mass_of(state.shtype[idx], state.scale[idx])
    return (
        state.x[idx], state.v[idx], state.q[idx], om,
        state.scale[idx], state.shtype[idx], m,
    )


@partial(jax.jit, static_argnames=("exact", "periodic", "chunk"))
def contact_force_dense(state, shapes, params, neigh,
                        exact: bool = False,
                        periodic=(False, False, False),
                        chunk: int = 0):
    """Force/torque over the dense [N, K] neighbor tensor.

    Returns (f [N,3], tau [N,3], new_hist [N,K,3], pe_total, virial [3,3]).
    Full-list semantics: each contact contributes to its row only; pe and
    virial are halved to undo double counting.

    ``chunk``: if > 0, process rows in blocks of this size with lax.map to
    bound [N*K, G] intermediates (VMEM/HBM working-set control).
    """
    N, K = neigh.idx.shape
    i_idx = jnp.broadcast_to(jnp.arange(N)[:, None], (N, K))
    rows = particle_rows(state, shapes)

    def run(block):
        ri, rj, ti, tj, msk, hist = block
        msk = msk & (ri[:, _RACT] > 0.5) & (rj[:, _RACT] > 0.5)
        return pair_contact_rows(
            ri, rj, ti, tj, hist, msk,
            state.box_lo, state.box_hi, shapes, params,
            exact=exact, periodic=periodic,
        )

    flat_i = i_idx.reshape(-1)
    flat_j = neigh.idx.reshape(-1)
    blocks = (rows[flat_i], rows[flat_j],
              state.shtype[flat_i], state.shtype[flat_j],
              neigh.mask.reshape(-1), neigh.hist.reshape(-1, 3))
    if chunk and N * K > chunk:
        n_chunks = -(-N * K // chunk)
        pad = n_chunks * chunk - N * K
        blocks = jax.tree.map(
            lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)),
            blocks,
        )
        blocks = jax.tree.map(
            lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), blocks
        )
        force, torque, hist_new, pe, inc, d = jax.lax.map(run, blocks)
        unpad = lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:])[: N * K]
        force, torque, hist_new, pe, inc, d = (
            unpad(force), unpad(torque), unpad(hist_new), unpad(pe),
            unpad(inc), unpad(d),
        )
    else:
        force, torque, hist_new, pe, inc, d = run(blocks)

    f = jnp.sum(force.reshape(N, K, 3), axis=1)
    tau = jnp.sum(torque.reshape(N, K, 3), axis=1)
    pe_total = 0.5 * jnp.sum(pe)
    # Virial: W_ab = -1/2 sum_pairs d_a F_b (d = x_j - x_i, F on i).
    virial = -0.5 * jnp.einsum("pa,pb->ab", d, force)
    return f, tau, hist_new.reshape(N, K, 3), pe_total, virial


@partial(jax.jit, static_argnames=("exact", "periodic", "pair_cap", "chunk",
                                   "use_pallas"))
def contact_force_compact(state, shapes, params, neigh,
                          pair_cap: int,
                          exact: bool = False,
                          periodic=(False, False, False),
                          chunk: int = 16384,
                          owned=None,
                          use_pallas: bool = False):
    """Force/torque via broad-phase compaction to a fixed pair capacity.

    The [N, K] Verlet tensor is mostly empty slack (cutoff includes skin;
    shapes are smaller than their bounding spheres). A cheap distance cull
    marks true bounding-sphere overlaps, a stable sort compacts them into
    ``pair_cap`` slots, and the expensive [P, G] cap-quadrature narrow
    phase runs only on those. Forces return home by segment-sum (pair
    slots stay sorted by row), history scatters back to [N, K].

    Returns (f, tau, new_hist, pe_total, virial, n_candidates).
    ``n_candidates > pair_cap`` means dropped contacts — the caller must
    track it like a neighbor-list overflow.
    """
    N, K = neigh.idx.shape
    j_idx = neigh.idx

    # One packed row table; all pair access is contiguous row-gathers
    # (per-field gathers measured ~0.4 s/step at n=20k — TPU has no
    # hardware gather, so gather COUNT is what matters).
    if owned is None:
        owned = state.active
    rows = particle_rows(state, shapes)
    rows_j_nk = rows[j_idx]  # [N, K, ROW_W]: the single broad-phase gather

    # Broad phase over the dense tensor (elementwise from rows).
    d = minimum_image(
        rows_j_nk[..., _RX] - rows[:, None, _RX],
        state.box_lo, state.box_hi, periodic,
    )
    dist2 = jnp.sum(d * d, axis=-1)
    rsum = rows[:, None, _RRB] + rows_j_nk[..., _RRB]
    cand = (
        neigh.mask
        & (dist2 < rsum * rsum)
        & owned[:, None]
        & (rows_j_nk[..., _RACT] > 0.5)
    )
    flat_cand = cand.reshape(-1)
    n_candidates = jnp.sum(flat_cand.astype(jnp.int32))

    # Stable compaction: sort flat slot ids with candidates first. Sorting
    # keys ascending by (!cand, slot) keeps slots ordered by row i, so the
    # segment-sum below sees sorted segment ids.
    slot = jnp.arange(N * K, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(flat_cand, slot, slot + N * K))
    sel = order[:pair_cap]
    psel_valid = flat_cand[sel]
    pi = (sel // K).astype(jnp.int32)
    pj = j_idx.reshape(-1)[sel]

    rows_i_p = rows[pi]
    rows_j_p = rows_j_nk.reshape(N * K, ROW_W)[sel]
    ti_p = state.shtype[pi]
    tj_p = state.shtype[pj]

    def run(block):
        ri, rj, ti, tj, msk, hist = block
        return pair_contact_rows(
            ri, rj, ti, tj, hist, msk,
            state.box_lo, state.box_hi, shapes, params,
            exact=exact, periodic=periodic,
        )

    if use_pallas:
        from spherharm_tpu.ops import contact_pallas

        hist_in = neigh.hist.reshape(-1, 3)[sel]
        dp = minimum_image(
            state.x[pj] - state.x[pi], state.box_lo, state.box_hi, periodic
        )
        packed, ci, cj, cap, par = contact_pallas.pack_pairs(
            state, shapes, params, pi, pj, psel_valid, hist_in, dp
        )
        out = contact_pallas.pair_contact_pallas(
            packed, ci, cj, cap, par, lmax=shapes.lmax
        )
        force = out[:, 0:3]
        torque = out[:, 3:6]
        hist_new = out[:, 6:9]
        pe = out[:, 9]
        f = jax.ops.segment_sum(force, pi, num_segments=N)
        tau = jax.ops.segment_sum(torque, pi, num_segments=N)
        hist = (
            jnp.zeros_like(neigh.hist)
            .reshape(-1, 3)
            .at[sel]
            .set(jnp.where(psel_valid[:, None], hist_new, 0.0))
            .reshape(N, K, 3)
        )
        pe_total = 0.5 * jnp.sum(pe)
        virial = -0.5 * jnp.einsum("pa,pb->ab", dp, force)
        return f, tau, hist, pe_total, virial, n_candidates

    blocks = (rows_i_p, rows_j_p, ti_p, tj_p, psel_valid,
              neigh.hist.reshape(-1, 3)[sel])
    if chunk and pair_cap > chunk:
        n_chunks = -(-pair_cap // chunk)
        pad = n_chunks * chunk - pair_cap
        blocks = jax.tree.map(
            lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)),
            blocks,
        )
        blocks = jax.tree.map(
            lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), blocks
        )
        force, torque, hist_new, pe, inc, dp = jax.lax.map(run, blocks)
        unpad = lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:])[:pair_cap]
        force, torque, hist_new, pe, inc, dp = (
            unpad(force), unpad(torque), unpad(hist_new), unpad(pe),
            unpad(inc), unpad(dp),
        )
    else:
        force, torque, hist_new, pe, inc, dp = run(blocks)

    f = jax.ops.segment_sum(force, pi, num_segments=N)
    tau = jax.ops.segment_sum(torque, pi, num_segments=N)
    # Non-candidate pairs are out of contact -> their springs reset to 0,
    # so scatter updates into a zero tensor.
    hist = (
        jnp.zeros_like(neigh.hist)
        .reshape(-1, 3)
        .at[sel]
        .set(jnp.where(psel_valid[:, None], hist_new, 0.0))
        .reshape(N, K, 3)
    )
    pe_total = 0.5 * jnp.sum(pe)
    virial = -0.5 * jnp.einsum("pa,pb->ab", dp, force)
    return f, tau, hist, pe_total, virial, n_candidates
