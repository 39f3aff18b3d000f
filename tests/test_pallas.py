"""Pallas fused contact kernel vs the jnp reference (interpret mode on
CPU; the compiled path runs on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops import contact, contact_pallas
from spherharm_tpu.ops.contact import minimum_image


pytestmark = pytest.mark.slow  # minutes-long physics horizons


def _random_pairs(seed=0, lmax=4, n=24, contact_quad=(8, 16)):
    rng = np.random.default_rng(seed)
    coeffs = np.stack([
        shapes_library.blob_coeffs(lmax, seed=seed + t, mean_radius=0.5,
                                   roughness=0.12)
        for t in range(3)
    ])
    shapes = shapes_library.build_shapes(coeffs, lmax,
                                         contact_quad=contact_quad)
    params = SimParams.create(dt=1e-4, kn=1e5, gamma_n=20.0, mu=0.4,
                              k_roll=2e4, gamma_roll=10.0, mu_roll=0.2,
                              cutoff=1.4, skin=0.2)
    x = rng.uniform(0.7, 3.3, (n, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    state = scenarios.make_state(
        x, [0, 0, 0], [4, 4, 4], q=q,
        v=rng.normal(size=(n, 3)) * 0.2,
        scale=rng.uniform(0.85, 1.15, n),
        shtype=rng.integers(0, 3, n),
    )
    # candidate pairs: all i<j within generous range, duplicated both ways
    pi, pj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    sel = pi.ravel() != pj.ravel()
    pi = jnp.asarray(pi.ravel()[sel], jnp.int32)
    pj = jnp.asarray(pj.ravel()[sel], jnp.int32)
    mask = jnp.ones(pi.shape, bool)
    hist = jnp.asarray(rng.normal(size=(pi.shape[0], 6)) * 1e-4, jnp.float32)
    return shapes, params, state, pi, pj, mask, hist


def test_pallas_kernel_matches_reference():
    shapes, params, state, pi, pj, mask, hist = _random_pairs()
    d = minimum_image(
        state.x[pj] - state.x[pi], state.box_lo, state.box_hi,
        (False, False, False),
    )
    # jnp reference
    gi = contact.gather_particle(state, shapes, pi)
    gj = contact.gather_particle(state, shapes, pj)
    (f_ref, tau_ref, tauj_ref, hist_ref, pe_ref, inc_ref,
     d_ref) = contact.pair_contact(
        gi[0], gi[1], gi[2], gi[3], gi[4], gi[5], gi[6],
        gj[0], gj[1], gj[2], gj[3], gj[4], gj[5], gj[6],
        hist, mask, state.box_lo, state.box_hi, shapes, params,
        exact=True, periodic=(False, False, False),
    )
    # pallas kernel (interpret mode on CPU)
    packed, tbl, cap, par = contact_pallas.pack_pairs(
        state, shapes, params, pi, pj, mask, hist, d
    )
    out = contact_pallas.pair_contact_pallas(
        packed, tbl, cap, par, lmax=shapes.lmax, block=64, interpret=True
    )
    f = np.asarray(out[:, 0:3])
    tau = np.asarray(out[:, 3:6])
    tau_j = np.asarray(out[:, 6:9])
    hist_new = np.asarray(out[:, 9:15])
    pe = np.asarray(out[:, 15])
    inc = np.asarray(out[:, 16]) > 0.5

    fmag = max(float(jnp.abs(f_ref).max()), 1e-6)
    np.testing.assert_array_equal(inc, np.asarray(inc_ref))
    np.testing.assert_allclose(f, np.asarray(f_ref), atol=2e-3 * fmag)
    np.testing.assert_allclose(tau, np.asarray(tau_ref), atol=2e-3 * fmag)
    np.testing.assert_allclose(tau_j, np.asarray(tauj_ref),
                               atol=2e-3 * fmag)
    np.testing.assert_allclose(
        hist_new, np.asarray(hist_ref), atol=1e-6 + 1e-3 * np.abs(hist_ref).max()
    )
    np.testing.assert_allclose(pe, np.asarray(pe_ref),
                               atol=2e-3 * max(float(pe_ref.max()), 1e-6))
    assert inc.sum() > 3, "test system should have several contacts"


def test_pallas_conservative_matches_reference():
    """Conservative (exact-gradient) Pallas kernel vs the jnp autodiff
    path (pair_contact_rows(conservative=True)). Both differentiate the
    SAME sampled PE, one via jax.grad outside, one via in-kernel vjp —
    parity is the round-3 'done' gate (VERDICT.md item 1)."""
    shapes, params, state, pi, pj, mask, hist = _random_pairs(seed=5)
    rows = contact.particle_rows(state, shapes)
    (f_ref, tau_ref, tauj_ref, hist_ref, pe_ref, inc_ref,
     d_ref) = contact.pair_contact_rows(
        rows[pi], rows[pj], state.shtype[pi], state.shtype[pj], hist, mask,
        state.box_lo, state.box_hi, shapes, params,
        exact=True, periodic=(False, False, False), conservative=True,
    )
    d = minimum_image(
        state.x[pj] - state.x[pi], state.box_lo, state.box_hi,
        (False, False, False),
    )
    packed, tbl, cap, par = contact_pallas.pack_pairs(
        state, shapes, params, pi, pj, mask, hist, d
    )
    out = contact_pallas.pair_contact_pallas(
        packed, tbl, cap, par, lmax=shapes.lmax, block=64,
        interpret=True, conservative=True,
    )
    f = np.asarray(out[:, 0:3])
    tau = np.asarray(out[:, 3:6])
    tau_j = np.asarray(out[:, 6:9])
    pe = np.asarray(out[:, 15])
    inc = np.asarray(out[:, 16]) > 0.5

    fmag = max(float(jnp.abs(f_ref).max()), 1e-6)
    np.testing.assert_array_equal(inc, np.asarray(inc_ref))
    np.testing.assert_allclose(f, np.asarray(f_ref), atol=1e-4 * fmag)
    np.testing.assert_allclose(tau, np.asarray(tau_ref), atol=1e-4 * fmag)
    np.testing.assert_allclose(tau_j, np.asarray(tauj_ref),
                               atol=1e-4 * fmag)
    np.testing.assert_allclose(pe, np.asarray(pe_ref),
                               atol=1e-4 * max(float(pe_ref.max()), 1e-6))
    assert inc.sum() > 3, "test system should have several contacts"


def test_pallas_bf16_stage2_close_to_f32():
    """SPHERHARM_STAGE2_BF16 experiment knob: the bf16 Horner chains
    perturb the radius field by ~1e-3 relative, so forces/torques stay
    within ~1% of the f32 kernel and the contact SET is identical for
    non-grazing pairs. This pins the knob's plumbing + error scale; the
    throughput/drift tradeoff is measured on TPU (tpu_battery.sh)."""
    shapes, params, state, pi, pj, mask, hist = _random_pairs(seed=9)
    d = minimum_image(
        state.x[pj] - state.x[pi], state.box_lo, state.box_hi,
        (False, False, False),
    )
    packed, tbl, cap, par = contact_pallas.pack_pairs(
        state, shapes, params, pi, pj, mask, hist, d
    )
    outs = {}
    for bf16 in (False, True):
        outs[bf16] = np.asarray(contact_pallas.pair_contact_pallas(
            packed, tbl, cap, par, lmax=shapes.lmax, block=64,
            interpret=True, conservative=True, bf16=bf16,
        ))
    f32, bf = outs[False], outs[True]
    fmag = max(float(np.abs(f32[:, 0:3]).max()), 1e-6)
    np.testing.assert_allclose(bf[:, 0:3], f32[:, 0:3], atol=2e-2 * fmag)
    np.testing.assert_allclose(bf[:, 3:9], f32[:, 3:9], atol=2e-2 * fmag)
    # Contact flags agree except possibly at grazing depth.
    inc32, incbf = f32[:, 16] > 0.5, bf[:, 16] > 0.5
    assert (inc32 != incbf).mean() < 0.05
    assert inc32.sum() > 3


def test_two_stage_matches_single_stage():
    """Two-stage narrow phase (r-only coarse probe -> full kernel on
    survivors) must reproduce the single-stage forces exactly: stage 1
    may only cull pairs the full kernel finds force-free."""
    from spherharm_tpu.core.simulation import Simulation
    from spherharm_tpu.ops.neighbor import CellGrid

    rng = np.random.default_rng(3)
    lmax = 4
    coeffs = np.stack([
        shapes_library.blob_coeffs(lmax, seed=11 + t, mean_radius=0.5,
                                   roughness=0.12)
        for t in range(3)
    ])
    shapes = shapes_library.build_shapes(coeffs, lmax, contact_quad=(8, 16))
    box = 6.0
    n = 80
    # Dense-ish random gas: plenty of bounding-sphere candidates that are
    # NOT touching (the population stage 1 exists to cull).
    x = rng.uniform(0.8, box - 0.8, (n, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    params = SimParams.create(dt=1e-4, kn=1e5, gamma_n=20.0, mu=0.4,
                              cutoff=1.4, skin=0.3)
    state = scenarios.make_state(
        x, [0, 0, 0], [box] * 3, q=q,
        v=rng.normal(size=(n, 3)) * 0.3,
        scale=rng.uniform(0.85, 1.15, n),
        shtype=rng.integers(0, 3, n),
    )
    grid = CellGrid([0, 0, 0], [box] * 3, 1.7)
    kw = dict(neighbor_mode="cell", grid=grid, k_max=24, cell_cap=12,
              pair_capacity=1024, use_pallas=True, conservative=False)
    sim_a = Simulation(shapes, params, stage2_capacity=256, **kw)
    sim_b = Simulation(shapes, params, stage2_capacity=0, **kw)
    sa, na = sim_a.init_neighbors(state)
    sb, nb = sim_b.init_neighbors(state)
    sa, na, _ = sim_a.compute_forces(sa, na)
    sb, nb, _ = sim_b.compute_forces(sb, nb)
    assert int(na.overflow) < 256  # stage-2 capacity honored
    assert float(jnp.abs(sa.f).max()) > 0, "should have real contacts"
    np.testing.assert_allclose(np.asarray(sa.f), np.asarray(sb.f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sa.tau), np.asarray(sb.tau),
                               rtol=1e-6, atol=1e-6)
    # Pair lists differ in size/order (the prefiltered list is the
    # stage-2 compaction); springs must agree in the dense tag-keyed
    # layout both fold back into.
    np.testing.assert_allclose(
        np.asarray(contact.pair_hist_to_dense(na)),
        np.asarray(contact.pair_hist_to_dense(nb)),
        rtol=1e-6, atol=1e-9,
    )
