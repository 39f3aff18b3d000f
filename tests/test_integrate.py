"""Rigid-body integrator fidelity: torque-free top invariants
(SURVEY.md 7.3 "quaternion integrator fidelity")."""

import jax.numpy as jnp
import numpy as np
import pytest

from spherharm_tpu.core.simulation import Simulation
from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops import integrate, rotation


def _free_ellipsoid(dt=1e-3, angmom=(0.4, 0.05, 0.8), dtype=jnp.float32):
    lmax = 6
    shapes = shapes_library.build_shapes(
        [shapes_library.ellipsoid_coeffs(1.0, 0.7, 0.5, lmax)], lmax,
        dtype=dtype,
    )
    params = SimParams.create(dt=dt, kn=1.0, cutoff=2.5, dtype=dtype)
    state = scenarios.make_state(
        [[0.0, 0.0, 0.0]], [-5, -5, -5], [5, 5, 5],
        angmom=[angmom], dtype=dtype,
    )
    sim = Simulation(shapes, params, neighbor_mode="static", k_max=1, conservative=False)
    state, neigh = sim.init_neighbors(state)
    return sim, state, neigh


def test_torque_free_invariants():
    """Free asymmetric top: |L| exact, L vector exact (no torque),
    rotational KE conserved to integrator order."""
    sim, state, neigh = _free_ellipsoid()
    L0 = np.asarray(state.angmom[0])
    _, ke0 = integrate.kinetic_energy(state, sim.shapes)
    state, neigh = sim.run(state, neigh, 4000)
    L1 = np.asarray(state.angmom[0])
    _, ke1 = integrate.kinetic_energy(state, sim.shapes)
    np.testing.assert_allclose(L1, L0, atol=1e-7)  # no torques at all
    assert float(jnp.abs(ke1 - ke0) / ke0) < 2e-3  # Richardson 2nd order
    assert abs(float(jnp.linalg.norm(state.q[0])) - 1.0) < 1e-5


def test_rotation_rate_sphere():
    """Sphere spinning about z rotates by exactly omega * t."""
    lmax = 0
    shapes = shapes_library.build_shapes(
        [shapes_library.sphere_coeffs(1.0, lmax)], lmax
    )
    inertia = float(shapes.inertia[0, 2])
    omega_z = 0.5
    dt = 1e-3
    n = 2000
    params = SimParams.create(dt=dt, kn=1.0, cutoff=2.5)
    state = scenarios.make_state(
        [[0.0, 0.0, 0.0]], [-5, -5, -5], [5, 5, 5],
        angmom=[[0.0, 0.0, inertia * omega_z]],
    )
    sim = Simulation(shapes, params, neighbor_mode="static", k_max=1, conservative=False)
    state, neigh = sim.init_neighbors(state)
    state, neigh = sim.run(state, neigh, n)
    angle = omega_z * dt * n
    expect = rotation.quat_from_axis_angle(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(angle)
    )
    q = np.asarray(state.q[0])
    e = np.asarray(expect)
    # q and -q are the same rotation.
    err = min(np.abs(q - e).max(), np.abs(q + e).max())
    assert err < 1e-4


def test_richardson_second_order():
    """Halving dt reduces rotational-KE error ~4x for the asymmetric top
    (run in f64 so roundoff doesn't mask the convergence order)."""
    errs = []
    for dt in (2e-3, 1e-3):
        sim, state, neigh = _free_ellipsoid(dt=dt, dtype=jnp.float64)
        _, ke0 = integrate.kinetic_energy(state, sim.shapes)
        steps = int(2.0 / dt)
        state, neigh = sim.run(state, neigh, steps)
        _, ke1 = integrate.kinetic_energy(state, sim.shapes)
        errs.append(abs(float(ke1 - ke0)) / float(ke0))
    assert errs[1] < errs[0] / 2.5, errs


def test_omega_from_angmom_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(10, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q, jnp.float32)
    I = jnp.asarray(rng.uniform(0.5, 2.0, (10, 3)), jnp.float32)
    L = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    om = rotation.omega_from_angmom(q, L, I)
    # Invert: L = R I_body R^T om
    om_body = rotation.quat_rotate_inv(q, om)
    L_back = rotation.quat_rotate(q, I * om_body)
    np.testing.assert_allclose(np.asarray(L_back), np.asarray(L), atol=1e-5)
