"""Replica ensembles (vmap sweeps) + sanitizer utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from spherharm_tpu.models import scenarios
from spherharm_tpu.parallel import ensemble
from spherharm_tpu.utils import validate


def test_replica_sweep_gamma():
    """A restitution sweep in ONE compiled program: higher damping ->
    lower outgoing speed, and the gamma=0 replica matches the solo run."""
    sim, state, neigh = scenarios.two_body_collision(gamma_n=0.0, dt=2e-4, conservative=False)
    R = 4
    states = ensemble.replicate(state, R)
    neighs = ensemble.replicate(neigh, R)
    gammas = jnp.asarray([0.0, 50.0, 150.0, 400.0], jnp.float32)
    params_stack = ensemble.with_param_sweep(sim.params, gamma_n=gammas)
    s_out, n_out = ensemble.run_replicas(sim, states, neighs, params_stack,
                                         3000)
    v_out = np.asarray(s_out.v)[:, 0, 0]  # replica, particle 0, x
    speeds = -v_out
    assert speeds[0] > 0.99
    assert np.all(np.diff(speeds) < 0), speeds  # monotone in gamma
    # cross-check vs non-vmapped run
    s1, n1 = sim.run(state, neigh, 3000)
    np.testing.assert_allclose(v_out[0], float(s1.v[0, 0]), atol=2e-3)


def test_validate_helpers():
    sim, state, neigh = scenarios.two_body_collision(conservative=False)
    validate.check_finite(state, "initial")
    rep = validate.audit_capacities(sim, neigh)
    assert rep["overflow_channel"] == (0, 0)
    validate.assert_no_overflow(sim, neigh)

    bad = state.replace(v=state.v.at[0, 0].set(jnp.nan))
    try:
        validate.check_finite(bad, "poisoned")
        raise AssertionError("check_finite missed a NaN")
    except FloatingPointError:
        pass


def test_determinism():
    sim, state, neigh = scenarios.two_body_collision(conservative=False)

    def runner(s, n):
        return sim.run(s, n, 200)

    ok = validate.determinism_check(runner, lambda: (state, neigh))
    assert ok
