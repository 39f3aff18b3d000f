"""Setup force pass must not advance friction-spring history.

The reference's Verlet::setup() runs the force computation so step 0
integrates f(t0), but with the shear-history update suppressed — a
pre-contacting pair otherwise accumulates a double dt of tangential
spring displacement at t0 (once at setup, once in the first real step
over the same configuration). Pins Simulation.init_neighbors and the
sharded _init_jit / _rebalance_jit equivalents.
"""

import jax.numpy as jnp
import numpy as np

from spherharm_tpu.core.simulation import Simulation
from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library


def _contacting_pair():
    lmax = 0
    shapes = shapes_library.build_shapes(
        [shapes_library.sphere_coeffs(0.5, lmax)], lmax,
        density=1.0, contact_quad=(12, 24),
    )
    params = SimParams.create(
        dt=2e-4, kn=1e5, gamma_n=0.0, mu=0.4, skin=0.05, cutoff=1.05,
    )
    # Overlapping at t0 and shearing tangentially: the spring update,
    # if run, is nonzero from the very first force evaluation.
    state = scenarios.make_state(
        [[-0.48, 0.0, 0.0], [0.48, 0.0, 0.0]],
        [-2, -2, -2], [2, 2, 2],
        v=[[0.0, 0.5, 0.0], [0.0, -0.5, 0.0]],
    )
    sim = Simulation(shapes, params, neighbor_mode="allpairs", k_max=1, conservative=False)
    return sim, state


def test_setup_pass_fills_forces_but_not_springs():
    sim, state = _contacting_pair()
    state, neigh = sim.init_neighbors(state)
    # Forces ARE filled (step 0 integrates f(t0))...
    assert float(jnp.max(jnp.abs(state.f))) > 0.0
    # ...but spring history is untouched (the allpairs/dense path keeps
    # springs in neigh.hist; the pair-list path in neigh.pair_hist).
    for h in (neigh.hist, neigh.pair_hist, neigh.wall_hist):
        if h.size:
            assert float(jnp.max(jnp.abs(h))) == 0.0
    # One real step then advances the tangential spring exactly once.
    state, neigh = sim.run(state, neigh, 1)
    assert float(jnp.max(jnp.abs(neigh.hist))) > 0.0


def test_first_step_spring_matches_single_tick():
    """The first step's spring displacement is one dt of tangential
    relative motion, not two (the double-tick symptom)."""
    sim, state = _contacting_pair()
    state, neigh = sim.init_neighbors(state)
    state, neigh = sim.run(state, neigh, 1)
    mag = float(np.abs(np.asarray(neigh.hist)).max())
    # Tangential relative speed 1.0, dt=2e-4 -> one tick ~2e-4 (the
    # update uses the post-half-kick velocity; allow 30% slack — a
    # double tick would be ~2x, far outside).
    assert 0.7 * 2e-4 < mag < 1.3 * 2e-4
