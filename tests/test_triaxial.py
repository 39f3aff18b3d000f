"""Config 5 acceptance (BASELINE.json:11): triaxial shear cell with PBC
and stress-tensor output; sharded variant with halo exchange via lax
collectives, validated against the single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spherharm_tpu.models import scenarios


pytestmark = pytest.mark.slow  # minutes-long physics horizons


def test_triaxial_compression_builds_pressure():
    sim, state, neigh = scenarios.triaxial_cell(
        n=64, lmax=2, strain_rate=(-0.2, -0.2, -0.2), dt=2e-4, k_max=24,
    )
    box0 = float(state.box_hi[0] - state.box_lo[0])
    p = []
    for _ in range(5):
        state, neigh = sim.run(state, neigh, 400)
        t = sim.thermo(state, neigh)
        p.append(float(t["press"]))
    box1 = float(state.box_hi[0] - state.box_lo[0])
    # Box shrank per the strain-rate integral: L = L0 * (1 - r*dt)^steps.
    expect = box0 * (1 - 0.2 * 2e-4) ** 2000
    assert box1 == pytest.approx(expect, rel=1e-4)
    # Dense compression raises pressure by orders of magnitude.
    assert p[-1] > 10 * max(p[0], 1e-8)
    # Stress tensor sane: compressive (positive diagonal), finite, and
    # shear components bounded by the normal ones. (Neither isotropy nor
    # exact symmetry holds at 64 particles: the contact network is noisy
    # and the antisymmetric part is balanced by contact torques.)
    stress = np.asarray(t["stress"])
    diag = np.diag(stress)
    assert np.isfinite(stress).all()
    assert (diag > 0).all(), diag
    off = stress - np.diag(diag)
    assert np.abs(off).max() < 5.0 * abs(diag).max()
    # All particles retained.
    assert int(state.n_active) == 64
    assert int(neigh.overflow) < sim.pair_capacity


def test_pressure_servo_reaches_target():
    """Berendsen stress control drives the cell toward the target
    pressure (fix press/berendsen analogue, SURVEY.md 2 B.5)."""
    target = 5.0
    sim, state, neigh = scenarios.triaxial_cell(
        n=64, lmax=2, strain_rate=(0.0, 0.0, 0.0),
        press_target=target, press_tau=2e-3, dt=2e-4, k_max=24,
        fill_fraction=0.42, gamma_n=200.0,
    )
    box0 = float(state.box_hi[0] - state.box_lo[0])
    p_hist = []
    for _ in range(8):
        state, neigh = sim.run(state, neigh, 300)
        p_hist.append(float(sim.thermo(state, neigh)["press"]))
    box1 = float(state.box_hi[0] - state.box_lo[0])
    assert box1 < box0  # servo compressed the loose cell
    # Instantaneous pressure of a 64-particle cell fluctuates ~10x
    # sample to sample (the trajectory is chaotic: bit-level force
    # reassociation re-rolls individual samples), so assert on the
    # MEDIAN of the second half — the quantity the servo actually
    # regulates on its own timescale.
    p_late = float(np.median(p_hist[4:]))
    assert p_late > 0.3 * target
    assert p_late < 3.0 * target
    # and moved closer to the target overall
    assert abs(p_late - target) < abs(p_hist[0] - target)


def test_triaxial_sharded_matches_single():
    n_dev = 2  # slab width must exceed cutoff+skin for this small box
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    kw = dict(n=64, lmax=2, strain_rate=(-0.1, -0.1, -0.1), dt=2e-4,
              k_max=24, seed=3)
    sim1, s1, n1 = scenarios.triaxial_cell(**kw)
    sim2, s2, n2, g2 = scenarios.triaxial_cell(
        **kw, sharded=True, mesh=mesh,
    )
    s1, n1 = sim1.run(s1, n1, 150)
    s2, n2, g2 = sim2.run(s2, n2, g2, 150)
    t1 = sim1.thermo(s1, n1)
    t2 = sim2.thermo(s2, n2, g2)
    assert float(t2["ke"]) == pytest.approx(float(t1["ke"]), rel=2e-3)
    assert float(t2["press"]) == pytest.approx(float(t1["press"]),
                                               rel=2e-2, abs=1e-6)
    # Same box deformation on both paths.
    np.testing.assert_allclose(
        np.asarray(s2.box_hi), np.asarray(s1.box_hi), rtol=1e-6
    )
    # Per-tag positions agree.
    def pos_by_tag(state):
        tags = np.asarray(state.tag)
        act = np.asarray(state.active)
        xs = np.asarray(state.x)
        return {int(t): xs[i] for i, t in enumerate(tags) if act[i]}

    a, b = pos_by_tag(s1), pos_by_tag(s2)
    assert set(a) == set(b)
    for t in a:
        np.testing.assert_allclose(a[t], b[t], atol=3e-3,
                                   err_msg=f"tag {t}")
