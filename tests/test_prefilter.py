"""Rebuild-time narrow-phase prefilter == per-step full-list physics.

The prefilter (ops.contact.prefilter_pair_list) compacts the candidate
pair list to near-contact pairs once per rebuild; correctness rests on
the rotation-aware skin trigger (ops.neighbor.max_approach). These pin:
trajectory equivalence vs the unfiltered pair list, the rotation term
of the trigger, and loud overflow when the kept-list capacity is too
small (SURVEY.md 2 B.3/B.4 neighbor + pair orchestration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherharm_tpu.core.simulation import Simulation
from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops import neighbor
from spherharm_tpu.ops.neighbor import CellGrid


def _setup(n=48, lmax=4, seed=3, box=10.0, skin=0.3):
    shapes = shapes_library.build_shapes(
        [shapes_library.blob_coeffs(lmax, seed=t, mean_radius=0.5,
                                    roughness=0.12) for t in range(2)],
        lmax, contact_quad=(8, 16),
    )
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.6, box - 0.6, (n, 3))
    v = rng.normal(size=(n, 3)) * 0.5
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    params = SimParams.create(dt=1e-3, kn=1e4, kt=5e3, gamma_n=5.0,
                              mu=0.3, cutoff=1.3, skin=skin)
    state = scenarios.make_state(
        x, [0, 0, 0], [box] * 3, v=v, q=q,
        shtype=rng.integers(0, 2, n),
    )
    return shapes, params, state


def _mk(shapes, params, box, stage2, pair_cap=2048, **kw):
    grid = CellGrid([0, 0, 0], [box] * 3, 1.6, (True,) * 3)
    # Prefilter equivalence, not drift, is the subject (conservative
    # coverage: test_conservative.py) — geometric keeps CPU cost sane.
    kw.setdefault("conservative", False)
    return Simulation(
        shapes, params, periodic=(True,) * 3, neighbor_mode="cell",
        grid=grid, k_max=24, cell_cap=12, pair_capacity=pair_cap,
        use_pallas=True, stage2_capacity=stage2, **kw,
    )


def test_prefilter_matches_full_list():
    """Prefiltered (stage-2-compacted) pair list reproduces the full
    candidate-list trajectory: the dropped pairs can exert no force
    before the next rebuild."""
    # Dense enough that many bounding-sphere candidates have real
    # surface gaps beyond the margin (the pairs the probe cuts), with a
    # small skin so the window allowance doesn't re-admit everything.
    box = 7.0
    shapes, params, state0 = _setup(n=72, box=box, skin=0.12)
    sim_a = _mk(shapes, params, box, stage2=0)       # full list
    sim_b = _mk(shapes, params, box, stage2=1024)    # prefiltered
    assert not sim_a.prefilter and sim_b.prefilter

    sa, na = sim_a.init_neighbors(state0)
    sb, nb = sim_b.init_neighbors(state0)
    # Same build positions at init: the prefiltered list must be a
    # strict subset of the candidates (it actually filtered).
    kept = int(jnp.sum(nb.pair_valid))
    cand = int(jnp.sum(na.pair_valid))
    assert 0 < kept < cand, (kept, cand)
    sa, na = sim_a.run(sa, na, 150)
    sb, nb = sim_b.run(sb, nb, 150)
    assert int(na.overflow) == 0 and int(nb.overflow) == 0
    np.testing.assert_allclose(np.asarray(sb.x), np.asarray(sa.x),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(sb.v), np.asarray(sa.v),
                               rtol=0, atol=5e-4)
    ta = sim_a.thermo(sa, na)
    tb = sim_b.thermo(sb, nb)
    assert float(tb["etot"]) == pytest.approx(float(ta["etot"]), rel=1e-5)


def test_prefilter_cadence_mode():
    """Same equivalence under the static rebuild cadence (the bench
    configuration), including spring history through rebuilds."""
    box = 10.0
    shapes, params, state0 = _setup(seed=5)
    sim_a = _mk(shapes, params, box, stage2=0, rebuild_every=10)
    sim_b = _mk(shapes, params, box, stage2=1024, rebuild_every=10)
    sa, na = sim_a.init_neighbors(state0)
    sb, nb = sim_b.init_neighbors(state0)
    # 60 steps: long enough for 6 scheduled rebuilds with migrations,
    # short enough that ulp-level summation-order noise (the compacted
    # list sums the same contacts in a different order) stays below
    # tolerance under contact chaos.
    sa, na = sim_a.run(sa, na, 60)
    sb, nb = sim_b.run(sb, nb, 60)
    assert int(nb.overflow) == 0
    assert int(nb.skin_violations) == int(na.skin_violations)
    np.testing.assert_allclose(np.asarray(sb.x), np.asarray(sa.x),
                               rtol=0, atol=1e-4)
    ta = sim_a.thermo(sa, na)
    tb = sim_b.thermo(sb, nb)
    assert float(tb["etot"]) == pytest.approx(float(ta["etot"]), rel=1e-5)


def test_prefilter_overflow_flags():
    """Too-small kept-list capacity must flag loudly, not drop pairs."""
    box = 6.0
    shapes, params, state0 = _setup(n=64, box=box, seed=7)
    sim = _mk(shapes, params, box, stage2=8, pair_cap=4096)
    s, ng = sim.init_neighbors(state0)
    assert int(ng.overflow) > 8


def test_rotation_aware_trigger():
    """max_approach grows with pure rotation (no displacement) scaled
    by gmax; spheres (gmax=0) are immune."""
    lmax = 4
    shapes = shapes_library.build_shapes(
        [shapes_library.ellipsoid_coeffs(0.7, 0.45, 0.45, lmax),
         shapes_library.sphere_coeffs(0.5, lmax)],
        lmax,
    )
    n = 2
    x = np.array([[1.0, 1.0, 1.0], [3.0, 1.0, 1.0]])
    q0 = np.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    alpha = 0.3
    qrot = np.array([
        [np.cos(alpha / 2), 0.0, 0.0, np.sin(alpha / 2)],
        [1.0, 0, 0, 0],
    ])
    active = np.array([True, True])
    for types, expect_growth in (([0, 0], True), ([1, 1], False)):
        gmax_s = np.asarray(shapes.gmax)[np.asarray(types)]
        appr = neighbor.max_approach(
            jnp.asarray(x), jnp.asarray(x), jnp.asarray(qrot),
            jnp.asarray(q0), jnp.asarray(gmax_s), jnp.asarray(active),
            jnp.zeros(3), jnp.full(3, 10.0), (False,) * 3,
        )
        if expect_growth:
            ref = float(shapes.gmax[0]) * alpha
            assert float(appr) == pytest.approx(ref, rel=1e-4)
        else:
            assert float(appr) < 1e-6

    # A spinning ellipsoid whose long axis rotates toward a neighbor
    # must trigger a rebuild before the bump arrives: the approach
    # bound at angle alpha exceeds the actual radial surface change.
    th = np.linspace(0, np.pi, 200)
    r_of = lambda a: 1.0 / np.sqrt(
        (np.cos(a) / 0.7) ** 2 + (np.sin(a) / 0.45) ** 2
    )
    dr = abs(r_of(0.0) - r_of(alpha))
    assert float(shapes.gmax[0]) * alpha >= dr
