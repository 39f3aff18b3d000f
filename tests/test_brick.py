"""Brick decomposition (2D/3D, weighted) == single device (SURVEY.md
2 B.6/3.5: the reference's Comm::set_proc_grid brick)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spherharm_tpu.core.simulation import Simulation
from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops.neighbor import CellGrid
from spherharm_tpu.parallel.brick import Brick2DSimulation, BrickSimulation
from spherharm_tpu.parallel.halo import balance_fracs

pytestmark = pytest.mark.slow


def _setup(n=96, lmax=2, seed=0):
    rng = np.random.default_rng(seed)
    shapes = shapes_library.build_shapes(
        [shapes_library.ellipsoid_coeffs(0.55, 0.45, 0.4, lmax)],
        lmax, contact_quad=(6, 12),
    )
    box = 8.0
    side = int(np.ceil(n ** (1 / 3)))
    pitch = box / side
    pts = [
        [(i % side + 0.5) * pitch, ((i // side) % side + 0.5) * pitch,
         (i // side**2 + 0.5) * pitch]
        for i in range(n)
    ]
    x = np.asarray(pts) + rng.uniform(-0.08, 0.08, (n, 3))
    v = rng.normal(size=(n, 3)) * 0.5
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    params = SimParams.create(dt=1e-3, kn=1e4, gamma_n=5.0, mu=0.3,
                              cutoff=1.2, skin=0.3)
    state = scenarios.make_state(x, [0, 0, 0], [box] * 3, v=v, q=q)
    return shapes, params, state, box


def _by_tag(state, field):
    tags = np.asarray(state.tag)
    act = np.asarray(state.active)
    arr = np.asarray(getattr(state, field))
    return {int(t): arr[i] for i, t in enumerate(tags) if act[i]}


def test_brick2d_matches_single_device():
    """2x2 brick == single device per tag, including cross-corner
    contacts and migration over both axes."""
    shapes, params, state0, box = _setup()
    periodic = (True, True, True)

    grid = CellGrid([0, 0, 0], [box] * 3, 1.5, periodic)
    sim1 = Simulation(
        shapes, params, periodic=periodic, neighbor_mode="cell",
        grid=grid, k_max=24, cell_cap=12, pair_capacity=1024,
        conservative=False,
    )
    s1, n1 = sim1.init_neighbors(state0)
    s1, n1 = sim1.run(s1, n1, 120)
    t1 = sim1.thermo(s1, n1)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    simb = Brick2DSimulation(
        shapes, params, mesh=mesh, box_lo=(0, 0, 0),
        box_hi=(box, box, box), cap_local=96, halo_cap=64, migrate_cap=24,
        periodic=periodic, k_max=24, cell_cap=12, pair_capacity=768,
        conservative=False,
    )
    sb, ngb, ghb = simb.init(state0)
    sb, ngb, ghb = simb.run(sb, ngb, ghb, 120)
    tb = simb.thermo(sb, ngb, ghb)
    assert int(tb["neigh_overflow"]) <= 64

    xa, xb = _by_tag(s1, "x"), _by_tag(sb, "x")
    va, vb = _by_tag(s1, "v"), _by_tag(sb, "v")
    assert set(xa) == set(xb)
    L = box
    for t in xa:
        dx = (xb[t] - xa[t] + L / 2) % L - L / 2
        np.testing.assert_allclose(dx, 0.0, atol=2e-3,
                                   err_msg=f"x tag {t}")
        np.testing.assert_allclose(vb[t], va[t], atol=5e-3,
                                   err_msg=f"v tag {t}")
    assert float(tb["ke"]) == pytest.approx(float(t1["ke"]), rel=1e-3)
    assert float(tb["etot"]) == pytest.approx(float(t1["etot"]), rel=1e-3)


def test_brick2d_migration_both_axes():
    """Strong drift along x AND y crosses brick boundaries in both dims
    (incl. diagonally); no particle lost or duplicated."""
    shapes, params, state0, box = _setup(n=64, seed=2)
    v = np.array(state0.v)
    v[:, 0] += 2.0
    v[:, 1] += 1.5
    state0 = state0.replace(v=jnp.asarray(v, jnp.float32))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    sim = Brick2DSimulation(
        shapes, params, mesh=mesh, box_lo=(0, 0, 0),
        box_hi=(box, box, box), cap_local=64, halo_cap=48, migrate_cap=32,
        periodic=(True, True, True), k_max=24, cell_cap=12,
        pair_capacity=512,
        conservative=False,
    )
    s, ng, gh = sim.init(state0)
    tags0 = sorted(
        int(t) for t, a in zip(np.asarray(s.tag), np.asarray(s.active)) if a
    )
    for _ in range(6):
        s, ng, gh = sim.run(s, ng, gh, 100)
    tags1 = sorted(
        int(t) for t, a in zip(np.asarray(s.tag), np.asarray(s.active)) if a
    )
    assert tags0 == tags1 == list(range(1, 65))
    assert int(ng.overflow) < 512
    # Particles spread across all 4 bricks.
    act = np.asarray(s.active)
    bx = np.clip(np.asarray(s.x)[:, 0] // (box / 2), 0, 1)
    by = np.clip(np.asarray(s.x)[:, 1] // (box / 2), 0, 1)
    blocks = {(int(a), int(b)) for a, b, ok in zip(bx, by, act) if ok}
    assert len(blocks) == 4


def test_brick3d_matches_single_device():
    """2x2x2 brick == single device per tag: the full 3D proc-grid of
    the reference's Comm::set_proc_grid (SURVEY.md 3.5), with corner
    ghosts riding the third halo phase and migration over all axes."""
    shapes, params, state0, box = _setup(n=96, seed=7)
    periodic = (True, True, True)

    grid = CellGrid([0, 0, 0], [box] * 3, 1.5, periodic)
    sim1 = Simulation(
        shapes, params, periodic=periodic, neighbor_mode="cell",
        grid=grid, k_max=24, cell_cap=12, pair_capacity=1024,
        conservative=False,
    )
    s1, n1 = sim1.init_neighbors(state0)
    s1, n1 = sim1.run(s1, n1, 120)
    t1 = sim1.thermo(s1, n1)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("x", "y", "z"))
    simb = BrickSimulation(
        shapes, params, mesh=mesh, box_lo=(0, 0, 0),
        box_hi=(box, box, box), cap_local=96, halo_cap=64, migrate_cap=24,
        periodic=periodic, k_max=24, cell_cap=12, pair_capacity=768,
        conservative=False,
    )
    sb, ngb, ghb = simb.init(state0)
    sb, ngb, ghb = simb.run(sb, ngb, ghb, 120)
    tb = simb.thermo(sb, ngb, ghb)
    assert int(tb["neigh_overflow"]) == 0

    xa, xb = _by_tag(s1, "x"), _by_tag(sb, "x")
    va, vb = _by_tag(s1, "v"), _by_tag(sb, "v")
    assert set(xa) == set(xb)
    L = box
    for t in xa:
        dx = (xb[t] - xa[t] + L / 2) % L - L / 2
        np.testing.assert_allclose(dx, 0.0, atol=2e-3,
                                   err_msg=f"x tag {t}")
        np.testing.assert_allclose(vb[t], va[t], atol=5e-3,
                                   err_msg=f"v tag {t}")
    assert float(tb["ke"]) == pytest.approx(float(t1["ke"]), rel=1e-3)
    assert float(tb["etot"]) == pytest.approx(float(t1["etot"]), rel=1e-3)


def test_brick_weighted_bounds_clustered():
    """Weighted per-axis bounds (LAMMPS `balance x y weighted` on the
    brick): a corner-clustered gas fits a cap_local that uniform 2x2
    bricks would overflow, and still matches single device per tag."""
    lmax = 2
    rng = np.random.default_rng(11)
    shapes = shapes_library.build_shapes(
        [shapes_library.ellipsoid_coeffs(0.55, 0.45, 0.4, lmax)],
        lmax, contact_quad=(6, 12),
    )
    box = 12.0
    n = 96
    # ~3/4 of particles clustered in the low-x low-y corner quadrant.
    x = np.empty((n, 3))
    nc = 72
    x[:nc] = rng.uniform(0.5, 4.5, (nc, 3))
    x[nc:] = rng.uniform(0.5, box - 0.5, (n - nc, 3))
    v = rng.normal(size=(n, 3)) * 0.4
    params = SimParams.create(dt=1e-3, kn=1e4, gamma_n=5.0, mu=0.3,
                              cutoff=1.2, skin=0.3)
    state0 = scenarios.make_state(x, [0, 0, 0], [box] * 3, v=v)

    grid = CellGrid([0, 0, 0], [box] * 3, 1.5, (True,) * 3)
    sim1 = Simulation(
        shapes, params, periodic=(True,) * 3, neighbor_mode="cell",
        grid=grid, k_max=24, cell_cap=12, pair_capacity=1024,
        conservative=False,
    )
    s1, n1 = sim1.init_neighbors(state0)
    # 60 steps: long enough for several migrations/rebuilds, short
    # enough that f32 reduction-order divergence in the dense cluster
    # stays below the per-tag tolerance.
    s1, n1 = sim1.run(s1, n1, 60)

    min_frac = (params.cutoff + params.skin) / box
    bounds = {
        ax: balance_fracs(state0, 2, min_frac=min_frac, axis=d)
        for d, ax in enumerate(("x", "y"))
    }
    # Weighted cuts sit well below the uniform 0.5 midpoint.
    assert bounds["x"][1] < 0.45 and bounds["y"][1] < 0.45

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    # cap_local=48: the uniform corner brick would hold ~72 > 48.
    simb = BrickSimulation(
        shapes, params, mesh=mesh, box_lo=(0, 0, 0),
        box_hi=(box,) * 3, cap_local=48, halo_cap=48, migrate_cap=24,
        # Weighted cuts leave the WIDE brick with coarse bins (the bin
        # grid is sized for the narrowest brick) — higher occupancy cap.
        periodic=(True,) * 3, k_max=24, cell_cap=36, pair_capacity=512,
        bounds_frac=bounds,
        conservative=False,
    )
    sb, ngb, ghb = simb.init(state0)
    sb, ngb, ghb = simb.run(sb, ngb, ghb, 60)
    tb = simb.thermo(sb, ngb, ghb)
    assert int(tb["neigh_overflow"]) == 0
    assert int(tb["n"]) == n

    t1 = sim1.thermo(s1, n1)
    assert float(tb["ke"]) == pytest.approx(float(t1["ke"]), rel=1e-3)
    assert float(tb["etot"]) == pytest.approx(float(t1["etot"]), rel=1e-3)
    xa, xb = _by_tag(s1, "x"), _by_tag(sb, "x")
    assert set(xa) == set(xb)
    for t in xa:
        dx = (xb[t] - xa[t] + box / 2) % box - box / 2
        np.testing.assert_allclose(dx, 0.0, atol=5e-3,
                                   err_msg=f"x tag {t}")


def test_brick2d_gather_restart_roundtrip(tmp_path):
    """The slab class's gather_restart/init(restart=...) machinery is
    inherited by the brick (owned-rows-lead layout assumption): resume
    a 2x2-brick run from a checkpoint and match the uninterrupted run."""
    shapes, params, state0, box = _setup(n=48, seed=5)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    kw = dict(
        shapes=shapes, params=params, mesh=mesh,
        box_lo=(0, 0, 0), box_hi=(box, box, box),
        cap_local=48, halo_cap=32, migrate_cap=16,
        periodic=(True, True, True), k_max=16, cell_cap=10,
        pair_capacity=384,
        conservative=False,
    )
    sim = Brick2DSimulation(**kw)
    s, ng, gh = sim.init(state0)
    s, ng, gh = sim.run(s, ng, gh, 150)

    gstate, payload = sim.gather_restart(s, ng)
    sim2 = Brick2DSimulation(**kw)
    s2, n2, g2 = sim2.init(gstate, restart=payload)

    s, ng, gh = sim.run(s, ng, gh, 150)
    s2, n2, g2 = sim2.run(s2, n2, g2, 150)

    a = _by_tag(s, "x")
    b = _by_tag(s2, "x")
    assert set(a) == set(b)
    L = box
    for t in a:
        dx = (b[t] - a[t] + L / 2) % L - L / 2
        np.testing.assert_allclose(dx, 0.0, atol=2e-3,
                                   err_msg=f"x tag {t}")


def test_brick_inrun_rebalance():
    """Mid-run per-axis rebalance on a 2x2 brick: bounds move via the
    traced per-phase fracs leaves, ownership migrates in one forced
    rebuild, trajectory still matches the single-device reference."""
    shapes, params, state0, box = _setup(n=64, seed=9)
    periodic = (True, True, True)

    grid = CellGrid([0, 0, 0], [box] * 3, 1.5, periodic)
    sim1 = Simulation(
        shapes, params, periodic=periodic, neighbor_mode="cell",
        grid=grid, k_max=24, cell_cap=12, pair_capacity=1024,
        conservative=False,
    )
    s1, n1 = sim1.init_neighbors(state0)
    s1, n1 = sim1.run(s1, n1, 50)
    s1, n1 = sim1.run(s1, n1, 50)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    simb = BrickSimulation(
        shapes, params, mesh=mesh, box_lo=(0, 0, 0),
        box_hi=(box, box, box),
        cap_local=96, halo_cap=64, migrate_cap=32,
        periodic=periodic, k_max=24, cell_cap=12, pair_capacity=768,
        conservative=False,
    )
    sb, ngb, ghb = simb.init(state0)
    sb, ngb, ghb = simb.run(sb, ngb, ghb, 50)
    fr_before = [np.asarray(jax.device_get(g.fracs)) for g in ghb]
    sb, ngb, ghb = simb.rebalance(sb, ngb, ghb)
    fr_after = [np.asarray(jax.device_get(g.fracs)) for g in ghb]
    assert any(
        not np.allclose(a, b) for a, b in zip(fr_before, fr_after)
    )
    sb, ngb, ghb = simb.run(sb, ngb, ghb, 50)
    tb = simb.thermo(sb, ngb, ghb)
    assert int(tb["neigh_overflow"]) <= 64

    def by_tag(st):
        tags = np.asarray(st.tag)
        act = np.asarray(st.active)
        arr = np.asarray(st.x)
        return {int(t): arr[i] for i, t in enumerate(tags) if act[i]}

    a, b = by_tag(s1), by_tag(sb)
    assert set(a.keys()) == set(b.keys())
    for t in a:
        np.testing.assert_allclose(b[t], a[t], atol=3e-3,
                                   err_msg=f"x mismatch tag {t}")


def test_brick_triclinic_matches_single():
    """Statically tilted periodic cell over a 2x2 (x, y) brick ==
    single device: the y-seam ghost shift carries the xy tilt (full
    cell-vector seams) and raw-coordinate membership reaches through
    the tilt pads."""
    rng = np.random.default_rng(12)
    lmax = 2
    shapes = shapes_library.build_shapes(
        [shapes_library.ellipsoid_coeffs(0.55, 0.45, 0.4, lmax)],
        lmax, contact_quad=(6, 12),
    )
    box = 8.0
    tilt = [1.2, 0.0, 0.0]  # xy
    n = 72
    side = int(np.ceil(n ** (1 / 3)))
    pitch = box / side
    pts = [[(i % side + 0.5) * pitch,
            ((i // side) % side + 0.5) * pitch,
            (i // side**2 + 0.5) * pitch] for i in range(n)]
    x = np.asarray(pts) + rng.uniform(-0.06, 0.06, (n, 3))
    v = rng.normal(size=(n, 3)) * 0.5
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    params = SimParams.create(dt=1e-3, kn=1e4, gamma_n=5.0, mu=0.3,
                              cutoff=1.2, skin=0.3)
    state0 = scenarios.make_state(
        x, [0, 0, 0], [box] * 3, v=v, q=q, tilt=tilt,
    )
    periodic = (True, True, True)

    grid = CellGrid([0, 0, 0], [box] * 3, 1.5 * 1.4, periodic)
    sim1 = Simulation(
        shapes, params, periodic=periodic, neighbor_mode="cell",
        grid=grid, k_max=24, cell_cap=16, pair_capacity=1024,
        triclinic=True,
        conservative=False,
    )
    s1, n1 = sim1.init_neighbors(state0)
    s1, n1 = sim1.run(s1, n1, 120)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    simb = BrickSimulation(
        shapes, params, mesh=mesh, box_lo=(0, 0, 0),
        box_hi=(box, box, box),
        cap_local=96, halo_cap=72, migrate_cap=32,
        periodic=periodic, k_max=24, cell_cap=16, pair_capacity=768,
        triclinic=True, tilt_pad=1.3,
        conservative=False,
    )
    sb, ngb, ghb = simb.init(state0)
    sb, ngb, ghb = simb.run(sb, ngb, ghb, 120)
    tb = simb.thermo(sb, ngb, ghb)
    assert int(tb["neigh_overflow"]) <= 72

    t1 = sim1.thermo(s1, n1)

    def by_tag(st):
        tags = np.asarray(st.tag)
        act = np.asarray(st.active)
        arr = np.asarray(st.x)
        return {int(t): arr[i] for i, t in enumerate(tags) if act[i]}

    a, b = by_tag(s1), by_tag(sb)
    assert set(a.keys()) == set(b.keys())
    for t in a:
        np.testing.assert_allclose(b[t], a[t], atol=3e-3,
                                   err_msg=f"x mismatch tag {t}")
    assert float(tb["etot"]) == pytest.approx(float(t1["etot"]), rel=2e-3)
