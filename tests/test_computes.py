"""Compute registry + per-atom stress (the reference's Compute styles,
SURVEY.md 2 B.5 — VERDICT r1 flagged 'no general compute registry, no
per-atom stress')."""

import jax.numpy as jnp
import numpy as np
import pytest

from spherharm_tpu.core import computes
from spherharm_tpu.core.simulation import Simulation
from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops.neighbor import CellGrid


def _dense_gas(n=64, lmax=2, seed=0):
    rng = np.random.default_rng(seed)
    shapes = shapes_library.build_shapes(
        [shapes_library.ellipsoid_coeffs(0.55, 0.45, 0.4, lmax)],
        lmax, contact_quad=(6, 12),
    )
    box = 6.0
    side = int(np.ceil(n ** (1 / 3)))
    pitch = box / side
    pts = [
        [(i % side + 0.5) * pitch, ((i // side) % side + 0.5) * pitch,
         (i // side**2 + 0.5) * pitch]
        for i in range(n)
    ]
    x = np.asarray(pts) + rng.uniform(-0.1, 0.1, (n, 3))
    v = rng.normal(size=(n, 3)) * 0.5
    params = SimParams.create(dt=1e-3, kn=1e4, gamma_n=5.0, mu=0.4,
                              cutoff=1.2, skin=0.3)
    state = scenarios.make_state(x, [0, 0, 0], [box] * 3, v=v)
    grid = CellGrid([0, 0, 0], [box] * 3, 1.5, (True, True, True))
    sim = Simulation(
        shapes, params, periodic=(True, True, True), neighbor_mode="cell",
        grid=grid, k_max=16, cell_cap=10, pair_capacity=1024,
        conservative=False,  # observable plumbing, not drift, is the subject
    )
    state, neigh = sim.init_neighbors(state)
    # A few steps so contacts carry live springs.
    state, neigh = sim.run(state, neigh, 40)
    return sim, state, neigh


def test_per_atom_stress_sums_to_global_virial():
    """LAMMPS identity: sum_i S_i == -(thermo stress tensor) * V."""
    sim, state, neigh = _dense_gas()
    s_atom = computes.per_atom_stress(sim, state, neigh)
    total = np.asarray(jnp.sum(s_atom, axis=0))
    t = sim.thermo(state, neigh)
    vol = float(jnp.prod(state.box_hi - state.box_lo))
    expect = -np.asarray(t["stress"]) * vol
    assert np.abs(expect).max() > 1e-6  # contacts actually present
    np.testing.assert_allclose(total, expect, rtol=1e-4, atol=1e-6)


def test_pressure_compute_matches_thermo_press():
    sim, state, neigh = _dense_gas(seed=3)
    p = float(computes.compute("pressure", sim, state, neigh))
    t = sim.thermo(state, neigh)
    assert p == pytest.approx(float(t["press"]), rel=1e-4, abs=1e-7)


def test_scalar_registry_and_errors():
    sim, state, neigh = _dense_gas(n=27, seed=1)
    temp = float(computes.compute("temp", sim, state, neigh))
    assert temp > 0
    ka = computes.compute("ke/atom", sim, state, neigh)
    assert float(jnp.sum(ka)) == pytest.approx(
        float(computes.compute("ke", sim, state, neigh)), rel=1e-5
    )
    with pytest.raises(KeyError, match="unknown compute"):
        computes.compute("cna/atom", sim, state, neigh)


def test_deck_compute_command():
    from spherharm_tpu.io.deck import DeckRunner

    r = DeckRunner()
    r.run_text("""
units           lj
boundary        p p p
atom_style      spherharm
region          box block 0 6 0 6 0 6
create_box      1 box
shape           1 sphere 0.45
lattice         sc 1.2
create_atoms    1 region box seed 9
velocity        all create 0.3 4
pair_style      spherharm 1e4 1e4 5 5 0.3
pair_coeff      * *
compute         mytemp all temp
compute         sa all stress/atom
timestep        1e-3
thermo          25
run             50
""")
    # Scalar compute appears in thermo rows.
    assert "c_mytemp" in r.thermo_log.rows[-1]
    assert r.thermo_log.rows[-1]["c_mytemp"] > 0
    # Per-atom compute evaluable on demand.
    sa = r.compute("sa")
    n = int(r.state.n_active)
    assert np.asarray(sa).shape[0] >= n


def test_coord_and_contact_atom():
    """Two overlapping + one distant particle: coord counts bounding-
    sphere proximity, contact counts true narrow-phase contacts."""
    import numpy as np

    from spherharm_tpu.core import computes
    from spherharm_tpu.core.simulation import Simulation
    from spherharm_tpu.core.state import SimParams
    from spherharm_tpu.models import scenarios, shapes_library

    lmax = 0
    shapes = shapes_library.build_shapes(
        [shapes_library.sphere_coeffs(0.5, lmax)], lmax,
        contact_quad=(12, 24),
    )
    params = SimParams.create(dt=1e-4, kn=1e5, cutoff=1.1, skin=0.2)
    state = scenarios.make_state(
        [[0.0, 0, 0], [0.95, 0, 0], [3.0, 0, 0]],
        [-1, -2, -2], [5, 2, 2],
    )
    sim = Simulation(shapes, params, neighbor_mode="allpairs", k_max=4,
                     pair_capacity=16, conservative=False)
    st, ng = sim.init_neighbors(state)
    coord = np.asarray(computes.compute("coord/atom", sim, st, ng))
    cont = np.asarray(computes.compute("contact/atom", sim, st, ng))
    assert list(coord[:3]) == [1, 1, 0]
    assert list(cont[:3]) == [1, 1, 0]


def test_dump_peratom_compute_column(tmp_path):
    """LAMMPS `dump custom ... c_<id>` columns: per-atom compute values
    ride the dump rows."""
    import numpy as np

    from spherharm_tpu.io.deck import DeckRunner
    from spherharm_tpu.io.dump import read_dump

    out = tmp_path / "c.dump"
    deck = f"""
units lj
boundary f f f
region box block -2 2 -2 2 -2 2
create_box 1 box
shape 1 sphere 0.5
pair_style spherharm 100000 28571 0 0 0
timestep 2e-4
create_atoms 1 single -0.45 0 0
create_atoms 1 single 0.45 0 0
compute 1 all coord/atom
fix 1 all nve/sh
dump 1 all custom 10 {out} id x c_1
run 10
"""
    runner = DeckRunner().run_text(deck)
    frames = read_dump(out)
    assert len(frames) >= 1
    last = frames[-1]
    assert "c_1" in last["columns"]
    col = np.asarray(last["data"]["c_1"])
    assert list(col) == [1.0, 1.0]  # both in bounding-sphere contact
