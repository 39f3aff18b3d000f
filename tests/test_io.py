"""I/O layer: dump format, restart roundtrip (with contact history),
coefficient files, data files, deck translation (SURVEY.md 2 B.7, 3.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spherharm_tpu.io import data as data_io
from spherharm_tpu.io.deck import DeckRunner
from spherharm_tpu.io.dump import read_dump, write_dump
from spherharm_tpu.io.restart import read_restart, write_restart
from spherharm_tpu.models import scenarios, shapes_library


def test_dump_roundtrip(tmp_path):
    sim, state, neigh = scenarios.two_body_collision()
    path = tmp_path / "traj.dump"
    write_dump(path, state, sim.shapes, periodic=(False, False, False))
    frames = read_dump(path)
    assert len(frames) == 1
    fr = frames[0]
    assert fr["n"] == 2
    np.testing.assert_allclose(
        sorted(fr["data"]["id"]), [1, 2]
    )
    np.testing.assert_allclose(
        fr["data"]["x"], np.asarray(state.x)[:, 0], atol=1e-6
    )
    # Append a second frame.
    write_dump(path, state, sim.shapes, append=True)
    assert len(read_dump(path)) == 2


@pytest.mark.slow
def test_restart_roundtrip_bitexact(tmp_path):
    """Resume must reproduce the exact trajectory — including friction
    springs (SURVEY.md 3.4 'contact history survives restart')."""
    sim, state, neigh = scenarios.settling_box(n=27, k_max=16)
    state, neigh = sim.run(state, neigh, 150)
    path = tmp_path / "rs.npz"
    write_restart(path, state, neigh, sim.params)
    s2, n2, p2, _ = read_restart(path)
    # continue both
    a_state, a_neigh = sim.run(state, neigh, 100)
    b_state, b_neigh = sim.run(s2, n2, 100)
    np.testing.assert_array_equal(np.asarray(a_state.x), np.asarray(b_state.x))
    np.testing.assert_array_equal(np.asarray(a_state.v), np.asarray(b_state.v))
    np.testing.assert_array_equal(
        np.asarray(a_neigh.hist), np.asarray(b_neigh.hist)
    )


def test_coeff_file_roundtrip(tmp_path):
    lmax = 6
    c = shapes_library.blob_coeffs(lmax, seed=4)
    path = tmp_path / "shape.sh"
    data_io.write_coeff_file(path, c, lmax)
    c2, lmax2 = data_io.read_coeff_file(path)
    assert lmax2 == lmax
    np.testing.assert_allclose(c2, c, rtol=1e-15)


def test_data_file_roundtrip(tmp_path):
    sim, state, neigh = scenarios.settling_box(n=8, k_max=8)
    path = tmp_path / "config.data"
    data_io.write_data_file(path, state)
    d = data_io.read_data_file(path)
    assert d["x"].shape == (8, 3)
    act = np.asarray(state.active)
    np.testing.assert_allclose(
        d["x"], np.asarray(state.x)[act], rtol=1e-6
    )
    np.testing.assert_allclose(
        d["v"], np.asarray(state.v)[act], rtol=1e-6
    )


DECK = """
# config-1-style two-sphere collision deck
units           lj
dimension       3
boundary        f f f
atom_style      spherharm

region          box block -2 2 -2 2 -2 2
create_box      1 box
shape           1 sphere 0.5
density         1 1.0
read_data       {data}

pair_style      spherharm 1e5 2.857e4 0.0 0.0 0.0 lmax 0
pair_coeff      * *
neighbor        0.05 bin

fix             1 all nve/sh
timestep        2e-4
thermo          500
dump            1 all custom 1000 {dump} id type x y z vx vy vz
run             3000
"""


@pytest.mark.slow
def test_deck_two_body(tmp_path):
    # Build the two-body data file, then run the deck and check physics.
    sim, state, neigh = scenarios.two_body_collision()
    data_path = tmp_path / "two.data"
    data_io.write_data_file(data_path, state)
    deck = DECK.format(data=data_path, dump=tmp_path / "out.dump")
    runner = DeckRunner().run_text(deck)
    v = np.asarray(runner.state.v)
    act = np.asarray(runner.state.active)
    v = v[act]
    # Elastic head-on swap, as in test_two_body.
    assert v[0, 0] == pytest.approx(-1.0, abs=5e-3)
    assert v[1, 0] == pytest.approx(1.0, abs=5e-3)
    # Thermo rows recorded on cadence, dump file written.
    assert len(runner.thermo_log.rows) >= 6
    frames = read_dump(tmp_path / "out.dump")
    assert len(frames) >= 3
    es = runner.thermo_log.series("etot")
    assert abs(es[-1] - es[0]) / abs(es[0]) < 5e-3


def test_deck_unknown_command():
    with pytest.raises(Exception, match="unsupported"):
        DeckRunner().run_text("compute 1 all stress/atom NULL\n")
