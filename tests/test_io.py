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
    sim, state, neigh = scenarios.two_body_collision(conservative=False)
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
    sim, state, neigh = scenarios.two_body_collision(conservative=False)
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
        DeckRunner().run_text("bond_style harmonic\n")
    with pytest.raises(Exception, match="unsupported compute"):
        DeckRunner().run_text("compute 1 all cna/atom 3.0\n")


def test_deck_regions_and_lattices(tmp_path):
    """Sphere/cylinder/prism regions + fcc/bcc/hcp lattices fill with
    the right counts and all sites lie inside the region."""
    from spherharm_tpu.io.deck import (
        BlockRegion, CylinderRegion, DeckRunner, PrismRegion, SphereRegion,
    )

    r = DeckRunner()
    r.run_text("""
units           lj
boundary        p p p
atom_style      spherharm
region          box block 0 10 0 10 0 10
create_box      1 box
shape           1 sphere 0.4
region          ball sphere 5 5 5 3
lattice         fcc 1.6
create_atoms    1 region ball
""")
    x = r.atoms["x"]
    assert x.shape[0] > 20
    assert np.all(np.sum((x - 5.0) ** 2, axis=1) <= (3.0 + 0.1) ** 2)

    r2 = DeckRunner()
    r2.run_text("""
units           lj
boundary        p p p
atom_style      spherharm
region          box block 0 10 0 10 0 10
create_box      1 box
shape           1 sphere 0.4
region          tube cylinder z 5 5 2.5 1 9
lattice         bcc 1.5
create_atoms    1 region tube
""")
    x2 = r2.atoms["x"]
    assert x2.shape[0] > 20
    d2 = (x2[:, 0] - 5) ** 2 + (x2[:, 1] - 5) ** 2
    assert np.all(d2 <= (2.5 + 0.1) ** 2)
    assert np.all((x2[:, 2] > 0.8) & (x2[:, 2] < 9.2))

    # hcp density ~ sc x 4 sites per (a, sqrt3 a, sqrt(8/3) a) cell
    r3 = DeckRunner()
    r3.run_text("""
units           lj
boundary        p p p
atom_style      spherharm
region          box block 0 10 0 10 0 10
create_box      1 box
shape           1 sphere 0.4
lattice         hcp 1.5
create_atoms    1 region box
""")
    n_hcp = r3.atoms["x"].shape[0]
    vol_per_site = 1.5**3 * np.sqrt(3.0) * np.sqrt(8.0 / 3.0) / 4
    assert n_hcp == pytest.approx(1000 / vol_per_site, rel=0.25)

    # Region membership primitives.
    pr = PrismRegion([0, 0, 0], [4, 4, 4], [2.0, 0.0, 0.0])
    assert pr.contains(np.array([[5.0, 3.9, 0.1]]))[0]   # sheared corner
    assert not pr.contains(np.array([[0.5, 3.9, 0.1]]))[0]


def test_deck_triclinic_prism_runs():
    """create_box from a prism region yields a tilted periodic cell and
    runs under the triclinic pipeline."""
    from spherharm_tpu.io.deck import DeckRunner

    r = DeckRunner()
    r.run_text("""
units           lj
boundary        p p p
atom_style      spherharm
region          cell prism 0 8 0 8 0 8 1.5 0 0
create_box      1 cell
shape           1 sphere 0.45
lattice         sc 1.9
region          fill block 0.5 7.5 0.5 7.5 0.5 7.5
create_atoms    1 region fill seed 7
velocity        all create 0.05 11
pair_style      spherharm 1e4 1e4 5 5 0.3
pair_coeff      * *
timestep        1e-3
thermo          50
run             100
""")
    assert r.sim.triclinic
    assert float(r.state.tilt[0]) == 1.5
    assert len(r.thermo_log.rows) >= 2
    ke = r.thermo_log.series("ke")
    assert np.isfinite(ke).all()


def test_deck_restart_roundtrip(tmp_path):
    """write_restart/read_restart deck commands resume bit-exact."""
    from spherharm_tpu.io.deck import DeckRunner

    common = """
units           lj
boundary        p p p
atom_style      spherharm
region          box block 0 8 0 8 0 8
create_box      1 box
shape           1 ellipsoid 0.5 0.45 0.4
lattice         sc 1.8
create_atoms    1 region box seed 3
velocity        all create 0.2 5
pair_style      spherharm 1e4 1e4 10 10 0.4 lmax 2 rolling 2e3 5 0.2
pair_coeff      * *
timestep        1e-3
"""
    ckpt = tmp_path / "deck.restart"
    r1 = DeckRunner()
    r1.run_text(common + f"""
run             120
write_restart   {ckpt}
run             80
""")
    r2 = DeckRunner()
    r2.run_text(common + f"""
read_restart    {ckpt}
run             80
""")
    np.testing.assert_array_equal(
        np.asarray(r1.state.x), np.asarray(r2.state.x)
    )
    np.testing.assert_array_equal(
        np.asarray(r1.state.v), np.asarray(r2.state.v)
    )
    assert float(r1.sim.params.k_roll) == 2e3


def test_deck_variables_and_expressions(capsys):
    """variable equal/string + ${} / $() substitution + if/then/else
    (the reference's Variable class + input-script flow, SURVEY.md 2
    B.1 — VERDICT r1 had these as out-of-scope)."""
    r = DeckRunner()
    r.run_text("""
variable        two equal 1+1
variable        r equal sqrt(v_two^2)
variable        name string hello
print           "${name} $(v_r*3) ${two}"
if              "v_two == 2" then "print 'yes'" else "print 'no'"
if              "v_two > 5 || v_r > 1" then "print 'or-works'"
""")
    out = capsys.readouterr().out
    assert "hello 6.0 2" in out
    assert "yes" in out and "no" not in out
    assert "or-works" in out


def test_deck_loop_label_jump(capsys):
    """The canonical LAMMPS loop idiom: label / variable loop / next /
    jump SELF."""
    r = DeckRunner()
    r.run_text("""
label           top
variable        i loop 4
print           "iter $i"
next            i
jump            SELF top
print           "done"
""")
    out = capsys.readouterr().out
    assert [l for l in out.splitlines() if l.startswith("iter")] == [
        "iter 1", "iter 2", "iter 3", "iter 4"
    ]
    assert "done" in out
    assert "i" not in r.variables  # exhausted loop var deleted


def test_deck_variable_runs_simulation(capsys):
    """Variables parameterize real runs; thermo keywords readable in
    expressions after materialization."""
    r = DeckRunner()
    r.run_text("""
variable        n_steps equal 20*2
units           lj
boundary        p p p
atom_style      spherharm
region          box block 0 6 0 6 0 6
create_box      1 box
shape           1 sphere 0.45
lattice         sc 1.5
create_atoms    1 region box seed 3
velocity        all create 0.2 7
pair_style      spherharm 1e4 1e4 5 5 0.3
pair_coeff      * *
timestep        1e-3
run             ${n_steps}
if              "ke > 0" then "print 'ke=$(ke)'"
print           "vol=$(vol)"
""")
    assert int(r.state.step) == 40
    out = capsys.readouterr().out
    assert "ke=" in out
    assert "vol=216" in out


def test_deck_group_velocity():
    """group type/region + velocity <group> set (LAMMPS group command):
    two single atoms of different types get opposing velocities and
    elastically swap them in a head-on collision."""
    deck = """
units lj
boundary f f f
region box block -2 2 -2 2 -2 2
create_box 2 box
shape 1 sphere 0.5
shape 2 sphere 0.5
pair_style spherharm 100000 28571 0 0 0 conservative off
timestep 2e-4
create_atoms 1 single -0.7 0 0
create_atoms 2 single 0.7 0 0
group left type 1
group right type 2
velocity left set 1.0 0 0
velocity right set -1.0 0 0
fix 1 all nve/sh
run 2500
"""
    runner = DeckRunner().run_text(deck)
    v = np.asarray(runner.state.v)[np.asarray(runner.state.active)]
    assert v[0, 0] == pytest.approx(-1.0, abs=5e-3)
    assert v[1, 0] == pytest.approx(1.0, abs=5e-3)


def test_deck_velocity_then_create_atoms():
    """velocity -> create_atoms -> velocity (LAMMPS semantics: atoms
    created after a velocity command start at rest until a later
    velocity command selects them). Regression: the append path used to
    leave atoms["v"] at the old length and crash on broadcast."""
    deck = """
units lj
boundary f f f
region box block -3 3 -3 3 -3 3
create_box 2 box
shape 1 sphere 0.4
shape 2 sphere 0.4
pair_style spherharm 100000 28571 0 0 0
timestep 2e-4
create_atoms 1 single -1.5 0 0
velocity all set 0.5 0 0
create_atoms 2 single 1.5 0 0
create_atoms 2 single 0 1.5 0
group newer type 2
velocity newer set -0.25 0 0
fix 1 all nve/sh
run 1
"""
    runner = DeckRunner().run_text(deck)
    act = np.asarray(runner.state.active)
    v = np.asarray(runner.state.v)[act]
    tags = np.asarray(runner.state.tag)[act]
    order = np.argsort(tags)
    v = v[order]
    assert v[0, 0] == pytest.approx(0.5, abs=1e-6)
    assert v[1, 0] == pytest.approx(-0.25, abs=1e-6)
    assert v[2, 0] == pytest.approx(-0.25, abs=1e-6)


def test_deck_pair_style_conservative_flag():
    """`pair_style ... conservative {on|off}` parses and reaches the
    Simulation config; default is on (the framework default). Parse-only
    — the end-to-end off path runs in the freeze test below."""
    r = DeckRunner().run_text("pair_style spherharm 1e5 1e4 5 5 0.3")
    assert r.conservative is True
    r = DeckRunner().run_text(
        "pair_style spherharm 1e5 1e4 5 5 0.3 conservative off")
    assert r.conservative is False
    r = DeckRunner().run_text(
        "pair_style spherharm 1e5 1e4 5 5 0.3 conservative on")
    assert r.conservative is True
    with pytest.raises(Exception):
        DeckRunner().run_text(
            "pair_style spherharm 1e5 1e4 5 5 0.3 conservative maybe")


def test_deck_fix_freeze_boundary_particle():
    """fix <group> freeze: the frozen particle carries a settling
    particle's weight without moving (force AND torque zeroed each
    step); the mobile one comes to rest on top of it.

    gamma_n=20000 puts the contact well past critical damping so the
    drop lands dead on first touch — the run horizon (5000 x 1e-4 =
    0.5 t*) fits the ~0.37 t* fall plus the landing (measured trace
    2026-08-19: z=1.4950, vz=-0.003 at step 5000). As originally
    committed with gamma_n=500, zeta ~ 0.1 gives restitution ~0.87 and
    the particle is provably still airborne at the horizon in EITHER
    elastic mode — the test never passed. `conservative off` keeps this
    pure-deck regression fast on CPU; freeze semantics are
    mode-independent."""
    deck = """
units lj
boundary f f f
region box block -2 2 -2 2 -1 6
create_box 1 box
shape 1 sphere 0.5
pair_style spherharm 100000 28571 20000 250 0.3 conservative off
timestep 1e-4
create_atoms 1 single 0 0 0.5
create_atoms 1 single 0.05 0 2.2
region bottom block -2 2 -2 2 -1 1
group base region bottom
velocity base set 0 0 0
fix g all gravity 10 vector 0 0 -1
fix 1 all nve/sh
fix 2 base freeze
run 5000
"""
    runner = DeckRunner().run_text(deck)
    act = np.asarray(runner.state.active)
    tags = np.asarray(runner.state.tag)[act]
    x = np.asarray(runner.state.x)[act][np.argsort(tags)]
    v = np.asarray(runner.state.v)[act][np.argsort(tags)]
    # Frozen particle did not move at all.
    np.testing.assert_allclose(x[0], [0.0, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(v[0], 0.0, atol=1e-8)
    # Mobile particle rests ON the frozen one (z ~ 1.4-1.5 at slight
    # Hertz compression), not fallen through to the floor.
    assert 1.2 < x[1, 2] < 1.6, x[1]
    assert abs(v[1, 2]) < 0.05


def test_deck_fix_setforce_null_components():
    """fix setforce NULL 0 0: the NULL component keeps the accumulated
    (gravity) force, the explicit zeros override theirs — the particle
    accelerates along x only."""
    deck = """
units lj
boundary f f f
region box block -5 5 -5 5 -5 5
create_box 1 box
shape 1 sphere 0.4
pair_style spherharm 100000 28571 0 0 0
timestep 1e-3
create_atoms 1 single 0 0 0
group one type 1
fix g all gravity 10 vector 1 0 0
fix 1 all nve/sh
fix 2 one setforce NULL 0 0
run 100
"""
    runner = DeckRunner().run_text(deck)
    act = np.asarray(runner.state.active)
    v = np.asarray(runner.state.v)[act]
    # x keeps gravity (NULL), y/z pinned to zero force.
    assert v[0, 0] == pytest.approx(10.0 * 100 * 1e-3, rel=1e-3)
    np.testing.assert_allclose(v[0, 1:], 0.0, atol=1e-7)
