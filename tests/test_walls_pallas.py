"""Fused wall kernel (ops/walls_pallas.py) vs the jnp reference
(ops/walls.py), interpret mode on CPU — plane and rotating cylinder,
friction + rolling, mid-contact springs."""

import jax.numpy as jnp
import numpy as np
import pytest

from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops import walls as walls_mod


def _system(seed=0, n=48, lmax=4):
    rng = np.random.default_rng(seed)
    shapes = shapes_library.build_shapes(
        [shapes_library.blob_coeffs(lmax, seed=seed + t, mean_radius=0.5,
                                    roughness=0.12) for t in range(2)],
        lmax, contact_quad=(8, 16),
    )
    params = SimParams.create(dt=1e-4, kn=1e5, gamma_n=20.0, mu=0.4,
                              k_roll=2e4, gamma_roll=10.0, mu_roll=0.2,
                              cutoff=1.4, skin=0.2)
    # Positions straddling z=0.5: some through the wall, some near, some
    # far (broad-phase cull exercised).
    x = rng.uniform(0.8, 5.2, (n, 3))
    x[:, 2] = rng.uniform(0.25, 1.6, n)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    angmom = rng.normal(size=(n, 3)) * 0.05
    state = scenarios.make_state(
        x, [0, 0, 0], [6, 6, 6], q=q,
        v=rng.normal(size=(n, 3)) * 0.3,
        angmom=angmom,
        scale=rng.uniform(0.85, 1.15, n),
        shtype=rng.integers(0, 2, n),
    )
    hist = jnp.asarray(rng.normal(size=(n, 6)) * 1e-4, jnp.float32)
    return shapes, params, state, hist


@pytest.mark.parametrize("kind", ["plane", "cylinder"])
def test_wall_kernel_matches_reference(kind):
    shapes, params, state, hist = _system()
    if kind == "plane":
        wall = walls_mod.PlaneWall.create(
            [0.0, 0.0, 0.5], [0.0, 0.0, 1.0], velocity=[0.1, 0.0, 0.0],
        )
    else:
        wall = walls_mod.CylinderWall.create(
            [3.0, 3.0, 0.0], [0.0, 0.0, 1.0], 2.8, omega=0.7,
        )
        # Push some particles toward the shell so the cylinder sees
        # real contacts.
        x = np.array(state.x)  # writable copy
        rel = x[:, :2] - 3.0
        rad = np.linalg.norm(rel, axis=1, keepdims=True)
        x[:24, :2] = 3.0 + rel[:24] / rad[:24] * np.linspace(
            2.2, 2.85, 24
        )[:, None]
        state = state.replace(x=jnp.asarray(x))

    f_ref, t_ref, h_ref, pe_ref, n_ref = walls_mod.wall_contact(
        state, shapes, params, wall, hist, exact=True,
    )
    f, t, h, pe, n_near = walls_mod.wall_contact(
        state, shapes, params, wall, hist, exact=True, use_pallas=True,
    )
    assert int(n_near) == int(n_ref)
    fmag = max(float(jnp.abs(f_ref).max()), 1e-6)
    assert fmag > 1.0, "system should have real wall contacts"
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=2e-3 * fmag)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               atol=2e-3 * fmag)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(h_ref),
        atol=1e-6 + 1e-3 * float(np.abs(np.asarray(h_ref)).max()),
    )
    np.testing.assert_allclose(
        np.asarray(pe), np.asarray(pe_ref),
        atol=2e-3 * max(float(np.asarray(pe_ref).max()), 1e-6),
    )


def test_wall_kernel_with_compaction():
    """wall_cap compaction + kernel == full jnp eval."""
    shapes, params, state, hist = _system(seed=3)
    wall = walls_mod.PlaneWall.create([0.0, 0.0, 0.5], [0.0, 0.0, 1.0])
    f_ref, t_ref, h_ref, pe_ref, _ = walls_mod.wall_contact(
        state, shapes, params, wall, hist, exact=True,
    )
    f, t, h, pe, _ = walls_mod.wall_contact(
        state, shapes, params, wall, hist, wall_cap=32, exact=True,
        use_pallas=True,
    )
    fmag = max(float(jnp.abs(f_ref).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=2e-3 * fmag)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               atol=2e-3 * fmag)


def test_per_wall_material_override():
    """A wall.mat row must act exactly like the same values as globals,
    in BOTH the jnp and kernel paths — and differ from the global run."""
    shapes, params, state, hist = _system(seed=6)
    soft = [2e4, 8e3, 10.0, 5.0, 0.2, 0.0, 0.0, 0.0]
    wall_soft = walls_mod.PlaneWall.create(
        [0.0, 0.0, 0.5], [0.0, 0.0, 1.0], mat=soft,
    )
    wall_plain = walls_mod.PlaneWall.create([0.0, 0.0, 0.5], [0, 0, 1.0])
    from spherharm_tpu.core.state import SimParams

    params_soft = SimParams.create(
        dt=1e-4, kn=soft[0], kt=soft[1], gamma_n=soft[2], gamma_t=soft[3],
        mu=soft[4], cutoff=1.4, skin=0.2,
    )
    f_ref, t_ref, h_ref, pe_ref, _ = walls_mod.wall_contact(
        state, shapes, params_soft, wall_plain, hist, exact=True,
    )
    for pall in (False, True):
        f, t, h, pe, _ = walls_mod.wall_contact(
            state, shapes, params, wall_soft, hist, exact=True,
            use_pallas=pall,
        )
        fmag = max(float(np.abs(np.asarray(f_ref)).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                                   atol=2e-3 * fmag)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                                   atol=2e-3 * fmag)
    # Sanity: the override differs from the global-params wall.
    f_g, *_ = walls_mod.wall_contact(
        state, shapes, params, wall_plain, hist, exact=True,
    )
    assert not np.allclose(np.asarray(f_g), np.asarray(f_ref),
                           atol=1e-3 * fmag)


def test_deck_wall_coeff():
    from spherharm_tpu.io.deck import DeckRunner

    deck = """
units lj
boundary f f f
region box block -2 2 -2 2 0 4
create_box 1 box
shape 1 sphere 0.5
pair_style spherharm 100000 28571 0 0 0
timestep 2e-4
create_atoms 1 single 0 0 0.45
fix 1 all nve/sh
fix 2 all wall/gran plane 0 0 0 0 0 1 coeff 30000 8571 0 0 0
run 10
"""
    runner = DeckRunner().run_text(deck)
    w = runner.sim.walls[0]
    assert w.mat is not None
    assert float(w.mat[0]) == pytest.approx(30000.0)
    v = np.asarray(runner.state.v)[np.asarray(runner.state.active)]
    assert v[0, 2] > 0  # pushed off the floor
